package graft.olap

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Z-order (Morton) layout keys — the multi-dimensional clustering
  * technique behind Delta/Iceberg `OPTIMIZE ZORDER`: interleaving the bits
  * of two dimension values gives a single sort key under which rows close
  * in EITHER dimension land in the same file/row-group, so min/max
  * statistics prune scans for predicates on either column (a plain sort
  * key prunes only its leading column).
  *
  * The key is exact integer bit arithmetic (shift/mask/or composed at plan
  * build time into one codegen'd expression tree — no loops at runtime,
  * no UDF), hence engine-portable and oracle-checkable. At 100 TB the
  * write path is `df.repartitionByRange(zkey).sortWithinPartitions(zkey)
  * .write` — the same shuffle any global sort pays, paid once at ingest.
  */
object ZOrder {

  /** Morton-interleave the low `bits` bits of `a` (even positions) and
    * `b` (odd positions) into one long. Inputs must be non-negative and
    * fit `bits` bits for the key to be a true Z-curve position.
    */
  def zkey(a: Column, b: Column, bits: Int): Column = {
    require(bits >= 1 && bits <= 31, s"bits must be in [1,31], got $bits")
    val al = a.cast("long")
    val bl = b.cast("long")
    (0 until bits).foldLeft(lit(0L)) { (acc, i) =>
      acc
        .bitwiseOR(shiftleft(shiftright(al, i).bitwiseAND(lit(1L)), 2 * i))
        .bitwiseOR(shiftleft(shiftright(bl, i).bitwiseAND(lit(1L)),
          2 * i + 1))
    }
  }
}
