package graft.olap

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Salted join for skewed keys.
  *
  * AQE's skew-join split (on by default) handles most skew at runtime by
  * splitting oversized shuffle partitions; salting is the explicit fallback
  * when one key alone exceeds an executor (AQE can split a partition, not a
  * single key's sorted run on the build side of a SMJ). The big side
  * scatters each row into one of `salts` sub-keys; the small side is
  * replicated `salts`× so every sub-key finds its match. Result is
  * bit-identical to the plain join (spec-pinned); cost is `salts`× the
  * small side's shuffle volume — cheap when small ≪ big, which is exactly
  * the skew scenario.
  */
object SkewJoin {

  def saltedJoin(big: DataFrame, small: DataFrame, keys: Seq[String],
                 salts: Int): DataFrame = {
    // deterministic scatter: hash of the whole big-side row, not rand() —
    // reruns and retried tasks land rows in the same salt bucket
    val bigS = big.withColumn("__salt",
      pmod(hash(big.columns.map(col): _*), lit(salts)))
    val smallS = small.withColumn("__salt",
      explode(sequence(lit(0), lit(salts - 1))))
    bigS.join(smallS, keys :+ "__salt").drop("__salt")
  }
}
