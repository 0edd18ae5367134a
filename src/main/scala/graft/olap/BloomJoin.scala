package graft.olap

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Bloom-filter join pruning — the explicit form of the runtime-filter
  * optimization (Spark's `spark.sql.optimizer.runtime.bloomFilter`, Trino's
  * dynamic filtering): build a compact membership filter from the selective
  * side's join keys, push it into the probe side's scan, and pay the real
  * join only for rows that might match.
  *
  * The filter is represented as its SET BIT POSITIONS (a small DataFrame)
  * rather than a packed bitset object, for two reasons: the positions
  * frame broadcasts exactly like the bitset would (≤ `bits` rows), and the
  * construction stays declarative — every step is engine-portable integer
  * arithmetic on the repo's spread hash, so the whole filter (and its
  * false-positive count) is oracle-checkable bit-for-bit. A production
  * variant would pack the same positions into `Array[Long]` words inside a
  * typed Aggregator; the candidate set it admits would be identical.
  *
  * Scale shape: build side aggregates to ≤ bits·hashes distinct positions
  * map-side (tiny, broadcast); probe-side candidacy is a broadcast
  * semi-join + count — no shuffle of the big table until the (pruned)
  * real join. With hashes=k and bits=m sized per the standard
  * m = −n·ln(p)/ln(2)², the candidate set shrinks the probe by the join's
  * selectivity, which is the entire point at 100 TB.
  */
object BloomJoin {

  /** Position of `keyCol` under hash function `salt`: portable spread hash
    * of "key#salt" folded into [0, bits).
    */
  private def position(key: Column, salt: Column, bits: Int): Column =
    Sketch.spreadHash(concat(key.cast("string"), lit("#"),
      salt.cast("string"))) % bits

  /** The filter: distinct set bit positions from the build side's keys. */
  def buildPositions(build: DataFrame, keyCol: String, bits: Int,
                     hashes: Int): DataFrame =
    build.select(col(keyCol).as("k")).distinct()
      .withColumn("salt", explode(sequence(lit(0), lit(hashes - 1))))
      .select(position(col("k"), col("salt"), bits).as("pos"))
      .distinct()

  /** Keys from `probe` that pass the filter: every one of the `hashes`
    * positions is set. (Contains all true matches plus the filter's false
    * positives — the caller verifies with the real join.)
    */
  def candidateKeys(probe: DataFrame, keyCol: String, positions: DataFrame,
                    bits: Int, hashes: Int): DataFrame =
    probe.select(col(keyCol).as("k")).distinct()
      .withColumn("salt", explode(sequence(lit(0), lit(hashes - 1))))
      .withColumn("pos", position(col("k"), col("salt"), bits))
      .join(broadcast(positions), Seq("pos"), "leftsemi")
      .groupBy("k")
      .agg(count(lit(1)).as("n_hit"))
      .filter(col("n_hit") === hashes)
      .select(col("k"))
}
