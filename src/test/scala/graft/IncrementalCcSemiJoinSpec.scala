package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-9 operator specs: incremental connected components, fuzzy
  * (LSH cross-set) decontamination, and the left-semi stream-stream
  * join — each pinned against an independent in-JVM replay on the
  * fixture corpus, beyond the DuckDB oracle rows.
  */
class IncrementalCcSemiJoinSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  test("incremental CC == full re-cluster, and the merge actually" +
      " unifies cross-batch clusters") {
    // the contract the query's comment claims: star-compressed old
    // labels ∪ new-batch delta re-clusters to EXACTLY the full corpus
    // clustering — compare against an independent full run over the
    // same banding (the engine's own full path, which the DuckDB
    // closure oracle certifies separately)
    val docs = Tables.documents(spark, sf)
    val full = graft.dedup.Components.canonicalLabels(
      graft.dedup.SimHash.bandedNearDupPairs(docs, "doc_id", "text",
        maxHamming = 1, bands = 2), "doc_a", "doc_b")
    val inc = SparkEntry.queries("dedup_cc_incremental")(spark, sf)
      .select("doc_id", "canonical_id")
    assert(inc.exceptAll(full).count() == 0)
    assert(full.exceptAll(inc).count() == 0)
    // the merge path is only exercised if some cluster SPANS batches
    // (old docs + new docs under one canonical id) — assert the fixture
    // actually provides that, otherwise this test pins nothing
    val spanning = inc
      .join(full.select(col("doc_id"), col("canonical_id").as("c2")),
        "doc_id")
      .groupBy("canonical_id")
      .agg(sum(when(col("doc_id") % 5 === 0, 1L).otherwise(0L))
          .as("n_new"),
        sum(when(col("doc_id") % 5 =!= 0, 1L).otherwise(0L))
          .as("n_old"))
      .filter(col("n_new") > 0 && col("n_old") > 0)
      .count()
    assert(spanning > 0, "fixture has no cross-batch cluster; the " +
      "incremental merge path went unexercised")
    CacheRegistry.releaseAll()
  }

  test("fuzzy decontamination is strictly cross-set and its jaccard" +
      " replays from raw signatures") {
    val got = SparkEntry.queries("text_contamination_fuzzy")(spark, sf)
      .collect()
    // benchmark docs never appear as corpus hits
    assert(got.forall(_.getAs[Long]("doc_id") >= 20L))
    assert(got.nonEmpty, "fixture produced no fuzzy contamination hit")
    // replay: for each reported doc, brute-force the signature
    // agreement against EVERY benchmark doc — max over sharing-a-bucket
    // pairs must equal the reported max_jaccard
    val sigs = graft.dedup.MinHash.bucketFrame(
        Tables.documents(spark, sf), "doc_id", "text", 16, 4)
      .select("doc_id", "sig", "band", "key")
    val bench = sigs.filter(col("doc_id") < 20).collect()
      .map(r => (r.getLong(0), r.getSeq[Long](1).toVector,
        r.getInt(2), r.getLong(3)))
    val corp = sigs.filter(col("doc_id") >= 20).collect()
      .map(r => (r.getLong(0), r.getSeq[Long](1).toVector,
        r.getInt(2), r.getLong(3)))
    val best = scala.collection.mutable.Map[Long, Double]()
    val hits = scala.collection.mutable.Map[Long, Set[Long]]()
    for ((cid, cs, cb, ck) <- corp; (bid, bs, bb, bk) <- bench
         if cb == bb && ck == bk) {
      val j = cs.zip(bs).count { case (a, b) => a == b } / 16.0
      if (j >= 0.5) {
        best(cid) = math.max(best.getOrElse(cid, 0.0), j)
        hits(cid) = hits.getOrElse(cid, Set.empty) + bid
      }
    }
    val want = best.keys.map(k => (k, hits(k).size.toLong, best(k)))
      .toSet
    val gotSet = got.map(r => (r.getAs[Long]("doc_id"),
      r.getAs[Long]("n_bench_hits"),
      r.getAs[Double]("max_jaccard"))).toSet
    assert(gotSet == want)
    CacheRegistry.releaseAll()
  }

  test("stream-stream semi join: streamed set == batch EXISTS, one row" +
      " per purchase") {
    val streamed = graft.streaming.EventStream
      .runStreamStreamSemiJoin(spark, sf)
    val rows = streamed.collect()
    // exactly once per matched purchase — semi join never re-emits
    assert(rows.map(_.getAs[Long]("event_id")).distinct.length
      == rows.length)
    val ev = Tables.events(spark, sf)
    val p = ev.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts"))
    val v = ev.filter(col("event_type") === "view")
      .select(col("user_id").as("vu"), col("ts").as("view_ts"))
    val batch = p.join(v,
        col("user_id") === col("vu") &&
          col("view_ts") >= col("ts") - expr("INTERVAL 1 HOUR") &&
          col("view_ts") <= col("ts"),
        "left_semi")
      .select("event_id", "user_id", "ts")
    assert(streamed.exceptAll(batch).count() == 0)
    assert(batch.exceptAll(streamed).count() == 0)
    CacheRegistry.releaseAll()
  }
}
