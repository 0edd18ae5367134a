package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class TextOlapSpec extends AnyFunSuite {
  import graft.text.TextAnalysis
  lazy val spark = SparkTestSession.spark
  val sf = "/root/testdata/sf0.001"

  test("fused doc_fingerprint matches the composable formulation everywhere") {
    val docs = Tables.documents(spark, sf)
    val fused = TextAnalysis.withFingerprint(docs)
      .select("doc_id", "fingerprint")
    val composed = TextAnalysis.withFingerprintComposable(docs)
      .select(col("doc_id"), col("fingerprint").as("fingerprint_c"))
    val diff = fused.join(composed, "doc_id")
      .filter(col("fingerprint") =!= col("fingerprint_c")).count()
    assert(diff == 0)
  }

  test("doc_fingerprint edge cases: empty, 1-2 tokens, case folding") {
    import spark.implicits._
    val df = Seq("", "hello", "hello world", "Hello, WORLD!", "a b c a b c")
      .toDF("text")
    val got = TextAnalysis.withFingerprint(df)
      .select("fingerprint").collect().map(_.getLong(0))
    assert(got(0) == 0L)          // no tokens -> empty fold
    assert(got(1) > 0L)           // single token -> its own hash
    assert(got(2) == got(3))      // punctuation/case insensitive
    assert(got.distinct.length == 4)
  }

  test("quality score is bounded and deterministic") {
    val q = TextAnalysis.withQuality(Tables.documents(spark, sf))
      .agg(min("quality_score"), max("quality_score")).collect()(0)
    assert(q.getDouble(0) >= 0.0 && q.getDouble(1) <= 1.0)
  }

  test("langid cascade: ties resolve to earlier language deterministically") {
    import spark.implicits._
    // 'la' is a marker for both es and fr; es comes first in the cascade
    val df = Seq("la la la").toDF("text")
    val got = TextAnalysis.withLangId(df).select("predicted_lang").first()
    assert(got.getString(0) == "es")
    val none = TextAnalysis.withLangId(Seq("xyz abc").toDF("text"))
      .select("predicted_lang").first()
    assert(none.getString(0) == "und")
  }

  test("join_region_revenue plan broadcasts dims and prunes columns") {
    val plan = SparkEntry.queries("join_region_revenue")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"))
    // lineitem scan must not read all 11 columns
    assert(!plan.contains("l_shipdate") || !plan.contains("l_comment"))
  }

  test("agg_pricing_summary pushes the shipdate comparison to the scan") {
    val plan = SparkEntry.queries("agg_pricing_summary")(spark, sf)
      .queryExecution.executedPlan.toString
    // not just IsNotNull — the range predicate itself must reach parquet
    // (row-group min/max skipping); a to_date() wrapper would block it
    assert(plan.contains("LessThan(l_shipdate"))
  }

  test("sort_topk_newest plans as distributed top-k, not global sort") {
    val plan = SparkEntry.queries("sort_topk_newest")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"))
  }

  test("KMV sketch: ~1/sqrt(k) accuracy, exact below k, top-k plan") {
    import spark.implicits._
    import graft.olap.Sketch
    // estimator branch: 20k distinct values, k=256 -> expect within ~3
    // standard errors (3/sqrt(256) ≈ 19%); observed error is ~2% here but
    // the bound keeps the test stable if the hash set changes
    val big = (1 to 20000).toDF("v")
    val est = Sketch.kmvDistinct(big, col("v"), 256)
      .collect()(0).getAs[Double]("est_distinct")
    assert(math.abs(est - 20000) / 20000.0 < 0.19, s"est=$est")
    // exact branch: fewer distinct values than k -> sketch IS the set
    val small = (1 to 100).toDF("v")
    val row = Sketch.kmvDistinct(small, col("v"), 256).collect()(0)
    assert(row.getAs[Long]("k_actual") == 100L)
    assert(row.getAs[Double]("est_distinct") == 100.0)
    // the k-smallest selection must be a distributed top-k, not a sort
    val plan = Sketch.kmvDistinct(big, col("v"), 256)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"))
  }

  test("token co-occurrence: hand docs + df bound on real data") {
    import spark.implicits._
    // hand corpus: pair counts once per doc (doc 1 repeats 'alpha bravo'),
    // short tokens (< 4 chars) excluded, a < b canonical order
    val docs = Seq(
      (1L, "alpha bravo alpha bravo charlie"),
      (2L, "alpha bravo"),
      (3L, "alpha delta ab cd")).toDF("doc_id", "text")
    val tk = docs
      .select(col("doc_id"), explode(TextAnalysis.tokens("text")).as("t"))
      .filter(length(col("t")) >= 4).distinct()
    val pairs = tk.select(col("doc_id"), col("t").as("a"))
      .join(tk.select(col("doc_id"), col("t").as("b")), Seq("doc_id"))
      .filter(col("a") < col("b"))
      .groupBy("a", "b").agg(count(lit(1)).as("n")).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(pairs == Map(
      ("alpha", "bravo") -> 2L, ("alpha", "charlie") -> 1L,
      ("bravo", "charlie") -> 1L, ("alpha", "delta") -> 1L))
    // real data: co-occurrence count can never exceed either doc frequency
    val top = SparkEntry.queries("text_cooccurrence_topk")(spark, sf)
      .collect()
    val df = Tables.documents(spark, sf)
      .select(col("doc_id"), explode(TextAnalysis.tokens("text")).as("t"))
      .filter(length(col("t")) >= 4).distinct()
      .groupBy("t").agg(count(lit(1)).as("df")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(top.nonEmpty && top.forall { r =>
      val n = r.getAs[Long]("n_docs")
      n <= df(r.getAs[String]("tok_a")) && n <= df(r.getAs[String]("tok_b"))
    })
  }

  test("group k-fold partitions users; sentence stats on hand docs") {
    val folds = SparkEntry.queries("sample_group_kfold")(spark, sf)
      .collect()
    assert(folds.map(_.getAs[Long]("fold")).toSet.subsetOf((0L to 4L).toSet))
    // every user is in exactly one fold: fold user counts sum to the total
    val totalUsers = Tables.documents(spark, sf).sparkSession
      .read.parquet(s"$sf/events.parquet").select("user_id")
      .distinct().count()
    assert(folds.map(_.getAs[Long]("n_users")).sum == totalUsers)
    // sentence stats: hand doc with empty segments and trailing run
    import spark.implicits._
    val hand = Seq((1L, "One. Two!! Three?  "), (2L, "...."), (3L, "abc"))
      .toDF("doc_id", "text")
    val got = hand
      .select(col("doc_id"),
        org.apache.spark.sql.functions.filter(
          transform(split(col("text"), "[.!?]+"), x => trim(x)),
          x => length(x) > 0).as("s"))
      .select(col("doc_id"), size(col("s")).as("n")).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(got == Map(1L -> 3, 2L -> 0, 3L -> 1))
  }

  test("damerau-levenshtein: unrestricted variant, hand cases, codegen") {
    import graft.functions.DamerauLevenshtein.{damerau_levenshtein, distance}
    import org.apache.spark.unsafe.types.UTF8String.{fromString => u}
    // the discriminator: unrestricted DL allows editing inside a
    // transposed block — dl("ca","abc") = 2 where OSA would give 3
    assert(distance(u("ca"), u("abc")) == 2)
    assert(distance(u("ab"), u("ba")) == 1)         // one transposition
    assert(distance(u("spark"), u("sprak")) == 1)
    assert(distance(u("kitten"), u("sitting")) == 3)
    assert(distance(u("abcdef"), u("abcfad")) == 3)
    assert(distance(u(""), u("abc")) == 3 && distance(u("abc"), u("")) == 3)
    assert(distance(u("same"), u("same")) == 0)
    // code-point semantics (ADVICE r4): each emoji is ONE unit, as in
    // DuckDB — under UTF-16 code units "𝄞" (a surrogate pair) would cost 2
    assert(distance(u("a𝄞b"), u("ab")) == 1)   // delete 𝄞
    assert(distance(u("😀😁"),
                    u("😁😀")) == 1)  // emoji transpose
    assert(distance(u("😀"), u("x")) == 1)      // emoji subst
    // triangle-ish sanity: never exceeds plain levenshtein
    val spark2 = spark
    import spark2.implicits._
    val pairs = Seq(("martha", "marhta"), ("dixon", "dicksonx"),
                    ("flaw", "lawn"), ("gumbo", "gambol"))
      .toDF("a", "b")
      .select(col("a"), col("b"),
        damerau_levenshtein(col("a"), col("b")).as("dl"),
        levenshtein(col("a"), col("b")).as("lev"))
    val rows = pairs.collect()
    assert(rows.forall(r => r.getAs[Int]("dl") <= r.getAs[Int]("lev")))
    assert(rows.head.getAs[Int]("dl") == 1) // martha->marhta: transposition
    // codegen path: on a real scan (a local Seq constant-folds into a
    // LocalTableScan before any codegen), the expression runs inside a
    // whole-stage codegen span
    val q = SparkEntry.queries("link_block_damerau")(
      spark, "/root/testdata/sf0.001")
    q.collect() // finalize the AQE plan on THIS QueryExecution
    val qplan = q.queryExecution.executedPlan.toString
    assert(qplan.contains("damerau_levenshtein"))
    // `*(n)` is the whole-stage-codegen marker in the finalized AQE plan:
    // the distance must run inside a codegen stage, not interpreted
    assert(qplan.linesIterator.exists(l =>
      l.contains("damerau_levenshtein") && l.trim.matches("""^\+?-?\s*\*\(\d+\).*""")),
      s"distance not in a codegen stage:\n$qplan")
    // null propagation
    val withNull = Seq((Some("x"), Option.empty[String])).toDF("a", "b")
      .select(damerau_levenshtein(col("a"), col("b")).as("dl")).collect()
    assert(withNull(0).isNullAt(0))
  }

  test("zipf spectrum: bucket bounds, token conservation, constant slope") {
    val sf = "/root/testdata/sf0.001"
    val rows = SparkEntry.queries("text_zipf_spectrum")(spark, sf).collect()
    assert(rows.nonEmpty)
    // every token in bucket b has 2^b <= tf < 2^(b+1), so the bucket's
    // occurrence total is bounded both ways
    rows.foreach { r =>
      val (b, nt, occ) = (r.getAs[Long]("b"), r.getAs[Long]("n_tokens"),
                          r.getAs[Long]("n_occurrences"))
      assert(b >= 0 && nt >= 1)
      assert(occ >= nt * (1L << b) && occ < nt * (1L << (b + 1)),
        s"bucket $b occupancy out of bounds")
    }
    // the slope column is a single scalar repeated on every row
    assert(rows.map(_.getAs[Double]("zipf_slope")).distinct.length == 1)
    // conservation: spectrum occurrences equal the corpus token count
    val total = Tables.documents(spark, sf)
      .select(explode(graft.text.TextAnalysis.tokens("text")).as("t"))
      .count()
    assert(rows.map(_.getAs[Long]("n_occurrences")).sum == total)
  }
}
