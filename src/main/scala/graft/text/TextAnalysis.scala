package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for LLM-data pipelines (north-star extension):
  * tokenization, quality scoring, language-ID heuristics, and document
  * fingerprinting — all built from codegen'd native functions (no UDFs),
  * with arithmetic chosen to be engine-portable (integer/decimal exact, no
  * transcendental functions) so every operator is oracle-checkable.
  *
  * Scale posture: everything here is a per-row projection — no shuffle, no
  * state; it runs map-side at whatever parallelism the scan provides.
  */
object TextAnalysis {

  /** The engine's tokenizer contract, stated once: case folding is
    * ASCII-ONLY (A-Z → a-z via translate, not full-Unicode lower()), and
    * tokens are maximal [a-z0-9]+ runs. The fused codegen expressions
    * (TextStatsExpr, DocFingerprintExpr, MinHash, SimHash) implement
    * exactly this; full-Unicode lower() would diverge on characters whose
    * lowercase is ASCII (e.g. Kelvin K U+212A → 'k'), silently breaking
    * fused-vs-composable and Spark-vs-oracle bitwise parity.
    */
  val asciiUpper = "ABCDEFGHIJKLMNOPQRSTUVWXYZ"
  val asciiLower = "abcdefghijklmnopqrstuvwxyz"

  /** ASCII-folded alphanumeric tokens per the contract above.
    * regexp_extract_all (RE2-compatible pattern, ASCII classes) so Spark's
    * Java regex and other engines agree on edge cases — unlike split(),
    * which emits empty boundary tokens.
    */
  def tokens(textCol: String): Column =
    expr(s"regexp_extract_all(translate($textCol, '$asciiUpper', " +
      s"'$asciiLower'), '[a-z0-9]+', 0)")

  /** Portable polynomial string hash — see graft.functions.CharFold (a
    * codegen'd expression; the lambda-based formulation of the same fold
    * benched ~100× slower).
    */
  def charFoldHash(c: Column): Column =
    graft.functions.CharFold.char_fold_hash(c)

  val stopwords: Seq[String] =
    Seq("the", "a", "of", "and", "to", "in", "is", "it", "that", "for")

  /** One fused pass (graft.functions.TextStatsExpr) computes every count;
    * the derived columns are cheap field reads. The composable
    * regexp/lambda formulation of the same stats lives on in the DuckDB
    * oracles, which pin the semantics.
    */
  def withTokenStats(docs: DataFrame, textCol: String = "text"): DataFrame =
    docs.withColumn("__stats",
        graft.functions.TextStats.text_stats(col(textCol), Seq(stopwords)))
      .withColumn("n_tokens", col("__stats.n_tokens"))
      // whitespace tokenization (the reference point BPE vocabularies are
      // measured against)
      .withColumn("n_ws_tokens", col("__stats.n_ws_tokens"))
      // BPE-ish subword estimate: pieces of <=4 chars per token — the
      // deterministic stand-in for a real tokenizer's piece count
      .withColumn("n_subwords", col("__stats.n_subwords"))
      .withColumn("n_stopwords", element_at(col("__stats.hits"), 1))
      .withColumn("avg_word_len",
        when(col("n_tokens") > 0,
          col("__stats.sum_tok_len").cast("double")
            / col("n_tokens").cast("double")))
      .drop("__stats")

  /** Quality scoring (length / punctuation / stopword-ratio heuristics).
    * Pure +,*,/ and least() over exact counts — no libm, fully portable.
    */
  def withQuality(docs: DataFrame, textCol: String = "text"): DataFrame =
    withTokenStats(docs, textCol)
      .withColumn("__q",
        graft.functions.TextStats.text_stats(col(textCol), Seq(stopwords)))
      .withColumn("punct_ratio",
        col("__q.n_punct").cast("double") / col("__q.n_chars").cast("double"))
      .withColumn("stopword_ratio",
        when(col("n_tokens") > 0,
          col("n_stopwords").cast("double") / col("n_tokens").cast("double"))
          .otherwise(lit(0.0)))
      .withColumn("quality_score",
        least(col("n_tokens").cast("double") / lit(100.0), lit(1.0)) * lit(0.4)
          + (lit(1.0) - col("punct_ratio")) * lit(0.3)
          + col("stopword_ratio") * lit(0.3))
      .drop("__q")

  /** Language-ID heuristic: marker-token hit counts per language, argmax
    * with a fixed priority cascade (deterministic ties). The markers are
    * data, not a model — swap in real per-language lists at deploy time.
    */
  val langMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "is", "of", "and"),
    "de" -> Seq("der", "die", "das", "und", "ist"),
    "es" -> Seq("el", "la", "los", "de", "y"),
    "fr" -> Seq("le", "les", "des", "et", "est"))

  def withLangId(docs: DataFrame, textCol: String = "text"): DataFrame = {
    val langs = langMarkers.map(_._1)
    val withScores = docs.withColumn("__ls",
        graft.functions.TextStats.text_stats(col(textCol),
          langMarkers.map(_._2)))
      .withColumns(langs.zipWithIndex.map { case (lang, i) =>
        s"score_$lang" -> element_at(col("__ls.hits"), i + 1)
      }.toMap)
      .drop("__ls")
    // priority cascade: first language whose score ties-or-beats the rest
    val predicted = langs.foldRight(lit("und")) { (lang, elseCol) =>
      val beatsAll = langs.filter(_ != lang)
        .map(o => col(s"score_$lang") >= col(s"score_$o"))
        .reduce(_ && _)
      when(col(s"score_$lang") > 0 && beatsAll, lit(lang)).otherwise(elseCol)
    }
    withScores.withColumn("predicted_lang", predicted)
  }

  /** Document fingerprint: minimum rolling hash over word 3-shingles —
    * shingle_hash = ((h(w1)*31 + h(w2))*31 + h(w3)) mod p over the portable
    * token hash; a 1-word change flips the fingerprint only if it touches
    * the minimal shingle. Production path is one fused codegen'd expression: one fused codegen'd expression (see
    * graft.functions.DocFingerprint for why).
    */
  def withFingerprint(docs: DataFrame, textCol: String = "text"): DataFrame =
    docs.withColumn("fingerprint",
      graft.functions.DocFingerprint.doc_fingerprint(col(textCol)))

  /** Reference formulation of the same fingerprint from composable pieces —
    * kept for cross-checking the fused expression (the spec asserts both
    * agree on every fixture document).
    */
  def withFingerprintComposable(docs: DataFrame, textCol: String = "text"): DataFrame = {
    // Single-pass fold carrying (prev2, prev1, min-shingle, small-doc fold).
    // Deliberately NOT expressed as indexed accesses over a hash array —
    // CollapseProject inlines the array-producing expression into every
    // element access inside a lambda, turning that formulation O(N²) per
    // document (benched 40s+ at sf0.1; this form is ~1s).
    val p = lit(2147483647L)
    val sentinel = lit(Long.MaxValue)
    val fp = aggregate(
      transform(tokens(textCol), t => charFoldHash(t)),
      struct(lit(-1L).as("p1"), lit(-1L).as("p2"),
             sentinel.as("m"), lit(0L).as("f")),
      (acc, h) => struct(
        acc.getField("p2").as("p1"),
        h.as("p2"),
        when(acc.getField("p1") >= 0,
          least(acc.getField("m"),
            pmod((acc.getField("p1") * 31 + acc.getField("p2")) * 31 + h, p)))
          .otherwise(acc.getField("m")).as("m"),
        pmod(acc.getField("f") * 31 + h, p).as("f")),
      acc => when(acc.getField("m") =!= sentinel, acc.getField("m"))
        .otherwise(acc.getField("f")))
    docs.withColumn("fingerprint", fp)
  }
}
