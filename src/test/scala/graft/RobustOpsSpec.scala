package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The round-3 breadth batch: set algebra, robust statistics, imputation,
  * streak detection — each pinned against an independent formulation
  * (Spark's own set operators, local brute force) rather than just the
  * DuckDB oracle.
  */
class RobustOpsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  private val sfDir = "/root/testdata/sf0.001"

  test("time-purged split: ordered non-overlapping zones covering all events") {
    val rows = SparkEntry.queries("sample_time_purged_split")(spark, sfDir)
      .collect().map(r => r.getAs[String]("split") ->
        ((r.getAs[Long]("n_events"), r.getAs[Long]("min_day"),
          r.getAs[Long]("max_day")))).toMap
    val (train, test) = (rows("1_train"), rows("3_test"))
    // strict temporal order train < purged < test with a <=2-day purge zone
    assert(train._3 < test._2)
    rows.get("2_purged").foreach { p =>
      assert(train._3 < p._2 && p._3 < test._2 && p._3 - p._2 <= 1)
    }
    // the three zones partition the table
    val total = Tables.events(spark, sfDir).count()
    assert(rows.values.map(_._1).sum == total)
    // ~70% lands in train (exact ceil-rank boundary, so >= 70% cumulative
    // only at the boundary day; train is everything strictly before it)
    assert(train._1 < total * 8 / 10 && train._1 > total / 2)
  }

  test("audience overlap: diagonal is the audience size, jaccard bounded") {
    val m = SparkEntry.queries("olap_audience_overlap")(spark, sfDir)
      .collect()
      .map(r => (r.getAs[String]("type_a"), r.getAs[String]("type_b")) ->
        ((r.getAs[Long]("n_shared"), r.getAs[Double]("jaccard")))).toMap
    val sizes = Tables.events(spark, sfDir)
      .select("user_id", "event_type").distinct()
      .groupBy("event_type").count().collect()
      .map(r => r.getAs[String]("event_type") -> r.getAs[Long]("count"))
      .toMap
    // diagonal: overlap with self = audience size, jaccard exactly 1
    sizes.foreach { case (t, n) =>
      assert(m((t, t)) == ((n, 1.0)))
    }
    // off-diagonal: overlap bounded by the smaller side, jaccard in (0,1]
    m.foreach { case ((a, b), (n, j)) =>
      assert(n <= math.min(sizes(a), sizes(b)) && j > 0.0 && j <= 1.0)
    }
  }

  test("power iteration: renormalized lattice, VaR/ES tail identities") {
    // renormalization pins max|v| to exactly the 4096 lattice bound
    val v = SparkEntry.queries("emb_power_iteration")(spark, sfDir)
      .collect().map(_.getAs[Long]("v3"))
    assert(v.length == 64 && v.map(math.abs).max == 4096L)
    // VaR/ES: ES is the mean of the tail, so es <= var (tail mean can
    // only be at or below its upper bound), and the tail holds >= 5%
    val rows = SparkEntry.queries("ts_var_es")(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (n, tn) = (r.getAs[Long]("n_days"), r.getAs[Long]("tail_n"))
      assert(r.getAs[Double]("es_return") <= r.getAs[Double]("var_return"))
      assert(tn * 20 >= n && tn <= n)
    }
  }

  test("bootstrap CI brackets the point estimate; dynamic overwrite surgical") {
    val r = SparkEntry.queries("agg_bootstrap_ci")(spark, sfDir).collect()(0)
    assert(r.getAs[Long]("n_replicates") == 32L)
    // E[w] = 1, so the CI must bracket the point estimate on real data
    val (lo, hi) = (r.getAs[Double]("ci_lo"), r.getAs[Double]("ci_hi"))
    val pt = r.getAs[Double]("point_mean")
    assert(lo <= hi && lo <= pt && pt <= hi)
    // dynamic overwrite: exactly the min day shrinks, all others intact
    val got = SparkEntry.queries("inc_dynamic_partition_overwrite")(
      spark, sfDir).collect()
      .map(x => x.getAs[Long]("day") -> x.getAs[Long]("n_events")).toMap
    val full = Tables.events(spark, sfDir)
      .groupBy(expr("unix_micros(ts) DIV 86400000000").as("day"))
      .agg(count(lit(1)).as("n")).collect()
      .map(x => x.getAs[Long]("day") -> x.getAs[Long]("n")).toMap
    val d0 = full.keys.min
    assert(got.keySet == full.keySet)
    assert(got.filter(_._1 != d0) == full.filter(_._1 != d0))
    assert(got(d0) < full(d0))
  }

  test("hll intersection and control chart hold their estimator identities") {
    val r = SparkEntry.queries("sketch_hll_intersection")(spark, sfDir)
      .collect()(0)
    val (ea, eb, eu) = (r.getAs[Double]("est_a"), r.getAs[Double]("est_b"),
      r.getAs[Double]("est_union"))
    // union estimate is monotone: at least each side, at most the sum
    assert(eu >= math.max(ea, eb) * 0.9 && eu <= ea + eb)
    // inclusion-exclusion is an exact arithmetic identity of the three
    // estimates (the estimator error itself is data — the raw 512-reg
    // HLL is deliberately uncorrected for bitwise portability, so at
    // sf0.001's n≈150 per set its absolute error dwarfs the overlap;
    // the oracle pins the numbers, the spec pins the identities)
    assert(r.getAs[Double]("est_inter") == ea + eb - eu)
    assert(r.getAs[Long]("n_inter_exact") > 0)
    // control chart: ooc flags match a local double-precision band check
    // in every clear case (exact integer test can only disagree within
    // rounding distance of the boundary, and then the integers win)
    val cc = SparkEntry.queries("agg_control_chart")(spark, sfDir)
      .collect()
    val ev = Tables.events(spark, sfDir).select(
      expr("unix_micros(ts) DIV 86400000000").as("day"),
      graft.olap.Exact.cents(col("value")).as("x")).collect()
      .map(x => (x.getLong(0), x.getLong(1)))
    val n = ev.length.toDouble
    val mean = ev.map(_._2).sum / n
    val variance = ev.map(v => (v._2 - mean) * (v._2 - mean)).sum / n
    cc.foreach { row =>
      val day = row.getAs[Long]("day")
      val ds = ev.filter(_._1 == day).map(_._2)
      val z2 = math.pow(ds.sum.toDouble / ds.length - mean, 2) / variance
      if (math.abs(z2 - 9.0) > 0.5) // clear of the boundary
        assert(row.getAs[Boolean]("ooc") == (z2 > 9.0))
    }
  }

  test("time-to-convert quartiles ordered; PoP growth null on first week") {
    val r = SparkEntry.queries("agg_time_to_convert")(spark, sfDir)
      .collect()(0)
    val (q1, q2, q3) = (r.getAs[Long]("q1_m"), r.getAs[Long]("median_m"),
      r.getAs[Long]("q3_m"))
    assert(q1 >= 0 && q1 <= q2 && q2 <= q3)
    val rate = r.getAs[Double]("conversion_rate")
    assert(rate > 0.0 && rate <= 1.0 &&
      r.getAs[Long]("n_converted") <= r.getAs[Long]("n_signup_users"))
    val pop = SparkEntry.queries("olap_period_over_period")(spark, sfDir)
      .collect()
    // each series' first week has no previous period
    pop.groupBy(_.getAs[String]("event_type")).foreach { case (_, rs) =>
      val first = rs.minBy(_.getAs[java.sql.Date]("week").toString)
      assert(first.isNullAt(first.fieldIndex("growth")))
    }
    // growth is exactly (cur - prev) / prev wherever present
    pop.filter(r => !r.isNullAt(r.fieldIndex("growth"))).foreach { r =>
      val (c, p) = (r.getAs[Long]("cents"), r.getAs[Long]("prev_cents"))
      assert(r.getAs[Double]("growth") == (c - p).toDouble / p.toDouble)
    }
  }

  test("set-ops flags agree with Spark's intersect/except operators") {
    val o = Tables.orders(spark, sfDir)
      .select(col("o_custkey"), year(col("o_orderdate")).as("y"))
    val a = o.filter(col("y") === 1995).select("o_custkey").distinct()
    val b = o.filter(col("y") === 1996).select("o_custkey").distinct()
    val row = SparkEntry.queries("set_ops_customers")(spark, sfDir)
      .collect().head
    assert(row.getAs[Long]("n_both") == a.intersect(b).count())
    assert(row.getAs[Long]("n_only_1995") == a.except(b).count())
    assert(row.getAs[Long]("n_only_1996") == b.except(a).count())
    assert(row.getAs[Long]("n_union") == a.union(b).distinct().count())
  }

  test("MAD query matches local brute force") {
    val rows = SparkEntry.queries("agg_mad_outliers")(spark, sfDir).collect()
    val cents = Tables.events(spark, sfDir)
      .select(col("event_type"),
        graft.olap.Exact.cents(col("value")).as("c"))
      .collect().groupBy(_.getString(0)).view
      .mapValues(_.map(_.getLong(1)).sorted).toMap
    def lowerMedian(xs: Array[Long]): Long = xs(((xs.length + 1) / 2) - 1)
    rows.foreach { r =>
      val xs = cents(r.getAs[String]("event_type"))
      val med = lowerMedian(xs)
      val mad = lowerMedian(xs.map(x => math.abs(x - med)).sorted)
      assert(r.getAs[Double]("median_value") == med / 100.0)
      assert(r.getAs[Double]("mad_value") == mad / 100.0)
      assert(r.getAs[Long]("n_outliers") ==
        xs.count(x => math.abs(x - med) > 3 * mad))
    }
  }

  test("LOCF fills every gap with the latest prior observation") {
    val out = SparkEntry.queries("ts_locf_impute")(spark, sfDir)
      .collect()
    val bySeries = out.groupBy(_.getAs[String]("event_type"))
    bySeries.values.foreach { rows =>
      val sorted = rows.sortBy(_.getAs[java.sql.Date]("date").toString)
      var lastSeen: Option[Double] = None
      sorted.foreach { r =>
        val observed =
          if (r.isNullAt(r.fieldIndex("close"))) None
          else Some(r.getAs[Double]("close"))
        observed.foreach(v => lastSeen = Some(v))
        val filled =
          if (r.isNullAt(r.fieldIndex("close_filled"))) None
          else Some(r.getAs[Double]("close_filled"))
        assert(filled == lastSeen, s"at ${r.getAs[java.sql.Date]("date")}")
        assert(r.getAs[Boolean]("is_imputed") == observed.isEmpty)
      }
      // the thinning must actually create gaps, or the test is vacuous
      assert(sorted.exists(_.getAs[Boolean]("is_imputed")))
    }
  }

  test("dimension correlations match local quantized brute force") {
    val out = SparkEntry.queries("emb_dim_correlation")(spark, sfDir)
      .collect()
    val vecs = Tables.embeddings(spark, sfDir)
      .select("embedding").collect()
      .map(_.getSeq[Float](0).map(x => math.floor(x.toDouble * 65536.0)
        .toLong).toArray)
    val n = vecs.length.toDouble
    def corr(i: Int, j: Int): Double = {
      val (qi, qj) = (vecs.map(_(i)), vecs.map(_(j)))
      val (si, sj) = (qi.sum, qj.sum)
      val (ssi, ssj) = (qi.map(x => x * x).sum, qj.map(x => x * x).sum)
      val sp = qi.zip(qj).map { case (a, b) => a * b }.sum
      (n * sp.toDouble - si.toDouble * sj.toDouble) /
        (math.sqrt(n * ssi.toDouble - si.toDouble * si.toDouble) *
         math.sqrt(n * ssj.toDouble - sj.toDouble * sj.toDouble))
    }
    assert(out.length == 10)
    out.foreach { r =>
      val (i, j) = (r.getAs[Long]("dim_i").toInt, r.getAs[Long]("dim_j").toInt)
      assert(r.getAs[Double]("corr") == corr(i - 1, j - 1), s"($i,$j)")
      assert(math.abs(r.getAs[Double]("corr")) <= 1.0)
    }
  }

  test("streak lengths match a local scan") {
    val bars = graft.ts.Ohlc.dailyBars(Tables.events(spark, sfDir))
      .select("event_type", "date", "close").collect()
      .groupBy(_.getAs[String]("event_type"))
    val out = SparkEntry.queries("ts_streaks")(spark, sfDir).collect()
      .map(r => r.getAs[String]("event_type") -> r).toMap
    bars.foreach { case (et, rows) =>
      val closes = rows.sortBy(_.getAs[java.sql.Date]("date").toString)
        .map(_.getAs[Double]("close"))
      val dirs = closes.sliding(2).collect {
        case Array(a, b) => b > a
      }.toList
      def streaks(d: List[Boolean], up: Boolean): List[Int] = {
        val runs = scala.collection.mutable.ListBuffer[Int]()
        var cur = 0
        d.foreach { x =>
          if (x == up) cur += 1
          else { if (cur > 0) runs += cur; cur = 0 }
        }
        if (cur > 0) runs += cur
        runs.toList
      }
      val ups = streaks(dirs, up = true)
      val downs = streaks(dirs, up = false)
      val r = out(et)
      assert(r.getAs[Long]("max_up_streak") == ups.max.toLong)
      assert(r.getAs[Long]("max_down_streak") == downs.max.toLong)
      assert(r.getAs[Long]("n_up_streaks") == ups.size.toLong)
      assert(r.getAs[Long]("n_down_streaks") == downs.size.toLong)
    }
  }

  test("two-sample z: bitwise local replay over all type pairs") {
    val rows = SparkEntry.queries("agg_two_sample_z")(spark, sfDir).collect()
    val cents = Tables.events(spark, sfDir)
      .select(col("event_type"), graft.olap.Exact.cents(col("value")).as("c"))
      .collect().map(r => r.getString(0) -> r.getLong(1))
    val types = cents.map(_._1).distinct.sorted
    assert(rows.length == types.combinations(2).size)
    def mom(et: String): (Long, Long, Long) = {
      val xs = cents.filter(_._1 == et).map(_._2)
      (xs.length.toLong, xs.sum, xs.map(x => x * x).sum)
    }
    rows.foreach { r =>
      val (na, sca, ssa) = mom(r.getAs[String]("et_a"))
      val (nb, scb, ssb) = mom(r.getAs[String]("et_b"))
      assert(r.getAs[Long]("na") == na && r.getAs[Long]("nb") == nb)
      val ma = sca.toDouble / na.toDouble
      val mb = scb.toDouble / nb.toDouble
      // replay the query's exact operand order → bitwise equality
      val va = (BigInt(na) * ssa - BigInt(sca) * sca).toDouble /
        (na * (na - 1)).toDouble
      val vb = (BigInt(nb) * ssb - BigInt(scb) * scb).toDouble /
        (nb * (nb - 1)).toDouble
      val z = (ma - mb) / math.sqrt(va / na.toDouble + vb / nb.toDouble)
      assert(r.getAs[Double]("mean_a") == ma / 100.0)
      assert(r.getAs[Double]("mean_b") == mb / 100.0)
      assert(r.getAs[Double]("z") == z)
      assert(math.signum(r.getAs[Double]("z"))
        == math.signum(ma - mb) || ma == mb)
    }
  }

  test("chi2 contingency: marginal identities and non-negative cells") {
    val rows = SparkEntry.queries("agg_chi2_contingency")(spark, sfDir)
      .collect()
    val n = rows.map(_.getAs[Long]("o")).sum
    rows.groupBy(_.getAs[String]("event_type")).values.foreach { rs =>
      // the row marginal on every cell equals the sum of its row's cells
      assert(rs.forall(_.getAs[Long]("r") == rs.map(_.getAs[Long]("o")).sum))
    }
    rows.groupBy(_.getAs[Long]("dow")).values.foreach { rs =>
      assert(rs.forall(_.getAs[Long]("c") == rs.map(_.getAs[Long]("o")).sum))
    }
    rows.foreach { r =>
      val dev = r.getAs[Long]("o") * n - r.getAs[Long]("r") * r.getAs[Long]("c")
      // the exact rational is the declared (o·N − r·c)²/(N·r·c)
      assert(BigInt(r.getAs[Long]("chi2_num")) == BigInt(dev) * BigInt(dev))
      assert(r.getAs[Long]("chi2_den") ==
        n * r.getAs[Long]("r") * r.getAs[Long]("c"))
      assert(r.getAs[Double]("chi2_cell") >= 0.0)
    }
  }

  test("pk audit: per-table conservation; catches lineitem's real dups") {
    val rows = SparkEntry.queries("dq_duplicate_pk_audit")(spark, sfDir)
      .collect()
    assert(rows.length == 10)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_rows") - r.getAs[Long]("n_keys")
        == r.getAs[Long]("n_excess_rows"), r.getAs[String]("table_name"))
      // the synthetic generator does NOT enforce lineitem's composite PK —
      // the audit catching that is its value; the other nine are clean
      if (r.getAs[String]("table_name") == "lineitem")
        assert(r.getAs[Long]("n_dup_keys") > 0L)
      else
        assert(r.getAs[Long]("n_dup_keys") == 0L
          && r.getAs[Long]("n_excess_rows") == 0L,
          s"${r.getAs[String]("table_name")}: expected unique keys")
    }
  }

  test("drawdown duration agrees with calmar's deepest drawdown") {
    val dur = SparkEntry.queries("ts_drawdown_duration")(spark, sfDir)
      .collect().map(r => r.getAs[String]("event_type") -> r).toMap
    dur.values.foreach { r =>
      assert(r.getAs[Long]("longest_spell_days")
        <= r.getAs[Long]("n_underwater_days"))
      assert(r.getAs[Long]("deepest_dd_bp") > 0L)
    }
    // cross-query consistency: the deepest drawdown is calmar's max_dd_bp
    SparkEntry.queries("ts_calmar_ratio")(spark, sfDir).collect().foreach { c =>
      val et = c.getAs[String]("event_type")
      val dd = c.getAs[Long]("max_dd_bp")
      if (dd > 0) assert(dur(et).getAs[Long]("deepest_dd_bp") == dd, et)
      else assert(!dur.contains(et), s"$et: no drawdown but duration row")
    }
  }

  test("mann-whitney: brute-force pairwise replay, bitwise z") {
    val rows = SparkEntry.queries("agg_mann_whitney_u")(spark, sfDir)
      .collect()
    val cents = Tables.events(spark, sfDir)
      .select(col("event_type"), graft.olap.Exact.cents(col("value")).as("c"))
      .collect().map(r => r.getString(0) -> r.getLong(1))
    val types = cents.map(_._1).distinct.sorted
    assert(rows.length == types.combinations(2).size)
    rows.foreach { r =>
      val xs = cents.filter(_._1 == r.getAs[String]("et_a")).map(_._2)
      val ys = cents.filter(_._1 == r.getAs[String]("et_b")).map(_._2)
      assert(r.getAs[Long]("na") == xs.length.toLong)
      assert(r.getAs[Long]("nb") == ys.length.toLong)
      // 2U_a by direct pair enumeration (sf0.001 is small enough)
      val u2 = xs.map(x => 2L * ys.count(_ < x) + ys.count(_ == x)).map(BigInt(_)).sum
      assert(BigInt(r.getAs[Long]("u2")) == u2)
      // tie term over the merged sample, then the query's operand order
      val tie3 = (xs ++ ys).groupBy(identity).values
        .map(g => BigInt(g.size).pow(3) - g.size).sum
      val na = xs.length.toLong; val nb = ys.length.toLong
      val n = na + nb
      val z = (u2 - BigInt(na) * BigInt(nb)).toDouble /
        (2.0 * math.sqrt((BigInt(na) * BigInt(nb)).toDouble / 12.0 *
          ((n + 1).toDouble -
            tie3.toDouble / (BigInt(n) * BigInt(n - 1)).toDouble)))
      assert(r.getAs[Double]("z") == z,
        s"${r.getAs[String]("et_a")}/${r.getAs[String]("et_b")}")
    }
  }

  test("spearman: brute-force tie-aware rank replay, bitwise rho") {
    val rows = SparkEntry.queries("agg_spearman_corr")(spark, sfDir)
      .collect()
    val parts = Tables.part(spark, sfDir)
      .select(col("p_brand"), col("p_size").cast("long"),
        graft.olap.Exact.cents(col("p_retailprice")))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(rows.length == parts.map(_._1).distinct.length)
    def ranks2(vs: Seq[Long]): Map[Long, Long] = {
      // doubled tie-average rank: 2r = 2*min_rank + tie_count - 1
      val sorted = vs.sorted
      vs.distinct.map { v =>
        val below = sorted.count(_ < v); val t = sorted.count(_ == v)
        v -> (2L * (below + 1) + t - 1)
      }.toMap
    }
    rows.foreach { r =>
      val brand = r.getAs[String]("brand")
      val bs = parts.filter(_._1 == brand)
      assert(r.getAs[Long]("n") == bs.length.toLong)
      val rx = ranks2(bs.map(_._2)); val ry = ranks2(bs.map(_._3))
      val prs = bs.map(p => (BigInt(rx(p._2)), BigInt(ry(p._3))))
      val n = BigInt(bs.length)
      val (sx, sy) = (prs.map(_._1).sum, prs.map(_._2).sum)
      // both rank sums must telescope to n(n+1) on the doubled lattice
      assert(sx == n * (n + 1) && sy == n * (n + 1))
      val sxy = prs.map(p => p._1 * p._2).sum
      val sxx = prs.map(p => p._1 * p._1).sum
      val syy = prs.map(p => p._2 * p._2).sum
      val rho = (n * sxy - sx * sy).toDouble /
        (math.sqrt((n * sxx - sx * sx).toDouble) *
          math.sqrt((n * syy - sy * sy).toDouble))
      assert(r.getAs[Double]("rho") == rho, brand)
      assert(r.getAs[Double]("rho") >= -1.0 && r.getAs[Double]("rho") <= 1.0)
    }
  }

  test("simpson diversity: brute-force token census per language") {
    val rows = SparkEntry.queries("text_simpson_diversity")(spark, sfDir)
      .collect()
    val toks = Tables.documents(spark, sfDir)
      .select(col("lang"),
        explode(graft.text.TextAnalysis.tokens("text")).as("t"))
      .collect().map(r => r.getString(0) -> r.getString(1))
    rows.foreach { r =>
      val lang = r.getAs[String]("lang")
      val freqs = toks.filter(_._1 == lang).groupBy(_._2).values.map(_.size)
      assert(r.getAs[Long]("n_types") == freqs.size.toLong)
      val nTok = freqs.sum.toLong
      assert(r.getAs[Long]("n_tokens") == nTok)
      val rep = freqs.map(f => BigInt(f) * (f - 1)).sum
      assert(BigInt(r.getAs[Long]("rep_pairs")) == rep)
      if (nTok > 1) {
        val d = rep.toDouble / (BigInt(nTok) * BigInt(nTok - 1)).toDouble
        assert(r.getAs[Double]("simpson") == d, lang)
        assert(d >= 0.0 && d <= 1.0)
      }
    }
  }

  test("funnel: monotone stages and local sequenced replay") {
    val rows = SparkEntry.queries("agg_funnel_stages")(spark, sfDir)
      .collect().sortBy(_.getAs[Long]("stage"))
    assert(rows.map(_.getAs[String]("stage_name")).toSeq
      == Seq("view", "click", "purchase"))
    val ns = rows.map(_.getAs[Long]("n_users"))
    assert(ns(0) >= ns(1) && ns(1) >= ns(2)) // a funnel narrows
    assert(rows.head.getAs[Double]("frac_of_top") == 1.0)
    // local replay of the sequenced min-time chain
    val ev = Tables.events(spark, sfDir)
      .select(col("user_id"), col("event_type"), col("ts").cast("long"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val t1 = ev.filter(_._2 == "view").groupBy(_._1)
      .map { case (u, es) => u -> es.map(_._3).min }
    val t2 = ev.filter(e => e._2 == "click" && t1.contains(e._1)
        && e._3 >= t1(e._1)).groupBy(_._1)
      .map { case (u, es) => u -> es.map(_._3).min }
    val t3 = ev.filter(e => e._2 == "purchase" && t2.contains(e._1)
        && e._3 >= t2(e._1)).groupBy(_._1)
      .map { case (u, es) => u -> es.map(_._3).min }
    assert(ns.toSeq == Seq(t1.size.toLong, t2.size.toLong, t3.size.toLong))
  }

  test("kruskal-wallis: brute-force global-rank replay, bitwise H") {
    val rows = SparkEntry.queries("agg_kruskal_wallis")(spark, sfDir)
      .collect()
    val cents = Tables.events(spark, sfDir)
      .select(col("event_type"), graft.olap.Exact.cents(col("value")).as("c"))
      .collect().map(r => r.getString(0) -> r.getLong(1))
    val all = cents.map(_._2).sorted
    // doubled tie-average global rank per value
    def r2(v: Long): Long = {
      val below = all.count(_ < v); val t = all.count(_ == v)
      2L * below + t + 1
    }
    val r2ByValue = cents.map(_._2).distinct.map(v => v -> r2(v)).toMap
    val byType = cents.groupBy(_._1)
    val terms = byType.toSeq.map { case (et, es) =>
      val rsum = es.map(e => BigInt(r2ByValue(e._2))).sum
      val row = rows.find(_.getAs[String]("event_type") == et).get
      assert(row.getAs[Long]("n") == es.length.toLong, et)
      assert(BigInt(row.getAs[Long]("r2")) == rsum, et)
      // q16 fixed-point term ⌊16·(2R)²/(4n)⌋ — exact, order-free
      et -> (rsum * rsum * 16) / (4 * es.length)
    }
    val n = BigInt(all.length)
    val s = terms.map(_._2).sum
    val h = 12.0 / (n * (n + 1)).toDouble * (s.toDouble / 16.0) -
      3.0 * (all.length + 1).toDouble
    val t3 = all.groupBy(identity).values
      .map(g => BigInt(g.size).pow(3) - g.size).sum
    val corr = 1.0 - t3.toDouble / (n * n * n - n).toDouble
    rows.foreach { r =>
      assert(r.getAs[Long]("n_total") == all.length.toLong)
      assert(r.getAs[Double]("h") == h)
      assert(r.getAs[Double]("h_tie_corrected") == h / corr)
    }
    // doubled global rank-sums must telescope to n(n+1) over all groups
    assert(rows.map(r => BigInt(r.getAs[Long]("r2"))).sum == n * (n + 1))
  }

  test("rich club: local threshold-ladder replay") {
    val rows = SparkEntry.queries("graph_rich_club")(spark, sfDir)
      .collect().map(r => r.getAs[Long]("k") -> r).toMap
    assert(rows.keySet == Set(2L, 4L, 8L, 16L))
    val pairs = Tables.lineitem(spark, sfDir)
      .select(col("l_partkey"), col("l_suppkey")).distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val edges = pairs.map(p => (2 * p._1, 2 * p._2 + 1)) ++
      pairs.map(p => (2 * p._2 + 1, 2 * p._1))
    val deg = edges.groupBy(_._1).map { case (u, es) => u -> es.size.toLong }
    for (k <- Seq(2L, 4L, 8L, 16L)) {
      val nRich = deg.values.count(_ > k).toLong
      val eRich = edges.count(e => deg(e._1) > k && deg(e._2) > k).toLong
      val r = rows(k)
      assert(r.getAs[Long]("n_rich") == nRich, s"k=$k")
      assert(r.getAs[Long]("e_rich") == eRich, s"k=$k")
      if (nRich > 1)
        assert(r.getAs[Double]("phi")
          == eRich.toDouble / (BigInt(nRich) * BigInt(nRich - 1)).toDouble)
      // the directed edge count is even (each undirected edge twice)
      assert(eRich % 2 == 0)
    }
  }

  test("burstiness: per-token moment replay on the reported top-k") {
    val rows = SparkEntry.queries("text_burstiness")(spark, sfDir)
      .collect()
    val toks = Tables.documents(spark, sfDir)
      .select(col("lang"), col("doc_id"),
        explode(graft.text.TextAnalysis.tokens("text")).as("t"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getString(2)))
    val docsPerLang = Tables.documents(spark, sfDir)
      .groupBy("lang").agg(count(lit(1)).as("n")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(rows.groupBy(_.getAs[String]("lang")).values
      .forall(_.length <= 20))
    rows.foreach { r =>
      val (lang, token) = (r.getAs[String]("lang"), r.getAs[String]("token"))
      val perDoc = toks.filter(t => t._1 == lang && t._3 == token)
        .groupBy(_._2).values.map(_.size.toLong).toSeq
      assert(r.getAs[Long]("tf") == perDoc.sum)
      assert(r.getAs[Long]("n_docs_with") == perDoc.size.toLong)
      val d = BigInt(docsPerLang(lang))
      val (sx, sxx) = (perDoc.map(BigInt(_)).sum,
        perDoc.map(x => BigInt(x) * x).sum)
      val vmr = (d * sxx - sx * sx).toDouble / ((d - 1) * sx).toDouble
      assert(r.getAs[Double]("vmr") == vmr, s"$lang/$token")
    }
  }

  test("cramers v: full-grid chi2 fold replay, bitwise") {
    val row = SparkEntry.queries("agg_cramers_v")(spark, sfDir)
      .collect().head
    val obs = Tables.events(spark, sfDir)
      .select(col("event_type"),
        (weekday(col("ts").cast("date")) + 1).cast("long").as("dow"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val cells = obs.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val ets = obs.map(_._1).distinct.sorted
    val dows = obs.map(_._2).distinct.sorted
    val rTot = ets.map(e => e -> cells.filter(_._1._1 == e).values.sum).toMap
    val cTot = dows.map(d => d -> cells.filter(_._1._2 == d).values.sum).toMap
    val n = obs.length.toLong
    assert(row.getAs[Long]("n_total") == n)
    assert(row.getAs[Long]("n_rows") == ets.length.toLong)
    assert(row.getAs[Long]("n_cols") == dows.length.toLong)
    // fold over the FULL grid in (event_type, dow) order — empty cells too
    val chi2 = (for (e <- ets; d <- dows) yield {
      val o = cells.getOrElse((e, d), 0L)
      val dev = BigInt(o * n) - BigInt(rTot(e)) * cTot(d)
      (dev * dev).toDouble / (n * rTot(e) * cTot(d)).toDouble
    }).foldLeft(0.0)(_ + _)
    assert(row.getAs[Double]("chi2") == chi2)
    val v = math.sqrt(chi2 / (n.toDouble *
      math.min(ets.length - 1, dows.length - 1).toDouble))
    assert(row.getAs[Double]("cramers_v") == v)
    assert(v >= 0.0 && v <= 1.0)
  }

  test("cohort ltv: cumulative conservation and monotonicity") {
    val rows = SparkEntry.queries("agg_cohort_ltv_curve")(spark, sfDir)
      .collect()
    // running totals are per-cohort monotone and end-to-end conservative
    rows.groupBy(_.getAs[java.sql.Date]("cohort_date").toString).values
      .foreach { rs =>
        val s = rs.sortBy(_.getAs[Long]("day_offset"))
        val cums = s.map(_.getAs[Long]("cum_rev_cents"))
        assert(cums.zip(cums.drop(1)).forall { case (a, b) => a <= b })
        assert(cums.last == s.map(_.getAs[Long]("rev_cents")).sum)
        assert(s.map(_.getAs[Long]("n_cohort_users")).distinct.length == 1)
      }
    // every purchase cent lands in exactly one (cohort, offset) cell
    val totalRev = Tables.events(spark, sfDir)
      .filter(col("event_type") === "purchase")
      .agg(sum(graft.olap.Exact.cents(col("value")))).collect()
      .head.getLong(0)
    assert(rows.map(_.getAs[Long]("rev_cents")).sum == totalRev)
  }

  test("bm25: full-corpus scoring replay picks the same top-10, bitwise") {
    val rows = SparkEntry.queries("text_bm25_topk")(spark, sfDir)
      .collect()
    val terms = Set("scan", "join", "window")
    val toks = Tables.documents(spark, sfDir)
      .select(col("doc_id"),
        explode(graft.text.TextAnalysis.tokens("text")).as("t"))
      .collect().map(r => r.getLong(0) -> r.getString(1))
    val lens = toks.groupBy(_._1).map { case (d, ts) => d -> ts.size.toLong }
    val nDocs = Tables.documents(spark, sfDir).count()
    val tTok = toks.length.toLong
    val dfq = terms.map(t =>
      t -> toks.filter(_._2 == t).map(_._1).distinct.size.toLong).toMap
    def score(doc: Long): Double = {
      val mine = toks.filter(p => p._1 == doc && terms(p._2))
      mine.groupBy(_._2).toSeq.sortBy(_._1).map { case (t, oc) =>
        val tf = oc.size.toDouble
        ((nDocs - dfq(t) + 1).toDouble / (dfq(t) + 1).toDouble) *
          (tf * 2.2 / (tf + 1.2 * (0.25 + 0.75 *
            ((lens(doc) * nDocs).toDouble / tTok.toDouble))))
      }.foldLeft(0.0)(_ + _)
    }
    val expected = toks.filter(p => terms(p._2)).map(_._1).distinct
      .map(d => (d, score(d))).sortBy(p => (-p._2, p._1)).take(10)
    assert(rows.length == expected.length)
    rows.zip(expected).foreach { case (r, (d, s)) =>
      assert(r.getAs[Long]("doc_id") == d)
      assert(r.getAs[Double]("bm25") == s, s"doc $d")
      assert(r.getAs[Long]("len") == lens(d))
    }
  }

  test("association rules: local basket replay, bitwise metrics") {
    val rows = SparkEntry.queries("mine_association_rules")(spark, sfDir)
      .collect()
    val items = Tables.lineitem(spark, sfDir)
      .select(col("l_orderkey"), col("l_partkey")).distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val nB = items.map(_._1).distinct.length.toLong
    val itemCnt = items.groupBy(_._2).map { case (p, xs) =>
      p -> xs.length.toLong }
    val byBasket = items.groupBy(_._1).values
      .map(_.map(_._2).sorted).toSeq
    val pairCnt = byBasket.flatMap(ps =>
      for (i <- ps.indices; j <- i + 1 until ps.length) yield (ps(i), ps(j)))
      .groupBy(identity).map { case (k, v) => k -> v.size.toLong }
      .filter(_._2 >= 3L)
    val expected = pairCnt.toSeq.map { case ((a, b), np) =>
      val lift = (BigInt(np) * nB).toDouble /
        (BigInt(itemCnt(a)) * itemCnt(b)).toDouble
      (a, b, np, lift)
    }.sortBy(t => (-t._4, t._1, t._2)).take(25)
    assert(rows.length == expected.length)
    rows.zip(expected).foreach { case (r, (a, b, np, lift)) =>
      assert(r.getAs[Long]("part_a") == a && r.getAs[Long]("part_b") == b)
      assert(r.getAs[Long]("n_pair") == np)
      assert(r.getAs[Long]("n_baskets") == nB)
      assert(r.getAs[Double]("lift") == lift)
      assert(r.getAs[Double]("conf_a_b")
        == np.toDouble / itemCnt(a).toDouble)
      assert(r.getAs[Double]("conf_b_a")
        == np.toDouble / itemCnt(b).toDouble)
      val lev = (BigInt(np) * nB - BigInt(itemCnt(a)) * itemCnt(b)).toDouble /
        (BigInt(nB) * nB).toDouble
      assert(r.getAs[Double]("leverage") == lev)
      assert(r.getAs[Double]("conf_a_b") > 0.0
        && r.getAs[Double]("conf_a_b") <= 1.0)
    }
  }

  test("degree gini: brute-force ranked replay, bitwise") {
    val row = SparkEntry.queries("graph_degree_gini")(spark, sfDir)
      .collect().head
    val pairs = Tables.lineitem(spark, sfDir)
      .select(col("l_partkey"), col("l_suppkey")).distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val degs = (pairs.map(p => 2 * p._1) ++ pairs.map(p => 2 * p._2 + 1))
      .groupBy(identity).values.map(_.size.toLong).toSeq.sorted
    val n = degs.size.toLong
    val s = degs.map(BigInt(_)).sum
    assert(row.getAs[Long]("n_nodes") == n)
    assert(row.getAs[Long]("sum_degree") == s.toLong)
    val tw = degs.zipWithIndex
      .map { case (d, i) => BigInt(2) * (i + 1) * d }.sum
    val gini = (tw - BigInt(n + 1) * s).toDouble / (BigInt(n) * s).toDouble
    assert(row.getAs[Double]("gini") == gini)
    assert(gini >= 0.0 && gini < 1.0)
  }

  test("ljung-box: Q replays bitwise from the acf query's own r values") {
    val acf = SparkEntry.queries("ts_acf_multilag")(spark, sfDir)
      .collect().groupBy(_.getAs[String]("event_type"))
    val nObs = Tables.events(spark, sfDir)
      .select(col("event_type"), to_date(col("ts")).as("d")).distinct()
      .groupBy("event_type").count().collect()
      .map(r => r.getString(0) -> (r.getLong(1) - 1)).toMap // minus lag-1 row
    val lb = SparkEntry.queries("ts_ljung_box")(spark, sfDir).collect()
    assert(lb.nonEmpty)
    for (r <- lb) {
      val et = r.getAs[String]("event_type")
      val n = r.getAs[Long]("n_obs")
      assert(n == nObs(et))
      val terms = acf(et).sortBy(_.getAs[Long]("lag")).map { a =>
        val rk = a.getAs[Double]("acf")
        rk * rk / (n - a.getAs[Long]("lag")).toDouble
      }
      val q = n.toDouble * (n + 2).toDouble *
        terms.foldLeft(0.0)(_ + _)
      assert(r.getAs[Double]("q_stat") == q, et)
      assert(q >= 0.0)
      assert(r.getAs[Long]("df") == 3L)
    }
  }

  test("class-balanced downsample: every label capped at the minority size") {
    val rows = SparkEntry.queries("sample_class_balanced")(spark, sfDir)
      .collect()
    assert(rows.nonEmpty)
    val minClass = rows.map(_.getAs[Long]("n_class")).min
    for (r <- rows) {
      assert(r.getAs[Long]("n_selected") == minClass)
      assert(r.getAs[Long]("n_class") >= minClass)
    }
    // the minority label keeps its entire id set (checksum = full sum)
    val fullSums = Tables.embeddings(spark, sfDir)
      .groupBy(col("label").cast("long").as("label"))
      .agg(sum("vec_id").as("s"), count(lit(1)).as("n")).collect()
      .map(r => r.getAs[Long]("label") ->
        ((r.getAs[Long]("s"), r.getAs[Long]("n")))).toMap
    for (r <- rows if r.getAs[Long]("n_class") == minClass)
      assert(r.getAs[Long]("id_checksum")
        == fullSums(r.getAs[Long]("label"))._1)
  }
}
