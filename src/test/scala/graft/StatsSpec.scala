package graft

import org.apache.spark.sql.functions._

import graft.queries.GroupingQueries

/** The exact-moment statistical aggregates (q_corr) against Spark's own
  * one-pass corr/covar_samp/stddev_samp: the decimal-moment formulas must
  * agree with the streaming implementations to floating-point tolerance
  * (they are algebraically identical; only accumulation order differs).
  */
class StatsSpec extends SparkSpec {

  test("HLL partials: estimates within bound, union of partials == direct sketch") {
    import org.apache.spark.sql.functions._
    val ev = Tables.t(spark, sf001, "events")
    val rows = graft.queries.GroupingQueries.qHllPartials(spark, sf001)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = ev.groupBy("event_type")
      .agg(count_distinct(col("user_id")).as("n")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val exactAll = ev.select(count_distinct(col("user_id"))).head().getLong(0)
    // lgConfigK=12 => relative error ~1.04/sqrt(2^12) ≈ 1.6%; allow 5%
    (exact + ("ALL" -> exactAll)).foreach { case (k, n) =>
      val est = rows(k)
      assert(math.abs(est - n) <= math.max(1.0, 0.05 * n),
        s"$k: estimate $est vs exact $n")
    }
    // re-aggregation exactness: merging the per-type partials must give
    // the SAME estimate as sketching all users directly (union of
    // sketches == sketch of union — the property that makes stored
    // partials trustworthy at rollup time)
    val direct = ev.agg(hll_sketch_estimate(
      hll_sketch_agg(col("user_id"), lit(12))).as("n")).head().getLong(0)
    assert(rows("ALL") == direct,
      s"merged partials ${rows("ALL")} != direct sketch $direct")
  }

  test("stored HLL partials survive the LogStore parquet+manifest round-trip") {
    import org.apache.spark.sql.functions._
    val ev = Tables.t(spark, sf001, "events")
    // the full stored tier: write partials -> commitManifest -> readPinned
    // -> union. Its estimates must EQUAL the never-persisted path — sketch
    // bytes must survive parquet encode/decode and the manifest-pinned
    // re-read bit-exactly (union of sketches == sketch of union).
    val stored = GroupingQueries.qHllStored(spark, sf001)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val direct = ev.groupBy("event_type")
      .agg(hll_sketch_estimate(hll_sketch_agg(col("user_id"), lit(12)))
        .as("n")).collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val directAll = ev.agg(hll_sketch_estimate(
      hll_sketch_agg(col("user_id"), lit(12)))).head().getLong(0)
    (direct + ("ALL" -> directAll)).foreach { case (k, n) =>
      assert(stored(k) == n, s"$k: stored-tier estimate ${stored(k)} != " +
        s"direct sketch $n — the parquet round-trip corrupted partials")
    }
    // and the in-memory partials path agrees with the stored path row-wise
    val mem = GroupingQueries.qHllPartials(spark, sf001)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(stored.forall { case (k, v) => mem(k) == v })
  }

  test("KLL partials: quantiles within rank-error bound; ALL row merges partials") {
    import org.apache.spark.sql.functions._
    val li = Tables.t(spark, sf001, "lineitem")
    val kll = GroupingQueries.qKllPartials(spark, sf001).collect()
      .map(r => r.getString(0) -> ((r.getDouble(1), r.getDouble(2)))).toMap
    val exact = li.groupBy("l_returnflag")
      .agg(percentile(col("l_quantity"), lit(0.5)).as("m"),
        percentile(col("l_quantity"), lit(0.9)).as("p"))
      .collect().map(r => r.getString(0) -> ((r.getDouble(1), r.getDouble(2))))
      .toMap
    val exactAll = li.agg(percentile(col("l_quantity"), lit(0.5)),
      percentile(col("l_quantity"), lit(0.9))).head()
    // default k=200 => ~1.65% rank error; quantities are uniform over
    // 1..50, so 2% of rank ≈ 1 value unit — allow 3 for merge slack
    (exact + ("ALL" -> ((exactAll.getDouble(0), exactAll.getDouble(1))))).foreach {
      case (flag, (m, p)) =>
        val (km, kp) = kll(flag)
        assert(math.abs(km - m) <= 3.0, s"$flag median: KLL $km vs exact $m")
        assert(math.abs(kp - p) <= 3.0, s"$flag p90: KLL $kp vs exact $p")
    }
    // the ALL row must come from MERGED partials, not a rescan: its row
    // count is the sum of the per-flag partials' counts
    val nAll = GroupingQueries.qKllPartials(spark, sf001).collect()
      .map(r => r.getString(0) -> r.getLong(3)).toMap
    assert(nAll("ALL") == nAll.filterNot(_._1 == "ALL").values.sum)
  }

  test("manual moment formulas match built-in corr/covar/stddev") {
    val manual = GroupingQueries.qCorr(spark, sf001)
    val builtin = Tables.t(spark, sf001, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(corr(col("l_quantity"), col("l_extendedprice")).as("c"),
        covar_samp(col("l_quantity"), col("l_extendedprice")).as("cv"),
        stddev_samp(col("l_quantity")).as("sq"),
        stddev_samp(col("l_extendedprice")).as("sp"))
    val m = manual.collect().map(r => r.getString(0) -> r).toMap
    builtin.collect().foreach { r =>
      val mm = m(r.getString(0))
      def near(a: Double, b: Double, tol: Double) =
        math.abs(a - b) <= tol * math.max(1.0, math.abs(b))
      assert(near(mm.getAs[Double]("corr_qty_price"), r.getAs[Double]("c"), 1e-9))
      assert(near(mm.getAs[Double]("covar_qty_price"), r.getAs[Double]("cv"), 1e-9))
      assert(near(mm.getAs[Double]("stddev_qty"), r.getAs[Double]("sq"), 1e-9))
      assert(near(mm.getAs[Double]("stddev_price"), r.getAs[Double]("sp"), 1e-9))
    }
  }

  test("Misra-Gries: exact when k >= distinct, bounded error + guaranteed " +
    "heavy hitters when k < distinct") {
    val spark2 = spark
    import spark2.implicits._
    import graft.functions.HeavyHitters.heavy_hitters
    // Zipf-ish synthetic stream: item i appears ceil(3000 / i) times,
    // i = 1..200 -> n ~ 3000 * H(200) ~ 17.6k items, 200 distinct
    val freqs = (1 to 200).map(i => s"item_$i" -> (3000 / i + 1).toLong)
    val n = freqs.map(_._2).sum
    val rows = freqs.flatMap { case (w, c) => Seq.fill(c.toInt)(w) }
    val df = spark.createDataset(rows).toDF("term").repartition(8)

    // exact regime: k >= 200 distinct -> decrement-free -> exact counts
    val exact = df.agg(heavy_hitters(col("term"), 256).as("hh"))
      .select(explode(col("hh"))).as[(String, Long)].collect().toMap
    assert(exact == freqs.toMap, "k >= distinct must reproduce exact counts")

    // approximate regime: k = 24 -> error <= n/(k+1)
    val k = 24
    val est = df.agg(heavy_hitters(col("term"), k).as("hh"))
      .select(explode(col("hh"))).as[(String, Long)].collect().toMap
    assert(est.size <= k)
    val bound = n / (k + 1)
    val truth = freqs.toMap
    est.foreach { case (w, c) =>
      assert(c <= truth(w), s"$w overestimated: $c > ${truth(w)}")
      assert(truth(w) - c <= bound, s"$w error ${truth(w) - c} > $bound")
    }
    // every item with true frequency > n/(k+1) must be present
    truth.filter(_._2 > bound).keys.foreach { w =>
      assert(est.contains(w), s"guaranteed heavy hitter $w missing")
    }
  }

  test("KMV distinct sketch: exact below k, bounded error above, merge == whole") {
    val spark2 = spark
    import spark2.implicits._
    // 5000 distinct values across 3 groups; group c has < k distinct
    val rows = (1 to 5000).map(i => ("a", s"v$i")) ++
      (1 to 2500).map(i => ("b", s"w$i")) ++
      (1 to 40).map(i => ("c", s"x$i")) ++
      (1 to 2500).map(i => ("b", s"w$i")) // duplicates must collapse
    val df = rows.toDF("flag", "v").repartition(8)
    val k = 64
    def sketch(in: org.apache.spark.sql.DataFrame) = {
      val hashed = in.select(col("flag"), md5(col("v")).as("h")).distinct()
      graft.plans.TopKPerGroup(hashed, Seq("flag"), Seq("h" -> true), k)
        .groupBy(col("flag"))
        .agg(count(lit(1)).as("n_min"), max(col("h")).as("kth"))
        .select(col("flag"), col("n_min"),
          when(col("n_min") < k, col("n_min").cast("double"))
            .otherwise(lit((k - 1).toDouble) /
              (conv(substring(col("kth"), 1, 13), 16, 10).cast("double") /
                lit(4503599627370496.0)))
            .as("est"))
    }
    val est = sketch(df).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(est("c") == ((40L, 40.0)), "below k the sketch is EXACT")
    // KMV relative error ~ 1/sqrt(k-2); assert 4 sigma
    val tol = 4.0 / math.sqrt(k - 2.0)
    assert(math.abs(est("a")._2 / 5000.0 - 1) < tol, s"a: ${est("a")}")
    assert(math.abs(est("b")._2 / 2500.0 - 1) < tol, s"b: ${est("b")}")
    // MERGEABILITY: per-half k-min sets union + re-take-k == whole-corpus
    // sketch, row for row (k-min of a union of k-min supersets)
    val h1 = sketch(df.filter(md5(col("v")) < "8"))
    val h2 = sketch(df.filter(md5(col("v")) >= "8"))
    // merge at the digest level: recompute from the halves' kept digests
    val halves = Seq(df.filter(md5(col("v")) < "8"),
      df.filter(md5(col("v")) >= "8"))
    val keptDigests = halves.map { half =>
      val hashed = half.select(col("flag"), md5(col("v")).as("h")).distinct()
      graft.plans.TopKPerGroup(hashed, Seq("flag"), Seq("h" -> true), k)
    }.reduce(_ unionByName _)
    val merged = keptDigests
      .groupBy(col("flag"), col("h")).agg(count(lit(1)).as("cnt")) // dedupe
      .select(col("flag"), col("h"))
    val mergedSketch = graft.plans.TopKPerGroup(merged, Seq("flag"),
        Seq("h" -> true), k)
      .groupBy(col("flag"))
      .agg(count(lit(1)).as("n_min"), max(col("h")).as("kth"))
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getString(2))))
      .toMap
    val whole = {
      val hashed = df.select(col("flag"), md5(col("v")).as("h")).distinct()
      graft.plans.TopKPerGroup(hashed, Seq("flag"), Seq("h" -> true), k)
        .groupBy(col("flag"))
        .agg(count(lit(1)).as("n_min"), max(col("h")).as("kth"))
        .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getString(2))))
        .toMap
    }
    assert(mergedSketch == whole,
      "union-of-halves k-min state must equal the whole-corpus sketch")
    assert(h1.count() + h2.count() >= 3)
  }

  test("bottom-k-sample percentile: rank error within the sampling envelope") {
    val spark2 = spark
    import spark2.implicits._
    // skewed values so a bad sampler would miss the tail
    val rnd = new scala.util.Random(5)
    val rows = (1 to 20000).map(i => ("g", math.pow(rnd.nextDouble(), 3) * 100))
    val df = rows.toDF("flag", "q").withColumn("h",
      md5(concat_ws("|", monotonically_increasing_id()))).repartition(8)
    val k = 256
    val samp = graft.plans.TopKPerGroup(df, Seq("flag"), Seq("h" -> true), k)
      .groupBy(col("flag"))
      .agg(percentile(col("q"), lit(0.5)).as("p50"),
        percentile(col("q"), lit(0.9)).as("p90"))
      .head()
    val sorted = rows.map(_._2).sorted
    def rankOf(v: Double) = sorted.count(_ <= v).toDouble / sorted.size
    // binomial rank error ~ sqrt(p(1-p)/k); assert 5 sigma
    assert(math.abs(rankOf(samp.getDouble(1)) - 0.5) <
      5 * math.sqrt(0.25 / k), s"p50 rank ${rankOf(samp.getDouble(1))}")
    assert(math.abs(rankOf(samp.getDouble(2)) - 0.9) <
      5 * math.sqrt(0.09 / k), s"p90 rank ${rankOf(samp.getDouble(2))}")
  }
}
