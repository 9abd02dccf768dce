package graft

import org.apache.spark.sql.functions._

import graft.queries.{AnalyticsQueries, GroupingQueries}

/** Independent invariants for the behavioral-analytics queries on sf0.001 —
  * each checked against a differently-shaped computation of the same fact,
  * not against the DuckDB oracle (which the driver already runs at sf0.01).
  */
class AnalyticsSpec extends SparkSpec {

  test("event transitions: mass balance and successor totality") {
    val ev = Tables.events(spark, sf001)
    val trans = AnalyticsQueries.qEventTransitions(spark, sf001)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    // every user with k events contributes exactly k-1 transitions, so the
    // grid's total mass is (rows - users) — a fact the window path never
    // computes directly
    val nRows = ev.count()
    val nUsers = ev.select("user_id").distinct().count()
    assert(trans.map(_._3).sum == nRows - nUsers)
    // the grid is over observed types only, and no cell is empty
    val types = ev.select("event_type").distinct().collect()
      .map(_.getString(0)).toSet
    assert(trans.forall { case (f, t, n) =>
      types(f) && types(t) && n > 0 })
  }

  test("outliers: integer 3-sigma test agrees with float stddev_pop") {
    val out = AnalyticsQueries.qOutliers(spark, sf001)
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    // recompute with the textbook float path: |x - mean| > 3 * sigma_pop
    // over the same cents quantization. The decimal rearrangement must
    // agree exactly — sf0.001 values are small enough that double
    // arithmetic is exact-comparable away from the boundary, and the
    // fixture plants no exact-boundary points.
    val ev = Tables.events(spark, sf001)
      .select(col("event_type"), floor(col("value") * 100).as("x"))
    val flt = ev.groupBy("event_type")
      .agg(avg("x").as("m"), stddev_pop("x").as("sd"))
    val n = ev.join(flt, "event_type")
      .filter(abs(col("x") - col("m")) > col("sd") * 3)
      .groupBy("event_type").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    out.foreach { case (t, k) => assert(n.getOrElse(t, 0L) == k,
      s"$t: integer path found $k outliers, float path ${n.getOrElse(t, 0L)}") }
  }

  test("ohlc bars: picks agree with a per-bar sorted driver recompute") {
    val bars = GroupingQueries.qOhlc(spark, sf001).collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        (r.getDouble(2), r.getDouble(3), r.getDouble(4), r.getDouble(5),
          r.getLong(6))).toMap
    // recompute every bar by sorting raw rows in memory — the window/agg
    // path under test never materializes a per-bar sorted list
    val raw = Tables.events(spark, sf001)
      .select(col("event_type"), unix_micros(col("ts")).as("us"),
        col("event_id"), col("value"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getDouble(3)))
    val regrouped = raw.groupBy { case (t, us, _, _) => (t, us / 3600000000L) }
    assert(bars.size == regrouped.size)
    regrouped.foreach { case (key, rows) =>
      val sorted = rows.sortBy { case (_, us, id, _) => (us, id) }
      val (open, high, low, close, cnt) = bars(key)
      assert(open == sorted.head._4 && close == sorted.last._4,
        s"$key open/close mismatch")
      assert(high == rows.map(_._4).max && low == rows.map(_._4).min)
      assert(cnt == rows.length)
    }
  }

  test("dau/wau: window counts agree with brute-force per-day filters") {
    val got = AnalyticsQueries.qDauWau(spark, sf001).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val ud = Tables.events(spark, sf001)
      .select(col("user_id"), to_date(col("ts")).cast("string").as("day"))
      .distinct().collect().map(r => (r.getLong(0), r.getString(1)))
    val fmt = java.time.format.DateTimeFormatter.ISO_LOCAL_DATE
    got.foreach { case (day, dau, wau, pm) =>
      val d = java.time.LocalDate.parse(day, fmt)
      assert(dau == ud.filter(_._2 == day).map(_._1).distinct.length)
      val win = ud.filter { case (_, ds) =>
        val x = java.time.LocalDate.parse(ds, fmt)
        !x.isAfter(d) && !x.isBefore(d.minusDays(6))
      }.map(_._1).distinct.length
      assert(wau == win, s"$day: wau $wau vs brute $win")
      assert(pm == dau * 1000 / wau && dau <= wau)
    }
  }

  test("custdist: buckets account for every customer and every order") {
    val d = graft.queries.RelationalQueries.qCustdist(spark, sf001)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val nCust = spark.read.parquet(s"$sf001/customer.parquet").count()
    val nOrd = spark.read.parquet(s"$sf001/orders.parquet").count()
    assert(d.map(_._2).sum == nCust)
    assert(d.map { case (k, n) => k * n }.sum == nOrd)
  }

  test("seq patterns: counts agree with driver-side regex over rebuilt " +
      "sequences") {
    val got = AnalyticsQueries.qSeqPattern(spark, sf001)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val seqs = Tables.events(spark, sf001)
      .select(col("user_id"), unix_micros(col("ts")).as("us"),
        col("event_id"), col("event_type"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getString(3)))
      .groupBy(_._1).values
      .map(_.sortBy { case (_, us, id, _) => (us, id) }
        .map(_._4).mkString(" "))
    def n(re: String) = seqs.count(_.matches(".*" + re + ".*")).toLong
    assert(got("error_then_buy") == n("error purchase"))
    assert(got("signup_to_buy") == n("signup.* purchase"))
    assert(got("view_burst") == n("view view view"))
    // counts are per-USER (bounded by the population, not event count)
    assert(got.values.forall(v => v >= 0 && v <= seqs.size))
  }

  test("equi-depth buckets: equal depth, ordered spans, full coverage") {
    val b = AnalyticsQueries.qEquidepth(spark, sf001)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3)))
    val n = spark.read.parquet(s"$sf001/lineitem.parquet").count()
    assert(b.map(_._1).toSeq == (0 until 10))
    assert(b.map(_._2).sum == n)
    // equi-DEPTH: bucket sizes differ by at most 1
    assert(b.map(_._2).max - b.map(_._2).min <= 1)
    // buckets tile the sorted domain: spans never run backwards (ties on
    // price may straddle a boundary, so adjacent max/min may be EQUAL)
    b.sortBy(_._1).sliding(2).foreach { case Array(lo, hi) =>
      assert(lo._4 <= hi._3, s"bucket ${lo._1} max ${lo._4} > " +
        s"bucket ${hi._1} min ${hi._3}")
    }
  }
}
