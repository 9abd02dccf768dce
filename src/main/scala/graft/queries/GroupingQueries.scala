package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables.{dec, t, toDouble}

/** Multi-dimensional aggregation coverage: rollup / cube / grouping sets /
  * distinct aggregates / approx sketches (SURVEY.md §2.2 "Aggregations").
  *
  * Rollup/cube NULL group markers are coalesced to the literal 'ALL' so the
  * oracle compare is insensitive to NULL-sorting differences between engines.
  */
object GroupingQueries {

  def qRollup(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "lineitem")
      .rollup(col("l_returnflag"), col("l_linestatus"))
      .agg(count(lit(1)).as("n"),
        toDouble(sum(dec(col("l_quantity")))).as("sum_qty"))
      .select(coalesce(col("l_returnflag"), lit("ALL")).as("l_returnflag"),
        coalesce(col("l_linestatus"), lit("ALL")).as("l_linestatus"),
        col("n"), col("sum_qty"))
      .orderBy("l_returnflag", "l_linestatus")

  def qCube(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "orders")
      .cube(col("o_orderstatus"), col("o_orderpriority"))
      .agg(count(lit(1)).as("n"),
        toDouble(sum(dec(col("o_totalprice")))).as("sum_price"))
      .select(coalesce(col("o_orderstatus"), lit("ALL")).as("o_orderstatus"),
        coalesce(col("o_orderpriority"), lit("ALL")).as("o_orderpriority"),
        col("n"), col("sum_price"))
      .orderBy("o_orderstatus", "o_orderpriority")

  def qGroupingSets(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "lineitem")
      .groupingSets(
        Seq(Seq(col("l_returnflag")), Seq(col("l_linestatus")), Seq.empty),
        col("l_returnflag"), col("l_linestatus"))
      .agg(count(lit(1)).as("n"))
      .select(coalesce(col("l_returnflag"), lit("ALL")).as("l_returnflag"),
        coalesce(col("l_linestatus"), lit("ALL")).as("l_linestatus"), col("n"))
      .orderBy("l_returnflag", "l_linestatus")

  /** Exact distinct aggregates (expand + two-phase under the hood). */
  def qDistinctAgg(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(count_distinct(col("l_partkey")).as("nd_parts"),
        count_distinct(col("l_suppkey")).as("nd_supps"),
        toDouble(sum_distinct(dec(col("l_quantity")))).as("sum_d_qty"))
      .orderBy("l_returnflag")

  /** HLL++ approximate distinct — value depends on Spark's sketch, so this
    * entry deliberately has no SQL oracle (rows-only check); accuracy is
    * asserted against the exact count in the test suite instead.
    */
  def qApproxDistinct(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(approx_count_distinct(col("l_partkey"), 0.02).as("approx_parts"),
        count_distinct(col("l_partkey")).as("exact_parts"),
        percentile_approx(col("l_extendedprice"), lit(0.5), lit(1000))
          .as("approx_median_price"))
      .orderBy("l_returnflag")

  /** KMV (k-minimum-values) distinct sketch (Bar-Yossef et al. 2002 —
    * the Theta-sketch family's base estimator): per group, keep the k
    * SMALLEST md5(value) digests; with u_k = the k-th minimum mapped to
    * (0,1], E[distinct] = (k-1)/u_k. The HASH-EXACT member of the
    * sketch tier: unlike the HLL/KLL rows (whose sketch internals are
    * engine-specific by design, hence rows-only), every piece here is
    * engine-replicable — md5 hex strings order identically under both
    * engines' binary collation, the k-th digest's first 13 hex chars
    * parse to a < 2^52 integer (exactly representable in a double), and
    * the estimate is ONE IEEE division of exact integers — so the full
    * estimator value hash-verifies against the DuckDB replay.
    *
    * Production shape: the k-min set is MERGEABLE (union, re-take k —
    * StatsSpec proves half-merge == whole-corpus sketch), the per-group
    * state is O(k), and the plan is a distinct (group, digest)
    * projection into the bounded-heap [[graft.plans.TopKPerGroupExec]]
    * (no per-group sort) + a k-row-per-group aggregation. Groups with
    * fewer than k distinct values report the EXACT count (the sketch is
    * lossless below k — the standard KMV contract).
    */
  def qKmvDistinct(spark: SparkSession, dir: String): DataFrame = {
    val k = 64
    val hashed = t(spark, dir, "lineitem")
      .select(col("l_returnflag").as("flag"),
        md5(col("l_partkey").cast("string")).as("h"))
      .distinct()
    val topk = graft.plans.TopKPerGroup(hashed, Seq("flag"),
      Seq("h" -> true), k)
    topk.groupBy(col("flag"))
      .agg(count(lit(1)).as("n_min"), max(col("h")).as("kth"))
      .select(col("flag"), col("n_min"),
        when(col("n_min") < k, col("n_min").cast("double"))
          .otherwise(lit((k - 1).toDouble) /
            (conv(substring(col("kth"), 1, 13), 16, 10).cast("double") /
              lit(4503599627370496.0)))
          .as("est_distinct"))
      .orderBy("flag")
  }

  /** Deterministic bottom-k-sample percentile — the quantile analog of
    * [[qKmvDistinct]], completing the HASH-EXACT approximate tier: per
    * group, the sample is the k rows with the SMALLEST md5(row identity)
    * (a uniform draw that is reproducible, engine-independent, and
    * MERGEABLE — union per-shard samples, re-take k), and the estimate
    * is the EXACT percentile over those <= k values. Unlike
    * `percentile_approx` (GK sketch — engine-specific internals,
    * rows-only), every step replays in DuckDB: same md5 order, same
    * sample, and the interpolation parity `q_percentiles` already
    * establishes. Bounded O(k) per-group state via the bounded-heap
    * [[graft.plans.TopKPerGroupExec]]; error ~ O(1/sqrt(k)) in rank.
    */
  def qSamplePercentile(spark: SparkSession, dir: String): DataFrame = {
    val k = 256
    val li = t(spark, dir, "lineitem")
      .select(col("l_returnflag").as("flag"), col("l_quantity").as("q"),
        md5(concat_ws("|", col("l_orderkey"), col("l_linenumber"))).as("h"))
    graft.plans.TopKPerGroup(li, Seq("flag"), Seq("h" -> true), k)
      .groupBy(col("flag"))
      .agg(percentile(col("q"), lit(0.5)).as("samp_median"),
        percentile(col("q"), lit(0.9)).as("samp_p90"),
        count(lit(1)).as("n_sample"))
      .orderBy("flag")
  }

  /** The approximate-percentile tier beside the exact one — rows-only (a
    * GK-sketch value is engine-specific, so no SQL oracle). The sketch's
    * rank-error contract (|rank(approx) − p·n| ≤ n/accuracy) is asserted
    * in ExtensionsSpec, which also plan+value-tests the opt-in optimizer
    * rewrite ([[graft.plans.ApproxPercentileRewrite]]) that moves EXISTING
    * exact-percentile queries onto this sketch without query edits.
    *
    * Scale: exact `percentile` buffers every group value (unbounded
    * state — untenable per-group at 100 TB); `percentile_approx` keeps an
    * O(accuracy·log n) mergeable summary with map-side combine.
    */
  def qPercentilesApprox(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(
        percentile_approx(col("l_quantity"), lit(0.5), lit(10000))
          .as("approx_median_qty"),
        percentile_approx(col("l_quantity"), lit(0.9), lit(10000))
          .as("approx_p90_qty"),
        percentile(col("l_quantity"), lit(0.5)).as("exact_median_qty"),
        percentile(col("l_quantity"), lit(0.9)).as("exact_p90_qty"),
        count(lit(1)).as("n_rows"))
      .orderBy("l_returnflag")

  /** HLL sketch partials + re-aggregation (DataSketches `hll_sketch_agg` /
    * `hll_union_agg`) — rows-only (sketch estimates are engine-specific;
    * StatsSpec bounds them against exact counts). THE pre-aggregated
    * dashboard shape at 100 TB: per-segment sketches build in ONE narrow
    * pass (constant-size mergeable buffers, map-side combine), and every
    * rollup above them — here the ALL row — merges the stored partials
    * instead of rescanning events. An exact distinct per segment + total
    * would cost one Expand re-shuffle of every distinct value per rollup
    * level; sketch partials make each extra level a KB-sized union.
    */
  def qHllPartials(spark: SparkSession, dir: String): DataFrame = {
    val sk = t(spark, dir, "events")
      .groupBy(col("event_type"))
      .agg(hll_sketch_agg(col("user_id"), lit(12)).as("sk"))
    val per = sk.select(col("event_type"),
      hll_sketch_estimate(col("sk")).as("approx_users"))
    val all = sk.agg(hll_union_agg(col("sk"), lit(true)).as("u"))
      .select(lit("ALL").as("event_type"),
        hll_sketch_estimate(col("u")).as("approx_users"))
    per.unionByName(all).orderBy("event_type")
  }

  /** STORED sketch partials, end to end: per-(event_type, day) HLL partials
    * are WRITTEN to a manifest-tracked [[graft.sources.LogStore]] (the
    * sketch bytes land in partitioned parquet, the file set publishes via
    * `commitManifest`), read back through the PINNED snapshot, and only
    * then re-aggregated (per-type union across days + the ALL rollup).
    * Rows-only like [[qHllPartials]]; StatsSpec asserts the round-tripped
    * union ≡ the direct sketch, byte-path included.
    *
    * This is the materialized-dashboard tier at 100 TB: the expensive scan
    * builds day×segment partials ONCE, persists them (KBs per segment),
    * and every later rollup — any segment subset, any date range, the ALL
    * row — is a metadata-pruned scan of stored KB-sized sketches plus a
    * union, never a rescan of the raw events. The manifest pin means a
    * dashboard refresh never sees a half-published day.
    */
  def qHllStored(spark: SparkSession, dir: String): DataFrame = {
    import graft.sources.LogStore
    // the partial build + manifest publish is STAGED once per sfDir
    // (Caches.stagedPath): the production shape this query models is
    // "dashboard rollups read STANDING stored partials" — the nightly
    // build is the cold pass, every warm pass measures the pinned-snapshot
    // read + union, and bench invocations stop leaking ~150-file stores
    val store = graft.Caches.stagedPath("hll-store", dir) { store =>
      val parts = t(spark, dir, "events")
        .groupBy(col("event_type"), date_trunc("day", col("ts")).as("day"))
        .agg(hll_sketch_agg(col("user_id"), lit(12)).as("sk"))
        .select(col("event_type").as("severity"), col("day").as("event_ts"),
          col("sk"))
      LogStore.write(parts, store, tsCol = "event_ts")
      LogStore.commitManifest(spark, store)
    }
    val merged = LogStore.readPinned(spark, store)
      .groupBy(col("severity"))
      .agg(hll_union_agg(col("sk"), lit(true)).as("u"),
        count(lit(1)).as("n_partials"))
    val per = merged.select(col("severity").as("event_type"),
      hll_sketch_estimate(col("u")).as("approx_users"), col("n_partials"))
    val all = merged.agg(hll_union_agg(col("u"), lit(true)).as("u2"),
        sum(col("n_partials")).as("np"))
      .select(lit("ALL").as("event_type"),
        hll_sketch_estimate(col("u2")).as("approx_users"),
        col("np").as("n_partials"))
    per.unionByName(all).orderBy("event_type")
  }

  /** Theta-sketch distinct-set ALGEBRA (DataSketches theta): the audience
    * questions HLL cannot answer — "users who clicked AND viewed",
    * "viewed but never purchased" — because HLL unions only; theta
    * sketches intersect and difference. Each per-type sketch builds as a
    * conditional aggregate in ONE pass (constant-size mergeable state);
    * the set algebra then runs on the sketch values.
    *
    * ORACLE-CHECKED (not rows-only): theta sketches are EXACT below their
    * nominal 4096 retained entries, and every per-type user set here is
    * under that at oracle scale — so the estimates are exact integers and
    * DuckDB's COUNT(DISTINCT) set expressions reproduce them cell-exact.
    * At 100 TB the same plan degrades gracefully to ~2% estimates; the
    * 1.6 TB-of-user-ids alternative is an Expand re-shuffle per set
    * expression.
    */
  def qThetaSets(spark: SparkSession, dir: String): DataFrame = {
    val ev = t(spark, dir, "events")
    def sk(tpe: String) = theta_sketch_agg(
      when(col("event_type") === tpe, col("user_id"))).as(tpe)
    val union = theta_sketch_estimate(theta_union(col("click"), col("view")))
    ev.agg(sk("click"), sk("view"), sk("purchase"))
      .select(
        theta_sketch_estimate(col("click")).cast("long").as("click_users"),
        theta_sketch_estimate(theta_intersection(col("click"), col("view")))
          .cast("long").as("click_and_view"),
        theta_sketch_estimate(theta_difference(col("view"), col("purchase")))
          .cast("long").as("view_not_purchase"),
        // the heavy-hitters precedent: the oracle equality RELIES on the
        // exact (<4096-entry) regime, so leaving it must fail LOUDLY here,
        // not as a mystifying downstream hash mismatch
        when(assert_true(union < 4000,
            lit("q_theta_sets left the theta exact regime — " +
              "the COUNT(DISTINCT) oracle no longer applies")).isNull,
          union.cast("long")).as("click_or_view"))
  }

  /** KLL quantile-sketch partials + merge (DataSketches KLL) — the
    * QUANTILE face of [[qHllPartials]]: per-group mergeable rank sketches
    * build in one pass, and the ALL rollup MERGES the stored partials
    * (`kll_merge_agg_double`) instead of re-buffering every value the way
    * exact `percentile` must. Rows-only: KLL returns an actual data value
    * at the queried rank (no interpolation), so exact-percentile SQL
    * can't reproduce it — StatsSpec bounds the rank error instead.
    */
  def qKllPartials(spark: SparkSession, dir: String): DataFrame = {
    val parts = t(spark, dir, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(kll_sketch_agg_double(col("l_quantity")).as("sk"),
        count(lit(1)).as("n_rows"))
    val per = parts.select(col("l_returnflag"),
      kll_sketch_get_quantile_double(col("sk"), lit(0.5)).as("median_qty"),
      kll_sketch_get_quantile_double(col("sk"), lit(0.9)).as("p90_qty"),
      col("n_rows"))
    val all = parts
      .agg(kll_merge_agg_double(col("sk")).as("m"),
        sum(col("n_rows")).as("n"))
      .select(lit("ALL").as("l_returnflag"),
        kll_sketch_get_quantile_double(col("m"), lit(0.5)).as("median_qty"),
        kll_sketch_get_quantile_double(col("m"), lit(0.9)).as("p90_qty"),
        col("n").as("n_rows"))
    per.unionByName(all).orderBy("l_returnflag")
  }

  /** Exact percentiles (sort-based `percentile`, linear interpolation —
    * same definition as SQL-standard PERCENTILE_CONT).
    */
  def qPercentiles(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(percentile(col("l_quantity"), lit(0.5)).as("median_qty"),
        percentile(col("l_quantity"), lit(0.9)).as("p90_qty"),
        min(col("l_quantity")).as("min_qty"),
        max(col("l_quantity")).as("max_qty"))
      .orderBy("l_returnflag")

  /** Statistical aggregates — correlation, sample covariance, sample
    * stddev — with CROSS-ENGINE BIT PARITY, which the built-in one-pass
    * `corr`/`covar_samp`/`stddev` can never give (their streaming-update
    * accumulation order differs per engine AND per partitioning). Instead:
    * the five raw moments accumulate as EXACT decimal sums (the
    * [[graft.Tables.dec]] oracle-parity rule; DECIMAL(18,2)^2 products stay
    * exact in 38 digits), and the closed-form formulas then evaluate in
    * double over those exact sums — the identical IEEE expression tree on
    * both engines. Same plan shape as any partial+final aggregation: one
    * shuffle of six accumulator columns per group, O(groups) state.
    *
    * Caveat the doc owns: the textbook moment formulas lose precision when
    * means dwarf variances (catastrophic cancellation) — fine for TPC-H
    * quantities/prices, and the price of determinism; Welford-style
    * one-pass is numerically safer but order-dependent, hence unverifiable
    * by hash.
    */
  def qCorr(spark: SparkSession, dir: String): DataFrame = {
    val dq = col("l_quantity").cast(org.apache.spark.sql.types.DecimalType(18, 2))
    val dp = col("l_extendedprice").cast(org.apache.spark.sql.types.DecimalType(18, 2))
    val s = t(spark, dir, "lineitem").groupBy(col("l_returnflag")).agg(
      count(lit(1)).as("cnt"),
      sum(dq).as("sxd"), sum(dp).as("syd"),
      sum(dq * dq).as("sxxd"), sum(dp * dp).as("syyd"),
      sum(dq * dp).as("sxyd"))
    val n = col("cnt").cast("double")
    val sx = col("sxd").cast("double")
    val sy = col("syd").cast("double")
    val sxx = col("sxxd").cast("double")
    val syy = col("syyd").cast("double")
    val sxy = col("sxyd").cast("double")
    s.select(col("l_returnflag"), col("cnt").as("n"),
        ((n * sxy - sx * sy) /
          (sqrt(n * sxx - sx * sx) * sqrt(n * syy - sy * sy)))
          .as("corr_qty_price"),
        ((n * sxy - sx * sy) / (n * (n - 1))).as("covar_qty_price"),
        sqrt((n * sxx - sx * sx) / (n * (n - 1))).as("stddev_qty"),
        sqrt((n * syy - sy * sy) / (n * (n - 1))).as("stddev_price"))
      .orderBy("l_returnflag")
  }

  /** Correlated scalar subquery shape: customers above their nation's
    * average balance. Expressed as the at-scale plan — a broadcast join
    * against the tiny per-nation aggregate (what a correlated subquery
    * decorrelates into anyway).
    */
  def qScalarSubquery(spark: SparkSession, dir: String): DataFrame = {
    val cust = t(spark, dir, "customer")
    val nationAvg = cust.groupBy(col("c_nationkey"))
      .agg((toDouble(sum(dec(col("c_acctbal")))) / count(lit(1))).as("nation_avg"))
    cust.join(broadcast(nationAvg), Seq("c_nationkey"))
      .filter(col("c_acctbal") > col("nation_avg"))
      .select(col("c_custkey"), col("c_nationkey"), col("c_acctbal"),
        col("nation_avg"))
      .orderBy("c_custkey")
  }

  /** Pivot: event counts per user pivoted by event_type (explicit value
    * list — the only scalable form; discovery-pivot scans twice).
    */
  def qPivot(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "events")
      .groupBy(col("user_id"))
      .pivot("event_type", Seq("click", "error", "purchase", "signup", "view"))
      .agg(count(lit(1)))
      .na.fill(0L)
      .orderBy("user_id")

  /** Unpivot (melt): a wide per-brand aggregate back to (metric, value)
    * rows via the native `unpivot` operator — the Expand-based inverse of
    * [[qPivot]] (narrow: one input row fans to |metrics| output rows, no
    * shuffle beyond the feeding aggregation).
    */
  def qUnpivot(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "part")
      .groupBy(col("p_brand"))
      .agg(
        toDouble(sum(dec(col("p_retailprice")))).as("sum_retail"),
        (sum(col("p_size")).cast("double") / count(lit(1))).as("avg_size"),
        count(lit(1)).cast("double").as("n_parts"))
      .unpivot(Array(col("p_brand")),
        Array(col("sum_retail"), col("avg_size"), col("n_parts")),
        "metric", "value")
      .orderBy("p_brand", "metric")

  /** NULL-handling functions: nullif / coalesce / nvl2-shaped CASE,
    * null-aware counts, null-safe equality.
    */
  def qNulls(spark: SparkSession, dir: String): DataFrame = {
    val d = nullif(col("l_discount"), lit(0.0))
    t(spark, dir, "lineitem").select(
        col("l_orderkey"), col("l_linenumber"),
        d.as("disc_or_null"),
        coalesce(d, lit(-1.0)).as("disc_defaulted"),
        d.isNull.as("was_zero"),
        col("l_discount") <=> lit(0.0) as "null_safe_eq_zero")
      .orderBy("l_orderkey", "l_linenumber")
  }

  /** Latest-wins MERGE/upsert — the batch CDC-apply shape (SCD type 1):
    * base ∪ changes, one row_number per key over (version desc), keep
    * rn = 1. The changes slice here rewrites every tenth customer (name
    * tagged, balance +100 through an exact decimal add).
    *
    * Scale: this is exactly what a MERGE INTO compiles to — ONE clustering
    * exchange on the merge key over base+changes; with the base bucketed
    * on the key only the (small) changes side moves, and the window
    * degrades gracefully to the bounded [[graft.plans.TopKPerGroupExec]]
    * shape if versions-per-key ever gets deep.
    */
  def qMergeLatest(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val base = t(spark, dir, "customer")
      .select(col("c_custkey"), col("c_name"), col("c_acctbal"),
        lit(1L).as("version"))
    val changes = t(spark, dir, "customer")
      .filter(col("c_custkey") % 10 === 0)
      .select(col("c_custkey"), concat(col("c_name"), lit("*")).as("c_name"),
        toDouble(dec(col("c_acctbal")) + lit(100)).as("c_acctbal"),
        lit(2L).as("version"))
    val w = Window.partitionBy(col("c_custkey")).orderBy(col("version").desc)
    base.unionByName(changes)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1).drop("rn")
      .orderBy("c_custkey")
  }

  /** union / intersect / except over customer vs supplier nation sets. */
  def qSetops(spark: SparkSession, dir: String): DataFrame = {
    val cn = t(spark, dir, "customer").select(col("c_nationkey").as("n")).distinct()
    val sn = t(spark, dir, "supplier").select(col("s_nationkey").as("n")).distinct()
    cn.intersect(sn).withColumn("op", lit("both"))
      .unionAll(cn.except(sn).withColumn("op", lit("cust_only")))
      .unionAll(cn.union(sn).distinct().withColumn("op", lit("either")))
      .select("op", "n")
      .orderBy("op", "n")
  }

  /** OHLC time bars: per (event_type, hour) open/high/low/close/volume —
    * the finance-style bar aggregation where open and close are
    * ORDER-dependent picks, not commutative aggregates.
    *
    * Determinism: the pick order is (us, event_id) — event_id breaks
    * same-microsecond ties, so first/last are total-order well-defined and
    * open/close are RAW input doubles (no arithmetic → bit-identical
    * cross-engine); only the volume sum goes through the decimal cast.
    *
    * Scale: ONE clustering exchange on (type, hour) serves both window
    * passes (row_number needs the sort, the per-bar count doesn't) and the
    * final aggregation — bars are output-sized, and hot hours skew-split
    * under AQE like any single-exchange aggregate.
    */
  def qOhlc(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ev = t(spark, dir, "events")
      .select(col("event_type"), unix_micros(col("ts")).as("us"),
        col("event_id"), col("value"))
      .withColumn("hour", expr("us div 3600000000"))
    val w = Window.partitionBy("event_type", "hour")
      .orderBy(col("us"), col("event_id"))
    val wAll = Window.partitionBy("event_type", "hour")
    ev.withColumn("rn", row_number().over(w))
      .withColumn("cnt", count(lit(1)).over(wAll))
      .groupBy("event_type", "hour")
      .agg(max(when(col("rn") === 1, col("value"))).as("open"),
        max(col("value")).as("high"),
        min(col("value")).as("low"),
        max(when(col("rn") === col("cnt"), col("value"))).as("close"),
        count(lit(1)).as("n_events"),
        toDouble(sum(dec(col("value")))).as("sum_value"))
      .orderBy("event_type", "hour")
  }

  /** The INCREMENTAL MATERIALIZED AGGREGATE VIEW ([[graft.sources
    * .AggView]]) through a full lifecycle in one query: init on the even
    * orderkeys, APPEND the odd ones, FORGET every 100th — then serve the
    * folded view, which must equal one plain GROUP BY over the surviving
    * rows (the DuckDB oracle). Sums go through the decimal cast
    * discipline on both sides, so the doubles are bit-identical.
    */
  /** The staged lifecycle both agg-view queries serve from: init on the
    * even orderkeys, append the odd, forget every 100th — one shared
    * cache key, so the pair differs only by the read path.
    */
  private def stagedAggView(spark: SparkSession, dir: String): String = {
    val li = t(spark, dir, "lineitem")
    graft.Caches.stagedPath("aggview", dir) { b =>
      graft.sources.AggView.write(li.filter(col("l_orderkey") % 2 === 0),
        b, Seq("l_returnflag", "l_linestatus"),
        Seq("l_quantity", "l_extendedprice"))
      graft.sources.AggView.append(
        li.filter(col("l_orderkey") % 2 === 1), b)
      graft.sources.AggView.forget(
        li.filter(col("l_orderkey") % 100 === 0), b)
      ()
    }
  }

  def qAggView(spark: SparkSession, dir: String): DataFrame =
    graft.sources.AggView.read(spark, stagedAggView(spark, dir))
      .select(col("l_returnflag"), col("l_linestatus"), col("cnt"),
        toDouble(col("sum_l_quantity")).as("sum_qty"),
        toDouble(col("sum_l_extendedprice")).as("sum_price"))
      .orderBy("l_returnflag", "l_linestatus")

  /** The NON-ADDITIVE measures through the same lifecycle (VERDICT r15
    * #2): a view with min/max on `l_extendedprice` — init even
    * orderkeys, append odd, FORGET every 100th with the surviving rows
    * as the re-derivation base, so the forgotten slice's extrema must
    * re-derive (negation cannot serve a retracted maximum). Served
    * columns include the free `avg_<v>` (sum/cnt — one IEEE division of
    * the exact decimal, bit-identical to DuckDB's CAST(SUM AS
    * DOUBLE)/COUNT). Hash-checked against one plain GROUP BY with
    * MIN/MAX/AVG over the survivors.
    */
  def qAggViewMinmax(spark: SparkSession, dir: String): DataFrame = {
    val li = t(spark, dir, "lineitem")
    val base = graft.Caches.stagedPath("aggview-mm", dir) { b =>
      graft.sources.AggView.write(li.filter(col("l_orderkey") % 2 === 0),
        b, Seq("l_returnflag", "l_linestatus"), Seq("l_quantity"),
        minmax = Seq("l_extendedprice"))
      graft.sources.AggView.append(
        li.filter(col("l_orderkey") % 2 === 1), b)
      graft.sources.AggView.forget(
        li.filter(col("l_orderkey") % 100 === 0), b,
        base = Some(li.filter(col("l_orderkey") % 100 =!= 0)))
      ()
    }
    graft.sources.AggView.read(spark, base)
      .select(col("l_returnflag"), col("l_linestatus"), col("cnt"),
        toDouble(col("sum_l_quantity")).as("sum_qty"),
        col("avg_l_quantity").as("avg_qty"),
        col("min_l_extendedprice").as("min_price"),
        col("max_l_extendedprice").as("max_price"))
      .orderBy("l_returnflag", "l_linestatus")
  }

  /** The view's ROUTE tier in its batch harness: a deterministic arrival
    * slice enriched with its key's served totals ([[graft.sources
    * .AggView.route]] — the online feature-store read, kb buckets
    * pruned), hash-checked against a DuckDB LEFT JOIN of the same
    * arrivals to the same GROUP BY.
    */
  def qAggViewRoute(spark: SparkSession, dir: String): DataFrame = {
    val base = stagedAggView(spark, dir)
    val arrivals = t(spark, dir, "lineitem")
      .filter(col("l_orderkey") % 500 === 0)
      .select(col("l_orderkey"), col("l_linenumber"),
        col("l_returnflag"), col("l_linestatus"))
    graft.sources.AggView.route(arrivals, base)
      .select(col("l_orderkey"), col("l_linenumber"),
        col("l_returnflag"), col("l_linestatus"), col("cnt"),
        toDouble(col("sum_l_quantity")).as("sum_qty"),
        toDouble(col("sum_l_extendedprice")).as("sum_price"))
      .orderBy("l_orderkey", "l_linenumber")
  }

  /** The O(1/nbuckets) point read: one rollup cell served from one kb
    * bucket ([[graft.sources.AggView.lookup]] — pruning plan-asserted in
    * AggViewSpec), hash-checked against the same GROUP BY restricted to
    * the key.
    */
  def qAggViewLookup(spark: SparkSession, dir: String): DataFrame =
    graft.sources.AggView.lookup(spark, stagedAggView(spark, dir),
        Seq("R", "F"))
      .select(col("l_returnflag"), col("l_linestatus"), col("cnt"),
        toDouble(col("sum_l_quantity")).as("sum_qty"),
        toDouble(col("sum_l_extendedprice")).as("sum_price"))

  /** The INDEX-CATALOG ops read ([[graft.sources.StoredIndex.catalog]],
    * r16 — the fleet-listing half of `maintain()`): a root holding one
    * cheap index per stored-family class (agg view with appended
    * segments, budget gate with learned fills, order-3 LM), listed from
    * manifests and directory metadata alone — no data file opens.
    * Engine-internal state, so rows-only (not oracle-expressible);
    * MaintainSpec asserts the column semantics per family. The temp
    * root path is reduced to the index basename for determinism.
    */
  def qIndexCatalog(spark: SparkSession, dir: String): DataFrame = {
    val li = t(spark, dir, "lineitem")
    val docs = t(spark, dir, "documents")
    val root = graft.Caches.stagedPath("index-catalog", dir) { b =>
      graft.sources.AggView.write(li.filter(col("l_orderkey") % 2 === 0),
        s"$b/view", Seq("l_returnflag"), Seq("l_quantity"))
      graft.sources.AggView.append(
        li.filter(col("l_orderkey") % 2 === 1), s"$b/view")
      graft.operators.Curation.writeBudgetGate(spark, s"$b/gate",
        Map("src0" -> 100000L, "src1" -> 50000L))
      graft.operators.Curation.recordBudgetFills(
        graft.operators.Curation.budgetRoute(
          docs.filter(col("doc_id") % 50 === 0), s"$b/gate"), s"$b/gate")
      graft.operators.LangModel.writeLmIndex(
        docs.filter(col("doc_id") % 20 === 0), s"$b/lm", vocabTop = 100,
        order = 3)
      ()
    }
    graft.sources.StoredIndex.catalog(spark, root)
      .select(element_at(split(col("path"), "/"), -1).as("index"),
        col("family"), col("versions"), col("live_files"), col("tables"),
        col("segments"), col("tombstone_files"))
      .orderBy("index")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_index_catalog" -> qIndexCatalog,
    "q_aggview" -> qAggView,
    "q_aggview_minmax" -> qAggViewMinmax,
    "q_aggview_route" -> qAggViewRoute,
    "q_aggview_lookup" -> qAggViewLookup,
    "q_ohlc" -> qOhlc,
    "q_rollup" -> qRollup,
    "q_cube" -> qCube,
    "q_grouping_sets" -> qGroupingSets,
    "q_distinct_agg" -> qDistinctAgg,
    "q_approx_distinct" -> qApproxDistinct,
    "q_kmv_distinct" -> qKmvDistinct,
    "q_sample_percentile" -> qSamplePercentile,
    "q_percentiles" -> qPercentiles,
    "q_percentiles_approx" -> qPercentilesApprox,
    "q_hll_partials" -> qHllPartials,
    "q_hll_stored" -> qHllStored,
    "q_theta_sets" -> qThetaSets,
    "q_kll_partials" -> qKllPartials,
    "q_corr" -> qCorr,
    "q_scalar_subquery" -> qScalarSubquery,
    "q_pivot" -> qPivot,
    "q_unpivot" -> qUnpivot,
    "q_nulls" -> qNulls,
    "q_merge_latest" -> qMergeLatest,
    "q_setops" -> qSetops)

  val oracles: Map[String, String] = Map(
    // the maintained view (init even + append odd - forget %100) must
    // equal one plain GROUP BY over the surviving rows
    "q_aggview" ->
      """SELECT l_returnflag, l_linestatus, COUNT(*) AS cnt,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE)
        |    AS sum_qty,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE)
        |    AS sum_price
        |FROM lineitem WHERE l_orderkey % 100 <> 0
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    // min/max forget-retraction lifecycle: the %100 slice carried group
    // maxima, so the served extrema must equal the survivors' MIN/MAX;
    // avg = CAST(SUM(decimal) AS DOUBLE)/COUNT on both sides
    "q_aggview_minmax" ->
      """SELECT l_returnflag, l_linestatus, COUNT(*) AS cnt,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE)
        |    AS sum_qty,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE)
        |    / COUNT(*) AS avg_qty,
        |  MIN(l_extendedprice) AS min_price,
        |  MAX(l_extendedprice) AS max_price
        |FROM lineitem WHERE l_orderkey % 100 <> 0
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q_aggview_lookup" ->
      """SELECT l_returnflag, l_linestatus, COUNT(*) AS cnt,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE)
        |    AS sum_qty,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE)
        |    AS sum_price
        |FROM lineitem
        |WHERE l_orderkey % 100 <> 0
        |  AND l_returnflag = 'R' AND l_linestatus = 'F'
        |GROUP BY 1, 2""".stripMargin,
    // the route = the same view LEFT-JOINed onto a deterministic arrival
    // slice; unknown keys answer zeros
    "q_aggview_route" ->
      """WITH v AS (
        |  SELECT l_returnflag, l_linestatus, COUNT(*) AS cnt,
        |    CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE)
        |      AS sum_qty,
        |    CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE)
        |      AS sum_price
        |  FROM lineitem WHERE l_orderkey % 100 <> 0 GROUP BY 1, 2)
        |SELECT a.l_orderkey, a.l_linenumber, a.l_returnflag,
        |  a.l_linestatus, COALESCE(v.cnt, 0) AS cnt,
        |  COALESCE(v.sum_qty, 0) AS sum_qty,
        |  COALESCE(v.sum_price, 0) AS sum_price
        |FROM (SELECT l_orderkey, l_linenumber, l_returnflag, l_linestatus
        |      FROM lineitem WHERE l_orderkey % 500 = 0) a
        |LEFT JOIN v USING (l_returnflag, l_linestatus)
        |ORDER BY a.l_orderkey, a.l_linenumber""".stripMargin,
    // the KMV replay: identical k-min selection over md5 hex order, the
    // k-th digest's first 13 hex chars parsed as an exact < 2^52 integer,
    // one IEEE division — the whole sketch estimator hash-compares
    "q_kmv_distinct" ->
      """WITH h AS (SELECT DISTINCT l_returnflag AS flag,
        |            md5(CAST(l_partkey AS VARCHAR)) AS h FROM lineitem),
        |r AS (SELECT flag, h,
        |        row_number() OVER (PARTITION BY flag ORDER BY h) AS rn
        |      FROM h),
        |s AS (SELECT flag, COUNT(*) AS n_min, MAX(h) AS kth
        |      FROM r WHERE rn <= 64 GROUP BY flag)
        |SELECT flag, n_min,
        |  CASE WHEN n_min < 64 THEN CAST(n_min AS DOUBLE)
        |       ELSE 63.0 / (CAST(CAST('0x' || substr(kth, 1, 13) AS BIGINT)
        |                      AS DOUBLE) / 4503599627370496.0)
        |  END AS est_distinct
        |FROM s ORDER BY flag""".stripMargin,
    "q_sample_percentile" ->
      """WITH h AS (SELECT l_returnflag AS flag, l_quantity AS q,
        |            md5(CAST(l_orderkey AS VARCHAR) || '|' ||
        |                CAST(l_linenumber AS VARCHAR)) AS h
        |          FROM lineitem),
        |r AS (SELECT flag, q,
        |        row_number() OVER (PARTITION BY flag ORDER BY h) AS rn
        |      FROM h)
        |SELECT flag, quantile_cont(q, 0.5) AS samp_median,
        |  quantile_cont(q, 0.9) AS samp_p90, COUNT(*) AS n_sample
        |FROM r WHERE rn <= 256 GROUP BY flag ORDER BY flag""".stripMargin,
    "q_ohlc" ->
      """WITH ev AS (SELECT event_type,
        |    epoch_us(CAST(ts AS TIMESTAMP)) AS us, event_id, value
        |  FROM events),
        |r AS (SELECT event_type, us // 3600000000 AS hour, value,
        |    ROW_NUMBER() OVER (PARTITION BY event_type, us // 3600000000
        |      ORDER BY us, event_id) AS rn,
        |    COUNT(*) OVER (PARTITION BY event_type, us // 3600000000) AS cnt
        |  FROM ev)
        |SELECT event_type, hour,
        |  MAX(CASE WHEN rn = 1 THEN value END) AS open,
        |  MAX(value) AS high, MIN(value) AS low,
        |  MAX(CASE WHEN rn = cnt THEN value END) AS close,
        |  COUNT(*) AS n_events,
        |  CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS sum_value
        |FROM r GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q_theta_sets" ->
      """WITH c AS (SELECT DISTINCT user_id FROM events
        |           WHERE event_type = 'click'),
        |v AS (SELECT DISTINCT user_id FROM events
        |      WHERE event_type = 'view'),
        |p AS (SELECT DISTINCT user_id FROM events
        |      WHERE event_type = 'purchase')
        |SELECT
        |  (SELECT COUNT(*) FROM c) AS click_users,
        |  (SELECT COUNT(*) FROM
        |    (SELECT * FROM c INTERSECT SELECT * FROM v)) AS click_and_view,
        |  (SELECT COUNT(*) FROM
        |    (SELECT * FROM v EXCEPT SELECT * FROM p)) AS view_not_purchase,
        |  (SELECT COUNT(*) FROM
        |    (SELECT * FROM c UNION SELECT * FROM v)) AS click_or_view""".stripMargin,
    "q_merge_latest" ->
      """WITH base AS (
        |  SELECT c_custkey, c_name, c_acctbal, CAST(1 AS BIGINT) AS version
        |  FROM customer),
        |chg AS (
        |  SELECT c_custkey, c_name || '*' AS c_name,
        |    CAST(CAST(c_acctbal AS DECIMAL(12,2)) + 100 AS DOUBLE) AS c_acctbal,
        |    CAST(2 AS BIGINT) AS version
        |  FROM customer WHERE c_custkey % 10 = 0),
        |u AS (SELECT * FROM base UNION ALL SELECT * FROM chg),
        |r AS (SELECT *, row_number() OVER (PARTITION BY c_custkey
        |        ORDER BY version DESC) AS rn FROM u)
        |SELECT c_custkey, c_name, c_acctbal, version FROM r WHERE rn = 1
        |ORDER BY c_custkey""".stripMargin,
    "q_unpivot" ->
      """WITH w AS (
        |  SELECT p_brand,
        |    CAST(SUM(CAST(p_retailprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_retail,
        |    CAST(SUM(p_size) AS DOUBLE) / COUNT(*) AS avg_size,
        |    CAST(COUNT(*) AS DOUBLE) AS n_parts
        |  FROM part GROUP BY p_brand)
        |SELECT p_brand, 'sum_retail' AS metric, sum_retail AS value FROM w
        |UNION ALL SELECT p_brand, 'avg_size', avg_size FROM w
        |UNION ALL SELECT p_brand, 'n_parts', n_parts FROM w
        |ORDER BY p_brand, metric""".stripMargin,
    "q_rollup" ->
      """SELECT COALESCE(l_returnflag, 'ALL') AS l_returnflag,
        |  COALESCE(l_linestatus, 'ALL') AS l_linestatus,
        |  COUNT(*) AS n,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty
        |FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q_cube" ->
      """SELECT COALESCE(o_orderstatus, 'ALL') AS o_orderstatus,
        |  COALESCE(o_orderpriority, 'ALL') AS o_orderpriority,
        |  COUNT(*) AS n,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_price
        |FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
        |ORDER BY o_orderstatus, o_orderpriority""".stripMargin,
    "q_grouping_sets" ->
      """SELECT COALESCE(l_returnflag, 'ALL') AS l_returnflag,
        |  COALESCE(l_linestatus, 'ALL') AS l_linestatus, COUNT(*) AS n
        |FROM lineitem
        |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q_distinct_agg" ->
      """SELECT l_returnflag,
        |  COUNT(DISTINCT l_partkey) AS nd_parts,
        |  COUNT(DISTINCT l_suppkey) AS nd_supps,
        |  CAST(SUM(DISTINCT CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_d_qty
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "q_corr" ->
      """WITH s AS (
        |  SELECT l_returnflag, COUNT(*) AS cnt,
        |    SUM(CAST(l_quantity AS DECIMAL(18,2))) AS sxd,
        |    SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS syd,
        |    SUM(CAST(l_quantity AS DECIMAL(18,2))
        |      * CAST(l_quantity AS DECIMAL(18,2))) AS sxxd,
        |    SUM(CAST(l_extendedprice AS DECIMAL(18,2))
        |      * CAST(l_extendedprice AS DECIMAL(18,2))) AS syyd,
        |    SUM(CAST(l_quantity AS DECIMAL(18,2))
        |      * CAST(l_extendedprice AS DECIMAL(18,2))) AS sxyd
        |  FROM lineitem GROUP BY l_returnflag),
        |d AS (
        |  SELECT l_returnflag, cnt, CAST(cnt AS DOUBLE) AS n,
        |    CAST(sxd AS DOUBLE) AS sx, CAST(syd AS DOUBLE) AS sy,
        |    CAST(sxxd AS DOUBLE) AS sxx, CAST(syyd AS DOUBLE) AS syy,
        |    CAST(sxyd AS DOUBLE) AS sxy
        |  FROM s)
        |SELECT l_returnflag, cnt AS n,
        |  (n * sxy - sx * sy) /
        |    (sqrt(n * sxx - sx * sx) * sqrt(n * syy - sy * sy))
        |    AS corr_qty_price,
        |  (n * sxy - sx * sy) / (n * (n - 1)) AS covar_qty_price,
        |  sqrt((n * sxx - sx * sx) / (n * (n - 1))) AS stddev_qty,
        |  sqrt((n * syy - sy * sy) / (n * (n - 1))) AS stddev_price
        |FROM d ORDER BY l_returnflag""".stripMargin,
    "q_percentiles" ->
      """SELECT l_returnflag,
        |  quantile_cont(l_quantity, 0.5) AS median_qty,
        |  quantile_cont(l_quantity, 0.9) AS p90_qty,
        |  MIN(l_quantity) AS min_qty, MAX(l_quantity) AS max_qty
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "q_scalar_subquery" ->
      """WITH na AS (
        |  SELECT c_nationkey,
        |    CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*) AS nation_avg
        |  FROM customer GROUP BY c_nationkey)
        |SELECT c_custkey, c.c_nationkey, c_acctbal, nation_avg
        |FROM customer c JOIN na ON c.c_nationkey = na.c_nationkey
        |WHERE c_acctbal > nation_avg
        |ORDER BY c_custkey""".stripMargin,
    "q_pivot" ->
      """SELECT user_id,
        |  COUNT(*) FILTER (WHERE event_type = 'click') AS click,
        |  COUNT(*) FILTER (WHERE event_type = 'error') AS error,
        |  COUNT(*) FILTER (WHERE event_type = 'purchase') AS purchase,
        |  COUNT(*) FILTER (WHERE event_type = 'signup') AS signup,
        |  COUNT(*) FILTER (WHERE event_type = 'view') AS "view"
        |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin,
    "q_nulls" ->
      """SELECT l_orderkey, l_linenumber,
        |  nullif(l_discount, 0.0) AS disc_or_null,
        |  coalesce(nullif(l_discount, 0.0), -1.0) AS disc_defaulted,
        |  nullif(l_discount, 0.0) IS NULL AS was_zero,
        |  l_discount IS NOT DISTINCT FROM 0.0 AS null_safe_eq_zero
        |FROM lineitem ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "q_setops" ->
      """WITH cn AS (SELECT DISTINCT c_nationkey AS n FROM customer),
        |     sn AS (SELECT DISTINCT s_nationkey AS n FROM supplier)
        |SELECT 'both' AS op, n FROM (SELECT n FROM cn INTERSECT SELECT n FROM sn)
        |UNION ALL
        |SELECT 'cust_only' AS op, n FROM (SELECT n FROM cn EXCEPT SELECT n FROM sn)
        |UNION ALL
        |SELECT 'either' AS op, n FROM (SELECT n FROM cn UNION SELECT n FROM sn)
        |ORDER BY op, n""".stripMargin)
}
