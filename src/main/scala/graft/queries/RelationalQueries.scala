package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables.{dec, pct, t, toDouble}

/** Relational operator coverage (SURVEY.md §2.2): the reference itself has no
  * joins/aggs/windows, but the engine gets them from Catalyst — each query
  * here is oracle-checked against DuckDB on the TPC-H-ish testdata.
  *
  * Numeric parity rule (see [[graft.Tables.dec]]): monetary doubles are cast
  * to exact decimals before summation and back to double after, making
  * results bit-identical regardless of partition/summation order — the same
  * property that makes these aggregations deterministic on a 1000-executor
  * cluster.
  */
object RelationalQueries {

  /** Hash aggregate with partial (map-side) combine: TPC-H Q1 shape. */
  def q1Agg(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "lineitem")
      .filter(col("l_shipdate") <= lit("2000-12-01"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        toDouble(sum(dec(col("l_quantity")))).as("sum_qty"),
        toDouble(sum(dec(col("l_extendedprice")))).as("sum_base_price"),
        toDouble(sum(dec(col("l_extendedprice")) * (lit(1) - pct(col("l_discount")))))
          .as("sum_disc_price"),
        toDouble(sum(dec(col("l_extendedprice")) * (lit(1) - pct(col("l_discount")))
          * (lit(1) + pct(col("l_tax"))))).as("sum_charge"),
        (toDouble(sum(dec(col("l_quantity")))) / count(lit(1))).as("avg_qty"),
        (toDouble(sum(dec(col("l_extendedprice")))) / count(lit(1))).as("avg_price"),
        count(lit(1)).as("count_order"))
      .orderBy("l_returnflag", "l_linestatus")

  /** 3-way join + agg + top-k (TPC-H Q3 shape). The customer side is tiny
    * after the segment filter, so it is explicitly broadcast — at 100 TB the
    * orders⋈lineitem join shuffles on the key while customer rides along
    * broadcast, exactly the plan a 1000-executor run wants.
    */
  def q3TopRevenue(spark: SparkSession, dir: String): DataFrame = {
    val cust = t(spark, dir, "customer")
      .filter(col("c_mktsegment") === "BUILDING").select("c_custkey")
    val ord = t(spark, dir, "orders")
      .filter(col("o_orderdate") < lit("1998-01-01"))
      .select("o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority")
    val li = t(spark, dir, "lineitem")
      .select(col("l_orderkey"),
        (dec(col("l_extendedprice")) * (lit(1) - pct(col("l_discount")))).as("rev"))
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
      .groupBy(col("o_orderkey"),
        date_format(col("o_orderdate"), "yyyy-MM-dd").as("o_orderdate"),
        col("o_orderpriority"))
      .agg(toDouble(sum(col("rev"))).as("revenue"))
      .orderBy(col("revenue").desc, col("o_orderkey"))
      .limit(10)
  }

  /** Tight filter + scalar aggregate (TPC-H Q6 shape) — predicate pushdown
    * reaches the parquet scan (verified in plan tests).
    */
  def q6FilterSum(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "lineitem")
      .filter(col("l_shipdate") >= lit("1996-01-01") &&
        col("l_shipdate") < lit("1997-01-01") &&
        col("l_discount").between(0.02, 0.04) && col("l_quantity") < 24)
      .agg(toDouble(sum(dec(col("l_extendedprice")) * pct(col("l_discount"))))
        .as("revenue"))

  /** Left-semi join (EXISTS): orders having any high-quantity line. */
  def qSemiJoin(spark: SparkSession, dir: String): DataFrame = {
    val hi = t(spark, dir, "lineitem").filter(col("l_quantity") > 45)
      .select(col("l_orderkey"))
    t(spark, dir, "orders")
      .join(hi, col("o_orderkey") === col("l_orderkey"), "left_semi")
      .select("o_orderkey", "o_orderstatus")
      .orderBy("o_orderkey")
  }

  /** Left-anti join (NOT EXISTS): customers with no pending order. */
  def qAntiJoin(spark: SparkSession, dir: String): DataFrame = {
    val ord = t(spark, dir, "orders")
      .filter(col("o_orderstatus") === "P").select(col("o_custkey"))
    t(spark, dir, "customer")
      .join(ord, col("c_custkey") === col("o_custkey"), "left_anti")
      .select("c_custkey", "c_name")
      .orderBy("c_custkey")
  }

  /** Ranking window: top-3 customers by balance per nation. */
  def qWindowRank(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("c_nationkey"))
      .orderBy(col("c_acctbal").desc, col("c_custkey"))
    t(spark, dir, "customer")
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
      .select("c_nationkey", "rn", "c_custkey", "c_acctbal")
      .orderBy("c_nationkey", "rn")
  }

  /** Analytic window functions with frames: running sum (unbounded
    * preceding), sliding 3-row sum, lag/lead — per customer, deterministic
    * order (date, key). Window sums go through decimals: both engines then
    * produce exact frame sums (DuckDB's segment-tree sliding windows and
    * Spark's incremental aggregation would drift on raw doubles).
    */
  def qWindowRunning(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
    val p = dec(col("o_totalprice"))
    t(spark, dir, "orders")
      .select(col("o_custkey"), col("o_orderkey"),
        date_format(col("o_orderdate"), "yyyy-MM-dd").as("o_orderdate"),
        toDouble(sum(p).over(w.rowsBetween(Window.unboundedPreceding, 0)))
          .as("running"),
        toDouble(sum(p).over(w.rowsBetween(-2, 0))).as("mov3"),
        lag(col("o_orderkey"), 1).over(w).as("prev_key"),
        lead(col("o_totalprice"), 1).over(w).as("next_price"),
        (rank().over(Window.partitionBy(col("o_custkey"))
          .orderBy(col("o_orderpriority"), col("o_orderkey")))).as("prio_rank"))
      .orderBy("o_custkey", "o_orderkey")
  }

  /** Analytic window completeness (VERDICT r1 gap): first_value/last_value,
    * ntile, percent_rank, cume_dist, nth_value over the deterministic
    * per-customer order timeline. percent_rank/cume_dist are exact small-
    * integer ratios, bit-identical across engines; ntile determinism comes
    * from the total (date, key) order.
    */
  def qWindowAnalytic(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
    val wFull = w.rowsBetween(Window.unboundedPreceding,
      Window.unboundedFollowing)
    t(spark, dir, "orders").select(
        col("o_custkey"), col("o_orderkey"),
        first(col("o_orderkey")).over(w).as("first_key"),
        last(col("o_orderkey")).over(wFull).as("last_key"),
        ntile(4).over(w).as("quartile"),
        percent_rank().over(w).as("pct_rank"),
        cume_dist().over(w).as("cume"),
        nth_value(col("o_orderkey"), 2).over(wFull).as("second_key"))
      .orderBy("o_custkey", "o_orderkey")
  }

  /** Global top-k via orderBy+limit (TakeOrderedAndProject physical op — no
    * full sort, per-partition heaps then a k-merge; the at-scale shape).
    */
  def qTopkOrders(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "orders")
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .limit(10)
      .select("o_orderkey", "o_totalprice")

  /** Correlated EXISTS + NOT EXISTS through the SQL front end: Catalyst
    * decorrelates both subqueries into a left-semi and a left-anti join on
    * the correlation key (same physical shape as [[qSemiJoin]]/[[qAntiJoin]]
    * — assert-able via explain) — the scale story is the joins', with the
    * decorrelation itself the operator under test.
    */
  def qExistsSubquery(spark: SparkSession, dir: String): DataFrame = {
    t(spark, dir, "customer").createOrReplaceTempView("v_customer")
    t(spark, dir, "orders").createOrReplaceTempView("v_orders")
    spark.sql(
      """SELECT c_custkey, c_name FROM v_customer c
        |WHERE EXISTS (SELECT 1 FROM v_orders o
        |        WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 400000)
        |  AND NOT EXISTS (SELECT 1 FROM v_orders o
        |        WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'F')
        |ORDER BY c_custkey""".stripMargin)
  }

  /** Generator through the SQL front end: LATERAL VIEW posexplode — the
    * table-function surface (one output row per input-array element, with
    * ordinality). Narrow: the generate fuses into the scan stage, no
    * exchange before the presentation sort.
    */
  def qLateralExplode(spark: SparkSession, dir: String): DataFrame = {
    t(spark, dir, "documents").createOrReplaceTempView("v_documents")
    spark.sql(
      """SELECT doc_id, pos, tok
        |FROM v_documents
        |LATERAL VIEW posexplode(slice(split(text, ' '), 1, 3)) g AS pos, tok
        |ORDER BY doc_id, pos""".stripMargin)
  }

  /** Time-series gap-fill / resample — the downsampling shape every
    * log-analytics store serves: per user, an hourly spine from the user's
    * first to last event hour, left-joined to hourly aggregates; empty
    * hours emit n_events=0 and carry the last observed value FORWARD
    * (last-non-null over the spine order).
    *
    * Scale: events pre-aggregate to (user, hour) BEFORE the spine join
    * (partial agg absorbs the raw stream), the spine is generated per user
    * with `sequence()` so its size is users x hours — output-sized, never
    * event-sized — and the forward-fill window shares the join's
    * clustering (one exchange end to end after the pre-agg). Decimal sums
    * for cross-engine bit parity; the per-hour "last" is picked by
    * max(struct(ts, event_id, ...)) ≙ the oracle's row_number desc — a
    * total order, so both engines pick the same row.
    */
  def qGapfill(spark: SparkSession, dir: String): DataFrame = {
    val ev = graft.Tables.events(spark, dir).filter(col("user_id") % 30 === 0)
    val hourly = ev.groupBy(col("user_id"),
        date_trunc("hour", col("ts")).as("hour"))
      .agg(count(lit(1)).as("n_events"),
        toDouble(sum(dec(col("value")))).as("sum_value"),
        max(struct(col("ts"), col("event_id"), col("value")))
          .getField("value").as("hour_last"))
    val spine = ev.groupBy(col("user_id"))
      .agg(date_trunc("hour", min(col("ts"))).as("h0"),
        date_trunc("hour", max(col("ts"))).as("h1"))
      .select(col("user_id"),
        explode(sequence(col("h0"), col("h1"),
          expr("interval 1 hour"))).as("hour"))
    val w = Window.partitionBy(col("user_id")).orderBy(col("hour"))
    spine.join(hourly, Seq("user_id", "hour"), "left")
      .select(col("user_id"), col("hour"),
        coalesce(col("n_events"), lit(0L)).as("n_events"),
        coalesce(col("sum_value"), lit(0.0)).as("sum_value"),
        last(col("hour_last"), ignoreNulls = true).over(w)
          .as("filled_value"))
      .orderBy("user_id", "hour")
  }

  /** RANGE-frame window (value-based bounds, not row counts): the trailing
    * 1-hour per-user event sum/count — rows with equal order values share
    * a frame, and the frame edge is a TIME distance, which ROWS frames
    * cannot express. The remaining window-frame mode after q_window_running
    * covered ROWS.
    *
    * Scale: same single-exchange streaming window shape as every per-user
    * window here; range frames keep O(window-span) state per key, bounded
    * by the hour horizon like a watermark.
    */
  def qWindowRange(spark: SparkSession, dir: String): DataFrame = {
    val ev = graft.Tables.events(spark, dir).filter(col("user_id") % 20 === 0)
      .select(col("user_id"), col("event_id"),
        unix_micros(col("ts")).as("us"), dec(col("value")).as("v"))
    val w = Window.partitionBy(col("user_id")).orderBy(col("us"))
      .rangeBetween(-3600L * 1000000L, 0)
    ev.select(col("user_id"), col("event_id"),
        count(lit(1)).over(w).as("n_1h"),
        toDouble(sum(col("v")).over(w)).as("sum_1h"))
      .orderBy("user_id", "event_id")
  }

  /** width_bucket histogram — the equi-width profiling aggregate: order
    * totals bucketed into 10 bins over a fixed range, one count+mass row
    * per bin. One partial-aggregated pass; bins are a literal expression,
    * so the scan stays codegen'd and the shuffle carries 10 rows.
    */
  def qHistogram(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "orders")
      .select(width_bucket(col("o_totalprice"), lit(0d), lit(600000d),
        lit(10)).as("bucket"), dec(col("o_totalprice")).as("p"))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n_orders"), toDouble(sum(col("p"))).as("mass"))
      .orderBy("bucket")

  /** Batch sessionization — the gap-based session assignment every
    * clickstream/telemetry pipeline runs (the batch analog of the
    * streaming session window in ShipperStream): a new session starts at
    * the first event or after a >30 min silence; sessions aggregate to
    * (count, bounds, duration).
    *
    * Scale: the classic two-window + aggregate shape over ONE user_id
    * exchange — lag and the running session counter share the same
    * (partition, sort) spec so Catalyst plans a single Exchange + Sort and
    * both Window operators stream over it; the final per-session aggregate
    * partial-aggregates before its (user, sess) exchange. State per user is
    * one row — no session buffer materializes anywhere.
    */
  def qSessionize(spark: SparkSession, dir: String): DataFrame = {
    val ev = graft.Tables.events(spark, dir).filter(col("user_id") % 10 === 0)
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val gapUs = 1800L * 1000000L
    ev
      .withColumn("prev_us", lag(unix_micros(col("ts")), 1).over(w))
      .withColumn("new_sess",
        when(col("prev_us").isNull ||
          unix_micros(col("ts")) - col("prev_us") > gapUs, 1L).otherwise(0L))
      .withColumn("sess", sum(col("new_sess")).over(
        w.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy(col("user_id"), col("sess"))
      .agg(count(lit(1)).as("n_events"),
        min(col("ts")).as("start_ts"), max(col("ts")).as("end_ts"),
        (unix_micros(max(col("ts"))) - unix_micros(min(col("ts"))))
          .as("duration_us"))
      .orderBy("user_id", "sess")
  }

  /** SCD type-2 dimension build — collapse an event stream into validity
    * intervals per attribute value: a new version opens whenever the
    * tracked attribute (event_type) changes, `valid_to` is the next
    * version's start (NULL = current). The standard warehouse
    * change-capture shape: lag to detect changes, filter to change rows,
    * lead for the closing bound.
    *
    * Scale: both windows and the change filter cluster by user_id — one
    * hash exchange, streaming window evaluation, and the second window
    * runs over the (much smaller) change-row set.
    */
  def qScd2(spark: SparkSession, dir: String): DataFrame = {
    val ev = graft.Tables.events(spark, dir).filter(col("user_id") % 25 === 0)
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    ev
      .withColumn("prev_type", lag(col("event_type"), 1).over(w))
      .filter(col("prev_type").isNull ||
        col("prev_type") =!= col("event_type"))
      .withColumn("version", row_number().over(w))
      .withColumn("valid_to", lead(col("ts"), 1).over(w))
      .select(col("user_id"), col("version"), col("event_type"),
        col("ts").as("valid_from"), col("valid_to"))
      .orderBy("user_id", "version")
  }

  /** Grouped top-k through the custom [[graft.plans.TopKPerGroupExec]]
    * operator (bounded heap per group — no per-partition full sort; the
    * oracle is the equivalent row_number window SQL, so the driver's gate
    * hash-proves operator-vs-window equivalence).
    */
  def qTopkGroups(spark: SparkSession, dir: String): DataFrame =
    graft.plans.TopKPerGroup(
        t(spark, dir, "orders")
          .select("o_orderpriority", "o_orderkey", "o_totalprice"),
        groupCols = Seq("o_orderpriority"),
        orderKeys = Seq("o_totalprice" -> false, "o_orderkey" -> true),
        k = 3)
      .orderBy(col("o_orderpriority"), col("o_totalprice").desc,
        col("o_orderkey"))

  /** Z-order clustering key over (o_custkey, o_orderkey) — the layout
    * primitive for 2-D min/max pruning ([[graft.functions.ZOrder2]], a
    * codegen'd Catalyst expression). The query pins the Morton math
    * cell-exact against a 32-term bit-arithmetic oracle; the LAYOUT effect
    * (sort by zval -> tight per-block bounding boxes -> parquet row-group
    * pruning on either dimension) is asserted in ExtensionsSpec.
    */
  def qZorder(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.gcolumns.zorder2
    t(spark, dir, "orders")
      .filter(col("o_orderkey") % 37 === 0)
      .select(col("o_orderkey"),
        zorder2((col("o_custkey") % 65536).cast("int"),
          (col("o_orderkey") % 65536).cast("int")).as("zval"))
      .orderBy("o_orderkey")
  }

  /** The Morton interleave as plain SQL bit arithmetic: bit i of x lands at
    * position 2i, bit i of y at 2i+1.
    */
  private val zorderSql: String = {
    val terms = (0 until 16).flatMap { i =>
      Seq(s"((x >> $i) & 1) * ${1L << (2 * i)}",
        s"((y >> $i) & 1) * ${1L << (2 * i + 1)}")
    }.mkString(" + ")
    s"""WITH m AS (
       |  SELECT o_orderkey,
       |    CAST(o_custkey % 65536 AS BIGINT) AS x,
       |    CAST(o_orderkey % 65536 AS BIGINT) AS y
       |  FROM orders WHERE o_orderkey % 37 = 0)
       |SELECT o_orderkey, CAST($terms AS BIGINT) AS zval
       |FROM m ORDER BY o_orderkey""".stripMargin
  }

  /** Customer order-count distribution (TPC-H Q13 shape): LEFT OUTER join
    * so zero-order customers land in the n_orders=0 bucket, then the
    * aggregate-of-an-aggregate — the "how many customers placed k orders"
    * histogram.
    *
    * Scale: the outer join shuffles on custkey (both sides key-partitioned;
    * partial counts absorb each customer's orders map-side), the second
    * aggregation's domain is order-COUNTS — tens of values at any corpus
    * size, so the final exchange moves a constant-size table. The
    * (n_custs, n_orders) sort key is unique by construction (n_orders is
    * the group key), so the ordering is total and oracle-stable.
    */
  def qCustdist(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "customer").select(col("c_custkey"))
      .join(t(spark, dir, "orders").select(col("o_custkey"), col("o_orderkey")),
        col("c_custkey") === col("o_custkey"), "left")
      .groupBy(col("c_custkey"))
      .agg(count(col("o_orderkey")).as("n_orders"))
      .groupBy(col("n_orders"))
      .agg(count(lit(1)).as("n_custs"))
      .orderBy(col("n_custs").desc, col("n_orders").desc)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_custdist" -> qCustdist,
    "q_topk_groups" -> qTopkGroups,
    "q_zorder" -> qZorder,
    "q_sessionize" -> qSessionize,
    "q_scd2" -> qScd2,
    "q_window_range" -> qWindowRange,
    "q_histogram" -> qHistogram,
    "q1_agg" -> q1Agg,
    "q3_top_revenue" -> q3TopRevenue,
    "q6_filter_sum" -> q6FilterSum,
    "q_semi_join" -> qSemiJoin,
    "q_anti_join" -> qAntiJoin,
    "q_exists_subquery" -> qExistsSubquery,
    "q_lateral_explode" -> qLateralExplode,
    "q_window_rank" -> qWindowRank,
    "q_window_running" -> qWindowRunning,
    "q_window_analytic" -> qWindowAnalytic,
    "q_gapfill" -> qGapfill,
    "q_topk_orders" -> qTopkOrders)

  val oracles: Map[String, String] = Map(
    "q_custdist" ->
      """SELECT n_orders, COUNT(*) AS n_custs FROM (
        |  SELECT c_custkey, COUNT(o_orderkey) AS n_orders
        |  FROM customer LEFT JOIN orders ON c_custkey = o_custkey
        |  GROUP BY 1)
        |GROUP BY 1 ORDER BY n_custs DESC, n_orders DESC""".stripMargin,
    "q_zorder" -> zorderSql,
    "q_window_range" ->
      """WITH ev AS (
        |  SELECT user_id, event_id, epoch_us(CAST(ts AS TIMESTAMP)) AS us,
        |    CAST(value AS DECIMAL(12,2)) AS v
        |  FROM events WHERE user_id % 20 = 0)
        |SELECT user_id, event_id,
        |  COUNT(*) OVER w AS n_1h,
        |  CAST(SUM(v) OVER w AS DOUBLE) AS sum_1h
        |FROM ev
        |WINDOW w AS (PARTITION BY user_id ORDER BY us
        |  RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
        |ORDER BY user_id, event_id""".stripMargin,
    "q_histogram" ->
      """WITH b AS (
        |  SELECT CAST(CASE WHEN o_totalprice < 0 THEN 0
        |              WHEN o_totalprice >= 600000 THEN 11
        |              ELSE 1 + floor(o_totalprice / 60000.0) END AS BIGINT)
        |    AS bucket,
        |    CAST(o_totalprice AS DECIMAL(12,2)) AS p
        |  FROM orders)
        |SELECT bucket, COUNT(*) AS n_orders,
        |  CAST(SUM(p) AS DOUBLE) AS mass
        |FROM b GROUP BY bucket ORDER BY bucket""".stripMargin,
    "q_scd2" ->
      """WITH ev AS (
        |  SELECT user_id, event_id, event_type, CAST(ts AS TIMESTAMP) AS ts
        |  FROM events WHERE user_id % 25 = 0),
        |g AS (SELECT *, lag(event_type) OVER
        |        (PARTITION BY user_id ORDER BY ts, event_id) AS prev_type
        |      FROM ev),
        |ch AS (SELECT * FROM g
        |       WHERE prev_type IS NULL OR prev_type <> event_type),
        |v AS (SELECT user_id, event_type, ts,
        |        CAST(row_number() OVER (PARTITION BY user_id
        |          ORDER BY ts, event_id) AS INT) AS version,
        |        lead(ts) OVER (PARTITION BY user_id
        |          ORDER BY ts, event_id) AS valid_to
        |      FROM ch)
        |SELECT user_id, version, event_type, ts AS valid_from, valid_to
        |FROM v ORDER BY user_id, version""".stripMargin,
    "q_sessionize" ->
      """WITH ev AS (
        |  SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts
        |  FROM events WHERE user_id % 10 = 0),
        |g AS (SELECT *, lag(epoch_us(ts)) OVER
        |        (PARTITION BY user_id ORDER BY ts, event_id) AS prev_us
        |      FROM ev),
        |n AS (SELECT *, CASE WHEN prev_us IS NULL
        |        OR epoch_us(ts) - prev_us > 1800000000 THEN 1 ELSE 0 END
        |        AS new_sess
        |      FROM g),
        |s AS (SELECT *, SUM(new_sess) OVER (PARTITION BY user_id
        |        ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS sess
        |      FROM n)
        |SELECT user_id, CAST(sess AS BIGINT) AS sess, COUNT(*) AS n_events,
        |  MIN(ts) AS start_ts, MAX(ts) AS end_ts,
        |  epoch_us(MAX(ts)) - epoch_us(MIN(ts)) AS duration_us
        |FROM s GROUP BY user_id, sess ORDER BY user_id, sess""".stripMargin,
    "q_gapfill" ->
      """WITH ev AS (SELECT * FROM events WHERE user_id % 30 = 0),
        |ranked AS (
        |  SELECT user_id, date_trunc('hour', ts) AS hour, value,
        |    row_number() OVER (PARTITION BY user_id, date_trunc('hour', ts)
        |      ORDER BY ts DESC, event_id DESC) AS rn
        |  FROM ev),
        |hl AS (SELECT user_id, hour, value AS hour_last FROM ranked WHERE rn = 1),
        |hourly AS (
        |  SELECT user_id, date_trunc('hour', ts) AS hour, COUNT(*) AS n_events,
        |    CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS sum_value
        |  FROM ev GROUP BY 1, 2),
        |bounds AS (
        |  SELECT user_id, date_trunc('hour', MIN(ts)) AS h0,
        |    date_trunc('hour', MAX(ts)) AS h1
        |  FROM ev GROUP BY 1),
        |spine AS (
        |  SELECT user_id, unnest(generate_series(h0, h1, INTERVAL 1 HOUR)) AS hour
        |  FROM bounds)
        |SELECT s.user_id, s.hour,
        |  COALESCE(h.n_events, 0) AS n_events,
        |  COALESCE(h.sum_value, 0.0) AS sum_value,
        |  last_value(hl.hour_last IGNORE NULLS)
        |    OVER (PARTITION BY s.user_id ORDER BY s.hour) AS filled_value
        |FROM spine s
        |LEFT JOIN hourly h ON s.user_id = h.user_id AND s.hour = h.hour
        |LEFT JOIN hl ON s.user_id = hl.user_id AND s.hour = hl.hour
        |ORDER BY s.user_id, s.hour""".stripMargin,
    "q_topk_groups" ->
      """WITH r AS (
        |  SELECT o_orderpriority, o_orderkey, o_totalprice,
        |    row_number() OVER (PARTITION BY o_orderpriority
        |      ORDER BY o_totalprice DESC, o_orderkey) AS rn
        |  FROM orders)
        |SELECT o_orderpriority, o_orderkey, o_totalprice
        |FROM r WHERE rn <= 3
        |ORDER BY o_orderpriority, o_totalprice DESC, o_orderkey""".stripMargin,
    "q_exists_subquery" ->
      """SELECT c_custkey, c_name FROM customer c
        |WHERE EXISTS (SELECT 1 FROM orders o
        |        WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 400000)
        |  AND NOT EXISTS (SELECT 1 FROM orders o
        |        WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'F')
        |ORDER BY c_custkey""".stripMargin,
    "q_lateral_explode" ->
      """WITH tok AS (
        |  SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
        |i AS (SELECT doc_id, toks,
        |        unnest(generate_series(1, least(3, len(toks)))) AS i
        |      FROM tok)
        |SELECT doc_id, CAST(i - 1 AS INT) AS pos, toks[i] AS tok
        |FROM i ORDER BY doc_id, pos""".stripMargin,
    "q1_agg" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_base_price,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS sum_disc_price,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(4,2))) * (1 + CAST(l_tax AS DECIMAL(4,2)))) AS DOUBLE) AS sum_charge,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*) AS avg_qty,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*) AS avg_price,
        |  COUNT(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '2000-12-01'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q3_top_revenue" ->
      """SELECT o_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate,
        |  o_orderpriority,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS revenue
        |FROM customer, orders, lineitem
        |WHERE c_mktsegment = 'BUILDING' AND c_custkey = o_custkey
        |  AND l_orderkey = o_orderkey AND o_orderdate < TIMESTAMP '1998-01-01'
        |GROUP BY o_orderkey, o_orderdate, o_orderpriority
        |ORDER BY revenue DESC, o_orderkey LIMIT 10""".stripMargin,
    "q6_filter_sum" ->
      """SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(l_discount AS DECIMAL(4,2))) AS DOUBLE) AS revenue
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
        |  AND l_discount BETWEEN 0.02 AND 0.04 AND l_quantity < 24""".stripMargin,
    "q_semi_join" ->
      """SELECT o_orderkey, o_orderstatus FROM orders
        |WHERE EXISTS (SELECT 1 FROM lineitem
        |  WHERE l_orderkey = o_orderkey AND l_quantity > 45)
        |ORDER BY o_orderkey""".stripMargin,
    "q_anti_join" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders
        |  WHERE o_custkey = c_custkey AND o_orderstatus = 'P')
        |ORDER BY c_custkey""".stripMargin,
    "q_window_rank" ->
      """SELECT c_nationkey, rn, c_custkey, c_acctbal FROM (
        |  SELECT c_nationkey, c_custkey, c_acctbal,
        |    row_number() OVER (PARTITION BY c_nationkey
        |      ORDER BY c_acctbal DESC, c_custkey) AS rn
        |  FROM customer) WHERE rn <= 3
        |ORDER BY c_nationkey, rn""".stripMargin,
    "q_window_running" ->
      """SELECT o_custkey, o_orderkey,
        |  strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) OVER (
        |    PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) OVER (
        |    PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |    ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS DOUBLE) AS mov3,
        |  lag(o_orderkey, 1) OVER (
        |    PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS prev_key,
        |  lead(o_totalprice, 1) OVER (
        |    PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS next_price,
        |  rank() OVER (
        |    PARTITION BY o_custkey ORDER BY o_orderpriority, o_orderkey) AS prio_rank
        |FROM orders ORDER BY o_custkey, o_orderkey""".stripMargin,
    "q_window_analytic" ->
      """SELECT o_custkey, o_orderkey,
        |  first_value(o_orderkey) OVER w AS first_key,
        |  last_value(o_orderkey) OVER (PARTITION BY o_custkey
        |    ORDER BY o_orderdate, o_orderkey
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS last_key,
        |  ntile(4) OVER w AS quartile,
        |  percent_rank() OVER w AS pct_rank,
        |  cume_dist() OVER w AS cume,
        |  nth_value(o_orderkey, 2) OVER (PARTITION BY o_custkey
        |    ORDER BY o_orderdate, o_orderkey
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS second_key
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
        |ORDER BY o_custkey, o_orderkey""".stripMargin,
    "q_topk_orders" ->
      """SELECT o_orderkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""".stripMargin)
}
