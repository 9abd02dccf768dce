package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Product-analytics operator coverage over the events table: ordered-step
  * funnels and cohort retention — the two canonical clickstream reports.
  */
object AnalyticsQueries {

  /** Ordered conversion funnel view -> click -> purchase: a user counts at
    * a stage only if the stage's event happened strictly AFTER their entry
    * into the previous stage (the MATCH_RECOGNIZE-ish sequence semantics,
    * not mere per-type existence).
    *
    * Report: one row per stage with converted-user counts and the summed
    * conversion gap (exact integer micros, so the double rate divides the
    * same bits on both engines).
    *
    * Scale: three per-user min-aggregates chained by user_id equi-joins —
    * every intermediate is user-sized, not event-sized; all three stages
    * cluster on user_id so AQE coalesces the exchanges, and nothing wider
    * than (user, ts) shuffles.
    */
  def qFunnel(spark: SparkSession, dir: String): DataFrame = {
    val ev = graft.Tables.events(spark, dir)
      .select(col("user_id"), col("event_type"), col("ts"))
    val v = ev.filter(col("event_type") === "view")
      .groupBy("user_id").agg(min(unix_micros(col("ts"))).as("t1"))
    val c = ev.filter(col("event_type") === "click")
      .join(v, "user_id").filter(unix_micros(col("ts")) > col("t1"))
      .groupBy("user_id").agg(min(unix_micros(col("ts"))).as("t2"),
        min(col("t1")).as("t1"))
    val p = ev.filter(col("event_type") === "purchase")
      .join(c, "user_id").filter(unix_micros(col("ts")) > col("t2"))
      .groupBy("user_id").agg(min(unix_micros(col("ts"))).as("t3"),
        min(col("t2")).as("t2"))
    val s1 = v.agg(count(lit(1)).as("n_users"),
      lit(0L).as("sum_gap_us")).select(lit("1_view").as("stage"),
      col("n_users"), col("sum_gap_us"))
    val s2 = c.agg(count(lit(1)).as("n_users"),
      sum(col("t2") - col("t1")).as("sum_gap_us"))
      .select(lit("2_click").as("stage"), col("n_users"), col("sum_gap_us"))
    val s3 = p.agg(count(lit(1)).as("n_users"),
      sum(col("t3") - col("t2")).as("sum_gap_us"))
      .select(lit("3_purchase").as("stage"), col("n_users"), col("sum_gap_us"))
    s1.unionByName(s2).unionByName(s3).orderBy("stage")
  }

  /** Cohort retention: users cohort by the week of their FIRST event; each
    * (cohort week, week offset) cell counts distinct users active that
    * week — the standard retention triangle.
    *
    * Scale: first-event week is one per-user aggregate; activity weeks
    * dedupe per (user, week) with map-side partials absorbing repeat
    * events; the final cell count is a bounded (weeks x offsets) grid.
    */
  def qCohort(spark: SparkSession, dir: String): DataFrame = {
    val ev = graft.Tables.events(spark, dir)
      .select(col("user_id"), date_trunc("week", col("ts")).as("week"))
    val cohort = ev.groupBy("user_id").agg(min(col("week")).as("cohort_week"))
    val active = ev.distinct()
    active.join(cohort, "user_id")
      .withColumn("week_offset",
        (datediff(col("week"), col("cohort_week")) / 7).cast("int"))
      .groupBy(col("cohort_week"), col("week_offset"))
      .agg(count_distinct(col("user_id")).as("n_users"))
      .orderBy("cohort_week", "week_offset")
  }

  /** Markov transition matrix over the event stream: for every user, each
    * consecutive (event, next event) pair counts one transition — the
    * input to "where do users go after X" product questions and to
    * first-order behavioral simulators.
    *
    * Scale: ONE clustering exchange on user_id serves the lead() window;
    * ties break on the unique event_id so the successor is total-order
    * deterministic. The output is the (types x types) grid — constant-size
    * regardless of corpus scale — and nothing wider than
    * (user, type, next_type) survives the window projection.
    */
  def qEventTransitions(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ev = graft.Tables.events(spark, dir)
      .select(col("user_id"), col("event_id"), col("event_type"),
        unix_micros(col("ts")).as("us"))
    val w = Window.partitionBy("user_id").orderBy(col("us"), col("event_id"))
    ev.withColumn("to_type", lead(col("event_type"), 1).over(w))
      .filter(col("to_type").isNotNull)
      .groupBy(col("event_type").as("from_type"), col("to_type"))
      .agg(count(lit(1)).as("n_trans"),
        count_distinct(col("user_id")).as("n_users"))
      .orderBy("from_type", "to_type")
  }

  /** Exact-integer z-score outlier screen: per event type, flag events
    * whose value sits more than 3 sigma from the type mean. All arithmetic
    * is integral — values quantize to cents via floor(value*100) and the
    * 3-sigma test rearranges to (n*x - s)^2 > 9*(n*q - s^2) over
    * scale-0 decimals — so Spark and the oracle agree bit-for-bit with no
    * float variance/stddev drift.
    *
    * Scale: two narrow passes over events. Pass one reduces to a
    * per-type (n, s, q) stats row (map-side partials, constant output);
    * pass two re-scans with the type-count-sized stats table BROADCAST —
    * no event-sized shuffle anywhere, and the plan is the canonical
    * "aggregate-then-rejoin-small" shape that survives any corpus size.
    */
  def qOutliers(spark: SparkSession, dir: String): DataFrame = {
    val d38 = org.apache.spark.sql.types.DecimalType(38, 0)
    val ev = graft.Tables.events(spark, dir)
      .select(col("event_type"), floor(col("value") * lit(100)).as("x"))
    val xd = col("x").cast(d38)
    val stats = ev.groupBy("event_type").agg(
      count(lit(1)).cast(d38).as("n"),
      sum(xd).cast(d38).as("s"),
      sum(xd * xd).cast(d38).as("q"))
    val dev = col("n") * xd - col("s")
    val isOut = dev * dev > lit(9).cast(d38) *
      (col("n") * col("q") - col("s") * col("s"))
    ev.join(broadcast(stats), "event_type")
      .groupBy("event_type")
      .agg(max(col("n")).cast("long").as("n_events"),
        sum(when(isOut, 1L).otherwise(0L)).as("n_outliers"),
        min(when(isOut, col("x"))).as("min_outlier"),
        max(when(isOut, col("x"))).as("max_outlier"))
      .orderBy("event_type")
  }

  /** Equi-depth (equal-count) histogram of lineitem prices: 10 buckets
    * with |n/10| rows each, reported as (bucket, row count, price span) —
    * the quantile-sliced view a cost-based optimizer or a pricing
    * dashboard wants, where equal-WIDTH buckets (q_histogram) would pile
    * 90% of rows into one bar on a skewed distribution.
    *
    * Scale: exact global rank WITHOUT a single-task global sort — the
    * two-phase range-partition pattern: repartitionByRange gives ordered
    * disjoint partitions, a partition-count-sized count collect (one row
    * per partition) turns local row numbers into exact global ranks inside one
    * mapPartitions, and bucket = (rank-1)*k div n. The only driver-side
    * state is one row per partition; at 100 TB that is a few thousand
    * longs, while a window-function ntile() would funnel every row
    * through ONE task.
    */
  def qEquidepth(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val k = 10
    // r18: range-partition by PRICE ALONE. The reported columns (per-bucket
    // count, min, max of price) are invariant to how equal prices are
    // ordered against each other: a tie run straddling a rank cut puts the
    // same price value on both sides whichever row crosses, so the
    // okey/lnum tiebreak columns bought determinism the output never
    // observes — dropping them halves the shuffled bytes (19.2 -> ~9 MB,
    // guide §2.3 "narrower types/columns"). Partition count follows the
    // session (was a hardcoded 32 — a local-mode constant; guide §2 wants
    // scale-adaptive partitioning).
    val ranged = spark.read.parquet(s"$dir/lineitem.parquet")
      .select(col("l_extendedprice").as("price"))
      .repartitionByRange(spark.sparkContext.defaultParallelism, col("price"))
      .sortWithinPartitions("price")
      .withColumn("pid", spark_partition_id())
      .persist()
    try {
      val counts = ranged.groupBy("pid").count().collect()
        .map(r => r.getInt(0) -> r.getLong(1)).sortBy(_._1)
      val n = counts.map(_._2).sum
      val offsets = counts.map(_._1)
        .zip(counts.map(_._2).scanLeft(0L)(_ + _)).toMap
      val bOff = spark.sparkContext.broadcast(offsets)
      // The aggregate is OUTPUT-sized (k rows) — materialize it eagerly so
      // the persisted input can be released before the query returns.
      val buckets = ranged.as[(Double, Int)]
        .mapPartitions { it =>
          var local = 0L
          it.map { case (price, pid) =>
            local += 1
            (bOff.value(pid) + local, price)
          }
        }
        .toDF("rank", "price")
        .withColumn("bucket", expr(s"cast(((rank - 1) * $k) div $n as int)"))
        .groupBy("bucket")
        .agg(count(lit(1)).as("n_rows"),
          min(col("price")).as("min_price"),
          max(col("price")).as("max_price"))
        .orderBy("bucket")
        .as[(Int, Long, Double, Double)].collect().toSeq
      buckets.toDF("bucket", "n_rows", "min_price", "max_price")
    } finally ranged.unpersist(blocking = false)
  }

  /** Daily / trailing-7-day active users (DAU/WAU) + integer stickiness —
    * the dashboard headline metric whose naive form (COUNT(DISTINCT) OVER
    * a RANGE frame) most engines either reject or execute by buffering
    * every row per frame.
    *
    * Scalable formulation: pre-distinct to (user, day) FIRST — the only
    * corpus-sized aggregation, map-side-combining to at most users×days
    * rows — then interval-join that small relation to the day spine
    * (spine is output-sized and broadcast; fan-out ≤ 7 per user-day) and
    * count distincts inside each spine day. Stickiness is exact-integer
    * permille ((dau*1000) div wau) — no float ratio drift.
    */
  def qDauWau(spark: SparkSession, dir: String): DataFrame = {
    val ud = graft.Tables.events(spark, dir)
      .select(col("user_id"), to_date(col("ts")).as("day"))
      .distinct()
    val spine = ud.select(col("day").as("d")).distinct()
    ud.join(broadcast(spine),
        datediff(col("d"), col("day")).between(0, 6))
      .groupBy(col("d"))
      .agg(
        count_distinct(when(col("day") === col("d"), col("user_id")))
          .as("dau"),
        count_distinct(col("user_id")).as("wau"))
      .withColumn("stickiness_pm", expr("(dau * 1000) div wau"))
      .select(date_format(col("d"), "yyyy-MM-dd").as("day"),
        col("dau"), col("wau"), col("stickiness_pm"))
      .orderBy("day")
  }

  /** Sequence-pattern matching (MATCH_RECOGNIZE-lite): how many users'
    * event streams match each behavioral regex — adjacency ("an error
    * immediately followed by a purchase"), repetition ("three consecutive
    * views"), and gapped order ("signup then eventually purchase") — the
    * pattern classes the funnel's strictly-after min-aggregates cannot
    * express.
    *
    * Mechanics: ONE clustering exchange collects each user's events; the
    * ordered sequence string is built IN-ROW (array_sort over
    * (us, event_id, type) structs — the same (us, event_id) total order
    * every behavioral query here uses), and all three Java/RE2-common
    * regexes evaluate in the same narrow pass, folded to one 3-row output
    * by a conditional-sum + stack. Per-user state is that user's own
    * event list — bounded by activity, not corpus; a production cap is
    * one `slice(sorted, 1, N)` on the sorted array.
    */
  def qSeqPattern(spark: SparkSession, dir: String): DataFrame = {
    val seq = graft.Tables.events(spark, dir)
      .select(col("user_id"), struct(unix_micros(col("ts")).as("us"),
        col("event_id"), col("event_type")).as("e"))
      .groupBy("user_id")
      .agg(array_join(transform(array_sort(collect_list(col("e"))),
        x => x.getField("event_type")), " ").as("seq"))
    // patterns anchor on TOKEN boundaries ((^| )…( |$)): an unanchored
    // substring would let a future type that merely ends in a known token
    // (e.g. "preview" vs "view") corrupt counts silently — and since the
    // oracle applies the identical regex, the hash check could never
    // catch it. Same anchoring in the DuckDB SQL below.
    seq.agg(
        sum(when(col("seq").rlike("(^| )error purchase( |$)"), 1L)
          .otherwise(0L)).as("error_then_buy"),
        sum(when(col("seq").rlike("(^| )signup (.* )?purchase( |$)"), 1L)
          .otherwise(0L)).as("signup_to_buy"),
        sum(when(col("seq").rlike("(^| )view view view( |$)"), 1L)
          .otherwise(0L)).as("view_burst"))
      .select(expr("""stack(3,
        | 'error_then_buy', error_then_buy,
        | 'signup_to_buy', signup_to_buy,
        | 'view_burst', view_burst) as (pattern, n_users)""".stripMargin))
      .orderBy("pattern")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_seq_pattern" -> qSeqPattern,
    "q_dau_wau" -> qDauWau,
    "q_funnel" -> qFunnel,
    "q_cohort" -> qCohort,
    "q_event_transitions" -> qEventTransitions,
    "q_outliers" -> qOutliers,
    "q_equidepth" -> qEquidepth)

  val oracles: Map[String, String] = Map(
    "q_seq_pattern" ->
      """WITH s AS (SELECT user_id,
        |    string_agg(event_type, ' '
        |      ORDER BY epoch_us(CAST(ts AS TIMESTAMP)), event_id) AS seq
        |  FROM events GROUP BY 1)
        |SELECT * FROM (
        |  SELECT 'error_then_buy' AS pattern, CAST(SUM(CASE WHEN
        |    regexp_matches(seq, '(^| )error purchase( |$)')
        |    THEN 1 ELSE 0 END) AS BIGINT) AS n_users FROM s
        |  UNION ALL
        |  SELECT 'signup_to_buy', CAST(SUM(CASE WHEN
        |    regexp_matches(seq, '(^| )signup (.* )?purchase( |$)')
        |    THEN 1 ELSE 0 END) AS BIGINT) FROM s
        |  UNION ALL
        |  SELECT 'view_burst', CAST(SUM(CASE WHEN
        |    regexp_matches(seq, '(^| )view view view( |$)')
        |    THEN 1 ELSE 0 END) AS BIGINT) FROM s)
        |ORDER BY pattern""".stripMargin,
    "q_dau_wau" ->
      """WITH ud AS (SELECT DISTINCT user_id,
        |    CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day FROM events),
        |sp AS (SELECT DISTINCT day AS d FROM ud)
        |SELECT strftime(d, '%Y-%m-%d') AS day,
        |  COUNT(DISTINCT CASE WHEN day = d THEN user_id END) AS dau,
        |  COUNT(DISTINCT user_id) AS wau,
        |  (COUNT(DISTINCT CASE WHEN day = d THEN user_id END) * 1000)
        |    // COUNT(DISTINCT user_id) AS stickiness_pm
        |FROM ud JOIN sp ON day BETWEEN d - 6 AND d
        |GROUP BY d ORDER BY 1""".stripMargin,
    "q_funnel" ->
      """WITH ev AS (SELECT user_id, event_type,
        |              epoch_us(CAST(ts AS TIMESTAMP)) AS us FROM events),
        |v AS (SELECT user_id, MIN(us) AS t1 FROM ev
        |      WHERE event_type = 'view' GROUP BY 1),
        |c AS (SELECT e.user_id, MIN(e.us) AS t2, MIN(v.t1) AS t1
        |      FROM ev e JOIN v ON e.user_id = v.user_id
        |      WHERE e.event_type = 'click' AND e.us > v.t1 GROUP BY 1),
        |p AS (SELECT e.user_id, MIN(e.us) AS t3, MIN(c.t2) AS t2
        |      FROM ev e JOIN c ON e.user_id = c.user_id
        |      WHERE e.event_type = 'purchase' AND e.us > c.t2 GROUP BY 1)
        |SELECT '1_view' AS stage, COUNT(*) AS n_users,
        |  CAST(0 AS BIGINT) AS sum_gap_us FROM v
        |UNION ALL
        |SELECT '2_click', COUNT(*), CAST(SUM(t2 - t1) AS BIGINT) FROM c
        |UNION ALL
        |SELECT '3_purchase', COUNT(*), CAST(SUM(t3 - t2) AS BIGINT) FROM p
        |ORDER BY stage""".stripMargin,
    "q_cohort" ->
      """WITH ev AS (SELECT DISTINCT user_id,
        |              date_trunc('week', CAST(ts AS TIMESTAMP)) AS week
        |            FROM events),
        |cohort AS (SELECT user_id, MIN(week) AS cohort_week
        |           FROM ev GROUP BY 1)
        |SELECT cohort_week,
        |  CAST(date_diff('day', cohort_week, week) // 7 AS INT)
        |    AS week_offset,
        |  COUNT(DISTINCT ev.user_id) AS n_users
        |FROM ev JOIN cohort ON ev.user_id = cohort.user_id
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q_event_transitions" ->
      """WITH ev AS (SELECT user_id, event_id, event_type,
        |              epoch_us(CAST(ts AS TIMESTAMP)) AS us FROM events),
        |s AS (SELECT user_id, event_type,
        |        LEAD(event_type) OVER (PARTITION BY user_id
        |          ORDER BY us, event_id) AS to_type
        |      FROM ev)
        |SELECT event_type AS from_type, to_type,
        |  COUNT(*) AS n_trans, COUNT(DISTINCT user_id) AS n_users
        |FROM s WHERE to_type IS NOT NULL
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q_outliers" ->
      """WITH ev AS (SELECT event_type,
        |              CAST(FLOOR(value * 100) AS HUGEINT) AS x FROM events),
        |st AS (SELECT event_type, CAST(COUNT(*) AS HUGEINT) AS n,
        |         SUM(x) AS s, SUM(x * x) AS q
        |       FROM ev GROUP BY 1)
        |SELECT ev.event_type, CAST(ANY_VALUE(n) AS BIGINT) AS n_events,
        |  CAST(SUM(CASE WHEN (n*x - s)*(n*x - s) > 9*(n*q - s*s)
        |           THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers,
        |  CAST(MIN(CASE WHEN (n*x - s)*(n*x - s) > 9*(n*q - s*s)
        |           THEN x END) AS BIGINT) AS min_outlier,
        |  CAST(MAX(CASE WHEN (n*x - s)*(n*x - s) > 9*(n*q - s*s)
        |           THEN x END) AS BIGINT) AS max_outlier
        |FROM ev JOIN st USING (event_type)
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_equidepth" ->
      """WITH r AS (SELECT l_extendedprice AS price,
        |    ROW_NUMBER() OVER (ORDER BY l_extendedprice, l_orderkey,
        |      l_linenumber) AS rn,
        |    (SELECT COUNT(*) FROM lineitem) AS n
        |  FROM lineitem)
        |SELECT CAST((rn - 1) * 10 // n AS INT) AS bucket,
        |  COUNT(*) AS n_rows, MIN(price) AS min_price,
        |  MAX(price) AS max_price
        |FROM r GROUP BY 1 ORDER BY 1""".stripMargin)
}
