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

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_funnel" -> qFunnel,
    "q_cohort" -> qCohort)

  val oracles: Map[String, String] = Map(
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
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)
}
