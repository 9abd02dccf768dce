package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables.t

/** Iterative graph analytics over a derived relation graph.
  *
  * The reference has no graph surface at all; the engine already walks
  * dup-pair graphs to connected components (`operators.Dedup`). This module
  * adds the other canonical iterative-join algorithm — PageRank — over the
  * customer–supplier trade graph, formulated so the fixed-point iterations
  * are EXACT-INTEGER and therefore DuckDB-oracle hash-checkable (a float
  * PageRank would drift in the last bits between engines).
  */
object GraphQueries {

  /** Integer PageRank (damping 0.85, 3 synchronous iterations) over the
    * undirected customer–supplier graph induced by lineitem x orders.
    *
    * Exactness: scores start at SCALE=10^12 and every update is
    * `base + SUM((score * 85) div (100 * outdeg))` in decimal(38,0)/BIGINT
    * integral arithmetic — floor division loses mass deterministically, and
    * integer addition is order-independent, so Spark and the oracle's three
    * unrolled CTE iterations agree bit-for-bit. No float ever appears.
    *
    * Scale: the classic distributed PageRank shape — per iteration ONE join
    * of the (src, dst, outdeg) edge relation against the score table plus
    * ONE aggregation on dst. The edge relation is built ONCE and
    * `localCheckpoint`-ed (the star-CC loop's pattern — AQE does not reuse
    * the exchange across iteration subtrees, so without it every iteration
    * re-runs the lineitem x orders join: 28 scans in the observed plan vs 2
    * after), hash-partitioned on src so each iteration's join co-locates
    * against it. Scores are (node, long) rows: nothing wider than short ids
    * + counters ever shuffles, and a fixed iteration count keeps plan depth
    * constant. At a real 100 TB the same loop runs with edges bucketed on
    * src so even the per-iteration join exchange disappears (see
    * q_bucketed_join).
    */
  def qPagerank(spark: SparkSession, dir: String): DataFrame = {
    val li = t(spark, dir, "lineitem").select(col("l_orderkey"), col("l_suppkey"))
    val ord = t(spark, dir, "orders").select(col("o_orderkey"), col("o_custkey"))
    val pairs = li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .select(concat(lit("c"), col("o_custkey").cast("string")).as("cust"),
        concat(lit("s"), col("l_suppkey").cast("string")).as("supp"))
      .distinct()
    val edges = pairs.select(col("cust").as("src"), col("supp").as("dst"))
      .unionByName(pairs.select(col("supp").as("src"), col("cust").as("dst")))
      .repartition(col("src"))
      .localCheckpoint()
    val deg = edges.groupBy("src").agg(count(lit(1)).as("outdeg"))
    val withDeg = edges.join(deg, "src").localCheckpoint()
    var score = deg.select(col("src").as("node"),
      lit(1000000000000L).as("score"))
    for (_ <- 1 to 3) {
      score = withDeg.join(score, col("src") === col("node"))
        .select(col("dst"), expr(
          "(cast(score as decimal(38,0)) * 85) div (100 * outdeg)").as("c"))
        .groupBy(col("dst").as("node"))
        .agg((lit(150000000000L) + sum(col("c"))).as("score"))
    }
    score.orderBy("node")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_pagerank" -> qPagerank)

  val oracles: Map[String, String] = Map(
    "q_pagerank" ->
      """WITH pairs AS (
        |  SELECT DISTINCT 'c' || o_custkey AS cust, 's' || l_suppkey AS supp
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
        |edges AS (
        |  SELECT cust AS src, supp AS dst FROM pairs
        |  UNION ALL
        |  SELECT supp AS src, cust AS dst FROM pairs),
        |deg AS (SELECT src, COUNT(*) AS outdeg FROM edges GROUP BY 1),
        |s0 AS (SELECT src AS node, CAST(1000000000000 AS HUGEINT) AS score
        |       FROM deg),
        |s1 AS (SELECT e.dst AS node, 150000000000 +
        |         SUM((s.score * 85) // (100 * d.outdeg)) AS score
        |       FROM edges e JOIN s0 s ON e.src = s.node
        |       JOIN deg d ON e.src = d.src GROUP BY 1),
        |s2 AS (SELECT e.dst AS node, 150000000000 +
        |         SUM((s.score * 85) // (100 * d.outdeg)) AS score
        |       FROM edges e JOIN s1 s ON e.src = s.node
        |       JOIN deg d ON e.src = d.src GROUP BY 1),
        |s3 AS (SELECT e.dst AS node, 150000000000 +
        |         SUM((s.score * 85) // (100 * d.outdeg)) AS score
        |       FROM edges e JOIN s2 s ON e.src = s.node
        |       JOIN deg d ON e.src = d.src GROUP BY 1)
        |SELECT node, CAST(score AS BIGINT) AS score
        |FROM s3 ORDER BY node""".stripMargin)
}
