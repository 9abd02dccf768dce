package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
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
    * ONE aggregation on dst. Nodes travel as LONGS (even = 2·custkey,
    * odd = 2·suppkey+1; the c…/s… labels materialize only at output), so
    * every shuffle, sort, and hash runs on fixed-width keys. The edge
    * relation is built once and STAGED as a catalog table BUCKETED on
    * `src` (r11; the `q_bucketed_join` machinery) with bucket count =
    * the session's shuffle partitions: the bucketed parquet scan reports
    * hash partitioning on src to the planner, so the degree/initial-score
    * aggregates and every iteration's edge side are exchange-free — and,
    * unlike the previous DISK_ONLY cache, warm passes re-read a
    * vectorized columnar scan instead of deserializing InMemoryRelation
    * blocks (which was this query's dominant GC source, BENCH_FULL_r10
    * gc2 = 2.09 s).
    *
    * The score side is exchange-free too: iteration N's scores leave the
    * dst-aggregation hash-partitioned on `node` with shuffle-partition
    * fan-out equal to the bucket count, which is exactly the
    * co-partitioning the next iteration's `src === node` join needs
    * against the bucketed edge scan. A SHUFFLE_HASH hint keeps AQE from
    * demoting that to a per-round broadcast (at test scale the score table
    * is tiny, so AQE would collect it to the driver and rebroadcast EVERY
    * iteration — a plan that dies at real node counts; the hinted shuffled
    * hash join instead builds a partition-local map from score rows already
    * sitting in place, no driver round-trip, no exchange on either side).
    *
    * Per iteration the ONLY exchange is the dst-aggregation's — PageRank's
    * scatter step, where contribution rows genuinely change key
    * (src-partitioned to dst-partitioned). That exchange is NOT deletable
    * by any layout choice: PageRank is a sparse matrix–vector multiply,
    * and moving each partial score sum from the partition owning the edge
    * to the partition owning its destination IS the algorithm's
    * communication — a lower bound, not an artifact (what the map-side
    * partial aggregate already minimizes: at most partitions × distinct
    * dst rows cross the wire, never the edge count). SURVEY §9's earlier
    * "bucket edges on src to delete the remaining score exchange" claimed
    * more than that; corrected there. A fixed iteration count keeps plan
    * depth constant.
    */
  def qPagerank(spark: SparkSession, dir: String): DataFrame = {
    // bucket count must equal the session's shuffle fan-out or the score
    // side loses co-partitioning (and with it the exchange-free join)
    val buckets = spark.sessionState.conf.numShufflePartitions
    graft.Caches.stagedPath("pagerank_edges",
        s"$dir@$buckets@${System.identityHashCode(spark)}") { loc =>
      spark.sql("DROP TABLE IF EXISTS graft_pr_edges_bkt")
      val li = t(spark, dir, "lineitem")
        .select(col("l_orderkey"), col("l_suppkey"))
      val ord = t(spark, dir, "orders")
        .select(col("o_orderkey"), col("o_custkey"))
      val pairs = li.join(ord, col("l_orderkey") === col("o_orderkey"))
        .select((col("o_custkey") * 2).as("cust"),
          (col("l_suppkey") * 2 + 1).as("supp"))
        .distinct()
      val edges = pairs.select(col("cust").as("src"), col("supp").as("dst"))
        .unionByName(pairs.select(col("supp").as("src"), col("cust").as("dst")))
      // r18: outdeg as a COUNT WINDOW over the same src clustering the
      // write needs, instead of a separate aggregate + join — the degree
      // attach then rides the one exchange the bucketed write pays anyway
      // (was: deg shuffle + edges join shuffle + write repartition).
      // repartition on the bucket key: bucket hashing and repartition
      // hashing agree, so each bucket lands in exactly one file
      edges
        .repartition(buckets, col("src"))
        .withColumn("outdeg", count(lit(1))
          .over(Window.partitionBy(col("src"))))
        .write.bucketBy(buckets, "src")
        .option("path", s"$loc/edges").saveAsTable("graft_pr_edges_bkt")
    }
    val withDeg = spark.table("graft_pr_edges_bkt")
    var score = withDeg.select(col("src").as("node")).distinct()
      .withColumn("score", lit(1000000000000L))
    for (_ <- 1 to 3) {
      score = withDeg.join(score.hint("shuffle_hash"),
          col("src") === col("node"))
        .select(col("dst"), expr(
          "(cast(score as decimal(38,0)) * 85) div (100 * outdeg)").as("c"))
        .groupBy(col("dst").as("node"))
        .agg((lit(150000000000L) + sum(col("c"))).as("score"))
    }
    score.select(
        expr("concat(if(node % 2 = 0, 'c', 's'), cast(node div 2 as string))")
          .as("node"),
        col("score"))
      .orderBy("node")
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
