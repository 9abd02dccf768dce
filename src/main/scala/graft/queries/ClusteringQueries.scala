package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.Tables.t
import graft.operators.Clustering

/** Full-corpus k-means coverage (see [[graft.operators.Clustering]]): the
  * whole pipeline is exact integer arithmetic, so the DuckDB oracle unrolls
  * the SAME Lloyd iterations as recursive-free CTEs (the way `q_pagerank`'s
  * oracle unrolls its three propagation rounds) and the final assignment
  * hash-matches cell-exactly — something float k-means can never promise.
  */
object ClusteringQueries {

  def clusterKmeans(spark: SparkSession, dir: String): DataFrame =
    Clustering.kmeansAssign(t(spark, dir, "embeddings"), k = 8, iters = 2)
      .orderBy("vec_id")

  def clusterProfile(spark: SparkSession, dir: String): DataFrame =
    Clustering.kmeansProfile(t(spark, dir, "embeddings"), k = 8, iters = 2)
      .orderBy("cluster")

  def clusterSample(spark: SparkSession, dir: String): DataFrame =
    Clustering.kmeansSample(t(spark, dir, "embeddings"), k = 8, iters = 2,
        perCluster = 25)
      .orderBy("cluster", "rn")

  /** The unrolled Lloyd CTE chain, mirroring [[Clustering.kmeansAssign]]
    * step for step, independently: quantize → deterministic md5 init →
    * per-iteration (assign via exact n²-scaled distance + (dist, cl)
    * tie-break, then re-aggregate exact (n, per-dim sum) centroids). The
    * last CTE `af` is the final assignment (vec_id, q, cl).
    */
  private def lloydCtes(k: Int, iters: Int, scale: Int): String = {
    val sb = new StringBuilder
    sb ++= s"""q AS (SELECT vec_id,
      |        list_transform(CAST(embedding AS DOUBLE[]),
      |          x -> CAST(floor(x * $scale) AS BIGINT)) AS q
      |      FROM embeddings),
      |init AS (SELECT q,
      |        row_number() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR)),
      |          vec_id) - 1 AS cl
      |      FROM q),
      |c0 AS (SELECT cl, CAST(1 AS BIGINT) AS n, q AS s
      |       FROM init WHERE cl < $k)""".stripMargin
    // one (assign, update) pair per iteration, plus the final assign-only
    // pass against the last centroids — exactly the Scala loop's shape
    for (i <- 1 to iters + 1) {
      val cents = s"c${i - 1}"
      sb ++= s""",
        |d$i AS (SELECT v.vec_id, v.q, c.cl,
        |        CAST(list_sum(list_transform(generate_series(1, len(v.q)),
        |          i -> (c.n * v.q[i] - c.s[i]) * (c.n * v.q[i] - c.s[i])))
        |          AS DOUBLE) / CAST(c.n * c.n AS DOUBLE) AS dist
        |      FROM q v CROSS JOIN $cents c),
        |a$i AS (SELECT vec_id, q, cl FROM (
        |        SELECT vec_id, q, cl, row_number() OVER (
        |          PARTITION BY vec_id ORDER BY dist, cl) AS rn FROM d$i)
        |      WHERE rn = 1)""".stripMargin
      if (i <= iters) sb ++= s""",
        |n$i AS (SELECT cl, COUNT(*) AS n FROM a$i GROUP BY cl),
        |x$i AS (SELECT cl, unnest(q) AS x,
        |        unnest(generate_series(1, len(q))) AS pos FROM a$i),
        |s$i AS (SELECT cl, pos, CAST(SUM(x) AS BIGINT) AS sx
        |      FROM x$i GROUP BY cl, pos),
        |c$i AS (SELECT s$i.cl, n$i.n, list(sx ORDER BY pos) AS s
        |      FROM s$i JOIN n$i USING (cl) GROUP BY s$i.cl, n$i.n)""".stripMargin
    }
    sb ++= s""",
      |af AS (SELECT vec_id, cl FROM a${iters + 1})""".stripMargin
    sb.toString
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_cluster_kmeans" -> clusterKmeans,
    "q_cluster_profile" -> clusterProfile,
    "samp_cluster" -> clusterSample)

  val oracles: Map[String, String] = Map(
    "q_cluster_kmeans" ->
      s"""WITH ${lloydCtes(k = 8, iters = 2, scale = 1000)}
        |SELECT vec_id, cl AS cluster FROM af ORDER BY vec_id""".stripMargin,
    "q_cluster_profile" ->
      s"""WITH ${lloydCtes(k = 8, iters = 2, scale = 1000)}
        |SELECT af.cl AS cluster, COUNT(*) AS n_members,
        |  COUNT(DISTINCT e.label) AS n_labels,
        |  MIN(e.vec_id) AS min_vec, MAX(e.vec_id) AS max_vec
        |FROM af JOIN embeddings e USING (vec_id)
        |GROUP BY af.cl ORDER BY cluster""".stripMargin,
    "samp_cluster" ->
      s"""WITH ${lloydCtes(k = 8, iters = 2, scale = 1000)},
        |r AS (SELECT cl AS cluster, vec_id, row_number() OVER (
        |        PARTITION BY cl ORDER BY md5(CAST(vec_id AS VARCHAR)),
        |        vec_id) AS rn
        |      FROM af)
        |SELECT cluster, rn, vec_id FROM r WHERE rn <= 25
        |ORDER BY cluster, rn""".stripMargin)
}
