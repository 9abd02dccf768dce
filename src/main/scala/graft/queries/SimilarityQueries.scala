package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables.t
import graft.operators.Similarity

/** Similarity-search coverage: exact brute-force cosine top-k (oracle
  * against DuckDB's list_inner_product on DOUBLE[], both sides sequential
  * double accumulation) and the LSH-bucketed ANN variant (rows-only; recall
  * asserted in tests).
  */
object SimilarityQueries {

  def simTopk(spark: SparkSession, dir: String): DataFrame =
    Similarity.bruteForceTopK(t(spark, dir, "embeddings"),
        probeFilter = col("vec_id") % 100 === 0, k = 5)
      .orderBy("qid", "rank")

  def simAnnLsh(spark: SparkSession, dir: String): DataFrame =
    Similarity.annLsh(t(spark, dir, "embeddings"),
        probeFilter = col("vec_id") % 100 === 0, k = 5)
      .orderBy("qid", "rank")

  def simIvf(spark: SparkSession, dir: String): DataFrame =
    Similarity.ivfTopK(t(spark, dir, "embeddings"),
        probeFilter = col("vec_id") % 100 === 0, k = 5)
      .orderBy("qid", "rank")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "sim_topk" -> simTopk,
    "sim_ann_lsh" -> simAnnLsh,
    "sim_ivf" -> simIvf)

  val oracles: Map[String, String] = Map(
    "sim_topk" ->
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |p AS (SELECT q.vec_id AS qid, c.vec_id AS nid,
        |        list_inner_product(q.v, c.v) /
        |          (sqrt(list_inner_product(q.v, q.v)) * sqrt(list_inner_product(c.v, c.v))) AS cos
        |      FROM e q JOIN e c ON q.vec_id % 100 = 0 AND c.vec_id <> q.vec_id),
        |r AS (SELECT qid, nid, cos,
        |        row_number() OVER (PARTITION BY qid ORDER BY cos DESC, nid) AS rn
        |      FROM p)
        |SELECT qid, rn AS rank, nid, cos FROM r WHERE rn <= 5
        |ORDER BY qid, rank""".stripMargin)
    // sim_ann_lsh: hyperplanes derive from xxhash64 -> rows-only.
}
