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

  def simCentroid(spark: SparkSession, dir: String): DataFrame =
    Similarity.labelCentroids(t(spark, dir, "embeddings"))
      .orderBy("label")

  def simQuantize(spark: SparkSession, dir: String): DataFrame =
    Similarity.quantizedTopK(t(spark, dir, "embeddings"),
        probeFilter = col("vec_id") % 100 === 0, k = 5)
      .orderBy("qid", "rank")

  /** IVF-PQ (IVFADC) serving against a STORED product-quantized index, in
    * the oracle-adjudication mode (the `text_hybrid_route` pattern):
    * exhaustive coarse probe + no rerank cut, so the two-stage
    * ADC-then-exact pipeline — stored codes, per-probe lookup tables, the
    * candidate join, the float re-rank — provably reproduces the
    * brute-force cosine ranking and HASH-checks against the same DuckDB
    * oracle as `sim_topk`. The production-shaped knobs (small nprobe +
    * rerank cut, where PQ error can cost recall but never a wrong score)
    * are recall-floor-asserted in IvfPqSpec, and the ADC scan's
    * vectors-never-read column pruning is plan-pinned there.
    */
  def simIvfPq(spark: SparkSession, dir: String): DataFrame = {
    val emb = t(spark, dir, "embeddings").select("vec_id", "embedding")
    val nCells = 16
    val base = graft.Caches.stagedPath("ivfpq", dir) { p =>
      Similarity.ivfWriteIndex(emb, p, nCells = nCells, pqM = 8, pqK = 16)
    }
    Similarity.pqRoute(emb.filter(col("vec_id") % 100 === 0), base,
        k = 5, nprobe = nCells, rerank = 0)
      // the route's probed_fraction regime signal (1.0 here — exhaustive
      // probe) is dropped so the oracle hash stays on the ranking
      .select("qid", "rank", "nid", "cos")
      .orderBy("qid", "rank")
  }

  /** The FRACTIONAL-rerank IVF-PQ path (r18 — the knob that pins
    * compressed-tier recall at scale) in its own oracle-adjudication
    * mode: exhaustive coarse probe + `rerankFraction = 1.0`, so the
    * per-query proportional cut keeps the ENTIRE ADC pool and the exact
    * float re-rank provably reproduces the brute-force cosine ranking —
    * the df-proportional window-sort branch (pool count + row_number +
    * greatest(rerank*k, ceil(pool*f)) filter) hash-checks against the
    * same DuckDB oracle as `sim_ivfpq`, which exercises the rerank=0
    * branch. Production fractions (0.1) are recall-floor-asserted per
    * decade in AnnScaleSpec.
    */
  def simIvfPqRrf(spark: SparkSession, dir: String): DataFrame = {
    val emb = t(spark, dir, "embeddings").select("vec_id", "embedding")
    val nCells = 16
    val base = graft.Caches.stagedPath("ivfpq", dir) { p =>
      Similarity.ivfWriteIndex(emb, p, nCells = nCells, pqM = 8, pqK = 16)
    }
    Similarity.pqRoute(emb.filter(col("vec_id") % 100 === 0), base,
        k = 5, nprobe = nCells, rerank = 1, rerankFraction = 1.0)
      .select("qid", "rank", "nid", "cos")
      .orderBy("qid", "rank")
  }

  /** METADATA-FILTERED ANN against the stored IVF index — "top-k
    * neighbors among vectors whose label % 3 = 0", the predicate
    * evaluated on the embeddings table and pre-filter semi-joined into
    * the postings scan ([[Similarity.annRoute]]'s `allowed`). Run in the
    * oracle-adjudication mode (exhaustive nprobe == brute-force over the
    * allowed set, the `sim_ivfpq` pattern) so the filtered pipeline
    * hash-checks against a DuckDB brute-force-with-WHERE; production
    * nprobe trades recall only (SimilaritySpec).
    */
  def simFiltered(spark: SparkSession, dir: String): DataFrame = {
    val emb = t(spark, dir, "embeddings")
    val nCells = 8
    val base = graft.Caches.stagedPath("ivf-filtered", dir) { p =>
      Similarity.ivfWriteIndex(emb.select("vec_id", "embedding"), p,
        nCells = nCells)
    }
    Similarity.annRoute(emb.filter(col("vec_id") % 100 === 0), base,
        k = 5, nprobe = nCells,
        allowed = Some(emb.filter(col("label") % 3 === 0)))
      // probed_fraction (1.0 — exhaustive probe) dropped: oracle hashes
      // the ranking columns
      .select("qid", "rank", "nid", "cos")
      .orderBy("qid", "rank")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "sim_filtered" -> simFiltered,
    "sim_topk" -> simTopk,
    "sim_ann_lsh" -> simAnnLsh,
    "sim_ivf" -> simIvf,
    "sim_ivfpq" -> simIvfPq,
    "sim_ivfpq_rrf" -> simIvfPqRrf,
    "sim_quantize" -> simQuantize,
    "sim_centroid" -> simCentroid)

  val oracles: Map[String, String] = Map(
    "sim_quantize" ->
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
        |           FROM embeddings),
        |m AS (SELECT vec_id, v,
        |        list_max(list_transform(v, x -> abs(x))) AS mx FROM e),
        |q0 AS (SELECT vec_id,
        |        list_transform(v, x -> CAST(floor(x * 127.0 / mx) AS BIGINT))
        |          AS qv
        |      FROM m),
        |q AS (SELECT vec_id, qv,
        |        sqrt(CAST(list_sum(list_transform(generate_series(1, len(qv)),
        |          i -> qv[i] * qv[i])) AS DOUBLE)) AS qn
        |      FROM q0),
        |p AS (SELECT a.vec_id AS qid, b.vec_id AS nid,
        |        CAST(list_sum(list_transform(generate_series(1, len(a.qv)),
        |          i -> a.qv[i] * b.qv[i])) AS BIGINT) AS dot,
        |        CAST(list_sum(list_transform(generate_series(1, len(a.qv)),
        |          i -> a.qv[i] * b.qv[i])) AS DOUBLE) / (a.qn * b.qn) AS qcos
        |      FROM q a JOIN q b
        |        ON a.vec_id % 100 = 0 AND b.vec_id <> a.vec_id),
        |r AS (SELECT qid, nid, dot, qcos,
        |        row_number() OVER (PARTITION BY qid
        |          ORDER BY qcos DESC, nid) AS rn
        |      FROM p)
        |SELECT qid, rn AS rank, nid, dot, qcos FROM r WHERE rn <= 5
        |ORDER BY qid, rank""".stripMargin,
    // sim_ivfpq runs the stored-index IVFADC pipeline in its provably-
    // exact mode (exhaustive probe, no rerank cut), so the brute-force
    // recompute IS its oracle — any drift in codes/LUT/re-rank plumbing
    // surfaces as a hash mismatch here
    "sim_ivfpq" ->
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |p AS (SELECT q.vec_id AS qid, c.vec_id AS nid,
        |        list_inner_product(q.v, c.v) /
        |          (sqrt(list_inner_product(q.v, q.v)) * sqrt(list_inner_product(c.v, c.v))) AS cos
        |      FROM e q JOIN e c ON q.vec_id % 100 = 0 AND c.vec_id <> q.vec_id),
        |r AS (SELECT qid, nid, cos,
        |        row_number() OVER (PARTITION BY qid ORDER BY cos DESC, nid) AS rn
        |      FROM p)
        |SELECT qid, rn AS rank, nid, cos FROM r WHERE rn <= 5
        |ORDER BY qid, rank""".stripMargin,
    // sim_ivfpq_rrf: the r18 fractional-rerank branch at
    // rerankFraction=1.0 + exhaustive probe keeps the whole ADC pool,
    // so the exact re-rank reproduces the same brute-force ranking
    "sim_ivfpq_rrf" ->
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |p AS (SELECT q.vec_id AS qid, c.vec_id AS nid,
        |        list_inner_product(q.v, c.v) /
        |          (sqrt(list_inner_product(q.v, q.v)) * sqrt(list_inner_product(c.v, c.v))) AS cos
        |      FROM e q JOIN e c ON q.vec_id % 100 = 0 AND c.vec_id <> q.vec_id),
        |r AS (SELECT qid, nid, cos,
        |        row_number() OVER (PARTITION BY qid ORDER BY cos DESC, nid) AS rn
        |      FROM p)
        |SELECT qid, rn AS rank, nid, cos FROM r WHERE rn <= 5
        |ORDER BY qid, rank""".stripMargin,
    // brute force restricted to the allowed set: the filtered route at
    // exhaustive nprobe must reproduce this ranking bit-exactly
    "sim_filtered" ->
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |a AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
        |      FROM embeddings WHERE label % 3 = 0),
        |p AS (SELECT q.vec_id AS qid, c.vec_id AS nid,
        |        list_inner_product(q.v, c.v) /
        |          (sqrt(list_inner_product(q.v, q.v)) * sqrt(list_inner_product(c.v, c.v))) AS cos
        |      FROM e q JOIN a c ON q.vec_id % 100 = 0 AND c.vec_id <> q.vec_id),
        |r AS (SELECT qid, nid, cos,
        |        row_number() OVER (PARTITION BY qid ORDER BY cos DESC, nid) AS rn
        |      FROM p)
        |SELECT qid, rn AS rank, nid, cos FROM r WHERE rn <= 5
        |ORDER BY qid, rank""".stripMargin,
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
        |ORDER BY qid, rank""".stripMargin,
    "sim_centroid" ->
      """WITH e AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v
        |           FROM embeddings),
        |x AS (SELECT label, unnest(v) AS x,
        |        unnest(generate_series(1, len(v))) AS pos FROM e),
        |c AS (SELECT label, pos,
        |        list_aggregate(list_sort(list(x)), 'sum') / COUNT(*) AS cx
        |      FROM x GROUP BY label, pos),
        |cent AS (SELECT label, list(cx ORDER BY pos) AS cv FROM c GROUP BY label),
        |cn AS (SELECT label, cv, sqrt(list_inner_product(cv, cv)) AS cnorm
        |       FROM cent),
        |m AS (SELECT e.label,
        |        list_inner_product(e.v, cn.cv) /
        |          (sqrt(list_inner_product(e.v, e.v)) * cn.cnorm) AS cos,
        |        cn.cnorm
        |      FROM e JOIN cn USING (label))
        |SELECT label, COUNT(*) AS n_vecs,
        |  list_aggregate(list_sort(list(cos)), 'sum') / COUNT(*) AS avg_cos,
        |  MIN(cnorm) AS centroid_norm
        |FROM m GROUP BY label ORDER BY label""".stripMargin)
    // sim_ann_lsh / sim_ivf: hyperplanes/centroids derive from xxhash64 ->
    // rows-only.
}
