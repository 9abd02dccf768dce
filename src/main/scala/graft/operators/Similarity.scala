package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over an embedding column
  * (`array<float>`).
  *
  * Two tiers (the standard vector-search shape):
  *  - [[bruteForceTopK]]: exact cosine top-k, probe-set x corpus. The
  *    baseline and the verifier. Linear in |corpus| per probe — fine for a
  *    probe batch, intractable as all-pairs; at 100 TB the corpus side
  *    streams (one pass, no shuffle of the corpus) and per-probe state is a
  *    k-heap (TakeOrderedAndProject after the window filter).
  *  - [[annLsh]]: random-hyperplane LSH — probe only compares against its
  *    own bucket(s). Hyperplanes are derived deterministically from a seeded
  *    hash (no RNG at plan time, so the plan is reproducible run-to-run —
  *    a requirement both for the driver's hash-compare and for incremental
  *    recomputation at scale). Multi-probe via `tables` independent hash
  *    tables raises recall without widening any single bucket.
  */
object Similarity {

  /** Deterministic "random" hyperplane component d of plane p for table t:
    * xxhash64 mapped to [-1, 1]. Fixed by (t, p, d) — pure plan constant.
    */
  private def planeComponent(t: Int, p: Int, d: Int): Double = {
    val h = org.apache.spark.sql.catalyst.expressions.XXH64
      .hashLong(((t.toLong * 131071 + p) << 20) + d, 2024L)
    (h.toDouble / Long.MaxValue.toDouble)
  }

  /** Sequential-accumulation dot product (bit-reproducible). */
  def dot(x: Column, y: Column): Column =
    aggregate(zip_with(x, y, (p, q) => p * q), lit(0.0), (acc, v) => acc + v)

  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (sqrt(dot(a, a)) * sqrt(dot(b, b)))

  private def asDouble(emb: DataFrame): DataFrame =
    emb.select(col("vec_id"), col("label"),
      transform(col("embedding"), _.cast("double")).as("v"))

  /** Exact cosine top-k for each probe vector. */
  def bruteForceTopK(emb: DataFrame, probeFilter: Column, k: Int): DataFrame = {
    val e = asDouble(emb)
    val probes = e.filter(probeFilter)
      .select(col("vec_id").as("qid"), col("v").as("qv"))
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("cos").desc, col("nid"))
    probes.crossJoin(e.select(col("vec_id").as("nid"), col("v").as("nv")))
      .filter(col("qid") =!= col("nid"))
      .select(col("qid"), col("nid"), cosine(col("qv"), col("nv")).as("cos"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("qid", "rank", "nid", "cos")
  }

  /** IVF-style ANN: coarse quantization with deterministic "centroids"
    * (every `centroidStride`-th vector), probes search their own cell plus
    * the runner-up cell (nprobe=2). The learned-centroid version (k-means)
    * drops into the same plan — assignment is a broadcast argmax against
    * the centroid table, search is a co-partitioned join on cell id. The
    * centroid table is O(sqrt(n))-ish and broadcast, the corpus shuffles
    * once by cell — the inverted-file layout at any scale.
    */
  def ivfTopK(emb: DataFrame, probeFilter: Column, k: Int,
              centroidStride: Int = 100): DataFrame = {
    val e = asDouble(emb)
    val centroids = e.filter(col("vec_id") % centroidStride === 0)
      .select(col("vec_id").as("cell"), col("v").as("cv"))
    // cell assignment: argmax cosine against the broadcast centroid table;
    // keep top-2 cells per vector (corpus side indexes only cell 1,
    // probes search cells 1 and 2 — classic nprobe>1 recall boost)
    def assign(df: DataFrame, n: Int): DataFrame = {
      val w = Window.partitionBy(col("vec_id"))
        .orderBy(col("ccos").desc, col("cell"))
      df.crossJoin(broadcast(centroids))
        .select(col("vec_id"), col("v"), col("cell"),
          cosine(col("v"), col("cv")).as("ccos"))
        .withColumn("crk", row_number().over(w))
        .filter(col("crk") <= n)
    }
    val corpus = assign(e, 1)
      .select(col("cell"), col("vec_id").as("nid"), col("v").as("nv"))
    val probes = assign(e.filter(probeFilter), 2)
      .select(col("cell"), col("vec_id").as("qid"), col("v").as("qv"))
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("cos").desc, col("nid"))
    probes.join(corpus, "cell")
      .filter(col("qid") =!= col("nid"))
      .select(col("qid"), col("nid"), cosine(col("qv"), col("nv")).as("cos"))
      .dropDuplicates("qid", "nid")
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("qid", "rank", "nid", "cos")
  }

  /** LSH bucket signature for `planes` hyperplanes of table `t`: one sign
    * bit per plane packed into a long. Bit b = sign of <v, plane_b>.
    */
  def bucketSignature(v: Column, t: Int, planes: Int, dim: Int): Column = {
    val bits = (0 until planes).map { p =>
      val planeVec = array((0 until dim).map(d => lit(planeComponent(t, p, d))): _*)
      when(dot(v, planeVec) >= 0, lit(1L << p)).otherwise(lit(0L))
    }
    bits.reduce(_ + _)
  }

  /** ANN top-k: candidates share an LSH bucket in at least one of `tables`
    * hash tables; exact cosine + rank within the candidate set. Recall vs
    * [[bruteForceTopK]] is asserted in the test suite.
    *
    * Parameter intuition: P(one-table collision at angle θ) = (1-θ/π)^planes,
    * so for top-k neighbors at cosine ~0.4 (θ≈1.16) the defaults give
    * 1-(1-0.63^4)^8 ≈ 0.75 recall while scanning a fraction of the corpus.
    * The sparser the space / closer the neighbors, the more planes you can
    * afford: planes ≈ log2(corpus / desired bucket size), then set tables
    * for the recall target. At 100 TB this is the knob that decouples probe
    * cost from corpus size; an IVF coarse quantizer is the same plan with
    * learned buckets instead of hashed ones.
    */
  def annLsh(emb: DataFrame, probeFilter: Column, k: Int,
             planes: Int = 4, tables: Int = 8, dim: Int = 64): DataFrame = {
    val e = asDouble(emb)
    val sigCols = (0 until tables).map(t =>
      struct(lit(t).as("t"), bucketSignature(col("v"), t, planes, dim).as("sig")))
    val bucketed = e.select(col("vec_id"), col("v"),
        explode(array(sigCols: _*)).as("b"))
      .select(col("vec_id"), col("v"), col("b.t").as("t"), col("b.sig").as("sig"))
    val probes = bucketed.filter(probeFilter)
      .select(col("vec_id").as("qid"), col("v").as("qv"), col("t"), col("sig"))
    val candidates = probes
      .join(bucketed.select(col("vec_id").as("nid"), col("v").as("nv"),
        col("t"), col("sig")), Seq("t", "sig"))
      .filter(col("qid") =!= col("nid"))
      .select("qid", "qv", "nid", "nv")
      .dropDuplicates("qid", "nid")
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("cos").desc, col("nid"))
    candidates
      .select(col("qid"), col("nid"), cosine(col("qv"), col("nv")).as("cos"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("qid", "rank", "nid", "cos")
  }
}
