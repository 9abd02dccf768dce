package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed exact-integer Lloyd's k-means over an embedding column.
  *
  * [[Similarity]]'s IVF tier trains centroids on a bounded driver sample —
  * the right call when centroids are an internal index detail. This operator
  * is the other regime: cluster EVERY vector, with both the E step
  * (assignment) and the M step (centroid update) distributed — the shape
  * behind cluster-balanced sampling and per-cluster curation of a training
  * corpus, where the full assignment table IS the product.
  *
  * Everything is exact integer arithmetic so the result is reproducible
  * cross-engine (the DuckDB oracle hash-matches the assignment cell-exactly,
  * something float k-means can never promise):
  *
  *  - vectors quantize to `floor(x * scale)` longs (both engines do the
  *    multiply and floor in IEEE double — bit-identical);
  *  - centroids are carried as exact (member count n, per-dim sum s) pairs
  *    and NEVER divided: the squared distance to the mean, scaled by n², is
  *    `Σ_d (n·x_d − s_d)²` — pure integer. Comparing across centroids with
  *    different n divides by n² in double; each term |n·x_d − s_d| ≤
  *    n·scale, so the numerator is ≤ dim·(n·scale)² and the division is
  *    IEEE-exact (numerator < 2^53) only while n ≤ sqrt(2^53/(dim·scale²))
  *    — n ≲ 2^13.5 ≈ 11,800 members per cluster at scale=1000, dim=64; the
  *    Long numerator itself overflows 2^63 (ANSI ArithmeticException) near
  *    n ≈ 2^18.5. [[kmeansAssign]] guards the tighter bound at runtime
  *    (cluster sizes are on the driver after every update — the check is
  *    free); a 100 TB run drops `scale` an order of magnitude or re-centres
  *    sums per iteration — the plan below is unchanged.
  *  - equal-distance ties break to the lowest cluster id on both sides
  *    ([[graft.functions.KMeansArgmin]]'s first-minimum over ascending ids
  *    ≡ `ORDER BY dist, cl` in the oracle).
  *
  * Scale: per iteration ONE narrow scan (the k centroids ride the plan as
  * literals — nothing joins, nothing shuffles but the update's
  * k×(dim+1)-cell partial aggregate) + a k-row driver collect. That is the
  * textbook 100 TB Lloyd's plan — what MLlib's KMeans runs via
  * treeAggregate, minus its sampled init. Init picks the k vectors with the
  * lowest md5(vec_id) — deterministic, uniformly spread, seed-free. A
  * cluster that loses all members drops out; both engines agree on that by
  * construction, so k may shrink (documented, not hidden).
  */
object Clustering {

  /** Final (vec_id, cluster) assignment after `iters` full Lloyd rounds.
    * `cluster` ids are the 0-based init ranks; gaps appear if a cluster
    * empties. The quantized corpus is [[graft.Caches]]-persisted once per
    * (input, scale) — iterations and repeat calls rescan the cached frame.
    */
  def kmeansAssign(emb: DataFrame, k: Int = 8, iters: Int = 2,
                   scale: Int = 1000,
                   idCol: String = "vec_id",
                   vecCol: String = "embedding"): DataFrame = {
    val q = quantized(emb, scale, idCol, vecCol)
    val cents = kmeansFit(emb, k, iters, scale, idCol, vecCol)
    q.select(col("vec_id"), assignment(cents).as("cluster"))
  }

  /** Quantized (vec_id, q) corpus, [[graft.Caches]]-persisted per
    * (input, scale) so iterations and repeat calls rescan one frame.
    */
  private def quantized(emb: DataFrame, scale: Int,
                        idCol: String, vecCol: String): DataFrame = {
    val q0 = emb.select(col(idCol).cast("long").as("vec_id"),
      transform(col(vecCol),
        x => floor(x.cast("double") * scale).cast("long")).as("q"))
    val key = s"${emb.queryExecution.analyzed.semanticHash()}|s=$scale"
    graft.Caches.cached("kmeans-quantized", key)(q0)
  }

  /** The E step over a `q` column: [[graft.functions.KMeansArgmin]] — a
    * codegen expression looping over the centroid matrix as a REFERENCE
    * OBJECT. The k×dim literal when-chain it replaced made Janino compile
    * a fresh multi-second projection per iteration and capped k; the
    * kernel's generated code is one call, constant-size in k·dim.
    */
  private def assignment(cs: Seq[(Long, Long, Seq[Long])]): Column =
    // a corpus that empties down to ONE surviving cluster has a
    // constant assignment
    if (cs.size == 1) lit(cs.head._1)
    else graft.functions.Cluster.kmeansArgmin(col("q"),
      cs.map { case (c, n, s) => (c +: n +: s).toArray }.toArray)

  /** The trained centroids as exact (cluster, n, per-dim sums): init
    * collect + `iters` Lloyd rounds, each ONE k×(dim+1) partial agg +
    * k-row collect. Memoized per (input, params): the profile and the
    * streaming router consume the same fit the assignment query trained
    * instead of re-paying the loop.
    */
  private[graft] def kmeansFit(emb: DataFrame, k: Int, iters: Int,
                               scale: Int, idCol: String,
                               vecCol: String): Seq[(Long, Long, Seq[Long])] = {
    require(k >= 2, s"k-means needs k >= 2, got $k")
    val q = quantized(emb, scale, idCol, vecCol)
    val key = s"${emb.queryExecution.analyzed.semanticHash()}|s=$scale"
    graft.Caches.memo("kmeans-cents",
        s"$key|k=$k|i=$iters") {
      // k-row bounded collect (same discipline as Similarity.kmeansCentroids)
      val initRows = q
        .orderBy(md5(col("vec_id").cast("string").cast("binary")), col("vec_id"))
        .limit(k).select("q").collect()
      require(initRows.length == k, s"corpus has fewer than $k vectors")
      val dim = initRows.head.getSeq[Long](0).length
      var cs: Seq[(Long, Long, Seq[Long])] = initRows.zipWithIndex.map {
        case (r, i) => (i.toLong, 1L, r.getSeq[Long](0)) }.toSeq

      // exactness budget (see class doc): IEEE-exact distance comparison
      // needs dim·(n·scale)² < 2^53 per cluster
      val exactLimit = math.sqrt((1L << 53).toDouble / (dim.toDouble * scale * scale)).toLong

      for (_ <- 1 to iters) {
        val assigned = q.withColumn("cluster", assignment(cs))
        val aggCols = count(lit(1)).as("n") +:
          (0 until dim).map(d => sum(element_at(col("q"), d + 1)).as(s"s$d"))
        val rows = assigned.groupBy("cluster")
          .agg(aggCols.head, aggCols.tail: _*).collect()
        cs = rows.map { r =>
          (r.getLong(0), r.getLong(1),
            (0 until dim).map(d => r.getLong(2 + d)).toSeq)
        }.sortBy(_._1).toSeq
        val maxN = cs.map(_._2).max
        require(maxN <= exactLimit,
          s"cluster of $maxN members exceeds the exact-arithmetic budget " +
            s"($exactLimit at scale=$scale, dim=$dim) — lower `scale` or " +
            s"re-centre sums per iteration (see Clustering doc)")
      }
      cs
    }
  }

  /** Streaming cluster router: assign a STREAM of embeddings to the
    * centroids trained on a batch corpus — the online face of
    * cluster-stratified curation (route arriving documents to per-cluster
    * sinks/quotas without re-training). Training happens (or is memo-hit)
    * at stream-definition time on the batch side; the stream side is then
    * a pure narrow projection — quantize + the [[graft.functions
    * .KMeansArgmin]] kernel with the centroid matrix riding the plan as a
    * reference object. No state store, no join, no shuffle: per-row
    * routing at source parallelism, exactly what a 1000-executor ingest
    * needs. Same exact-integer arithmetic as the batch E step, so a
    * routed row agrees bit-for-bit with what [[kmeansAssign]] would say.
    */
  def kmeansRoute(stream: DataFrame, corpus: DataFrame, k: Int = 8,
                  iters: Int = 2, scale: Int = 1000,
                  idCol: String = "vec_id",
                  vecCol: String = "embedding"): DataFrame = {
    val cents = kmeansFit(corpus, k, iters, scale, idCol, vecCol)
    stream.select(col(idCol).cast("long").as("vec_id"),
        transform(col(vecCol),
          x => floor(x.cast("double") * scale).cast("long")).as("q"))
      .select(col("vec_id"), assignment(cents).as("cluster"))
  }

  /** Cluster-stratified sample: a deterministic quota of `perCluster`
    * vectors per cluster, ranked by md5(vec_id) inside each cluster — the
    * consumer that turns a full-corpus assignment into a balanced training
    * subset (over-represented clusters are capped, small ones kept whole).
    * Reuses the memoized fit from [[kmeansAssign]] — the assignment query
    * trains once, this query re-scans only the cached quantized corpus —
    * and the same md5-quota shape as [[Curation.stratifiedSample]]:
    * [[graft.plans.TopKPerGroup]] cuts each partition to its local top
    * `perCluster` BEFORE the rank window, so the single-key window sort
    * never sees more than partitions×k×perCluster rows no matter the
    * corpus size.
    */
  def kmeansSample(emb: DataFrame, k: Int = 8, iters: Int = 2,
                   perCluster: Int = 25, scale: Int = 1000,
                   idCol: String = "vec_id",
                   vecCol: String = "embedding"): DataFrame = {
    val a = kmeansAssign(emb, k, iters, scale, idCol, vecCol)
    val slim = a.select(col("cluster"), col("vec_id"),
      md5(col("vec_id").cast("string").cast("binary")).as("h"))
    val topk = graft.plans.TopKPerGroup(slim, Seq("cluster"),
      Seq("h" -> true, "vec_id" -> true), perCluster)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("cluster")).orderBy(col("h"), col("vec_id"))
    topk.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= perCluster)
      .select(col("cluster"), col("rn"), col("vec_id"))
  }

  /** Per-cluster profile of the final assignment joined back to labels —
    * the "is my clustering balanced / label-coherent" report a curation
    * pipeline reads before cluster-stratified sampling. Output is k rows.
    */
  def kmeansProfile(emb: DataFrame, k: Int = 8, iters: Int = 2,
                    scale: Int = 1000,
                    idCol: String = "vec_id",
                    vecCol: String = "embedding",
                    labelCol: String = "label"): DataFrame = {
    val a = kmeansAssign(emb, k, iters, scale, idCol, vecCol)
    a.join(emb.select(col(idCol).cast("long").as("vec_id"),
        col(labelCol).as("label")), "vec_id")
      .groupBy("cluster")
      .agg(count(lit(1)).as("n_members"),
        countDistinct(col("label")).as("n_labels"),
        min(col("vec_id")).as("min_vec"),
        max(col("vec_id")).as("max_vec"))
  }
}
