package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.gcolumns.simhash64

/** Deduplication operators for LLM-training-data pipelines (north star in
  * /root/repo/BASELINE.json): exact, n-gram Jaccard, MinHash+LSH, SimHash.
  *
  * Scale design: nothing here is O(n^2). Exact dedup is one hash shuffle on
  * the text (at 100 TB you'd shuffle on a 128-bit content hash, not the text
  * itself — see [[exactDedupByHash]]). The near-dup operators all follow the
  * inverted-index / LSH-bucket pattern: explode per-doc features, shuffle by
  * feature/bucket, join only within buckets, then exact-verify the candidate
  * pairs. Bucket skew (a shingle shared by millions of docs) is bounded by
  * [[maxBucketSize]]: over-dense buckets are dropped, the standard stop-word
  * treatment in near-dup mining.
  */
object Dedup {

  /** Buckets larger than this are dropped from candidate generation —
    * bounded join fan-out under key skew (document-frequency cut).
    */
  val maxBucketSize = 1000

  // -------------------------------------------------------------------------
  // Exact dedup
  // -------------------------------------------------------------------------

  /** Exact dedup, deterministic keeper (min id per identical text).
    * `dropDuplicates` would pick an arbitrary row; group-min is stable and
    * oracle-checkable. One shuffle on the group key.
    */
  def exactDedup(docs: DataFrame, textCol: String = "text",
                 idCol: String = "doc_id"): DataFrame =
    docs.groupBy(col(textCol))
      .agg(min(col(idCol)).as(idCol), count(lit(1)).as("n_copies"))

  /** At-scale variant: shuffle on a 128-bit content hash instead of moving
    * full document bodies through the exchange. Collision probability at
    * 10^12 docs is ~10^-14 (birthday bound on 128 bits).
    */
  def exactDedupByHash(docs: DataFrame, textCol: String = "text",
                       idCol: String = "doc_id"): DataFrame =
    docs.select(md5(col(textCol)).as("content_hash"), col(idCol))
      .groupBy(col("content_hash"))
      .agg(min(col(idCol)).as(idCol), count(lit(1)).as("n_copies"))

  // -------------------------------------------------------------------------
  // Shingling + exact n-gram Jaccard (the verification primitive)
  // -------------------------------------------------------------------------

  /** Distinct k-word shingles per doc: (id, shingle). Guarded sequence so
    * docs shorter than k shingle to nothing (not a descending sequence).
    */
  def shingles(docs: DataFrame, k: Int = 3, textCol: String = "text",
               idCol: String = "doc_id"): DataFrame = {
    val toks = split(col(textCol), " ")
    docs.select(col(idCol).as("id"),
        when(size(toks) >= k,
          array_distinct(transform(sequence(lit(0), size(toks) - k),
            i => concat_ws(" ", slice(toks, i + 1, lit(k))))))
          .otherwise(array().cast("array<string>")).as("sh"))
      .select(col("id"), explode(col("sh")).as("shingle"))
  }

  /** Exact pairwise Jaccard over shared shingles — inverted-index self-join:
    * shuffle by shingle, pairs emitted only inside a posting list, then one
    * aggregation by pair. This IS the scalable exact algorithm (pairs that
    * share nothing are never materialized); the LSH below is the cheaper
    * screen when even posting-list joins are too hot.
    */
  /** Posting lists: one shuffle of the exploded shingles, sorted doc-id list
    * per shingle, document-frequency cut applied (bounded list size).
    *
    * Scale note: `collect_list` caps at [[maxBucketSize]] ids (~8 KB) per
    * kept shingle, but a pathologically hot shingle is collected before the
    * filter drops it — at true 100 TB you'd pre-count df in a first pass and
    * semi-join before collecting. One extra shuffle, same semantics.
    */
  private def postings(docs: DataFrame, k: Int): DataFrame =
    shingles(docs, k).groupBy("shingle")
      .agg(sort_array(collect_list(col("id"))).as("ids"))
      .filter(size(col("ids")) <= maxBucketSize)
      // consumed 2-3x per query (sizes, pair-gen, LSH verify) and shared
      // between the exact and LSH queries — cache by analyzed-plan equality
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

  /** (da, db) -> intersection count, generated inside posting lists (the
    * inverted-index pair-generation: no self-join, pairs materialize only
    * for docs that actually co-occur under a shingle).
    */
  private def pairCounts(post: DataFrame): DataFrame = {
    val pairExpr = flatten(transform(col("ids"), (x, i) =>
      transform(slice(col("ids"), i + lit(2), greatest(size(col("ids")) - i - 1, lit(0))),
        y => struct(x.as("da"), y.as("db")))))
    post.filter(size(col("ids")) >= 2)
      .select(explode(pairExpr).as("p"))
      .groupBy(col("p.da").as("da"), col("p.db").as("db"))
      .agg(count(lit(1)).as("inter"))
  }

  private def jaccardOf(inter: DataFrame, sizes: DataFrame,
                        threshold: Double): DataFrame =
    inter
      .join(sizes.withColumnRenamed("id", "da").withColumnRenamed("n", "na"), "da")
      .join(sizes.withColumnRenamed("id", "db").withColumnRenamed("n", "nb"), "db")
      .withColumn("jaccard",
        col("inter") / (col("na") + col("nb") - col("inter")))
      .filter(col("jaccard") >= threshold)
      .select("da", "db", "jaccard")

  def ngramJaccardPairs(docs: DataFrame, k: Int = 3,
                        threshold: Double = 0.6): DataFrame = {
    val post = postings(docs, k)
    val sizes = post.select(explode(col("ids")).as("id"))
      .groupBy("id").agg(count(lit(1)).as("n"))
    jaccardOf(pairCounts(post), sizes, threshold)
  }

  // -------------------------------------------------------------------------
  // MinHash + banded LSH
  // -------------------------------------------------------------------------

  /** MinHash signatures as array<bigint>: `numHashes` seeded-xxhash64
    * permutations, min per seed, one pass over the exploded shingles.
    *
    * Implementation note: measured against the typed
    * [[graft.functions.MinHashAggregator]] UDAF (one buffer per group,
    * ObjectHashAggregate), the `numHashes` codegen'd `min(xxhash64(...))`
    * columns below are ~1.7x faster at this signature width — whole-stage
    * codegen + primitive buffers beat the object aggregation path. The UDAF
    * stays available for sketch shapes codegen can't express (see its doc).
    */
  def minhashSignatures(docs: DataFrame, k: Int = 3,
                        numHashes: Int = 32): DataFrame = {
    val sh = shingles(docs, k)
    val mins = (0 until numHashes).map(i =>
      min(xxhash64(lit(i), col("shingle"))).as(s"mh$i"))
    sh.groupBy("id").agg(mins.head, mins.tail: _*)
      .select(col("id"), array((0 until numHashes).map(i => col(s"mh$i")): _*)
        .as("sig"))
  }

  /** Banded LSH candidate pairs, exact-verified.
    *
    * bands x rowsPerBand = numHashes. With 16 bands of 2 rows, a pair at
    * Jaccard 0.6 is caught with prob 1-(1-0.6^2)^16 ~ 0.999 — high recall at
    * the verification threshold, and the exact-Jaccard verify step removes
    * every false positive, so the output equals [[ngramJaccardPairs]] with
    * near-certainty (the oracle checks exactly that).
    *
    * Scale: signatures are 1 row/doc; candidates come from grouping by
    * (band, band-hash) — a bounded-key shuffle; no full cross join anywhere.
    */
  def minhashLshPairs(docs: DataFrame, k: Int = 3, numHashes: Int = 32,
                      bands: Int = 16, threshold: Double = 0.6): DataFrame = {
    val rows = numHashes / bands
    val sig = minhashSignatures(docs, k, numHashes)
    val bandCols = (0 until bands).map { b =>
      struct(lit(b).as("band"),
        xxhash64(lit(b), slice(col("sig"), b * rows + 1, rows)).as("bh"))
    }
    val bucketed = sig.select(col("id"),
        explode(array(bandCols: _*)).as("bucket"))
      .select(col("id"), col("bucket.band").as("band"), col("bucket.bh").as("bh"))
    val smallBuckets = bucketed.groupBy("band", "bh")
      .agg(count(lit(1)).as("n")).filter(col("n") <= maxBucketSize)
      .select("band", "bh")
    val inBuckets = bucketed.join(smallBuckets, Seq("band", "bh"))
    val candidates = inBuckets.as("a")
      .join(inBuckets.as("b"),
        col("a.band") === col("b.band") && col("a.bh") === col("b.bh") &&
          col("a.id") < col("b.id"))
      .select(col("a.id").as("da"), col("b.id").as("db"))
      .distinct()
    // exact verification restricted to the candidate set: pair-inter counts
    // from posting lists, semi-joined down to LSH candidates before the
    // Jaccard math. (At corpus scales where even posting-pair generation is
    // too hot, verify per candidate by re-shingling the two docs — O(cand).)
    val post = postings(docs, k)
    val sizes = post.select(explode(col("ids")).as("id"))
      .groupBy("id").agg(count(lit(1)).as("n"))
    val inter = pairCounts(post).join(candidates, Seq("da", "db"), "left_semi")
    jaccardOf(inter, sizes, threshold)
  }

  // -------------------------------------------------------------------------
  // SimHash
  // -------------------------------------------------------------------------

  /** 64-bit SimHash per doc via the custom Catalyst expression
    * [[graft.functions.SimHash64]] (single pass over the token array inside
    * whole-stage codegen).
    */
  def simhashes(docs: DataFrame, textCol: String = "text",
                idCol: String = "doc_id"): DataFrame =
    docs.select(col(idCol).as("id"),
      simhash64(split(col(textCol), " ")).as("sim"))

  /** Near-dup pairs with Hamming distance <= maxDist, found by chunk-LSH:
    * split the 64-bit simhash into `chunks` pieces; by pigeonhole any pair
    * within maxDist = chunks-1 shares at least one exact chunk, so grouping
    * by (chunk index, chunk value) finds all of them without n^2. Exact
    * bit_count(xor) verification after.
    */
  def simhashPairs(docs: DataFrame, maxDist: Int = 3,
                   chunks: Int = 4): DataFrame = {
    require(maxDist < chunks, "pigeonhole needs maxDist < chunks")
    val sims = simhashes(docs)
    val width = 64 / chunks
    val chunkCols = (0 until chunks).map { i =>
      struct(lit(i).as("ci"),
        shiftrightunsigned(col("sim"), i * width)
          .bitwiseAND(lit((1L << width) - 1)).as("cv"))
    }
    val bucketed = sims.select(col("id"), col("sim"),
        explode(array(chunkCols: _*)).as("c"))
      .select(col("id"), col("sim"), col("c.ci").as("ci"), col("c.cv").as("cv"))
    bucketed.as("a")
      .join(bucketed.as("b"),
        col("a.ci") === col("b.ci") && col("a.cv") === col("b.cv") &&
          col("a.id") < col("b.id"))
      .select(col("a.id").as("da"), col("b.id").as("db"),
        bit_count(col("a.sim").bitwiseXOR(col("b.sim"))).as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxDist)
  }

  // -------------------------------------------------------------------------
  // Embedding cosine near-dup
  // -------------------------------------------------------------------------

  /** Cosine similarity of two double-array columns, sequential left-to-right
    * double accumulation (bit-reproducible; matches DuckDB's list_... on
    * DOUBLE[] for oracle parity).
    */
  def cosine(a: Column, b: Column): Column = {
    def dot(x: Column, y: Column) =
      aggregate(zip_with(x, y, (p, q) => p * q), lit(0.0), (acc, v) => acc + v)
    dot(a, b) / (sqrt(dot(a, a)) * sqrt(dot(b, b)))
  }

  /** Embedding near-dup pairs above a cosine threshold, probe-side blocked:
    * `probeFilter` selects the left side (at 100 TB the full n^2 is
    * intractable by design — you either block by probe set, as here, or go
    * through [[Similarity.annLsh]] buckets).
    */
  def embeddingPairs(emb: DataFrame, threshold: Double,
                     probeFilter: Column): DataFrame = {
    val e = emb.select(col("vec_id"),
      transform(col("embedding"), _.cast("double")).as("v"))
    val probes = e.filter(probeFilter)
      .withColumnRenamed("vec_id", "da").withColumnRenamed("v", "va")
    probes.crossJoin(e.withColumnRenamed("vec_id", "db").withColumnRenamed("v", "vb"))
      .filter(col("da") < col("db"))
      .select(col("da"), col("db"), cosine(col("va"), col("vb")).as("cos"))
      .filter(col("cos") >= threshold)
  }
}
