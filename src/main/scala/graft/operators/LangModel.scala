package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.{IndexCommit, IndexTxn, Maintenance, StoredIndex}

/** STORED n-gram language model — the perplexity filter every large-scale
  * training-data pipeline runs (the CCNet/KenLM recipe: train a small LM on
  * a trusted reference corpus, score candidate documents, cut the tail), as
  * the engine's SIXTH stored-state family with the full decide / learn /
  * forget / compact / as-of lifecycle.
  *
  * Relation to the existing quality cut: [[Curation.lmQualityCut]] scores a
  * corpus against ITSELF in one query (self-referential rarity). This family
  * separates the two corpora the production recipe separates — the model is
  * trained (and maintained) on a REFERENCE corpus, stored once, and serves
  * admission decisions over arbitrary later arrivals without rescanning the
  * reference.
  *
  * Scoring is EXACT INTEGER arithmetic — the BM25 discipline
  * ([[TextIndex]]'s rational idf surrogate): true perplexity needs
  * `log`/`exp`, which are not bit-reproducible across engines, so the score
  * is the Laplace-smoothed INVERSE-PROBABILITY mean, a monotone rarity
  * surrogate with the same decision geometry:
  *
  *   surprise(w1,w2) = (SCALE * (c(w1) + V)) div (c(w1,w2) + 1)
  *   doc is admitted iff sum(surprise) <= thrMean * n_bigrams
  *
  * where c(w1,w2) are the stored bigram counts, c(w1) = sum_w2 c(w1,w2) the
  * context counts (DERIVED from the bigram table at read — one table to
  * learn/forget, contexts can never drift out of sync), and V = |vocab|+1
  * (the `<unk>` row). 1/p(w2|w1) = (c(w1)+V)/(c(w1,w2)+1) is exactly the
  * smoothed inverse probability, scaled to an integer; decimal(38,0)
  * arithmetic throughout (long products wrap silently at 100 TB counts) and
  * integral `div`, so DuckDB replays the whole train+score bit-identically
  * (q:`curate_lm_route`).
  *
  * Index layout under `dir` (one [[IndexCommit]] manifest, every mutation a
  * single atomic manifest rename):
  *  - `meta`    — one row (vocab_top, v, nbuckets).
  *  - `vocab`   — the FROZEN train-time vocabulary (tok, cnt), top
  *                `vocabTop` unigrams by (cnt desc, tok asc) — deterministic
  *                tie order. Frozen like the IVF quantizers: appends map new
  *                text through it, so decisions stay comparable across
  *                versions; retraining the vocab is a rebuild, not a learn.
  *  - `bi/seg=N/wb=K` — LSM delta segments of bigram counts
  *                (w1, w2, cnt), partitioned by `wb = pmod(xxhash64(w1),
  *                nbuckets)` so a route's scan prunes to the batch's probed
  *                buckets; forget writes NEGATIVE deltas (the budget-gate
  *                fills ledger discipline), folds sum exactly.
  *
  * Scale: training is two bounded aggregations (vocab top-k + bigram
  * group-by); a route decision reads ONLY the batch's probed `wb` partitions
  * of the bi LSM (bounded by the batch's bigram vocabulary, never by corpus
  * or index size), joins them to the batch's exploded bigrams, and
  * aggregates per doc — no corpus-sized state, no driver collect beyond the
  * probed-bucket set (<= nbuckets values).
  */
object LangModel {

  /** The out-of-vocabulary token every non-vocab token maps to. */
  val Unk = "<unk>"

  /** Integer scale of the surprise surrogate (1e6 per unit of inverse
    * probability) — headroom for decimal(38,0) sums at 100 TB counts.
    */
  val Scale = 1000000L

  private def p(s: String) = java.nio.file.Paths.get(s)

  /** Exact integral division of two non-negative decimal(38,0) columns.
    * Spark's `div` returns LongType EVEN FOR DECIMAL OPERANDS (the
    * quotient wraps silently past Long.MaxValue), and a plain decimal
    * `/` rounds HALF_UP at the result scale (floor-of-rounded is off by
    * one when the true fraction is within 5e-7 of 1 — reachable once
    * the divisor exceeds ~2e6). Subtracting the EXACT remainder first
    * makes the quotient an integer, so the decimal division is exact by
    * construction and the final cast is lossless.
    */
  private[graft] def idiv(a: Column, b: Column): Column =
    ((a - pmod(a, b)) / b).cast("decimal(38,0)")

  /** One bigram's Laplace inverse-probability surprise as decimal(38,0):
    * (Scale * (ctx + V)) div (cnt + 1), computed ENTIRELY in decimal —
    * operands cast BEFORE the multiply (a long product wraps silently
    * once ctx exceeds Long.MaxValue/Scale ≈ 9.2e12, exactly the 100 TB
    * context counts this family is specced for) and divided via
    * [[idiv]]. DuckDB replays the same arithmetic in HUGEINT
    * (q:`curate_lm_route`); LangModelSpec pins the near-Long.MaxValue
    * regime against driver-side BigInt.
    */
  private[graft] def surpriseBigram(ctx: Column, cnt: Column,
                                    v: Long): Column = {
    val a = (coalesce(ctx, lit(0L)) + lit(v)).cast("decimal(38,0)") *
      lit(Scale)
    val b = (coalesce(cnt, lit(0L)) + lit(1L)).cast("decimal(38,0)")
    idiv(a, b)
  }

  private def wbCol(nBuckets: Int): Column =
    pmod(xxhash64(col("w1")), lit(nBuckets.toLong))

  private def metaOf(spark: SparkSession, dir: String,
                     asOf: Option[Int]): (Int, Long, Int) = {
    val r = StoredIndex.readTable(spark, s"$dir/meta",
      "vocab_top INT, v BIGINT, nbuckets INT", asOf).collect()
    require(r.nonEmpty, s"no lm index meta under $dir")
    (r(0).getInt(0), r(0).getLong(1), r(0).getInt(2))
  }

  private def vocabOf(spark: SparkSession, dir: String,
                      asOf: Option[Int]): DataFrame =
    StoredIndex.readTable(spark, s"$dir/vocab", "tok STRING, cnt BIGINT",
      asOf)

  /** One row per bigram OCCURRENCE of `docs`, both sides mapped through the
    * frozen vocabulary (non-vocab tokens -> [[Unk]]): (doc_id, w1, w2).
    * Docs under two tokens contribute no rows (callers that must answer for
    * every arrival left-join the per-doc aggregate back — [[lmRoute]]).
    * The vocab is vocabTop-bounded, so both mapping joins broadcast.
    */
  private def mappedBigrams(docs: DataFrame, vocab: DataFrame,
                            idCol: String, textCol: String): DataFrame = {
    val toks = split(col(textCol), " ")
    val pairs = zip_with(
      slice(toks, lit(1), size(toks) - 1),
      slice(toks, lit(2), size(toks) - 1),
      (x, y) => struct(x.as("r1"), y.as("r2")))
    docs.where(size(toks) >= 2)
      .select(col(idCol).cast("long").as("doc_id"), explode(pairs).as("pr"))
      .select(col("doc_id"), col("pr.r1").as("r1"), col("pr.r2").as("r2"))
      .join(broadcast(vocab.select(col("tok").as("r1"),
        lit(1).as("in1"))), Seq("r1"), "left")
      .join(broadcast(vocab.select(col("tok").as("r2"),
        lit(1).as("in2"))), Seq("r2"), "left")
      .select(col("doc_id"),
        when(col("in1").isNotNull, col("r1")).otherwise(lit(Unk)).as("w1"),
        when(col("in2").isNotNull, col("r2")).otherwise(lit(Unk)).as("w2"))
  }

  /** TRAIN: build the stored LM from the reference corpus — frozen
    * top-`vocabTop` vocabulary (cnt desc, tok asc — the
    * [[TextAnalysis.bigramLmScore]] tie order), mapped bigram counts as the
    * LSM base segment, one committed manifest. Repeatable: the whole train
    * is deterministic aggregation, no sampling.
    */
  def writeLmIndex(refDocs: DataFrame, dir: String, vocabTop: Int = 50000,
                   nBuckets: Int = 16, idCol: String = "doc_id",
                   textCol: String = "text"): Unit = {
    require(vocabTop > 0 && nBuckets > 0, "vocabTop and nBuckets must be > 0")
    val spark = refDocs.sparkSession
    import spark.implicits._
    IndexCommit.deleteTree(p(dir))
    refDocs.select(explode(split(col(textCol), " ")).as("tok"))
      .groupBy("tok").agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("tok")).limit(vocabTop)
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/vocab")
    // read the materialized vocab back: the train-time mapping must go
    // through EXACTLY the frozen rows appends will read, and the top-k
    // recompute is not free
    val vocab = spark.read.parquet(s"$dir/vocab")
    val v = vocab.count() + 1 // + <unk>
    val bi = mappedBigrams(refDocs, vocab, idCol, textCol)
      .groupBy("w1", "w2").agg(count(lit(1)).as("cnt"))
      .withColumn("wb", wbCol(nBuckets))
    StoredIndex.writeByPart(bi, "wb", s"$dir/bi/seg=0")
    Seq((vocabTop, v, nBuckets)).toDF("vocab_top", "v", "nbuckets")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/meta")
    IndexCommit.commitFiles(dir, IndexCommit.walkDataFiles(dir))
  }

  /** One staged bi-counts delta segment, published by one manifest rename —
    * the shared learn/forget commit path (the budget gate's
    * `appendFillsDelta` discipline, failpoints `lm-staged` /
    * `lm-before-commit`): a crash anywhere leaves the previous version
    * serving and the re-run re-derives the identical delta.
    */
  private def appendBiDelta(delta: DataFrame, dir: String,
                            nBuckets: Int): Unit = {
    val t = new IndexTxn(dir)
    val seg = StoredIndex.nextSeg(dir, "bi", "seg=")
    StoredIndex.writeByPart(delta.withColumn("wb", wbCol(nBuckets)),
      "wb", s"$dir/.bi-stage")
    IndexCommit.hit("lm-staged")
    StoredIndex.moveTree(t, p(s"$dir/.bi-stage"), p(s"$dir/bi/seg=$seg"))
    IndexCommit.hit("lm-before-commit")
    t.commit()
    t.cleanup()
  }

  /** LEARN: fold a new slice of the reference corpus into the stored
    * counts — one positive delta segment of its bigram counts, mapped
    * through the FROZEN vocabulary (new surface forms count as `<unk>`
    * until a rebuild retrains the vocab; the IVF frozen-quantizer
    * contract). Empty/short batches are a NO-OP (no segment, no version).
    * Returns the number of delta rows written.
    */
  def appendLmCounts(newRefDocs: DataFrame, dir: String,
                     idCol: String = "doc_id",
                     textCol: String = "text"): Long = {
    val spark = newRefDocs.sparkSession
    IndexCommit.vacuum(dir)
    val (_, _, nb) = metaOf(spark, dir, None)
    val delta = mappedBigrams(newRefDocs, vocabOf(spark, dir, None),
        idCol, textCol)
      .groupBy("w1", "w2").agg(count(lit(1)).as("cnt"))
    val n = delta.count()
    if (n > 0) appendBiDelta(delta, dir, nb)
    n
  }

  /** FORGET: erase a reference slice's contribution — the SAME delta its
    * learn wrote, NEGATED (takedowns / GDPR erasure of reference
    * documents; the budget-gate refund discipline: the ledger stays
    * append-only and auditable, [[compactLmCounts]] folds positive and
    * negative deltas alike and drops annihilated grams). The caller
    * asserts the docs were previously learned — like the refund, no
    * clamping is applied, so an over-forget is visible in the history,
    * not silently absorbed. Returns the number of delta rows written.
    */
  def forgetLmCounts(docs: DataFrame, dir: String,
                     idCol: String = "doc_id",
                     textCol: String = "text"): Long = {
    val spark = docs.sparkSession
    IndexCommit.vacuum(dir)
    val (_, _, nb) = metaOf(spark, dir, None)
    val delta = mappedBigrams(docs, vocabOf(spark, dir, None), idCol,
        textCol)
      .groupBy("w1", "w2").agg((-count(lit(1))).as("cnt"))
    val n = delta.count()
    if (n > 0) appendBiDelta(delta, dir, nb)
    n
  }

  /** Fold the bi LSM back to ONE segment once the per-learn delta segments
    * exceed `maxSegments` — merged counts are unchanged by construction
    * (decisions before and after the fold are identical); grams whose
    * merged count annihilated to zero are physically dropped. Same stage /
    * retire / move-in / atomic-manifest-commit protocol as every fold.
    * Returns the number of folded segments (0 = under budget, no-op).
    */
  def compactLmCounts(spark: SparkSession, dir: String,
                      maxSegments: Int = 8): Int = {
    IndexCommit.vacuum(dir)
    val t = new IndexTxn(dir)
    val segs = StoredIndex.segCount(t, "bi", "seg=")
    if (segs <= maxSegments) 0
    else {
      val (_, _, nb) = metaOf(spark, dir, None)
      val merged = StoredIndex.mergedLsm(spark, s"$dir/bi",
          "w1 STRING, w2 STRING, cnt BIGINT, seg INT, wb BIGINT",
          Seq("w1", "w2"), "cnt")
        .filter(col("cnt") =!= 0L)
      StoredIndex.writeByPart(merged.withColumn("wb", wbCol(nb)),
        "wb", s"$dir/.bi-stage")
      val seg = StoredIndex.nextSeg(dir, "bi", "seg=")
      t.retireUnder("bi")
      StoredIndex.moveTree(t, p(s"$dir/.bi-stage"), p(s"$dir/bi/seg=$seg"))
      t.commit()
      t.cleanup()
      segs
    }
  }

  /** Nightly-ops policy driver for the lm family (dispatched by
    * [[graft.sources.StoredIndex.maintain]]): folds the bi LSM when its
    * segment count exceeds the budget, else a no-op audit row. Idempotent —
    * the fold leaves one segment, so a second run is `noop`.
    */
  def maintainLmIndex(spark: SparkSession, dir: String,
                      maxSegments: Int = 8): Maintenance = {
    val folded = compactLmCounts(spark, dir, maxSegments)
    Maintenance("lm", if (folded > 0) "compact" else "noop", folded.toLong)
  }

  /** DRIFT SIGNAL — the [[Similarity.ivfDriftStats]] analog for the LM
    * family: how well the FROZEN model still covers an arrival slice.
    * One aggregate row: token count, OOV tokens (outside the frozen
    * vocab), bigram count, and bigrams UNSEEN by the stored counts.
    * Rising OOV/unseen fractions mean the reference corpus no longer
    * represents the arrivals — the operator that answers "when do we
    * retrain" (a rebuild retrains vocab+counts from a fresh reference;
    * the gate itself stays exact against whatever is committed). Bounded
    * work: the batch's tokens/bigrams + one wb-pruned count probe.
    * Identity-free by construction — the stats aggregate over token and
    * bigram OCCURRENCES, so no id column is required (or guessed): the
    * bigram explode runs under a synthetic row id.
    */
  def lmOovStats(batch: DataFrame, dir: String,
                 textCol: String = "text",
                 asOf: Option[Int] = None): DataFrame = {
    val spark = batch.sparkSession
    val (_, _, nb) = metaOf(spark, dir, asOf)
    val vocab = vocabOf(spark, dir, asOf)
    val toks = batch.select(explode(split(col(textCol), " ")).as("tok"))
    val tokStats = toks
      .join(broadcast(vocab.select(col("tok"), lit(1).as("inv"))),
        Seq("tok"), "left")
      .agg(count(lit(1)).as("n_tokens"),
        sum(when(col("inv").isNull, 1L).otherwise(0L)).as("n_oov"))
    val bg = mappedBigrams(
      batch.select(monotonically_increasing_id().as("__row"), col(textCol)),
      vocab, idCol = "__row", textCol = textCol)
    val wanted = bg.select(wbCol(nb).as("wb")).distinct()
      .collect().map(_.getLong(0)).toSeq
    val bi = StoredIndex.readTable(spark, s"$dir/bi",
        "w1 STRING, w2 STRING, cnt BIGINT, seg INT, wb BIGINT", asOf)
      .filter(col("wb").isin(wanted: _*))
      .groupBy("w1", "w2").agg(sum(col("cnt")).as("cnt"))
    val bgStats = bg.join(bi, Seq("w1", "w2"), "left")
      .agg(count(lit(1)).as("n_bigrams"),
        sum(when(col("cnt").isNull || col("cnt") <= 0L, 1L).otherwise(0L))
          .as("n_unseen"))
    tokStats.crossJoin(bgStats)
      .select(col("n_tokens"), col("n_oov"), col("n_bigrams"),
        col("n_unseen"),
        (col("n_oov").cast("double") / col("n_tokens")).as("oov_frac"),
        (col("n_unseen").cast("double") / col("n_bigrams"))
          .as("unseen_frac"))
  }

  /** DECIDE one arrival batch against the committed model: per doc the
    * bigram surprise sum under the stored counts, admitted iff the mean
    * surprise is at or under `thrMean` (scaled by [[Scale]]; pick the
    * threshold from the reference distribution — q:`curate_lm_route` uses
    * the eval median). Docs under two tokens carry NO evidence and are
    * ADMITTED (n_bigrams 0, surprise_sum 0) — a gate answers for every
    * arrival. Returns (doc_id, n_bigrams, surprise_sum decimal(38,0),
    * admitted).
    *
    * Scale: ONE bounded driver collect (the batch's probed `wb` buckets,
    * <= nbuckets values regardless of batch size) pushed as a partition
    * filter on the bi LSM scan; context counts derive from the SAME pruned
    * slice (a w1's bucket always covers all its (w1,*) rows — `wb` hashes
    * w1 only); everything else is batch-sized. `asOf` serves any committed
    * version (quota-audit/reproducibility reads, the family contract).
    */
  def lmRoute(batch: DataFrame, dir: String, thrMean: Long,
              idCol: String = "doc_id", textCol: String = "text",
              asOf: Option[Int] = None): DataFrame = {
    val spark = batch.sparkSession
    val (_, v, nb) = metaOf(spark, dir, asOf)
    val bg = mappedBigrams(batch, vocabOf(spark, dir, asOf), idCol, textCol)
    // bounded collect: the batch's probed buckets (<= nbuckets values)
    val wanted = bg.select(wbCol(nb).as("wb")).distinct()
      .collect().map(_.getLong(0)).toSeq
    val pruned = StoredIndex.readTable(spark, s"$dir/bi",
        "w1 STRING, w2 STRING, cnt BIGINT, seg INT, wb BIGINT", asOf)
      .filter(col("wb").isin(wanted: _*))
    val bi = pruned.groupBy("w1", "w2").agg(sum(col("cnt")).as("cnt"))
    val ctx = pruned.groupBy("w1").agg(sum(col("cnt")).as("ctx"))
    val scored = bg
      .join(bi, Seq("w1", "w2"), "left")
      .join(ctx, Seq("w1"), "left")
      .select(col("doc_id"),
        surpriseBigram(col("ctx"), col("cnt"), v).as("surprise"))
      .groupBy("doc_id").agg(count(lit(1)).as("n_bigrams"),
        sum(col("surprise")).as("surprise_sum"))
    batch.select(col(idCol).cast("long").as("doc_id"))
      .join(scored, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        coalesce(col("surprise_sum"),
          lit(0L).cast("decimal(38,0)")).as("surprise_sum"),
        (col("n_bigrams").isNull ||
          col("surprise_sum") <= lit(thrMean).cast("decimal(38,0)") *
            col("n_bigrams")).as("admitted"))
  }
}
