package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables.t
import graft.operators.{Curation, LangModel}

/** Training-data curation coverage: sequence packing, deterministic
  * sampling, contamination screening, end-to-end curation — each an
  * oracle-checked query over the `documents` table.
  */
object CurationQueries {

  def textPack(spark: SparkSession, dir: String): DataFrame =
    Curation.packSequences(t(spark, dir, "documents"),
        budgetTokens = 2048, shards = 8)
      .orderBy("shard", "seq")

  def sampStratified(spark: SparkSession, dir: String): DataFrame =
    Curation.stratifiedSample(t(spark, dir, "documents"), perStratum = 40)
      .orderBy("lang", "rn")

  def sampHash(spark: SparkSession, dir: String): DataFrame =
    Curation.hashSampleStats(t(spark, dir, "documents"))
      .orderBy("source")

  def textContaminate(spark: SparkSession, dir: String): DataFrame =
    Curation.contamination(t(spark, dir, "documents"),
        benchFilter = col("id") % 50 === 0, k = 3, minOverlap = 3)
      .orderBy("bench_doc", "corpus_doc")

  /** Contamination against a FIXED held-out benchmark frame — the realistic
    * screen shape (small bench side, broadcast; see
    * [[Curation.contaminationAgainst]]). The benchmark here is derived as
    * 40-word excerpts of a deterministic document slice — the classic
    * "eval question quoted from a crawled page" leakage pattern, so the
    * screen is guaranteed genuine hits (the excerpt's source page at
    * minimum).
    */
  def textContaminateBench(spark: SparkSession, dir: String): DataFrame = {
    val docs = t(spark, dir, "documents")
    val bench = docs.filter(col("doc_id") % 97 === 0)
      .select(col("doc_id").as("bench_id"),
        array_join(slice(split(col("text"), " "), 1, 40), " ").as("text"))
    Curation.contaminationAgainst(docs, bench, k = 3, minOverlap = 3)
      .orderBy("bench_id", "corpus_doc")
  }

  /** PII scrub accounting over documents with PLANTED synthetic PII (the
    * corpus generator emits clean text, so the query deterministically
    * appends an email + an IPv4 per doc — the operator then has guaranteed
    * real matches to find, count, and mask, all oracle-checked).
    */
  def textRedact(spark: SparkSession, dir: String): DataFrame = {
    val docs = t(spark, dir, "documents")
    val withPii = docs.select(col("doc_id"),
      concat(col("text"), lit(" contact user"), col("doc_id"),
        lit("@example.com from 10.0."), col("doc_id") % 256, lit(".7"))
        .as("text"))
    Curation.redact(withPii)
      .select(col("doc_id"), col("n_emails"), col("n_ips"),
        length(col("redacted")).cast("long").as("redacted_len"))
      .orderBy("doc_id")
  }

  def curateStats(spark: SparkSession, dir: String): DataFrame =
    Curation.curatedStats(t(spark, dir, "documents"))
      .orderBy("lang", "source")

  def textChunk(spark: SparkSession, dir: String): DataFrame =
    Curation.chunkDocs(t(spark, dir, "documents"))
      .orderBy("doc_id", "chunk_no")

  /** Mixture targets: crawl-ish sources downsampled hard, curated-ish
    * sources kept at higher rates — arbitrary but deterministic 16th-rates
    * exercising the per-source threshold map plus the default fallback.
    */
  def sampDomainMix(spark: SparkSession, dir: String): DataFrame =
    Curation.domainMixSample(t(spark, dir, "documents"),
        rates = Map("src0" -> "2", "src1" -> "4", "src2" -> "8",
          "src3" -> "c"),
        defaultRate = "6")
      .orderBy("source")

  /** Token-BUDGETED mixture ([[Curation.tokenBudgetMix]] — the recipe
    * form of `samp_domain_mix`'s rates): three sources filled to exact
    * token budgets in content-hash order, one source budgeted ABOVE its
    * corpus (kept whole — the exhausted edge), every other source
    * excluded. The oracle replays the plain per-source ordered prefix
    * sum in DuckDB; the engine's two-pass bucket-cutoff plan must select
    * the identical document set (the distributed form is proven
    * equivalent to the sequential definition, hash-exact).
    */
  def sampTokenMix(spark: SparkSession, dir: String): DataFrame =
    Curation.tokenBudgetMix(t(spark, dir, "documents"),
        budgets = Map("src0" -> 800L, "src1" -> 400L, "src2" -> 1200L,
          "src3" -> 50000L))
      .orderBy("source")

  /** Token-budgeted mixture WITH UPSAMPLING ([[Curation
    * .tokenBudgetMixEpochs]] — the epochs form of the mix recipe:
    * budgets above a source's corpus repeat it in content-hash order,
    * the "books x2.5" knob). Budgets span the regimes at sf0.01:
    * src0 fills ~2.1 epochs (full passes + a partial), src1's budget
    * lands EXACTLY on its 3-epoch boundary (remainder 0, no partial
    * runs), src2 stays sub-epoch (reduces to the plain mix). The
    * oracle replays the closed form in DuckDB — integer epoch division
    * plus the same windowed prefix sum for the partial pass.
    */
  def sampTokenMixEpochs(spark: SparkSession, dir: String): DataFrame =
    Curation.tokenBudgetMixEpochs(t(spark, dir, "documents"),
        budgets = Map("src0" -> 3000L, "src1" -> 4620L, "src2" -> 700L))
      .orderBy("source")

  /** The stateful BUDGET GATE ([[Curation.budgetRoute]] — per-source
    * token quotas as an admission decision, the capacity half of the
    * `curate_route` story) driven through TWO sequential batches: the
    * gate is initialized with four budgets, the even-id half of the
    * corpus is decided and LEARNED ([[Curation.recordBudgetFills]] — one
    * committed fills delta), and the emitted decisions are the ODD
    * half's — every admitted/rejected verdict depends on the fill state
    * the first batch committed. Budgets span the regimes: crossing in
    * batch 2, already-filled by batch 1, never crossing, and unbudgeted
    * sources (rejected, not dropped). The oracle replays both batches'
    * content-hash-ordered prefix sums in DuckDB — the gate's
    * cross-batch state arithmetic proven hash-exact through an
    * independent engine.
    */
  def curateBudgetRoute(spark: SparkSession, dir: String): DataFrame = {
    val docs = t(spark, dir, "documents")
    val base = graft.Caches.stagedPath("budget-gate", dir) { b =>
      Curation.writeBudgetGate(spark, b,
        Map("src0" -> 900L, "src1" -> 300L, "src2" -> 5000L,
          "src3" -> 10000L))
      Curation.recordBudgetFills(
        Curation.budgetRoute(docs.filter(col("doc_id") % 2 === 0), b), b)
      ()
    }
    Curation.budgetRoute(docs.filter(col("doc_id") % 2 === 1), base)
      .orderBy("source", "doc_id")
  }

  def curateQualityCut(spark: SparkSession, dir: String): DataFrame =
    Curation.qualityQuantileCut(t(spark, dir, "documents"), p = 0.25)
      .orderBy("lang")

  /** The stored-LM perplexity gate ([[LangModel]]) in its batch harness:
    * train the reference model on the `doc_id % 4 = 0` corpus slice
    * (vocabTop 200 — small enough that the `<unk>` path carries real
    * mass), then decide EVERY other document against the committed
    * counts. thrMean 35e6 sits at the eval-slice median of the scaled
    * mean-surprise distribution (measured at sf0.01), so the gate
    * genuinely splits the corpus. The DuckDB oracle RETRAINS the model
    * (vocab top-k, mapped bigram counts) and replays the integer-exact
    * surprise arithmetic — train and serve proven consistent
    * cross-engine, the `text_bm25_bpe` discipline.
    */
  def curateLmRoute(spark: SparkSession, dir: String): DataFrame = {
    val docs = t(spark, dir, "documents")
    val base = graft.Caches.stagedPath("lm-index", dir) { b =>
      LangModel.writeLmIndex(docs.filter(col("doc_id") % 4 === 0), b,
        vocabTop = 200)
    }
    LangModel.lmRoute(docs.filter(col("doc_id") % 4 =!= 0), base,
        thrMean = 35000000L)
      .withColumn("surprise_sum", col("surprise_sum").cast("long"))
      .orderBy("doc_id")
  }

  /** The ORDER-3 stored LM (Stupid Backoff at α = 2/5, r16) through the
    * same standalone-gate harness: trained on the `doc_id % 4 = 0`
    * slice at order 3, every other document decided against the
    * committed trigram + bigram counts. The DuckDB oracle retrains
    * vocab, bigram AND trigram counts and replays the exact-integer
    * backoff rule in HUGEINT — the trigram level scores seen contexts,
    * the unseen ones back off to 5/2 x the bigram Laplace score.
    * thrMean sits near the eval-slice median of the order-3 scaled
    * mean-surprise distribution (measured at sf0.01).
    */
  def curateLm3Route(spark: SparkSession, dir: String): DataFrame = {
    val docs = t(spark, dir, "documents")
    val base = graft.Caches.stagedPath("lm3-index", dir) { b =>
      LangModel.writeLmIndex(docs.filter(col("doc_id") % 4 === 0), b,
        vocabTop = 200, order = 3)
    }
    LangModel.lmRoute(docs.filter(col("doc_id") % 4 =!= 0), base,
        thrMean = 73000000L)
      .withColumn("surprise_sum", col("surprise_sum").cast("long"))
      .orderBy("doc_id")
  }

  def sampSplit(spark: SparkSession, dir: String): DataFrame =
    Curation.splitStats(t(spark, dir, "documents"))
      .orderBy("split")

  /** Column profile (the ANALYZE-style data-quality pass a pipeline runs
    * before trusting a new drop): one aggregation pass computes row count,
    * null count, distinct count, and min/max per profiled column, emitted
    * long (one row per column). Exact distincts here because the oracle
    * demands determinism; at 100 TB flip `spark.graft.approxDistinct
    * .enabled` (see [[graft.plans.ApproxDistinctRewrite]]) and the same
    * query plans as mergeable HLL sketches.
    */
  def qProfile(spark: SparkSession, dir: String): DataFrame = {
    val docs = t(spark, dir, "documents")
    val cols = Seq("lang", "source", "text")
    val wide = docs.agg(
      count(lit(1)).as("n_rows"),
      cols.flatMap(c => Seq(
        count(when(col(c).isNull, 1)).as(s"nulls_$c"),
        count_distinct(col(c)).as(s"distinct_$c"),
        min(col(c)).as(s"min_$c"),
        max(col(c)).as(s"max_$c"))): _*)
    val rows = cols.map(c => struct(lit(c).as("col_name"),
      col("n_rows"), col(s"nulls_$c").as("n_nulls"),
      col(s"distinct_$c").as("n_distinct"),
      substring(col(s"min_$c"), 1, 16).as("min_prefix"),
      substring(col(s"max_$c"), 1, 16).as("max_prefix")))
    wide.select(explode(array(rows: _*)).as("p")).select("p.*")
      .orderBy("col_name")
  }

  /** C4-style segment dedup with PLANTED boilerplate (the corpus generator
    * emits unique texts, so the query deterministically prefixes a fixed
    * 10-word banner to every 7th document — exactly one tumbling segment,
    * so the operator has guaranteed cross-document duplicates to strip
    * while every original segment survives untouched).
    */
  def curateLineDedup(spark: SparkSession, dir: String): DataFrame = {
    val docs = t(spark, dir, "documents")
    val boiler =
      "cookie policy terms subscribe newsletter follow share like privacy notice"
    val planted = docs.select(col("doc_id"),
      when(col("doc_id") % 7 === 0, concat(lit(boiler + " "), col("text")))
        .otherwise(col("text")).as("text"))
    Curation.lineDedup(planted, segWords = 10, dupMin = 3).orderBy("doc_id")
  }

  /** Declarative data-quality expectations over orders with PLANTED
    * corruption (every 500th order re-enters with a negated price and an
    * out-of-range customer key — the generator's data is clean, so the
    * report needs guaranteed violations to prove it counts): three row
    * rules in one aggregation pass + a referential-integrity orphan check
    * against customer, union'd into one (rule, rows, violations, rate)
    * report.
    */
  def qExpectations(spark: SparkSession, dir: String): DataFrame = {
    import graft.operators.Expectations
    val o = t(spark, dir, "orders").select("o_orderkey", "o_custkey",
      "o_totalprice", "o_orderpriority", "o_orderdate")
    val corrupted = o.filter(col("o_orderkey") % 500 === 0)
      .withColumn("o_totalprice", -col("o_totalprice"))
      .withColumn("o_custkey", col("o_custkey") + lit(10000000L))
    val aug = o.unionByName(corrupted)
    val rowRules = Expectations.check(aug, Seq(
      Expectations.Rule("date_not_null", col("o_orderdate").isNotNull),
      Expectations.Rule("price_positive", col("o_totalprice") > 0),
      Expectations.Rule("priority_known", col("o_orderpriority").isin(
        "1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"))))
    val fk = Expectations.orphans(aug, "o_custkey",
      t(spark, dir, "customer"), "c_custkey", "fk_customer")
    rowRules.unionByName(fk).orderBy("rule")
  }

  /** Substring-level dedup with a PLANTED shared span at a PER-DOC VARYING
    * offset: a fixed 25-word passage is spliced into every 7th document
    * after its first `doc_id % 10` words, so the splice point cycles
    * through every residue mod the tumbling width — the offset-invariance
    * sliding windows buy. Stride-1 windows recover the full 25-token span
    * as ONE maximal merged span for EVERY planted doc regardless of
    * offset; tumbling segment hashes ([[Curation.lineDedup]]) only ever
    * see the aligned fraction, and CurationSpec pins the strict-miss case
    * (two docs, offsets 3 and 7, tumbling finds nothing).
    */
  def curateSubstringDedup(spark: SparkSession, dir: String): DataFrame = {
    val docs = t(spark, dir, "documents")
    val passage = "the quick brown fox jumps over the lazy dog while " +
      "seven wizards brew strong potions beneath ancient oak trees near " +
      "the silver river bank tonight"
    val toks = split(col("text"), " ")
    val off = (col("doc_id") % 10).cast("int")
    val planted = docs.select(col("doc_id"),
      when(col("doc_id") % 7 === 0,
        concat_ws(" ", concat(slice(toks, lit(1), off),
          split(lit(passage), " "),
          slice(toks, off + 1, size(toks)))))
        .otherwise(col("text")).as("text"))
    Curation.substringDedup(planted, segWords = 10, dupMin = 2)
      .orderBy("doc_id")
  }

  /** The APPLY side over the same planted fixture as
    * [[curateSubstringDedup]]: documents are REBUILT with their duplicated
    * spans removed (planted docs lose exactly the 25-word passage and
    * reassemble to their pre-splice text whenever the splice boundaries
    * don't duplicate; untouched docs pass through byte-identical). The
    * whole rebuilt corpus is oracle hash-checked cell-exact.
    */
  def curateSubstringApply(spark: SparkSession, dir: String): DataFrame = {
    val docs = t(spark, dir, "documents")
    val passage = "the quick brown fox jumps over the lazy dog while " +
      "seven wizards brew strong potions beneath ancient oak trees near " +
      "the silver river bank tonight"
    val toks = split(col("text"), " ")
    val off = (col("doc_id") % 10).cast("int")
    val planted = docs.select(col("doc_id"),
      when(col("doc_id") % 7 === 0,
        concat_ws(" ", concat(slice(toks, lit(1), off),
          split(lit(passage), " "),
          slice(toks, off + 1, size(toks)))))
        .otherwise(col("text")).as("text"))
    Curation.substringDedupApply(planted, segWords = 10, dupMin = 2)
      .orderBy("doc_id")
  }

  /** LM-scored quality cut with PLANTED gibberish (every 97th document's
    * text becomes 30 doc-unique nonsense tokens, so its bigrams are
    * guaranteed corpus-unseen and the rare-fraction threshold provably
    * bites at any sf — the planted-corruption pattern of
    * [[qExpectations]]).
    */
  def curateLmCut(spark: SparkSession, dir: String): DataFrame = {
    val docs = t(spark, dir, "documents")
    val gib = concat_ws(" ", transform(sequence(lit(1), lit(30)),
      i => concat(lit("zq"), col("doc_id").cast("string"), lit("x"),
        i.cast("string"))))
    val planted = docs.withColumn("text",
      when(col("doc_id") % 97 === 0, gib).otherwise(col("text")))
    Curation.lmQualityCut(planted).orderBy("lang")
  }

  /** Unicode + whitespace normalization over documents with PLANTED messy
    * re-entries (the corpus generator emits clean ASCII, so the query
    * deterministically re-enters every 97th document through the classic
    * crawl noise: an NFD-decomposed accent prefix, a BEL control byte,
    * NBSP/LINE-SEPARATOR/IDEOGRAPHIC-SPACE runs, and trailing Unicode
    * whitespace — [[Curation.normalizeDocs]] must compose, strip, collapse,
    * and trim all of it, cell-exactly matching DuckDB's `nfc_normalize`).
    * The NFD prefix "cafe&#x301;" normalizes to the 4-char NFC "café" — the
    * composition is visible in `n_removed`.
    */
  def curateNormalize(spark: SparkSession, dir: String): DataFrame = {
    val docs = t(spark, dir, "documents").select(col("doc_id"), col("text"))
    // NFD e+U+0301, BEL, NBSP NBSP, LINE SEPARATOR, IDEOGRAPHIC SPACE,
    // trailing space+NBSP — explicit escapes so the oracle's chr() calls
    // mirror them codepoint for codepoint
    val messy = docs.filter(col("doc_id") % 97 === 0)
      .select((col("doc_id") + 50000000L).as("doc_id"),
        concat(lit("cafe\u0301 \u0007 "), col("text"),
          lit("\u00a0\u00a0over\u2028the\u3000line \u00a0")).as("text"))
    Curation.normalizeDocs(docs.unionByName(messy)).orderBy("doc_id")
  }

  /** The flagship composition ([[Curation.curatePipeline]]): normalize →
    * quality floor → exact dedup → near-dup screen → contamination screen
    * → pack, one oracle-hashed manifest. PLANTED mess proves the
    * normalize→dedup composition end to end: every 100th document
    * re-enters under a shifted id wrapped in crawl noise (BEL prefix,
    * NBSP/LINE-SEPARATOR trailer) — normalization reduces it to an EXACT
    * copy of its original, so the exact-dedup stage must drop every
    * planted row (a normalize-then-hash divergence anywhere would leak
    * them into the manifest). The near-dup and contamination screens run
    * on the generator's natural near-duplicates and the `% 97` held-out
    * slice.
    */
  /** The planted pipeline corpus shared by `curate_pipeline` and
    * `curate_route`: raw docs plus crawl-noise exact copies of every
    * 100th under shifted ids (BEL + space prefix, NBSP/space/
    * LINE-SEPARATOR trailer — explicit escapes so the oracle chr() calls
    * mirror them codepoint for codepoint, the curate_normalize
    * convention).
    */
  private def plantedDocs(spark: SparkSession, dir: String): DataFrame = {
    val docs = t(spark, dir, "documents").select(col("doc_id"), col("text"))
    val messy = docs.filter(col("doc_id") % 100 === 0)
      .select((col("doc_id") + 10000000L).as("doc_id"),
        concat(lit("\u0007 "), col("text"), lit("\u00a0 \u2028"))
          .as("text"))
    docs.unionByName(messy)
  }

  def curatePipeline(spark: SparkSession, dir: String): DataFrame =
    Curation.curatePipeline(plantedDocs(spark, dir)).orderBy("shard", "seq")

  /** The TRAIN-READY DATASET BUILD ([[Curation.datasetBuild]]): curate
    * (the full planted pipeline) -> token-budget mix (four budgeted
    * sources, content-hash fill over the curated text) -> pack (512-token
    * sequences, 4 shards). One manifest, three composed stages, one
    * DuckDB replay — the flagship composition extended by the mix
    * recipe.
    */
  def curateDatasetBuild(spark: SparkSession, dir: String): DataFrame =
    Curation.datasetBuild(plantedDocs(spark, dir),
        t(spark, dir, "documents").select(col("doc_id"), col("source")),
        Map("src0" -> 800L, "src1" -> 400L, "src2" -> 1200L,
          "src3" -> 50000L),
        budgetTokens = 512, shards = 4)
      .orderBy("shard", "seq")

  /** The streaming admission gate ([[Curation.curateRoute]]) run in its
    * batch harness over the SAME planted corpus, against the staged
    * [[Curation.writeCurateIndex]] state — every per-document decision
    * (accepted + first-failing reason) replayed and hash-checked in
    * DuckDB. CurationSpec separately proves the MemoryStream replay of
    * this operator admits exactly the batch keep set; this query makes
    * the decision TABLE itself oracle-exact, including the reason
    * column's pipeline ordering.
    */
  def curateRouteQ(spark: SparkSession, dir: String): DataFrame = {
    val planted = plantedDocs(spark, dir)
    val base = graft.Caches.stagedPath("curate-index", dir) { b =>
      Curation.writeCurateIndex(planted, b)
    }
    Curation.curateRoute(planted, base).orderBy("doc_id")
  }

  /** The admission gate WITH the stored-LM perplexity verdict composed in
    * (the CCNet stage order: dedup verdicts first, then the LM cut) — the
    * reference model trained on the NORMALIZED `doc_id % 4 = 0` slice of
    * the same planted corpus, thr at the ~p80 of the mean-surprise
    * distribution so a realistic tail cuts. The whole decision table —
    * curation reasons AND the new `perplexity` reason — hash-checks
    * against one DuckDB replay of pipeline + LM train + scoring. The
    * curate index is the same staged build `curate_route` uses (shared
    * cache key), so the two queries differ only by the LM leg.
    */
  def curateRouteLm(spark: SparkSession, dir: String): DataFrame = {
    val planted = plantedDocs(spark, dir)
    val base = graft.Caches.stagedPath("curate-index", dir) { b =>
      Curation.writeCurateIndex(planted, b)
    }
    val lmBase = graft.Caches.stagedPath("lm-index-norm", dir) { b =>
      LangModel.writeLmIndex(
        Curation.normalizeDocs(planted)
          .select(col("doc_id"), col("norm").as("text"))
          .filter(col("doc_id") % 4 === 0), b, vocabTop = 200)
    }
    Curation.curateRoute(planted, base, lmDir = Some(lmBase),
        lmThr = 36000000L)
      .orderBy("doc_id")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "curate_pipeline" -> curatePipeline,
    "curate_dataset_build" -> curateDatasetBuild,
    "curate_route" -> curateRouteQ,
    "curate_route_lm" -> curateRouteLm,
    "text_pack" -> textPack,
    "curate_normalize" -> curateNormalize,
    "curate_line_dedup" -> curateLineDedup,
    "curate_substring_dedup" -> curateSubstringDedup,
    "curate_substring_apply" -> curateSubstringApply,
    "curate_lm_cut" -> curateLmCut,
    "q_expectations" -> qExpectations,
    "samp_stratified" -> sampStratified,
    "samp_hash" -> sampHash,
    "samp_split" -> sampSplit,
    "q_profile" -> qProfile,
    "text_contaminate" -> textContaminate,
    "text_contaminate_bench" -> textContaminateBench,
    "text_redact" -> textRedact,
    "text_chunk" -> textChunk,
    "samp_domain_mix" -> sampDomainMix,
    "samp_token_mix" -> sampTokenMix,
    "samp_token_mix_epochs" -> sampTokenMixEpochs,
    "curate_budget_route" -> curateBudgetRoute,
    "curate_lm_route" -> curateLmRoute,
    "curate_lm3_route" -> curateLm3Route,
    "curate_quality_cut" -> curateQualityCut,
    "curate_stats" -> curateStats)

  /** Shared replay of the pipeline stages both `curate_pipeline` and
    * `curate_route` hash against: planted-mess union -> normalize (the
    * curate_normalize expressions) -> token floor -> min-id exact dedup
    * -> the df-cut shingle chain (the dedup_ngram_jaccard CTEs, over the
    * deduped frame) -> the near-dup drop set (larger id of each pair at
    * Jaccard >= 0.6) and the %97 contamination drop set.
    */
  private val pipelineCtes: String =
    """u AS (SELECT doc_id, text FROM documents
      |  UNION ALL
      |  SELECT doc_id + 10000000,
      |    chr(7) || ' ' || text || chr(160) || ' ' || chr(8232)
      |  FROM documents WHERE doc_id % 100 = 0),
      |norm AS (SELECT doc_id, trim(regexp_replace(
      |    nfc_normalize(regexp_replace(text,
      |      '[\x00-\x08\x0B\x0C\x0E-\x1F\x7F]', '', 'g')),
      |    '[\t\n\x0B\f\r \x{0085}\x{00A0}\x{1680}\x{2000}-\x{200A}\x{2028}\x{2029}\x{202F}\x{205F}\x{3000}]+',
      |    ' ', 'g')) AS text
      |  FROM u),
      |flo AS (SELECT doc_id, text FROM norm
      |        WHERE len(string_split(text, ' ')) >= 20),
      |ex AS (SELECT MIN(doc_id) AS doc_id, text FROM flo GROUP BY text),
      |tok AS (SELECT doc_id, string_split(text, ' ') AS toks FROM ex),
      |idx AS (SELECT doc_id, toks,
      |          unnest(generate_series(1, len(toks)-2)) AS i FROM tok),
      |sh0 AS (SELECT DISTINCT doc_id AS id,
      |          array_to_string(toks[i:i+2], ' ') AS shingle FROM idx),
      |df AS (SELECT shingle FROM sh0 GROUP BY shingle
      |       HAVING COUNT(*) <= 1000),
      |sh AS (SELECT sh0.id, sh0.shingle FROM sh0 JOIN df USING (shingle)),
      |sizes AS (SELECT id, COUNT(*) AS n FROM sh GROUP BY id),
      |inter AS (SELECT a.id AS da, b.id AS db, COUNT(*) AS inter
      |          FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.id < b.id
      |          GROUP BY a.id, b.id),
      |neardrop AS (SELECT DISTINCT db AS doc_id
      |             FROM inter JOIN sizes x ON da = x.id
      |               JOIN sizes y ON db = y.id
      |             WHERE CAST(inter AS DOUBLE) / (x.n + y.n - inter) >= 0.6),
      |ov AS (SELECT b.id AS bench_doc, c.id AS corpus_doc,
      |         COUNT(*) AS overlap
      |       FROM (SELECT id, shingle FROM sh WHERE id % 97 = 0) b
      |       JOIN (SELECT id, shingle FROM sh WHERE id % 97 <> 0) c
      |         USING (shingle)
      |       GROUP BY 1, 2),
      |contdrop AS (SELECT DISTINCT corpus_doc AS doc_id FROM ov
      |             WHERE overlap >= 3)""".stripMargin

  /** The stored-LM train + score replay as a CTE chain ending in
    * `agg(doc_id, n_bigrams, surprise_sum)` — shared by the standalone
    * gate oracle (`curate_lm_route`) and the pipeline composition
    * (`curate_route_lm`). `refSel`/`evSel` are FROM-clause fragments
    * (table-or-CTE plus WHERE); no trailing comma — callers append one
    * when chaining further CTEs.
    */
  private def lmCtes(refSel: String, evSel: String): String =
    s"""ref AS (SELECT string_split(text, ' ') AS toks FROM $refSel),
      |uni AS (SELECT unnest(toks) AS tok FROM ref),
      |voc AS (SELECT tok FROM (
      |          SELECT tok, COUNT(*) AS cnt FROM uni GROUP BY tok
      |          ORDER BY cnt DESC, tok LIMIT 200)),
      |vv AS (SELECT COUNT(*) + 1 AS v FROM voc),
      |rbg0 AS (SELECT toks[i] AS r1, toks[i+1] AS r2
      |         FROM (SELECT toks,
      |                 unnest(generate_series(1, len(toks)-1)) AS i
      |               FROM ref WHERE len(toks) >= 2)),
      |rbg AS (SELECT
      |          CASE WHEN v1.tok IS NOT NULL THEN r1
      |               ELSE '<unk>' END AS w1,
      |          CASE WHEN v2.tok IS NOT NULL THEN r2
      |               ELSE '<unk>' END AS w2
      |        FROM rbg0 LEFT JOIN voc v1 ON r1 = v1.tok
      |                  LEFT JOIN voc v2 ON r2 = v2.tok),
      |bi AS (SELECT w1, w2, COUNT(*) AS cnt FROM rbg GROUP BY w1, w2),
      |ctx AS (SELECT w1, SUM(cnt) AS ctx FROM bi GROUP BY w1),
      |ev AS (SELECT doc_id, string_split(text, ' ') AS toks
      |       FROM $evSel),
      |ebg0 AS (SELECT doc_id, toks[i] AS r1, toks[i+1] AS r2
      |         FROM (SELECT doc_id, toks,
      |                 unnest(generate_series(1, len(toks)-1)) AS i
      |               FROM ev WHERE len(toks) >= 2)),
      |ebg AS (SELECT doc_id,
      |          CASE WHEN v1.tok IS NOT NULL THEN r1
      |               ELSE '<unk>' END AS w1,
      |          CASE WHEN v2.tok IS NOT NULL THEN r2
      |               ELSE '<unk>' END AS w2
      |        FROM ebg0 LEFT JOIN voc v1 ON r1 = v1.tok
      |                  LEFT JOIN voc v2 ON r2 = v2.tok),
      |sc AS (SELECT doc_id,
      |         (CAST(1000000 AS HUGEINT) * (COALESCE(ctx.ctx, 0) + vv.v))
      |           // (COALESCE(bi.cnt, 0) + 1) AS surprise
      |       FROM ebg LEFT JOIN bi USING (w1, w2)
      |                LEFT JOIN ctx ON ebg.w1 = ctx.w1
      |                CROSS JOIN vv),
      |agg AS (SELECT doc_id, COUNT(*) AS n_bigrams,
      |          CAST(SUM(surprise) AS BIGINT) AS surprise_sum
      |        FROM sc GROUP BY doc_id)""".stripMargin

  /** The ORDER-3 retrain + Stupid-Backoff replay (q:`curate_lm3_route`):
    * vocab + bigram + trigram counts retrained on `refSel`, every
    * `evSel` doc scored per trigram position — seen trigrams pay
    * (Scale * c(w1w2)) // c(w1w2w3), unseen ones back off to
    * (Scale * 5 * (c(w2)+V)) // (2 * (c(w2w3)+1)) — all HUGEINT, ending
    * in `agg3(doc_id, n_trigrams, surprise_sum)`. Mirrors
    * [[graft.operators.LangModel.surpriseTrigram]]; change the scoring
    * in both places or hashes drift.
    */
  private def lm3Ctes(refSel: String, evSel: String): String =
    s"""ref AS (SELECT string_split(text, ' ') AS toks FROM $refSel),
      |uni AS (SELECT unnest(toks) AS tok FROM ref),
      |voc AS (SELECT tok FROM (
      |          SELECT tok, COUNT(*) AS cnt FROM uni GROUP BY tok
      |          ORDER BY cnt DESC, tok LIMIT 200)),
      |vv AS (SELECT COUNT(*) + 1 AS v FROM voc),
      |rbg0 AS (SELECT toks[i] AS r1, toks[i+1] AS r2
      |         FROM (SELECT toks,
      |                 unnest(generate_series(1, len(toks)-1)) AS i
      |               FROM ref WHERE len(toks) >= 2)),
      |rbg AS (SELECT
      |          CASE WHEN v1.tok IS NOT NULL THEN r1
      |               ELSE '<unk>' END AS w1,
      |          CASE WHEN v2.tok IS NOT NULL THEN r2
      |               ELSE '<unk>' END AS w2
      |        FROM rbg0 LEFT JOIN voc v1 ON r1 = v1.tok
      |                  LEFT JOIN voc v2 ON r2 = v2.tok),
      |bi AS (SELECT w1, w2, COUNT(*) AS cnt FROM rbg GROUP BY w1, w2),
      |ctx AS (SELECT w1, SUM(cnt) AS ctx FROM bi GROUP BY w1),
      |rtg0 AS (SELECT toks[i] AS r1, toks[i+1] AS r2, toks[i+2] AS r3
      |         FROM (SELECT toks,
      |                 unnest(generate_series(1, len(toks)-2)) AS i
      |               FROM ref WHERE len(toks) >= 3)),
      |rtg AS (SELECT
      |          CASE WHEN v1.tok IS NOT NULL THEN r1
      |               ELSE '<unk>' END AS w1,
      |          CASE WHEN v2.tok IS NOT NULL THEN r2
      |               ELSE '<unk>' END AS w2,
      |          CASE WHEN v3.tok IS NOT NULL THEN r3
      |               ELSE '<unk>' END AS w3
      |        FROM rtg0 LEFT JOIN voc v1 ON r1 = v1.tok
      |                  LEFT JOIN voc v2 ON r2 = v2.tok
      |                  LEFT JOIN voc v3 ON r3 = v3.tok),
      |tri AS (SELECT w1, w2, w3, COUNT(*) AS cnt FROM rtg
      |        GROUP BY w1, w2, w3),
      |ev AS (SELECT doc_id, string_split(text, ' ') AS toks
      |       FROM $evSel),
      |etg0 AS (SELECT doc_id, toks[i] AS r1, toks[i+1] AS r2,
      |           toks[i+2] AS r3
      |         FROM (SELECT doc_id, toks,
      |                 unnest(generate_series(1, len(toks)-2)) AS i
      |               FROM ev WHERE len(toks) >= 3)),
      |etg AS (SELECT doc_id,
      |          CASE WHEN v1.tok IS NOT NULL THEN r1
      |               ELSE '<unk>' END AS w1,
      |          CASE WHEN v2.tok IS NOT NULL THEN r2
      |               ELSE '<unk>' END AS w2,
      |          CASE WHEN v3.tok IS NOT NULL THEN r3
      |               ELSE '<unk>' END AS w3
      |        FROM etg0 LEFT JOIN voc v1 ON r1 = v1.tok
      |                  LEFT JOIN voc v2 ON r2 = v2.tok
      |                  LEFT JOIN voc v3 ON r3 = v3.tok),
      |sc3 AS (SELECT doc_id,
      |          CASE WHEN COALESCE(t.cnt, 0) > 0
      |            THEN (CAST(1000000 AS HUGEINT) * COALESCE(b12.cnt, 0))
      |                   // t.cnt
      |            ELSE (CAST(5000000 AS HUGEINT)
      |                    * (COALESCE(c2.ctx, 0) + vv.v))
      |                   // (2 * (COALESCE(b23.cnt, 0) + 1)) END
      |            AS surprise
      |        FROM etg LEFT JOIN tri t USING (w1, w2, w3)
      |                 LEFT JOIN bi b12
      |                   ON etg.w1 = b12.w1 AND etg.w2 = b12.w2
      |                 LEFT JOIN bi b23
      |                   ON etg.w2 = b23.w1 AND etg.w3 = b23.w2
      |                 LEFT JOIN ctx c2 ON etg.w2 = c2.w1
      |                 CROSS JOIN vv),
      |agg3 AS (SELECT doc_id, COUNT(*) AS n_trigrams,
      |           CAST(SUM(surprise) AS BIGINT) AS surprise_sum
      |         FROM sc3 GROUP BY doc_id)""".stripMargin

  val oracles: Map[String, String] = Map(
    // the order-3 stored-LM replay: retrain vocab + bi + tri on the
    // reference slice, score with the exact-integer Stupid Backoff
    "curate_lm3_route" ->
      s"""WITH ${lm3Ctes("documents WHERE doc_id % 4 = 0",
                         "documents WHERE doc_id % 4 <> 0")}
        |SELECT d.doc_id,
        |  COALESCE(a.n_trigrams, 0) AS n_trigrams,
        |  COALESCE(a.surprise_sum, 0) AS surprise_sum,
        |  (a.n_trigrams IS NULL
        |    OR a.surprise_sum <= 73000000 * a.n_trigrams) AS admitted
        |FROM (SELECT doc_id FROM documents WHERE doc_id % 4 <> 0) d
        |LEFT JOIN agg3 a USING (doc_id)
        |ORDER BY d.doc_id""".stripMargin,
    // The flagship composition, replayed stage for stage: planted-mess
    // union -> normalize (the curate_normalize expressions) -> token floor
    // -> min-id exact dedup -> the shared df-cut shingle chain (the
    // dedup_ngram_jaccard CTEs, over the deduped frame) feeding BOTH the
    // near-dup pair screen and the %97 contamination screen -> pack (the
    // text_pack expressions over the final keep set).
    "curate_pipeline" ->
      s"""WITH $pipelineCtes,
        |fin AS (SELECT doc_id, text FROM ex
        |        WHERE doc_id % 97 <> 0
        |          AND doc_id NOT IN (SELECT doc_id FROM neardrop)
        |          AND doc_id NOT IN (SELECT doc_id FROM contdrop)),
        |ptok AS (SELECT doc_id, doc_id % 8 AS shard,
        |           CAST(len(string_split(text, ' ')) AS BIGINT) AS tokens
        |         FROM fin),
        |off AS (SELECT doc_id, shard, tokens,
        |          CAST(COALESCE(SUM(tokens) OVER (PARTITION BY shard
        |            ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING
        |            AND 1 PRECEDING), 0) AS BIGINT) AS start
        |        FROM ptok)
        |SELECT shard, CAST(start // 2048 AS BIGINT) AS seq,
        |  COUNT(*) AS n_docs, CAST(SUM(tokens) AS BIGINT) AS sum_tokens,
        |  MIN(doc_id) AS first_doc, MAX(doc_id) AS last_doc
        |FROM off GROUP BY shard, seq ORDER BY shard, seq""".stripMargin,
    // curate -> mix -> pack in one replay: the keep set (fin) joins its
    // sources, the budget prefix-sum selects, the pack lays out the
    // selection
    "curate_dataset_build" ->
      s"""WITH $pipelineCtes,
        |fin AS (SELECT doc_id, text FROM ex
        |        WHERE doc_id % 97 <> 0
        |          AND doc_id NOT IN (SELECT doc_id FROM neardrop)
        |          AND doc_id NOT IN (SELECT doc_id FROM contdrop)),
        |b(source, budget) AS (VALUES
        |    ('src0', 800), ('src1', 400), ('src2', 1200), ('src3', 50000)),
        |mt AS (SELECT d.source, f.doc_id, md5(f.text) AS h,
        |         CAST(len(string_split(f.text, ' ')) AS BIGINT) AS tokens,
        |         b.budget
        |       FROM fin f JOIN documents d USING (doc_id)
        |                  JOIN b ON d.source = b.source),
        |mc AS (SELECT *, COALESCE(SUM(tokens) OVER (
        |         PARTITION BY source ORDER BY h, doc_id
        |         ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |         AS bef
        |       FROM mt),
        |sel AS (SELECT doc_id FROM mc WHERE bef < budget),
        |ptok AS (SELECT f.doc_id, f.doc_id % 4 AS shard,
        |           CAST(len(string_split(f.text, ' ')) AS BIGINT)
        |             AS tokens
        |         FROM fin f JOIN sel USING (doc_id)),
        |off AS (SELECT doc_id, shard, tokens,
        |          CAST(COALESCE(SUM(tokens) OVER (PARTITION BY shard
        |            ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING
        |            AND 1 PRECEDING), 0) AS BIGINT) AS start
        |        FROM ptok)
        |SELECT shard, CAST(start // 512 AS BIGINT) AS seq,
        |  COUNT(*) AS n_docs, CAST(SUM(tokens) AS BIGINT) AS sum_tokens,
        |  MIN(doc_id) AS first_doc, MAX(doc_id) AS last_doc
        |FROM off GROUP BY shard, seq ORDER BY shard, seq""".stripMargin,
    // The admission gate's per-document decision table: the SAME CTE
    // chain feeding a first-failing-reason CASE in the route's pipeline
    // order (quality -> exact_dup -> near_dup -> contaminated ->
    // held_out). `keeper` joins on normalized text over the floored
    // frame, so an exact copy resolves to its min-id original.
    "curate_route" ->
      s"""WITH $pipelineCtes,
        |nt AS (SELECT doc_id, text,
        |         CAST(len(string_split(text, ' ')) AS BIGINT) AS ntok
        |       FROM norm),
        |kp AS (SELECT text, MIN(doc_id) AS keeper FROM nt
        |       WHERE ntok >= 20 GROUP BY text),
        |dec AS (SELECT n.doc_id,
        |  CASE WHEN n.ntok < 20 THEN 'quality'
        |       WHEN k.keeper < n.doc_id THEN 'exact_dup'
        |       WHEN n.doc_id IN (SELECT doc_id FROM neardrop)
        |         THEN 'near_dup'
        |       WHEN n.doc_id IN (SELECT doc_id FROM contdrop)
        |         THEN 'contaminated'
        |       WHEN n.doc_id % 97 = 0 THEN 'held_out'
        |       ELSE NULL END AS reason
        |  FROM nt n LEFT JOIN kp k ON n.text = k.text)
        |SELECT doc_id, reason IS NULL AS accepted, reason
        |FROM dec ORDER BY doc_id""".stripMargin,
    "curate_normalize" ->
      """WITH u AS (SELECT doc_id, text FROM documents
        |  UNION ALL
        |  SELECT doc_id + 50000000,
        |    'cafe' || chr(769) || ' ' || chr(7) || ' ' || text ||
        |    chr(160) || chr(160) || 'over' || chr(8232) || 'the' ||
        |    chr(12288) || 'line ' || chr(160)
        |  FROM documents WHERE doc_id % 97 = 0),
        |n AS (SELECT doc_id, length(text) AS n_raw,
        |  trim(regexp_replace(
        |    nfc_normalize(regexp_replace(text,
        |      '[\x00-\x08\x0B\x0C\x0E-\x1F\x7F]', '', 'g')),
        |    '[\t\n\x0B\f\r \x{0085}\x{00A0}\x{1680}\x{2000}-\x{200A}\x{2028}\x{2029}\x{202F}\x{205F}\x{3000}]+',
        |    ' ', 'g')) AS norm
        |  FROM u)
        |SELECT doc_id, norm, CAST(length(norm) AS BIGINT) AS n_chars_norm,
        |  CAST(n_raw - length(norm) AS BIGINT) AS n_removed
        |FROM n ORDER BY doc_id""".stripMargin,
    "curate_substring_dedup" ->
      """WITH base AS (SELECT doc_id, string_split(text, ' ') AS toks
        |              FROM documents),
        |tok AS (SELECT doc_id, CASE WHEN doc_id % 7 = 0
        |          THEN toks[1:CAST(doc_id % 10 AS INT)] || string_split(
        |            'the quick brown fox jumps over the lazy dog while seven wizards brew strong potions beneath ancient oak trees near the silver river bank tonight',
        |            ' ') || toks[CAST(doc_id % 10 AS INT) + 1:]
        |          ELSE toks END AS toks
        |        FROM base),
        |w AS (SELECT doc_id, len(toks) AS n, toks FROM tok
        |      WHERE len(toks) >= 10),
        |win AS (SELECT doc_id, n, toks,
        |          unnest(generate_series(1, CAST(n - 9 AS INT))) AS i FROM w),
        |seg AS (SELECT doc_id, n, i,
        |          array_to_string(toks[i:i+9], ' ') AS s FROM win),
        |cnt AS (SELECT s, COUNT(*) AS c FROM seg GROUP BY s),
        |dup AS (SELECT seg.doc_id, seg.n, seg.i
        |        FROM seg JOIN cnt ON seg.s = cnt.s WHERE cnt.c >= 2),
        |pos AS (SELECT DISTINCT doc_id, n,
        |          unnest(generate_series(i, i + 9)) AS p FROM dup),
        |isl AS (SELECT doc_id, n, p,
        |          CASE WHEN lag(p) OVER (PARTITION BY doc_id ORDER BY p)
        |                 = p - 1 THEN 0 ELSE 1 END AS ns
        |        FROM pos)
        |SELECT doc_id, CAST(any_value(n) AS INT) AS n_tokens,
        |  COUNT(*) AS dup_tokens, CAST(SUM(ns) AS BIGINT) AS n_spans
        |FROM isl GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "curate_substring_apply" ->
      """WITH base AS (SELECT doc_id, string_split(text, ' ') AS toks
        |              FROM documents),
        |tok AS (SELECT doc_id, CASE WHEN doc_id % 7 = 0
        |          THEN toks[1:CAST(doc_id % 10 AS INT)] || string_split(
        |            'the quick brown fox jumps over the lazy dog while seven wizards brew strong potions beneath ancient oak trees near the silver river bank tonight',
        |            ' ') || toks[CAST(doc_id % 10 AS INT) + 1:]
        |          ELSE toks END AS toks
        |        FROM base),
        |w AS (SELECT doc_id, len(toks) AS n, toks FROM tok
        |      WHERE len(toks) >= 10),
        |win AS (SELECT doc_id, n, toks,
        |          unnest(generate_series(1, CAST(n - 9 AS INT))) AS i FROM w),
        |seg AS (SELECT doc_id, n, i,
        |          array_to_string(toks[i:i+9], ' ') AS s FROM win),
        |cnt AS (SELECT s, COUNT(*) AS c FROM seg GROUP BY s),
        |dup AS (SELECT seg.doc_id, seg.i
        |        FROM seg JOIN cnt ON seg.s = cnt.s WHERE cnt.c >= 2),
        |pos AS (SELECT DISTINCT doc_id,
        |          unnest(generate_series(i, i + 9)) AS p FROM dup),
        |covs AS (SELECT doc_id, list(p ORDER BY p) AS cov
        |         FROM pos GROUP BY doc_id)
        |SELECT t.doc_id, CAST(len(t.toks) AS INT) AS n_tokens,
        |  CAST(COALESCE(len(c.cov), 0) AS INT) AS dup_tokens,
        |  CASE WHEN c.cov IS NULL THEN array_to_string(t.toks, ' ')
        |       -- array_to_string([]) is NULL in DuckDB, '' in Spark
        |       ELSE COALESCE(array_to_string(list_transform(
        |         list_filter(generate_series(1, len(t.toks)),
        |           i -> NOT list_contains(c.cov, i)),
        |         i -> t.toks[i]), ' '), '') END AS kept_text
        |FROM tok t LEFT JOIN covs c USING (doc_id)
        |ORDER BY t.doc_id""".stripMargin,
    "curate_lm_cut" ->
      """WITH planted AS (
        |  SELECT doc_id, lang,
        |    CASE WHEN doc_id % 97 = 0 THEN array_to_string(
        |      list_transform(generate_series(1, 30),
        |        i -> 'zq' || doc_id || 'x' || i), ' ')
        |    ELSE text END AS text
        |  FROM documents),
        |tok AS (SELECT doc_id, lang, string_split(text, ' ') AS toks
        |        FROM planted
        |        WHERE len(string_split(text, ' ')) >= 2),
        |idx AS (SELECT doc_id, lang, toks,
        |          unnest(generate_series(1, len(toks) - 1)) AS i FROM tok),
        |bg AS (SELECT doc_id, lang, toks[i] || ' ' || toks[i+1] AS bigram
        |       FROM idx),
        |c AS (SELECT bigram, COUNT(*) AS cnt FROM bg GROUP BY bigram
        |      ORDER BY cnt DESC, bigram LIMIT 50000),
        |s AS (SELECT doc_id, any_value(lang) AS lang,
        |        COUNT(*) AS n_bigrams,
        |        CAST(SUM(CASE WHEN COALESCE(cnt, 0) <= 1 THEN 1 ELSE 0 END)
        |          AS BIGINT) AS n_rare
        |      FROM bg LEFT JOIN c USING (bigram) GROUP BY doc_id)
        |SELECT lang, COUNT(*) AS n_docs,
        |  CAST(SUM(n_bigrams) AS BIGINT) AS sum_bigrams,
        |  CAST(SUM(n_rare) AS BIGINT) AS sum_rare
        |FROM s WHERE n_rare * 20 <= n_bigrams
        |GROUP BY lang ORDER BY lang""".stripMargin,
    "q_expectations" ->
      """WITH corrupted AS (
        |  SELECT o_orderkey, o_custkey + 10000000 AS o_custkey,
        |    -o_totalprice AS o_totalprice, o_orderpriority, o_orderdate
        |  FROM orders WHERE o_orderkey % 500 = 0),
        |aug AS (
        |  SELECT o_orderkey, o_custkey, o_totalprice, o_orderpriority,
        |    o_orderdate
        |  FROM orders
        |  UNION ALL SELECT * FROM corrupted),
        |n AS (SELECT COUNT(*) AS n_rows FROM aug),
        |r AS (
        |  SELECT 'date_not_null' AS rule, n_rows,
        |    (SELECT COUNT(*) FROM aug WHERE o_orderdate IS NULL)
        |      AS n_violations FROM n
        |  UNION ALL
        |  SELECT 'price_positive', n_rows,
        |    (SELECT COUNT(*) FROM aug
        |     WHERE NOT COALESCE(o_totalprice > 0, FALSE)) FROM n
        |  UNION ALL
        |  SELECT 'priority_known', n_rows,
        |    (SELECT COUNT(*) FROM aug WHERE NOT COALESCE(o_orderpriority IN
        |      ('1-URGENT','2-HIGH','3-MEDIUM','4-NOT SPECIFIED','5-LOW'),
        |      FALSE)) FROM n
        |  UNION ALL
        |  SELECT 'fk_customer', n_rows,
        |    (SELECT COUNT(*) FROM aug a
        |     LEFT JOIN (SELECT DISTINCT c_custkey FROM customer) c
        |       ON a.o_custkey = c.c_custkey
        |     WHERE c.c_custkey IS NULL) FROM n)
        |SELECT rule, n_rows, n_violations,
        |  CAST(n_violations AS DOUBLE) / n_rows AS violation_rate
        |FROM r ORDER BY rule""".stripMargin,
    "curate_line_dedup" ->
      """WITH d0 AS (
        |  SELECT doc_id, CASE WHEN doc_id % 7 = 0 THEN
        |    'cookie policy terms subscribe newsletter follow share like privacy notice '
        |      || text ELSE text END AS text
        |  FROM documents),
        |tok AS (SELECT doc_id, string_split(text, ' ') AS toks FROM d0),
        |sx AS (SELECT doc_id, toks,
        |         unnest(generate_series(0, (len(toks) - 1) // 10)) AS seg_no
        |       FROM tok),
        |s AS (SELECT doc_id, seg_no,
        |        array_to_string(toks[seg_no * 10 + 1 : seg_no * 10 + 10], ' ')
        |          AS seg
        |      FROM sx),
        |dup AS (SELECT seg FROM s GROUP BY seg HAVING COUNT(*) >= 3),
        |m AS (SELECT s.doc_id, s.seg_no, s.seg,
        |        dup.seg IS NOT NULL AS is_dup
        |      FROM s LEFT JOIN dup ON s.seg = dup.seg)
        |SELECT doc_id, COUNT(*) AS n_segs,
        |  COUNT(CASE WHEN NOT is_dup THEN 1 END) AS n_kept,
        |  COALESCE(string_agg(CASE WHEN NOT is_dup THEN seg END, ' '
        |    ORDER BY seg_no), '') AS kept_text
        |FROM m GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "text_pack" ->
      """WITH tok AS (
        |  SELECT doc_id, doc_id % 8 AS shard,
        |    CAST(len(string_split(text, ' ')) AS BIGINT) AS tokens
        |  FROM documents),
        |off AS (
        |  SELECT doc_id, shard, tokens,
        |    CAST(COALESCE(SUM(tokens) OVER (PARTITION BY shard ORDER BY doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
        |      AS start
        |  FROM tok)
        |SELECT shard, CAST(start // 2048 AS BIGINT) AS seq, COUNT(*) AS n_docs,
        |  CAST(SUM(tokens) AS BIGINT) AS sum_tokens,
        |  MIN(doc_id) AS first_doc, MAX(doc_id) AS last_doc
        |FROM off GROUP BY shard, seq ORDER BY shard, seq""".stripMargin,
    "samp_stratified" ->
      """WITH r AS (
        |  SELECT lang, doc_id,
        |    row_number() OVER (PARTITION BY lang
        |      ORDER BY md5(text), doc_id) AS rn
        |  FROM documents)
        |SELECT lang, rn, doc_id FROM r WHERE rn <= 40
        |ORDER BY lang, rn""".stripMargin,
    "samp_hash" ->
      """SELECT source, COUNT(*) AS n_total,
        |  COUNT(CASE WHEN md5(text) < '2' THEN 1 END) AS n_sampled,
        |  CAST(SUM(CASE WHEN md5(text) < '2'
        |    THEN len(string_split(text, ' ')) ELSE 0 END) AS BIGINT)
        |    AS sampled_tokens
        |FROM documents GROUP BY source ORDER BY source""".stripMargin,
    "samp_split" ->
      """SELECT CASE WHEN md5(text) < 'c' THEN 'train'
        |            WHEN md5(text) < 'e' THEN 'val'
        |            ELSE 'test' END AS split,
        |  COUNT(*) AS n_docs,
        |  CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS sum_tokens,
        |  COUNT(DISTINCT lang) AS n_langs
        |FROM documents GROUP BY split ORDER BY split""".stripMargin,
    "q_profile" ->
      """WITH p AS (
        |  SELECT 'lang' AS col_name, COUNT(*) AS n_rows,
        |    COUNT(CASE WHEN lang IS NULL THEN 1 END) AS n_nulls,
        |    COUNT(DISTINCT lang) AS n_distinct,
        |    substring(MIN(lang), 1, 16) AS min_prefix,
        |    substring(MAX(lang), 1, 16) AS max_prefix
        |  FROM documents
        |  UNION ALL
        |  SELECT 'source', COUNT(*),
        |    COUNT(CASE WHEN source IS NULL THEN 1 END),
        |    COUNT(DISTINCT source),
        |    substring(MIN(source), 1, 16), substring(MAX(source), 1, 16)
        |  FROM documents
        |  UNION ALL
        |  SELECT 'text', COUNT(*),
        |    COUNT(CASE WHEN text IS NULL THEN 1 END),
        |    COUNT(DISTINCT text),
        |    substring(MIN(text), 1, 16), substring(MAX(text), 1, 16)
        |  FROM documents)
        |SELECT * FROM p ORDER BY col_name""".stripMargin,
    "text_contaminate" ->
      s"""WITH ${DedupQueries.jaccardCtes},
        |b AS (SELECT id AS bench_doc, shingle FROM sh WHERE id % 50 = 0),
        |c AS (SELECT id AS corpus_doc, shingle FROM sh WHERE id % 50 <> 0),
        |ov AS (SELECT bench_doc, corpus_doc, COUNT(*) AS overlap
        |       FROM b JOIN c USING (shingle) GROUP BY 1, 2),
        |bs AS (SELECT bench_doc, COUNT(*) AS bench_n FROM b GROUP BY 1)
        |SELECT bench_doc, corpus_doc, overlap,
        |  CAST(overlap AS DOUBLE) / bench_n AS bench_frac
        |FROM ov JOIN bs USING (bench_doc) WHERE overlap >= 3
        |ORDER BY bench_doc, corpus_doc""".stripMargin,
    "text_contaminate_bench" ->
      s"""WITH ${DedupQueries.jaccardCtes},
        |b0 AS (SELECT doc_id AS bench_id,
        |         array_to_string(string_split(text, ' ')[1:40], ' ') AS btext
        |       FROM documents WHERE doc_id % 97 = 0),
        |btok AS (SELECT bench_id, string_split(btext, ' ') AS toks FROM b0),
        |bidx AS (SELECT bench_id, toks,
        |           unnest(generate_series(1, len(toks)-2)) AS i FROM btok),
        |bsh AS (SELECT DISTINCT bench_id,
        |          array_to_string(toks[i:i+2], ' ') AS shingle FROM bidx),
        |bn AS (SELECT bench_id, COUNT(*) AS bench_n FROM bsh GROUP BY 1),
        |ov AS (SELECT bench_id, s.id AS corpus_doc, COUNT(*) AS overlap
        |       FROM bsh b JOIN sh s ON b.shingle = s.shingle GROUP BY 1, 2)
        |SELECT bench_id, corpus_doc, overlap,
        |  CAST(overlap AS DOUBLE) / bench_n AS bench_frac
        |FROM ov JOIN bn USING (bench_id) WHERE overlap >= 3
        |ORDER BY bench_id, corpus_doc""".stripMargin,
    "text_redact" ->
      """WITH p AS (
        |  SELECT doc_id,
        |    text || ' contact user' || doc_id || '@example.com from 10.0.'
        |      || (doc_id % 256) || '.7' AS text
        |  FROM documents)
        |SELECT doc_id,
        |  CAST(len(regexp_extract_all(text,
        |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS BIGINT)
        |    AS n_emails,
        |  CAST(len(regexp_extract_all(text,
        |    '\b(?:(?:25[0-5]|2[0-4]\d|1?\d?\d)\.){3}(?:25[0-5]|2[0-4]\d|1?\d?\d)\b'))
        |    AS BIGINT) AS n_ips,
        |  CAST(length(regexp_replace(regexp_replace(text,
        |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
        |    '\b(?:(?:25[0-5]|2[0-4]\d|1?\d?\d)\.){3}(?:25[0-5]|2[0-4]\d|1?\d?\d)\b',
        |    '<IP>', 'g')) AS BIGINT)
        |    AS redacted_len
        |FROM p ORDER BY doc_id""".stripMargin,
    "text_chunk" ->
      """WITH c AS (
        |  SELECT doc_id, text,
        |    unnest(generate_series(0,
        |      greatest(0, (length(text) - 1) // 120))) AS chunk_no
        |  FROM documents)
        |SELECT doc_id, chunk_no, chunk_no * 120 + 1 AS start,
        |  CAST(length(substr(text, CAST(chunk_no * 120 + 1 AS INT), 160))
        |    AS BIGINT) AS chunk_len,
        |  md5(substr(text, CAST(chunk_no * 120 + 1 AS INT), 160)) AS chunk_hash
        |FROM c ORDER BY doc_id, chunk_no""".stripMargin,
    "samp_domain_mix" ->
      """WITH th AS (
        |  SELECT *, CASE source WHEN 'src0' THEN '2' WHEN 'src1' THEN '4'
        |    WHEN 'src2' THEN '8' WHEN 'src3' THEN 'c' ELSE '6' END AS t
        |  FROM documents)
        |SELECT source, COUNT(*) AS n_total,
        |  COUNT(CASE WHEN md5(text) < t THEN 1 END) AS n_kept,
        |  CAST(SUM(CASE WHEN md5(text) < t
        |    THEN len(string_split(text, ' ')) ELSE 0 END) AS BIGINT)
        |    AS kept_tokens
        |FROM th GROUP BY source ORDER BY source""".stripMargin,
    // the closed form of the cyclic fill: full_epochs = budget // total,
    // the partial pass is the same windowed prefix rule under the
    // remainder (rem = 0 -> no partial, the exact-boundary case)
    "samp_token_mix_epochs" ->
      """WITH b(source, budget) AS (VALUES
        |    ('src0', 3000), ('src1', 4620), ('src2', 700)),
        |tok AS (
        |  SELECT d.source, d.doc_id, md5(d.text) AS h,
        |    CAST(len(string_split(d.text, ' ')) AS BIGINT) AS t
        |  FROM documents d JOIN b ON d.source = b.source),
        |tot AS (SELECT source, COUNT(*) AS n, CAST(SUM(t) AS BIGINT) AS tt
        |        FROM tok GROUP BY source),
        |f AS (SELECT tot.source, b.budget, tot.n, tot.tt,
        |        b.budget // tot.tt AS fe,
        |        b.budget - (b.budget // tot.tt) * tot.tt AS rem
        |      FROM tot JOIN b ON tot.source = b.source),
        |c AS (SELECT tok.*, f.rem, COALESCE(SUM(t) OVER (
        |        PARTITION BY tok.source ORDER BY h, doc_id
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS bef
        |      FROM tok JOIN f ON tok.source = f.source),
        |p AS (SELECT source, COUNT(*) AS pn, CAST(SUM(t) AS BIGINT) AS pt
        |      FROM c WHERE bef < rem GROUP BY source)
        |SELECT f.source, CAST(f.budget AS BIGINT) AS budget_tokens,
        |  CAST(f.fe AS BIGINT) AS full_epochs,
        |  CAST(f.fe * f.n + COALESCE(p.pn, 0) AS BIGINT) AS n_rows,
        |  CAST(f.fe * f.tt + COALESCE(p.pt, 0) AS BIGINT) AS sum_tokens
        |FROM f LEFT JOIN p ON f.source = p.source
        |ORDER BY f.source""".stripMargin,
    // the gate's two-batch replay: batch 1 (even ids) fills through the
    // same ordered prefix rule, batch 2 (odd ids) decides against the
    // recorded fills — admitted iff budget exists and filled + bef < it
    "curate_budget_route" ->
      """WITH b(source, budget) AS (VALUES
        |    ('src0', 900), ('src1', 300), ('src2', 5000), ('src3', 10000)),
        |e AS (
        |  SELECT d.source, d.doc_id, md5(d.text) AS h,
        |    CAST(len(string_split(d.text, ' ')) AS BIGINT) AS t, b.budget
        |  FROM documents d JOIN b ON d.source = b.source
        |  WHERE d.doc_id % 2 = 0),
        |ec AS (
        |  SELECT *, COALESCE(SUM(t) OVER (
        |      PARTITION BY source ORDER BY h, doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS bef
        |  FROM e),
        |fil AS (SELECT source, CAST(SUM(t) AS BIGINT) AS filled
        |        FROM ec WHERE bef < budget GROUP BY source),
        |o AS (
        |  SELECT d.source, d.doc_id, md5(d.text) AS h,
        |    CAST(len(string_split(d.text, ' ')) AS BIGINT) AS t
        |  FROM documents d WHERE d.doc_id % 2 = 1),
        |oc AS (
        |  SELECT o.*, b.budget, COALESCE(f.filled, 0) AS filled,
        |    COALESCE(SUM(o.t) OVER (
        |      PARTITION BY o.source ORDER BY o.h, o.doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS bef
        |  FROM o LEFT JOIN b ON o.source = b.source
        |         LEFT JOIN fil f ON o.source = f.source)
        |SELECT doc_id, source, t AS tokens,
        |  (budget IS NOT NULL AND filled + bef < budget) AS admitted
        |FROM oc ORDER BY source, doc_id""".stripMargin,
    // the full stored-LM replay: retrain the vocab + bigram counts on the
    // reference slice, then score every eval doc with the same
    // integer-exact Laplace inverse-probability surprise
    "curate_lm_route" ->
      s"""WITH ${lmCtes("documents WHERE doc_id % 4 = 0",
                        "documents WHERE doc_id % 4 <> 0")}
        |SELECT d.doc_id,
        |  COALESCE(a.n_bigrams, 0) AS n_bigrams,
        |  COALESCE(a.surprise_sum, 0) AS surprise_sum,
        |  (a.n_bigrams IS NULL
        |    OR a.surprise_sum <= 35000000 * a.n_bigrams) AS admitted
        |FROM (SELECT doc_id FROM documents WHERE doc_id % 4 <> 0) d
        |LEFT JOIN agg a USING (doc_id)
        |ORDER BY d.doc_id""".stripMargin,
    // pipeline + stored-LM composition: the curate_route decision table
    // with the perplexity reason spliced in at the CCNet position
    // (after the dedup verdicts), LM retrained on the NORMALIZED
    // reference slice exactly as the query stages it
    "curate_route_lm" ->
      s"""WITH $pipelineCtes,
        |${lmCtes("norm WHERE doc_id % 4 = 0", "norm")},
        |lmcut AS (SELECT doc_id FROM agg
        |          WHERE surprise_sum > 36000000 * n_bigrams),
        |nt AS (SELECT doc_id, text,
        |         CAST(len(string_split(text, ' ')) AS BIGINT) AS ntok
        |       FROM norm),
        |kp AS (SELECT text, MIN(doc_id) AS keeper FROM nt
        |       WHERE ntok >= 20 GROUP BY text),
        |dec AS (SELECT n.doc_id,
        |  CASE WHEN n.ntok < 20 THEN 'quality'
        |       WHEN k.keeper < n.doc_id THEN 'exact_dup'
        |       WHEN n.doc_id IN (SELECT doc_id FROM neardrop)
        |         THEN 'near_dup'
        |       WHEN n.doc_id IN (SELECT doc_id FROM lmcut)
        |         THEN 'perplexity'
        |       WHEN n.doc_id IN (SELECT doc_id FROM contdrop)
        |         THEN 'contaminated'
        |       WHEN n.doc_id % 97 = 0 THEN 'held_out'
        |       ELSE NULL END AS reason
        |  FROM nt n LEFT JOIN kp k ON n.text = k.text)
        |SELECT doc_id, reason IS NULL AS accepted, reason
        |FROM dec ORDER BY doc_id""".stripMargin,
    // the sequential definition of the token-budget fill: one ordered
    // prefix sum per source, keep while the running total BEFORE the doc
    // is under budget — the engine's two-pass bucket-cutoff plan must
    // select the identical set
    "samp_token_mix" ->
      """WITH b(source, budget) AS (VALUES
        |    ('src0', 800), ('src1', 400), ('src2', 1200), ('src3', 50000)),
        |tok AS (
        |  SELECT d.source, d.doc_id, md5(d.text) AS h,
        |    CAST(len(string_split(d.text, ' ')) AS BIGINT) AS tokens,
        |    b.budget
        |  FROM documents d JOIN b ON d.source = b.source),
        |c AS (
        |  SELECT *, COALESCE(SUM(tokens) OVER (
        |      PARTITION BY source ORDER BY h, doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS bef
        |  FROM tok)
        |SELECT source, CAST(MIN(budget) AS BIGINT) AS budget_tokens,
        |  COUNT(*) AS n_docs, CAST(SUM(tokens) AS BIGINT) AS sum_tokens,
        |  MAX(h) AS max_h
        |FROM c WHERE bef < budget
        |GROUP BY source ORDER BY source""".stripMargin,
    "curate_quality_cut" ->
      """WITH tok AS (
        |  SELECT lang, CAST(len(string_split(text, ' ')) AS BIGINT) AS tokens
        |  FROM documents),
        |th AS (SELECT quantile_cont(tokens, 0.25) AS cut FROM tok)
        |SELECT lang, COUNT(*) AS n_docs,
        |  CAST(SUM(tokens) AS BIGINT) AS sum_tokens, MIN(cut) AS cut
        |FROM tok, th WHERE tokens >= cut
        |GROUP BY lang ORDER BY lang""".stripMargin,
    "curate_stats" ->
      """WITH q AS (
        |  SELECT doc_id, lang, source, text,
        |    CAST(len(string_split(text, ' ')) AS BIGINT) AS tokens
        |  FROM documents
        |  WHERE len(string_split(text, ' ')) >= 20
        |    AND CAST(length(text) - length(regexp_replace(text, '[0-9]', '', 'g'))
        |      AS DOUBLE) / length(text) < 0.2),
        |k AS (
        |  SELECT *, MIN(doc_id) OVER (PARTITION BY md5(text)) AS keeper FROM q)
        |SELECT lang, source, COUNT(*) AS n_docs,
        |  CAST(SUM(tokens) AS BIGINT) AS sum_tokens,
        |  CAST(SUM(tokens) AS DOUBLE) / COUNT(*) AS avg_tokens
        |FROM k WHERE doc_id = keeper
        |GROUP BY lang, source ORDER BY lang, source""".stripMargin)
}
