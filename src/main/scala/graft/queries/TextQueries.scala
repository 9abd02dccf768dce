package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables.t
import graft.operators.{Multimodal, Similarity, TextAnalysis}

/** Text-analysis + multimodal coverage queries. */
object TextQueries {

  /** TF-IDF-style term salience: top-5 terms per probe doc by
    * tf * N / df (log-free scoring — a single exact-integer-numerator
    * division, so scores are bit-identical across engines; ln/exp are not
    * IEEE-reproducible cross-engine). Document frequencies aggregate over
    * the FULL corpus; only the probe docs rank — the standard keyword-
    * extraction shape: explode -> two hash aggs -> broadcast N -> window.
    * At 100 TB the df table is the only corpus-wide aggregate (terms are
    * heavy-tailed; partial aggregation absorbs the hot ones).
    */
  /** BM25 ranked retrieval: top-20 documents for a fixed 3-term query —
    * the search-engine face of the text family (tf-idf ranks a doc's own
    * terms; BM25 ranks DOCS for a query, with tf saturation and length
    * normalization).
    *
    * Exactness: k1=1.2, b=0.75 are rationals, so each term's score
    * clears denominators into one integral division —
    * idf*(tf*(k1+1))/(tf+k1*(1-b+b*dl/avgdl)) becomes
    * ((2(N-df)+1) * 44*tf*TL * 10^9) div ((2df+1) * (20*tf*TL + 6*TL +
    * 18*dl*N)) with TL = total tokens (avgdl = TL/N cleared through) —
    * and the scaled integer scores are bit-identical cross-engine; a
    * log-idf BM25 could never hash-match.
    *
    * Scale: ZERO corpus-sized shuffle. Term frequencies are in-row
    * higher-order `filter` counts (no explode), the (N, TL, df...) stats
    * row is ONE constant-size aggregate broadcast back, and the ranking is
    * top-k over (doc_id, score) — TakeOrderedAndProject, never a global
    * sort. Per-query-term cost is one array scan per doc, exactly how a
    * scan-based retrieval pass over 100 TB should look (an inverted index
    * is the stored-tier alternative; see text_tfidf for the df machinery).
    */
  /** The scan-path BM25 scored frame (doc_id, score, tf0..tf2) for the
    * fixed 3-term query — shared by [[textBm25]] and the lexical leg of
    * [[textHybridRrf]].
    */
  private def bm25ScanScored(spark: SparkSession, dir: String): DataFrame = {
    val terms = Seq("spark", "merge", "vector")
    val docs = t(spark, dir, "documents")
      .select(col("doc_id"), split(col("text"), " ").as("toks"))
      .withColumn("dl", size(col("toks")).cast("long"))
    val withTf = terms.zipWithIndex.foldLeft(docs) { case (d, (term, i)) =>
      d.withColumn(s"tf$i",
        size(filter(col("toks"), x => x === lit(term))).cast("long"))
    }.drop("toks")
    val stats = withTf.agg(
      count(lit(1)).as("n"), sum(col("dl")).as("tl"),
      sum(when(col("tf0") > 0, 1L).otherwise(0L)).as("df0"),
      sum(when(col("tf1") > 0, 1L).otherwise(0L)).as("df1"),
      sum(when(col("tf2") > 0, 1L).otherwise(0L)).as("df2"))
    // denominator in decimal(38,0) like the numerator: long arithmetic
    // wraps at 100 TB-scale stats (tl ~ 1e12, n ~ 1e9), and every BM25
    // path must score identically (see TextIndex.scoredTerms)
    def tscore(i: Int): String =
      s"""CASE WHEN tf$i > 0 THEN
         | (cast(2 * (n - df$i) + 1 as decimal(38,0))
         |   * 44 * tf$i * tl * 1000000000)
         | div (cast(2 * df$i + 1 as decimal(38,0))
         |   * (20 * cast(tf$i as decimal(38,0)) * tl
         |      + 6 * cast(tl as decimal(38,0))
         |      + 18 * cast(dl as decimal(38,0)) * n))
         | ELSE 0L END""".stripMargin
    withTf.crossJoin(broadcast(stats))
      .withColumn("score",
        expr(s"${tscore(0)} + ${tscore(1)} + ${tscore(2)}"))
  }

  def textBm25(spark: SparkSession, dir: String): DataFrame =
    bm25ScanScored(spark, dir)
      .select(col("doc_id"), col("score"), col("tf0").as("tf_spark"),
        col("tf1").as("tf_merge"), col("tf2").as("tf_vector"))
      .orderBy(col("score").desc, col("doc_id"))
      .limit(20)

  /** HYBRID RETRIEVAL — reciprocal-rank fusion of the lexical (BM25) and
    * vector (cosine) retrievers, the standard two-tower shape a
    * training-data pipeline runs when neither keywords nor embeddings
    * alone surface the right documents (RAG retrieval, hard-negative
    * mining, dedup candidate generation). One query = the fixed 3-term
    * keyword set PLUS one example embedding (vec 0); each leg ranks its
    * own top-[[hybridLegK]], and fusion scores
    * RRF(d) = Σ_legs 10^9 div (60 + rank_leg(d)) — k=60 is the standard
    * Cormack/Clarke constant, and scaling the reciprocal to an integer
    * division makes the fused score EXACT integer arithmetic, so the
    * ranking hash-matches DuckDB with no float caveats (the same
    * clear-the-denominator trick as the BM25 score itself).
    *
    * Plan shape: each leg is the already-verified retrieval pass (scan
    * BM25 via [[bm25ScanScored]]; brute-force cosine via
    * [[graft.operators.Similarity.bruteForceTopK]], which prunes through
    * the bounded-heap grouped top-k), cut to leg-k rows by
    * TakeOrderedAndProject — so the FUSION input is 2 x legK rows
    * regardless of corpus size, and the full-outer join + rank windows
    * run on that constant-size frame. At 100 TB the legs swap in their
    * stored-index tiers (`text_bm25_indexed` / `annRoute`) unchanged:
    * fusion only consumes (doc_id, rank) lists.
    */
  def textHybridRrf(spark: SparkSession, dir: String): DataFrame = {
    val legK = 50
    // lexical leg: top-legK by the exact scaled-integer BM25; the window
    // ranks the ALREADY-CUT legK rows (TakeOrderedAndProject feeds it),
    // never the corpus
    val lexTop = bm25ScanScored(spark, dir)
      .select(col("doc_id"), col("score"))
      .orderBy(col("score").desc, col("doc_id")).limit(legK)
    val lex = lexTop.withColumn("rank_lex", row_number().over(
      Window.orderBy(col("score").desc, col("doc_id")))).drop("score")
    // vector leg: exact cosine top-legK for the example embedding —
    // rank comes from the verified bruteForceTopK ranking (cos desc, id)
    val vec = Similarity.bruteForceTopK(t(spark, dir, "embeddings"),
        probeFilter = col("vec_id") === 0, k = legK)
      .select(col("nid").as("doc_id"), col("rank").as("rank_vec"))
    lex.join(vec, Seq("doc_id"), "full_outer")
      .withColumn("rrf_score", expr(
        """coalesce(1000000000L div (60 + rank_lex), 0L)
          | + coalesce(1000000000L div (60 + rank_vec), 0L)""".stripMargin))
      .select(col("doc_id"), col("rrf_score"), col("rank_lex"),
        col("rank_vec"))
      .orderBy(col("rrf_score").desc, col("doc_id"))
      .limit(20)
  }

  /** BM25 over a STORED inverted index — the other half of the retrieval
    * story: text_bm25 is the scan-based pass (touches every doc per
    * query); this builds the classic index tables ONCE — postings
    * (term, doc_id, tf), doc lengths (doc_id, dl), one corpus-stats row —
    * persists them to parquet, and answers the same query by reading ONLY
    * the three query terms' postings back (term predicate pushed to the
    * postings scan).
    *
    * The scoring arithmetic is identical to text_bm25, and the oracle is
    * byte-for-byte the SAME SQL (recomputing from raw documents) — so the
    * hash check proves index-path ≡ scan-path against an independent
    * engine. df comes from the postings themselves (COUNT per term), so
    * the index is self-contained: a new query needs no corpus access.
    *
    * Scale: the index build is one explode + two aggregations (posting
    * lists are Zipfian — map-side partials absorb hot terms); the QUERY
    * cost is O(postings of the query terms), not O(corpus) — with
    * postings written partitioned/sorted by term, a 100 TB corpus serves
    * point queries from KB-to-MB-sized slices. Doc lengths join the
    * postings by doc_id; at this fan-in the postings side drives and dl
    * rides a shuffle join keyed on doc_id (or a broadcast when the
    * candidate set is small, as AQE picks here).
    */
  def textBm25Indexed(spark: SparkSession, dir: String): DataFrame = {
    val terms = Seq("spark", "merge", "vector")
    // index build: postings, doc lengths, corpus stats — STAGED once per
    // sfDir (Caches.stagedPath): warm passes measure the production shape
    // (query served from a standing index), the build cost appears once in
    // the cold pass, and repeated invocations stop leaking temp dirs
    val base = graft.Caches.stagedPath("bm25", dir) { base =>
      val docs = t(spark, dir, "documents")
        .select(col("doc_id"), split(col("text"), " ").as("toks"))
        .withColumn("dl", size(col("toks")).cast("long"))
      docs.select(col("doc_id"), explode(col("toks")).as("term"))
        .groupBy("term", "doc_id").agg(count(lit(1)).as("tf"))
        .write.mode("overwrite").parquet(s"$base/postings")
      docs.select("doc_id", "dl")
        .write.mode("overwrite").parquet(s"$base/doclens")
      docs.agg(count(lit(1)).as("n"), sum(col("dl")).as("tl"))
        .write.mode("overwrite").parquet(s"$base/stats")
    }
    // query: only the three terms' postings are read (pushdown asserted
    // in RetrievalSpec); df per term is derived from the postings slice
    val post = spark.read.parquet(s"$base/postings")
      .filter(col("term").isin(terms: _*))
    val dfreq = post.groupBy("term").agg(count(lit(1)).as("df"))
    val stats = spark.read.parquet(s"$base/stats")
    val dl = spark.read.parquet(s"$base/doclens")
    val scored = post.join(broadcast(dfreq), "term")
      .join(dl, "doc_id")
      .crossJoin(broadcast(stats))
      .withColumn("tscore", expr(
        """(cast(2 * (n - df) + 1 as decimal(38,0))
          |  * 44 * tf * tl * 1000000000)
          | div (cast(2 * df + 1 as decimal(38,0))
          |  * (20 * cast(tf as decimal(38,0)) * tl
          |     + 6 * cast(tl as decimal(38,0))
          |     + 18 * cast(dl as decimal(38,0)) * n))
          |""".stripMargin))
      .groupBy("doc_id")
      .agg(sum(col("tscore")).as("score"),
        max(when(col("term") === terms(0), col("tf")))
          .as("tf_spark"),
        max(when(col("term") === terms(1), col("tf"))).as("tf_merge"),
        max(when(col("term") === terms(2), col("tf"))).as("tf_vector"))
    // PRECONDITION, checked loudly (the q_theta_sets precedent): the
    // postings path can only surface docs containing >=1 query term, while
    // the scan path / shared oracle rank ALL docs (score-0 ties ordered by
    // doc_id). The two agree iff at least `limit` candidate docs exist —
    // if ever they don't, fail here, not as a mystifying hash mismatch.
    val ncand = scored.agg(count(lit(1)).as("nc"))
    scored.crossJoin(broadcast(ncand))
      .select(col("doc_id"),
        when(assert_true(col("nc") >= 20,
            lit("text_bm25_indexed: fewer than 20 docs match any query " +
              "term — the postings path no longer covers the all-docs " +
              "oracle ranking")).isNull,
          col("score")).as("score"),
        coalesce(col("tf_spark"), lit(0L)).as("tf_spark"),
        coalesce(col("tf_merge"), lit(0L)).as("tf_merge"),
        coalesce(col("tf_vector"), lit(0L)).as("tf_vector"))
      .orderBy(col("score").desc, col("doc_id"))
      .limit(20)
  }

  /** The batch harness of [[graft.operators.TextIndex.hybridRoute]] —
    * streaming hybrid retrieval served ENTIRELY from standing state: the
    * lexical leg ranks through the staged MAINTAINED BM25 index
    * ([[bm25MaintIndex]] — build + append grown), the vector leg through
    * a staged IVF index probed EXHAUSTIVELY (nprobe = nCells, so the leg
    * is exact and the whole fused ranking is DuckDB-oracle-checkable;
    * production drops nprobe and trades vector-leg recall only). One
    * arriving query per 100th embedding: its vector + the fixed keyword
    * text. The oracle replays per-probe cosine ranks and the shared
    * BM25 ranks and fuses with the same integer RRF — hash-exact, so
    * the route tier's fusion is proven cross-engine, per probe.
    */
  def textHybridRoute(spark: SparkSession, dir: String): DataFrame = {
    val bm25Dir = bm25MaintIndex(spark, dir)
    val ivfDir = graft.Caches.stagedPath("hybrid-ivf", dir) { base =>
      Similarity.ivfWriteIndex(
        t(spark, dir, "embeddings").select(col("vec_id"), col("embedding")),
        base, nCells = 8)
    }
    val queries = t(spark, dir, "embeddings")
      .filter(col("vec_id") % 100 === 0)
      .select(col("vec_id").as("qid"),
        lit("spark merge vector").as("qtext"), col("embedding"))
    graft.operators.TextIndex.hybridRoute(queries, bm25Dir, ivfDir,
        k = 10, legK = 50, nprobe = 8)
      .orderBy("qid", "rank")
  }

  /** The staged MAINTAINED BM25 index ([[graft.operators.TextIndex]]):
    * built over the even-id half of the corpus, grown by appending the
    * odd half — the lifecycle fixture `text_bm25_maintained` and (by
    * file-copy derivation) `text_bm25_forget` serve from.
    */
  private def bm25MaintIndex(spark: SparkSession, dir: String): String =
    graft.Caches.stagedPath("bm25-maint", dir) { base =>
      val docs = t(spark, dir, "documents").select(col("doc_id"), col("text"))
      graft.operators.TextIndex.writeBm25Index(
        docs.filter(col("doc_id") % 2 === 0), base)
      graft.operators.TextIndex.appendBm25Index(
        docs.filter(col("doc_id") % 2 === 1), base)
    }

  /** BM25 served from the MAINTAINED index — the retrieval family's
    * entry in the stored-index maintenance tier (crash-atomic manifest
    * commits, append growth, tombstone forget, compaction — see
    * [[graft.operators.TextIndex]]): the index is built from the even-id
    * half and grown by appending the odd half, and the serving query
    * hash-checks against the SAME recompute-from-raw-docs oracle as the
    * scan (`text_bm25`) and staged-index (`text_bm25_indexed`) paths —
    * append-equals-rebuild proven through an independent engine. The
    * serving scan prunes to the query terms' bucket partitions
    * (TextIndexSpec plan-asserts it): at 100 TB a query reads O(probed
    * buckets), never the full postings table.
    */
  def textBm25Maintained(spark: SparkSession, dir: String): DataFrame =
    graft.operators.TextIndex.bm25TopK(spark, bm25MaintIndex(spark, dir),
      Seq("spark", "merge", "vector"))

  /** BM25 over a NORM-tokenIZED maintained index (`writeBm25Index(...,
    * tokenizer = "norm")`): the corpus is planted with messy variants —
    * NBSP-glued query terms, a LINE SEPARATOR, a control byte, run-on
    * whitespace — that a bare `split(text, ' ')` tokenizes as garbage
    * tokens, and the index tokenizes through curation's normalization
    * ([[graft.operators.Curation.normalizeText]]: control-strip → NFC →
    * Unicode-whitespace collapse → trim) recorded in `meta`, so the
    * append-grown half replays it identically. Hash-checks against a
    * DuckDB oracle that replays the SAME normalization (the
    * curate_normalize expressions) before the BM25 recompute — retrieval
    * and curation share one tokenization, proven through an independent
    * engine. Existing bm25 queries are untouched (their indexes record
    * the `ws` default).
    */
  def textBm25Normalized(spark: SparkSession, dir: String): DataFrame = {
    val base = graft.Caches.stagedPath("bm25-norm", dir) { base =>
      val docs = t(spark, dir, "documents").select(col("doc_id"), col("text"))
      // NBSP-glued query terms, a U+2028 LINE SEPARATOR, a BEL control
      // byte and a double space: every planted token is garbage to
      // split-on-space and recovered by the norm tokenizer
      val messy = docs.filter(col("doc_id") % 50 === 0)
        .select((col("doc_id") + 30000000L).as("doc_id"),
          concat(lit("spark merge "), col("text"),
            lit(" vector  spark")).as("text"))
      val planted = docs.unionByName(messy)
      graft.operators.TextIndex.writeBm25Index(
        planted.filter(col("doc_id") % 2 === 0), base, tokenizer = "norm")
      graft.operators.TextIndex.appendBm25Index(
        planted.filter(col("doc_id") % 2 === 1), base)
    }
    graft.operators.TextIndex.bm25TopK(spark, base,
      Seq("spark", "merge", "vector"))
  }

  /** BM25 served AFTER a tombstone delete ([[graft.operators.TextIndex
    * .deleteFromBm25Index]] — the FORGET half of the retrieval tier):
    * the `doc_id % 7 = 3` slice is forgotten from a copy of the
    * maintained index, and the serving query hash-checks against the
    * oracle recomputed over the LIVE corpus only. Unlike the LSH forget
    * tier (where `df` stays a documented historical upper bound), BM25
    * forgetting is FULLY exact — the delete's same-commit negative
    * `termdf`/`stats` deltas make served df/N/avgdl the live values — so
    * the post-delete ranking equals a fresh build over the live docs,
    * and the oracle needs no delete-semantics caveat, just a WHERE.
    */
  def textBm25Forget(spark: SparkSession, dir: String): DataFrame = {
    val base = graft.Caches.stagedPath("bm25-forget", dir) { base =>
      // derive by file copy (the dedup_lsh_forget discipline): the copy
      // serves exactly what the maintained index serves — the delete is
      // the only work this fixture adds
      DedupQueries.copyTree(bm25MaintIndex(spark, dir), base)
      graft.operators.TextIndex.deleteFromBm25Index(
        t(spark, dir, "documents").filter(col("doc_id") % 7 === 3)
          .select("doc_id"), base)
    }
    graft.operators.TextIndex.bm25TopK(spark, base,
      Seq("spark", "merge", "vector"))
  }

  /** BM25 served AS OF a historical committed version of the maintained
    * index — TIME TRAVEL over the [[graft.sources.IndexCommit]] manifest
    * history (audits, reproducible reruns): version 0 of the staged
    * append chain is the even-id base build, so serving `asOf = 0`
    * must rank exactly the even-id corpus — the oracle recomputes from
    * raw docs over that slice. Appends and deletes retire no files, so
    * every pre-compaction version stays fully resolvable; the first
    * compaction invalidates rewritten versions loudly (TextIndexSpec).
    */
  def textBm25Asof(spark: SparkSession, dir: String): DataFrame =
    graft.operators.TextIndex.bm25TopK(spark, bm25MaintIndex(spark, dir),
      Seq("spark", "merge", "vector"), asOf = Some(0))

  /** BM25 served by CERTIFICATE-DRIVEN pruning ([[graft.operators
    * .TextIndex.bm25TopKPruned]] — the set-at-a-time MaxScore) over a
    * forward-enabled maintained index (built from the even-id half,
    * grown by appending the odd half, like `text_bm25_maintained`): the
    * serve reads only the ESSENTIAL terms' posting lists and finishes
    * candidates' exact scores from the doc-range-pruned forward table,
    * escalating per query until the skipped terms' stored score
    * envelopes prove nothing outside the candidate set can reach the
    * top k. Hash-checks against the SAME recompute-from-raw-docs oracle
    * as the scan / indexed / maintained paths — the pruning is proven
    * EXACT through an independent engine, on the fixture whose uniform
    * df is the certificate's worst case (the df-skewed speedup is
    * spec-proven and route-benched on the Zipf fixtures).
    */
  def textBm25Pruned(spark: SparkSession, dir: String): DataFrame = {
    val base = graft.Caches.stagedPath("bm25-pruned", dir) { base =>
      val docs = t(spark, dir, "documents").select(col("doc_id"), col("text"))
      graft.operators.TextIndex.writeBm25Index(
        docs.filter(col("doc_id") % 2 === 0), base, forward = true)
      graft.operators.TextIndex.appendBm25Index(
        docs.filter(col("doc_id") % 2 === 1), base)
    }
    graft.operators.TextIndex.bm25TopKPruned(spark, base,
      Seq("spark", "merge", "vector"))
  }

  /** BM25 served by the IMPACT-ORDERED approximate tier
    * ([[graft.operators.TextIndex.bm25TopKWand]] — WAND/Block-Max-class
    * score-at-a-time early termination over stored impact blocks),
    * since r17 over the RECALL-BOUNDED df-proportional layout
    * (`impactFraction` — per-term heads sized to fraction x df, so
    * coverage and recall are pinned at any corpus size where the r16
    * fixed-budget layout's recall measurably decayed; the serve also
    * emits the per-query `coverage` column). APPROXIMATE by
    * construction, so this is a ROWS-ONLY record (the `sim_ann_lsh`
    * adjudication): recall@k vs the exact tier is asserted in
    * TextIndexSpec/WandFractionSpec, and the exact oracle-hashed tiers
    * stay the verifiers. The index is the standard even/odd build+append
    * fixture, so the serve exercises per-segment heads, not just a
    * one-shot build.
    */
  def textBm25Wand(spark: SparkSession, dir: String): DataFrame =
    graft.operators.TextIndex.bm25TopKWand(spark, bm25WandIndex(spark, dir),
      Seq("spark", "merge", "vector"), k = 20)

  /** The staged IMPACT-ENABLED maintained index (the even/odd
    * build+append fixture with the df-proportional `impactFraction`
    * layout since r17) — shared by the impact-ordered serve
    * (`text_bm25_wand`) and the wand-leg hybrid (`text_hybrid_wand`).
    */
  private def bm25WandIndex(spark: SparkSession, dir: String): String =
    graft.Caches.stagedPath("bm25-wand", dir) { base =>
      val docs = t(spark, dir, "documents").select(col("doc_id"), col("text"))
      // blockSize 256 >= any per-segment df at this sf, so the stored
      // heads are COMPLETE here (the floor covers every term) — the
      // recall trade itself is spec'd on the Zipf fixtures, while this
      // record pins the serve's plumbing and the RetrievalSpec hybrid's
      // full-coverage bit-equality
      graft.operators.TextIndex.writeBm25Index(
        docs.filter(col("doc_id") % 2 === 0), base, impactFraction = 0.2,
        impactBlockSize = 256)
      graft.operators.TextIndex.appendBm25Index(
        docs.filter(col("doc_id") % 2 === 1), base)
    }

  /** HYBRID retrieval with the IMPACT-ORDERED lexical leg
    * ([[graft.operators.TextIndex.hybridRoute]] `wandBudget > 0`): the
    * same arriving queries and exhaustive-nprobe vector leg as
    * `text_hybrid_route`, but the lexical ranks come from the
    * budget-bounded wand serve over the staged impact-enabled index —
    * the flat-latency swap for the measured hybrid bottleneck (the
    * exact lexical leg). APPROXIMATE on the lexical evidence by
    * construction, so this is a ROWS-ONLY record (the `text_bm25_wand`
    * adjudication): fused recall vs the exact-leg fusion is asserted in
    * RetrievalSpec, and `text_hybrid_route` stays the hash-exact
    * verifier of the fuse itself.
    */
  def textHybridWand(spark: SparkSession, dir: String): DataFrame = {
    val bm25Dir = bm25WandIndex(spark, dir)
    val ivfDir = graft.Caches.stagedPath("hybrid-ivf", dir) { base =>
      Similarity.ivfWriteIndex(
        t(spark, dir, "embeddings").select(col("vec_id"), col("embedding")),
        base, nCells = 8)
    }
    val queries = t(spark, dir, "embeddings")
      .filter(col("vec_id") % 100 === 0)
      .select(col("vec_id").as("qid"),
        lit("spark merge vector").as("qtext"), col("embedding"))
    graft.operators.TextIndex.hybridRoute(queries, bm25Dir, ivfDir,
        k = 10, legK = 50, nprobe = 8, wandBudget = 4)
      .orderBy("qid", "rank")
  }

  /** BM25 over a BPE-TOKENIZED maintained index — the engine's own
    * trained subword pipeline ([[graft.operators.Bpe]], 30 merges
    * trained on this corpus) as the index's recorded tokenization: the
    * merge table is stored IN the index (`tokmerges`), the append-grown
    * half replays it, and the query words encode through the same
    * stored merges ([[graft.operators.TextIndex.bpeQueryTokens]]).
    * Hash-checks against a DuckDB oracle that RETRAINS the identical
    * merges (the BpeOracle chained-CTE replay), re-encodes every corpus
    * word and the query words through them, and recomputes BM25 over
    * the subword token stream — retrieval and subword tokenization
    * proven consistent through an independent engine. tf_* columns are
    * dropped (token-valued names); the ranking carries the check.
    */
  def textBm25Bpe(spark: SparkSession, dir: String): DataFrame = {
    val docs = t(spark, dir, "documents").select(col("doc_id"), col("text"))
    val base = graft.Caches.stagedPath("bm25-bpe", dir) { base =>
      val merges = graft.operators.Bpe.train(docs, nMerges = 30)
      graft.operators.TextIndex.writeBm25Index(
        docs.filter(col("doc_id") % 2 === 0), base, tokenizer = "bpe",
        bpeMerges = merges)
      graft.operators.TextIndex.appendBm25Index(
        docs.filter(col("doc_id") % 2 === 1), base)
    }
    val qtoks = graft.operators.TextIndex.bpeQueryTokens(spark, base,
      Seq("spark", "merge", "vector"))
    graft.operators.TextIndex.bm25TopK(spark, base, qtoks, k = 20)
      .select("doc_id", "score")
  }


  /** Positional PHRASE search, scan path: exact occurrence count of the
    * consecutive-token phrase "spark merge" per doc, top-20 by (count,
    * doc_id). Positions come from one posexplode pass filtered to the
    * phrase terms; phrase starts fold through the codegen'd
    * [[graft.functions.PhraseJoin]] sorted-merge kernel (overlapping
    * occurrences count — each valid start is one). Hash-checks against
    * a DuckDB position-join oracle (positions built by zipped unnest,
    * starts by ord+i equi-joins) — two entirely different positional
    * machineries agreeing on counts.
    */
  def textPhrase(spark: SparkSession, dir: String): DataFrame = {
    val phrase = Seq("spark", "merge")
    val docs = t(spark, dir, "documents")
    val pos = docs.select(col("doc_id"),
        posexplode(split(col("text"), " ")).as(Seq("p", "term")))
      .filter(col("term").isin(phrase.distinct: _*))
    val aggs = phrase.distinct.zipWithIndex.map { case (tm, i) =>
      sort_array(collect_list(when(col("term") === tm, col("p"))))
        .as(s"ps$i") }
    val m = pos.groupBy("doc_id").agg(aggs.head, aggs.tail: _*)
    val byTerm = phrase.distinct.zipWithIndex
      .map { case (tm, i) => tm -> col(s"ps$i") }.toMap
    val starts = phrase.zipWithIndex.tail.foldLeft(byTerm(phrase.head)) {
      case (acc, (tm, i)) =>
        graft.functions.gcolumns.phrase_join(acc, byTerm(tm), i)
    }
    m.select(col("doc_id"), size(starts).cast("long").as("phrase_tf"))
      .filter(col("phrase_tf") > 0)
      .orderBy(col("phrase_tf").desc, col("doc_id"))
      .limit(20)
  }

  /** The staged POSITIONAL maintained index the indexed phrase/proximity
    * queries serve from — built from the even-id half and grown by
    * appending the odd half, like the other maintained-index fixtures,
    * so the oracle checks the append-grown positional lists too.
    */
  private def posIndex(spark: SparkSession, dir: String): String =
    graft.Caches.stagedPath("bm25-pos", dir) { base =>
      val docs = t(spark, dir, "documents").select(col("doc_id"), col("text"))
      graft.operators.TextIndex.writeBm25Index(
        docs.filter(col("doc_id") % 2 === 0), base, positional = true)
      graft.operators.TextIndex.appendBm25Index(
        docs.filter(col("doc_id") % 2 === 1), base)
    }

  /** [[textPhrase]] served from the append-grown positional maintained
    * index ([[graft.operators.TextIndex.phraseTopK]], term-bucket-pruned
    * postings scan) — the SAME DuckDB oracle as the scan path, so the
    * stored positional lists are proven equal to a fresh tokenization
    * through an independent engine.
    */
  def textPhraseIndexed(spark: SparkSession, dir: String): DataFrame =
    graft.operators.TextIndex.phraseTopK(spark, posIndex(spark, dir),
      Seq("spark", "merge"))
      .select(col("doc_id"), col("phrase_tf").cast("long").as("phrase_tf"))

  /** Proximity (NEAR/slop) search from the same positional index:
    * docs where "spark" and "vector" occur within 3 tokens, ranked by
    * the minimum gap ([[graft.functions.SortedMinGap]] two-pointer
    * kernel), ties by doc_id. DuckDB oracle: pairwise position join,
    * min(abs(gap)) per doc.
    */
  def textNear(spark: SparkSession, dir: String): DataFrame =
    graft.operators.TextIndex.nearTopK(spark, posIndex(spark, dir),
      "spark", "vector", slop = 3)
      .select(col("doc_id"), col("gap").cast("long").as("gap"))

  /** k-term WINDOW search from the same positional index: docs where
    * "spark", "merge" AND "vector" all occur within 6 tokens, ranked by
    * the tightest window ([[graft.functions.SortedMinCover]] n-pointer
    * kernel — the n-ary generalization of text_near's min gap), ties by
    * doc_id. DuckDB oracle: 3-way position join,
    * min(greatest − least) per doc.
    */
  def textWindow(spark: SparkSession, dir: String): DataFrame =
    graft.operators.TextIndex.windowTopK(spark, posIndex(spark, dir),
      Seq("spark", "merge", "vector"), span = 6)
      .select(col("doc_id"), col("win").cast("long").as("win"))


  /** Streaming phrase-route replay: a fixed five-query batch (2-term,
    * 3-term, reversed, and a REPEATED-term phrase) through
    * [[graft.operators.TextIndex.phraseRoute]] against the staged
    * positional index — per-query top-20 (rank, doc_id, phrase_tf).
    * Hash-checks against a DuckDB oracle that computes each phrase by
    * position equi-joins and ranks with a window — so the route's
    * n-way shifted-intersection fold is proven equal to first-
    * principles position arithmetic for every query shape at once.
    */
  def textPhraseRoute(spark: SparkSession, dir: String): DataFrame = {
    val arrivals = spark.createDataFrame(Seq(
        (1L, "spark merge"), (2L, "merge vector"),
        (3L, "spark merge vector"), (4L, "vector spark"),
        (5L, "merge merge")))
      .toDF("qid", "qtext")
    graft.operators.TextIndex.phraseRoute(arrivals, posIndex(spark, dir))
      .orderBy(col("qid"), col("rank"))
  }

  def textTfidf(spark: SparkSession, dir: String): DataFrame = {
    val docs = t(spark, dir, "documents")
    val tok = docs.select(col("doc_id"),
        explode(split(col("text"), " ")).as("term"))
      .filter(length(col("term")) > 3)
    val tf = tok.groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val nDocs = docs.agg(count(lit(1)).as("n_docs"))
    val w = Window.partitionBy(col("doc_id"))
      .orderBy(col("score").desc, col("term"))
    tf.filter(col("doc_id") % 100 === 0)
      .join(dfreq, "term")
      .crossJoin(broadcast(nDocs))
      .withColumn("score",
        (col("tf") * col("n_docs")).cast("double") / col("df").cast("double"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 5)
      .select("doc_id", "rank", "term", "score")
      .orderBy("doc_id", "rank")
  }

  def textQuality(spark: SparkSession, dir: String): DataFrame =
    TextAnalysis.quality(t(spark, dir, "documents")).orderBy("doc_id")

  def textLangid(spark: SparkSession, dir: String): DataFrame =
    TextAnalysis.languageId(t(spark, dir, "documents")).orderBy("doc_id")

  def textTokens(spark: SparkSession, dir: String): DataFrame =
    TextAnalysis.tokenCounts(t(spark, dir, "documents")).orderBy("doc_id")

  def textFingerprint(spark: SparkSession, dir: String): DataFrame =
    TextAnalysis.fingerprints(t(spark, dir, "documents")).orderBy("doc_id")

  def textBigrams(spark: SparkSession, dir: String): DataFrame =
    TextAnalysis.bigramCounts(t(spark, dir, "documents"), topN = 50)

  def textRepetition(spark: SparkSession, dir: String): DataFrame =
    TextAnalysis.repetition(t(spark, dir, "documents")).orderBy("doc_id")

  /** Bigram-LM quality scoring ([[TextAnalysis.bigramLmScore]]) — the
    * log-free perplexity proxy; exact-integer signals hash-match the
    * DuckDB replica of the same count table + cutoff.
    */
  def textLmScore(spark: SparkSession, dir: String): DataFrame =
    TextAnalysis.bigramLmScore(t(spark, dir, "documents")).orderBy("doc_id")

  /** Frequent terms via the Misra–Gries sketch ([[graft.functions
    * .HeavyHitters]]). Capacity 1024 far exceeds this corpus's distinct
    * vocabulary, so the sketch provably runs decrement-free and its counts
    * are EXACT — which is what lets a sketch-valued query hash-match a
    * plain GROUP BY oracle (the approximate regime is property-tested in
    * StatsSpec, where merge-order dependence makes hash equality the wrong
    * contract).
    */
  def textHeavyHitters(spark: SparkSession, dir: String): DataFrame = {
    val words = t(spark, dir, "documents")
      .select(explode(split(col("text"), " ")).as("term"))
    words
      .agg(graft.functions.HeavyHitters.heavy_hitters(col("term"), 1024)
          .as("hh"),
        count_distinct(col("term")).as("nd"))
      // the oracle hash-match is only valid in the decrement-free EXACT
      // regime; if a corpus change pushes distinct vocab past capacity,
      // fail with this message instead of a mystifying hash mismatch
      .where(isnull(assert_true(col("nd") <= 1024, lit(
        "heavy-hitters left the exact regime: distinct terms > sketch " +
          "capacity 1024 — raise k or re-derive the oracle"))))
      .select(explode(col("hh")).as(Seq("term", "est")))
      .orderBy(col("est").desc, col("term")).limit(20)
  }

  /** BPE tokenizer training ([[graft.operators.Bpe]]): the learned merge
    * table for 30 merges over the corpus — hash-exact since r11 via the
    * unrolled-merge DuckDB replay ([[BpeOracle]], the k-means
    * unrolled-Lloyd / r10 `text_fingerprint` conversion template applied
    * to the merge loop); BpeSpec additionally pins the algorithm against
    * the textbook example and proves encode/train consistency.
    */
  def textBpe(spark: SparkSession, dir: String): DataFrame = {
    import graft.operators.Bpe
    val merges = Bpe.train(t(spark, dir, "documents"), nMerges = 30)
    Bpe.mergeTable(spark, merges).orderBy("rank")
  }

  /** Vocabulary build + id-encode — the tokenizer plumbing of a
    * pretraining pipeline: top-1000 terms by global count become the vocab
    * (rank = id, deterministic (count desc, term) total order), probe docs
    * encode their first 20 tokens to id arrays (OOV -> 0) with an OOV
    * count per doc.
    *
    * Scale: term counts partial-aggregate (map-side combine absorbs the
    * heavy tail); the global top-1000 runs through TakeOrderedAndProject
    * (per-partition heaps + k-merge, NO global sort); the residual rank
    * window sees exactly 1000 rows; and the encode join BROADCASTS the
    * vocab — per-token work is a hash probe, nothing token-sized shuffles.
    */
  def textVocabEncode(spark: SparkSession, dir: String): DataFrame = {
    val docs = t(spark, dir, "documents")
    val counts = docs.select(explode(split(col("text"), " ")).as("term"))
      .groupBy("term").agg(count(lit(1)).as("cnt"))
    val top = counts.orderBy(col("cnt").desc, col("term")).limit(1000)
    val vocab = top.withColumn("id",
      row_number().over(Window.orderBy(col("cnt").desc, col("term"))))
    val ptok = docs.filter(col("doc_id") % 100 === 0)
      .select(col("doc_id"),
        posexplode(slice(split(col("text"), " "), 1, 20))
          .as(Seq("pos", "term")))
    ptok.join(broadcast(vocab.select(col("term"), col("id"))),
        Seq("term"), "left")
      .select(col("doc_id"), col("pos"), coalesce(col("id"), lit(0)).as("id"))
      .groupBy("doc_id")
      // id sequence emitted as a space-joined string: the hash-compare
      // harness sorts rows by every output column and array columns are
      // unsortable there — the string carries the identical information
      .agg(array_join(
          transform(sort_array(collect_list(struct(col("pos"), col("id")))),
            s => s.getField("id")), " ").as("ids"),
        count(when(col("id") === 0, 1)).as("n_oov"))
      .orderBy("doc_id")
  }

  def mmDecodeStats(spark: SparkSession, dir: String): DataFrame =
    Multimodal.decodeStats(spark, t(spark, dir, "documents"))
      .orderBy("source", "mime")

  /** Frame sampling over the video subset of the manifest: every 2nd
    * fixed-size chunk (stub frames), byte-accounted per frame — the
    * plumbing a keyframe sampler runs through at scale (narrow flatMap,
    * frames never shuffle).
    */
  def mmFrameSample(spark: SparkSession, dir: String): DataFrame = {
    val spark2 = spark
    import spark2.implicits._
    Multimodal.frameSample(
        Multimodal.manifest(t(spark, dir, "documents"))
          .filter(col("mime") === "video/mp4"), stride = 2)
      .select(col("doc_id"), col("frame_no").cast("long").as("frame_no"),
        col("n_bytes").cast("long").as("n_bytes"))
      .orderBy("doc_id", "frame_no")
  }

  /** Resize plumbing over the image subset: metadata update + the stub
    * kernel's area-ratio byte accounting (truncating toward zero, like any
    * size estimate). A real decoder swap changes no plan shape.
    */
  def mmResize(spark: SparkSession, dir: String): DataFrame =
    Multimodal.resize(
        Multimodal.manifest(t(spark, dir, "documents"))
          .filter(col("mime") === "image/png"), w = 320, h = 240)
      .select(col("doc_id"), col("mime"), col("width"), col("height"),
        col("n_bytes"))
      .orderBy("doc_id")

  /** REAL PNG decode over the image manifest ([[Multimodal.imageManifest]]
    * carries genuine PNG containers; javax.imageio parses them). Decoded
    * dims and pixel stats are closed-form from the manifest metadata, so
    * the oracle checks the real decoder's output cell-exact.
    */
  def mmImageDecode(spark: SparkSession, dir: String): DataFrame =
    Multimodal.decodeImages(
        Multimodal.imageManifest(t(spark, dir, "documents")))
      .toDF().orderBy("doc_id")

  /** REAL image resize: PNG decode -> bilinear resample -> re-measure.
    * Constant-color sources survive any resampling kernel bit-exactly,
    * which is what keeps a real Graphics2D pipeline oracle-checkable.
    */
  def mmImageResize(spark: SparkSession, dir: String): DataFrame =
    Multimodal.resizeImages(
        Multimodal.imageManifest(t(spark, dir, "documents")), w = 16, h = 12)
      .toDF().orderBy("doc_id")

  /** REAL WAV decode over the audio manifest ([[Multimodal.audioManifest]]
    * carries genuine RIFF/WAVE containers; javax.sound.sampled parses
    * them). Square-wave payloads keep peak/RMS/mean closed-form from the
    * manifest metadata, so the oracle checks the real decoder cell-exact.
    */
  def mmAudioDecode(spark: SparkSession, dir: String): DataFrame =
    Multimodal.decodeAudio(
        Multimodal.audioManifest(t(spark, dir, "documents")))
      .toDF().orderBy("doc_id")

  /** REAL multi-frame decode over the GIF manifest ([[Multimodal
    * .gifManifest]] writes genuine animated-GIF containers; the kernel
    * opens each once and decodes every 2nd frame). Constant-gray frames
    * keep per-frame stats closed-form for the oracle while the bytes are a
    * real multi-image container — the video-path proof that only true
    * codecs (H.264 etc.) remain stubbed.
    */
  def mmGifFrames(spark: SparkSession, dir: String): DataFrame =
    Multimodal.gifFrames(
        Multimodal.gifManifest(t(spark, dir, "documents")), stride = 2)
      .toDF().orderBy("doc_id", "frame_no")

  /** REAL video decode over the MJPEG/AVI manifest ([[Multimodal
    * .aviManifest]] muxes genuine RIFF/AVI containers whose frames are
    * quality-1.0 JPEGs; the kernel demuxes the container and ImageIO-
    * decodes every 2nd frame). Constant frames round-trip the lossy codec
    * bit-exactly, keeping per-frame stats closed-form for the oracle —
    * this closes the video gap: container AND per-frame codec are real,
    * only inter-frame codecs (H.264) stay absent from the JDK.
    */
  def mmVideoFrames(spark: SparkSession, dir: String): DataFrame =
    Multimodal.aviFrames(
        Multimodal.aviManifest(t(spark, dir, "documents")), stride = 2)
      .toDF().orderBy("doc_id", "frame_no")

  /** Container-invariant image dedup ([[Multimodal.pixelDedup]]): mixed
    * PNG/BMP payloads of the same deterministic raster; dedup groups by a
    * REAL decoded-pixel digest, so the oracle can replicate groups from
    * the fixture's closed-form (w, h, gray) — and n_containers = 2 rows
    * prove the groups span byte-distinct encodings.
    */
  def mmPixelDedup(spark: SparkSession, dir: String): DataFrame =
    Multimodal.pixelDedup(
        Multimodal.mixedImageManifest(t(spark, dir, "documents")))
      .orderBy("rep_doc_id")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "mm_pixel_dedup" -> mmPixelDedup,
    "mm_resize" -> mmResize,
    "mm_audio_decode" -> mmAudioDecode,
    "mm_gif_frames" -> mmGifFrames,
    "mm_video_frames" -> mmVideoFrames,
    "mm_image_decode" -> mmImageDecode,
    "mm_image_resize" -> mmImageResize,
    "text_quality" -> textQuality,
    "text_langid" -> textLangid,
    "text_tokens" -> textTokens,
    "text_fingerprint" -> textFingerprint,
    "text_bigrams" -> textBigrams,
    "text_repetition" -> textRepetition,
    "text_lm_score" -> textLmScore,
    "text_heavy_hitters" -> textHeavyHitters,
    "text_bpe" -> textBpe,
    "text_tfidf" -> textTfidf,
    "text_bm25" -> textBm25,
    "text_hybrid_rrf" -> textHybridRrf,
    "text_hybrid_route" -> textHybridRoute,
    "text_bm25_indexed" -> textBm25Indexed,
    "text_bm25_maintained" -> textBm25Maintained,
    "text_bm25_pruned" -> textBm25Pruned,
    "text_bm25_wand" -> textBm25Wand,
    "text_hybrid_wand" -> textHybridWand,
    "text_bm25_bpe" -> textBm25Bpe,
    "text_bm25_normalized" -> textBm25Normalized,
    "text_phrase" -> textPhrase,
    "text_phrase_indexed" -> textPhraseIndexed,
    "text_near" -> textNear,
    "text_window" -> textWindow,
    "text_phrase_route" -> textPhraseRoute,
    "text_bm25_forget" -> textBm25Forget,
    "text_bm25_asof" -> textBm25Asof,
    "text_vocab_encode" -> textVocabEncode,
    "mm_decode_stats" -> mmDecodeStats,
    "mm_frame_sample" -> mmFrameSample)

  /** Shared by `text_bm25` (scan path), `text_bm25_indexed` (staged
    * index), and `text_bm25_maintained` (append-grown maintained index):
    * all must hash-match this one recompute-from-raw-docs SQL, which is
    * what proves the paths result-identical. `text_bm25_forget` uses the
    * same SQL over the live (post-delete) corpus slice — BM25 forgetting
    * is exact, so the delete semantics are just a WHERE on the source.
    */
  private def bm25OracleSqlOver(where: String): String =
    bm25OracleSqlFromD(
      s"""d AS (SELECT doc_id, string_split(text, ' ') AS toks
         |      FROM documents$where)""".stripMargin)

  /** The BM25 recompute body over an arbitrary tokenized-docs CTE chain
    * ending in `d(doc_id, toks)` — lets the normalized-tokenizer oracle
    * replay curation's normalization before the SAME scoring SQL.
    */
  private def bm25OracleSqlFromD(dCte: String): String =
      s"""WITH $dCte,
        |t AS (SELECT doc_id, len(toks) AS dl,
        |        len(list_filter(toks, x -> x = 'spark')) AS tf0,
        |        len(list_filter(toks, x -> x = 'merge')) AS tf1,
        |        len(list_filter(toks, x -> x = 'vector')) AS tf2
        |      FROM d),
        |s AS (SELECT COUNT(*) AS n, SUM(dl) AS tl,
        |        SUM(CASE WHEN tf0 > 0 THEN 1 ELSE 0 END) AS df0,
        |        SUM(CASE WHEN tf1 > 0 THEN 1 ELSE 0 END) AS df1,
        |        SUM(CASE WHEN tf2 > 0 THEN 1 ELSE 0 END) AS df2
        |      FROM t)
        |SELECT doc_id, CAST(
        |    (CASE WHEN tf0 > 0 THEN
        |      (CAST(2*(n - df0) + 1 AS HUGEINT) * 44 * tf0 * tl * 1000000000)
        |      // ((2*df0 + 1) * (20*tf0*tl + 6*tl + 18*dl*n)) ELSE 0 END)
        |  + (CASE WHEN tf1 > 0 THEN
        |      (CAST(2*(n - df1) + 1 AS HUGEINT) * 44 * tf1 * tl * 1000000000)
        |      // ((2*df1 + 1) * (20*tf1*tl + 6*tl + 18*dl*n)) ELSE 0 END)
        |  + (CASE WHEN tf2 > 0 THEN
        |      (CAST(2*(n - df2) + 1 AS HUGEINT) * 44 * tf2 * tl * 1000000000)
        |      // ((2*df2 + 1) * (20*tf2*tl + 6*tl + 18*dl*n)) ELSE 0 END)
        |  AS BIGINT) AS score,
        |  tf0 AS tf_spark, tf1 AS tf_merge, tf2 AS tf_vector
        |FROM t, s
        |ORDER BY score DESC, doc_id LIMIT 20""".stripMargin

  private val bm25OracleSql = bm25OracleSqlOver("")


  /** Zipped-unnest positions CTE shared by the positional oracles:
    * (doc_id, tok, ord) with 1-based ord — only RELATIVE offsets enter
    * the checks, so the Spark side's 0-based positions agree.
    */
  private val posCte =
    """WITH p AS (SELECT doc_id,
      |                  unnest(string_split(text, ' ')) AS tok,
      |                  unnest(range(1, len(string_split(text, ' ')) + 1)) AS ord
      |           FROM documents)""".stripMargin


  /** One phrase's (qid, doc_id, phrase_tf) rows by position equi-joins. */
  private def phraseArm(qid: Int, terms: Seq[String]): String = {
    val joins = terms.zipWithIndex.tail.map { case (_, i) =>
      s"JOIN p t$i ON t0.doc_id = t$i.doc_id AND t$i.ord = t0.ord + $i"
    }.mkString(" ")
    val preds = terms.zipWithIndex.map { case (tm, i) => s"t$i.tok = '$tm'" }
      .mkString(" AND ")
    s"""SELECT CAST($qid AS BIGINT) AS qid, t0.doc_id AS doc_id,
       | count(*) AS phrase_tf FROM p t0 $joins WHERE $preds GROUP BY 2"""
      .stripMargin.replace("\n", " ")
  }

  private val phraseOracleSql =
    s"""$posCte
       |SELECT a.doc_id AS doc_id, count(*) AS phrase_tf
       |FROM p a JOIN p b ON a.doc_id = b.doc_id AND b.ord = a.ord + 1
       |WHERE a.tok = 'spark' AND b.tok = 'merge'
       |GROUP BY 1 ORDER BY phrase_tf DESC, doc_id LIMIT 20""".stripMargin

  val oracles: Map[String, String] = Map(
    "text_bpe" -> BpeOracle.mergesSql,
    "text_bm25" -> bm25OracleSql,
    // the normalized-tokenizer index: plant the messy variants, replay
    // curation's normalization (the curate_normalize expressions), then
    // the same BM25 recompute
    "text_bm25_normalized" -> bm25OracleSqlFromD(
      """u AS (SELECT doc_id, text FROM documents
        |  UNION ALL
        |  SELECT doc_id + 30000000,
        |    'spark' || chr(160) || 'merge' || chr(160) || text ||
        |    chr(8232) || 'vector ' || chr(7) || ' spark'
        |  FROM documents WHERE doc_id % 50 = 0),
        |n AS (SELECT doc_id, trim(regexp_replace(
        |    nfc_normalize(regexp_replace(text,
        |      '[\x00-\x08\x0B\x0C\x0E-\x1F\x7F]', '', 'g')),
        |    '[\t\n\x0B\f\r \x{0085}\x{00A0}\x{1680}\x{2000}-\x{200A}\x{2028}\x{2029}\x{202F}\x{205F}\x{3000}]+',
        |    ' ', 'g')) AS norm FROM u),
        |d AS (SELECT doc_id, string_split(norm, ' ') AS toks FROM n)"""
        .stripMargin),
    "text_bm25_pruned" -> bm25OracleSql,
    // text_bm25_wand / text_hybrid_wand: deliberately NO oracle — the
    // impact-ordered tier (and the hybrid serve whose lexical leg rides
    // it) is approximate by construction (rows-only records; recall
    // floors asserted in TextIndexSpec / RetrievalSpec, the sim_ann_lsh
    // adjudication pattern)
    "text_bm25_bpe" -> BpeOracle.bm25BpeSql,
    "text_phrase" -> phraseOracleSql,
    "text_phrase_indexed" -> phraseOracleSql,
    "text_phrase_route" -> {
      val arms = Seq(
        phraseArm(1, Seq("spark", "merge")),
        phraseArm(2, Seq("merge", "vector")),
        phraseArm(3, Seq("spark", "merge", "vector")),
        phraseArm(4, Seq("vector", "spark")),
        phraseArm(5, Seq("merge", "merge"))).mkString(" UNION ALL ")
      s"""$posCte,
         |u AS ($arms),
         |r AS (SELECT qid, doc_id, phrase_tf, row_number() OVER
         |        (PARTITION BY qid ORDER BY phrase_tf DESC, doc_id)
         |        AS rank FROM u)
         |SELECT qid, rank, doc_id, phrase_tf FROM r
         |WHERE rank <= 20 ORDER BY qid, rank""".stripMargin
    },
    "text_near" ->
      s"""$posCte
         |SELECT a.doc_id AS doc_id, min(abs(a.ord - b.ord)) AS gap
         |FROM p a JOIN p b ON a.doc_id = b.doc_id
         |WHERE a.tok = 'spark' AND b.tok = 'vector'
         |GROUP BY 1 HAVING min(abs(a.ord - b.ord)) <= 3
         |ORDER BY gap, doc_id LIMIT 20""".stripMargin,
    "text_window" ->
      s"""$posCte
         |SELECT a.doc_id AS doc_id,
         |  min(greatest(a.ord, b.ord, c.ord)
         |      - least(a.ord, b.ord, c.ord)) AS win
         |FROM p a
         |JOIN p b ON a.doc_id = b.doc_id
         |JOIN p c ON a.doc_id = c.doc_id
         |WHERE a.tok = 'spark' AND b.tok = 'merge' AND c.tok = 'vector'
         |GROUP BY 1
         |HAVING min(greatest(a.ord, b.ord, c.ord)
         |           - least(a.ord, b.ord, c.ord)) <= 6
         |ORDER BY win, doc_id LIMIT 20""".stripMargin,
    "text_hybrid_rrf" ->
      """WITH d AS (SELECT doc_id, string_split(text, ' ') AS toks
        |           FROM documents),
        |t AS (SELECT doc_id, len(toks) AS dl,
        |        len(list_filter(toks, x -> x = 'spark')) AS tf0,
        |        len(list_filter(toks, x -> x = 'merge')) AS tf1,
        |        len(list_filter(toks, x -> x = 'vector')) AS tf2
        |      FROM d),
        |s AS (SELECT COUNT(*) AS n, SUM(dl) AS tl,
        |        SUM(CASE WHEN tf0 > 0 THEN 1 ELSE 0 END) AS df0,
        |        SUM(CASE WHEN tf1 > 0 THEN 1 ELSE 0 END) AS df1,
        |        SUM(CASE WHEN tf2 > 0 THEN 1 ELSE 0 END) AS df2
        |      FROM t),
        |lex0 AS (SELECT doc_id, CAST(
        |    (CASE WHEN tf0 > 0 THEN
        |      (CAST(2*(n - df0) + 1 AS HUGEINT) * 44 * tf0 * tl * 1000000000)
        |      // ((2*df0 + 1) * (20*tf0*tl + 6*tl + 18*dl*n)) ELSE 0 END)
        |  + (CASE WHEN tf1 > 0 THEN
        |      (CAST(2*(n - df1) + 1 AS HUGEINT) * 44 * tf1 * tl * 1000000000)
        |      // ((2*df1 + 1) * (20*tf1*tl + 6*tl + 18*dl*n)) ELSE 0 END)
        |  + (CASE WHEN tf2 > 0 THEN
        |      (CAST(2*(n - df2) + 1 AS HUGEINT) * 44 * tf2 * tl * 1000000000)
        |      // ((2*df2 + 1) * (20*tf2*tl + 6*tl + 18*dl*n)) ELSE 0 END)
        |  AS BIGINT) AS score FROM t, s),
        |lex AS (SELECT doc_id,
        |          row_number() OVER (ORDER BY score DESC, doc_id)
        |            AS rank_lex
        |        FROM lex0 QUALIFY rank_lex <= 50),
        |e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
        |      FROM embeddings),
        |vec0 AS (SELECT c.vec_id AS doc_id,
        |        list_inner_product(q.v, c.v) /
        |          (sqrt(list_inner_product(q.v, q.v)) *
        |           sqrt(list_inner_product(c.v, c.v))) AS cos
        |      FROM e q JOIN e c ON q.vec_id = 0 AND c.vec_id <> 0),
        |vec AS (SELECT doc_id,
        |          row_number() OVER (ORDER BY cos DESC, doc_id) AS rank_vec
        |        FROM vec0 QUALIFY rank_vec <= 50),
        |f AS (SELECT COALESCE(lex.doc_id, vec.doc_id) AS doc_id,
        |        rank_lex, rank_vec
        |      FROM lex FULL OUTER JOIN vec ON lex.doc_id = vec.doc_id)
        |SELECT doc_id,
        |  COALESCE(1000000000 // (60 + rank_lex), 0)
        |    + COALESCE(1000000000 // (60 + rank_vec), 0) AS rrf_score,
        |  CAST(rank_lex AS INT) AS rank_lex,
        |  CAST(rank_vec AS INT) AS rank_vec
        |FROM f ORDER BY rrf_score DESC, doc_id LIMIT 20""".stripMargin,
    "text_hybrid_route" ->
      """WITH d AS (SELECT doc_id, string_split(text, ' ') AS toks
        |           FROM documents),
        |t AS (SELECT doc_id, len(toks) AS dl,
        |        len(list_filter(toks, x -> x = 'spark')) AS tf0,
        |        len(list_filter(toks, x -> x = 'merge')) AS tf1,
        |        len(list_filter(toks, x -> x = 'vector')) AS tf2
        |      FROM d),
        |s AS (SELECT COUNT(*) AS n, SUM(dl) AS tl,
        |        SUM(CASE WHEN tf0 > 0 THEN 1 ELSE 0 END) AS df0,
        |        SUM(CASE WHEN tf1 > 0 THEN 1 ELSE 0 END) AS df1,
        |        SUM(CASE WHEN tf2 > 0 THEN 1 ELSE 0 END) AS df2
        |      FROM t),
        |lex0 AS (SELECT doc_id, CAST(
        |    (CASE WHEN tf0 > 0 THEN
        |      (CAST(2*(n - df0) + 1 AS HUGEINT) * 44 * tf0 * tl * 1000000000)
        |      // ((2*df0 + 1) * (20*tf0*tl + 6*tl + 18*dl*n)) ELSE 0 END)
        |  + (CASE WHEN tf1 > 0 THEN
        |      (CAST(2*(n - df1) + 1 AS HUGEINT) * 44 * tf1 * tl * 1000000000)
        |      // ((2*df1 + 1) * (20*tf1*tl + 6*tl + 18*dl*n)) ELSE 0 END)
        |  + (CASE WHEN tf2 > 0 THEN
        |      (CAST(2*(n - df2) + 1 AS HUGEINT) * 44 * tf2 * tl * 1000000000)
        |      // ((2*df2 + 1) * (20*tf2*tl + 6*tl + 18*dl*n)) ELSE 0 END)
        |  AS BIGINT) AS score FROM t, s),
        |lex AS (SELECT doc_id,
        |          row_number() OVER (ORDER BY score DESC, doc_id)
        |            AS rank_lex
        |        FROM lex0 WHERE score > 0 QUALIFY rank_lex <= 50),
        |e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
        |      FROM embeddings),
        |vec0 AS (SELECT q.vec_id AS qid, c.vec_id AS doc_id,
        |        list_inner_product(q.v, c.v) /
        |          (sqrt(list_inner_product(q.v, q.v)) *
        |           sqrt(list_inner_product(c.v, c.v))) AS cos
        |      FROM e q JOIN e c
        |        ON q.vec_id % 100 = 0 AND c.vec_id <> q.vec_id),
        |vec AS (SELECT qid, doc_id,
        |          row_number() OVER (PARTITION BY qid
        |            ORDER BY cos DESC, doc_id) AS rank_vec
        |        FROM vec0 QUALIFY rank_vec <= 50),
        |qs AS (SELECT DISTINCT vec_id AS qid FROM e WHERE vec_id % 100 = 0),
        |lexq AS (SELECT qs.qid, lex.doc_id, lex.rank_lex FROM qs, lex),
        |f AS (SELECT COALESCE(lexq.qid, vec.qid) AS qid,
        |        COALESCE(lexq.doc_id, vec.doc_id) AS doc_id,
        |        lexq.rank_lex, vec.rank_vec
        |      FROM lexq FULL OUTER JOIN vec
        |        ON lexq.qid = vec.qid AND lexq.doc_id = vec.doc_id),
        |fused AS (SELECT qid, doc_id,
        |        COALESCE(1000000000 // (60 + rank_lex), 0)
        |          + COALESCE(1000000000 // (60 + rank_vec), 0) AS rrf_score
        |      FROM f),
        |r AS (SELECT qid, doc_id, rrf_score,
        |        row_number() OVER (PARTITION BY qid
        |          ORDER BY rrf_score DESC, doc_id) AS rank
        |      FROM fused QUALIFY rank <= 10)
        |SELECT qid, CAST(rank AS INT) AS rank, doc_id, rrf_score
        |FROM r ORDER BY qid, rank""".stripMargin,
    "text_bm25_indexed" -> bm25OracleSql,
    "text_bm25_maintained" -> bm25OracleSql,
    "text_bm25_forget" -> bm25OracleSqlOver(" WHERE doc_id % 7 <> 3"),
    "text_bm25_asof" -> bm25OracleSqlOver(" WHERE doc_id % 2 = 0"),
    "mm_pixel_dedup" ->
      """WITH v AS (
        |  SELECT doc_id, (n_chars % 16) + 8 AS w, (doc_id % 8) + 8 AS h,
        |    (doc_id % 16) * 16 AS g,
        |    CASE WHEN (n_chars // 16) % 2 = 0 THEN 'image/png'
        |         ELSE 'image/bmp' END AS container
        |  FROM documents WHERE doc_id % 3 = 0)
        |SELECT CAST(MIN(doc_id) AS BIGINT) AS rep_doc_id,
        |  CAST(w AS INT) AS width, CAST(h AS INT) AS height,
        |  COUNT(*) AS n_dups,
        |  CAST(COUNT(DISTINCT container) AS BIGINT) AS n_containers
        |FROM v GROUP BY w, h, g HAVING COUNT(*) >= 2
        |ORDER BY rep_doc_id""".stripMargin,
    "mm_gif_frames" ->
      """WITH v AS (
        |  SELECT doc_id, (n_chars % 24) + 6 AS w, (doc_id % 16) + 6 AS h,
        |    (doc_id % 5) + 2 AS n, doc_id % 200 AS base
        |  FROM documents WHERE doc_id % 3 = 2),
        |f AS (SELECT doc_id, w, h, base,
        |        unnest(generate_series(0, CAST(n - 1 AS INT))) AS fr
        |      FROM v)
        |SELECT doc_id, CAST(fr AS INT) AS frame_no, CAST(w AS INT) AS width,
        |  CAST(h AS INT) AS height,
        |  CAST((base + 7 * fr) % 256 AS DOUBLE) AS avg_px
        |FROM f WHERE fr % 2 = 0 ORDER BY doc_id, frame_no""".stripMargin,
    "mm_video_frames" ->
      """WITH v AS (
        |  SELECT doc_id, (n_chars % 24) + 8 AS w, (doc_id % 16) + 8 AS h,
        |    (doc_id % 4) + 2 AS n, doc_id % 200 AS base
        |  FROM documents WHERE doc_id % 3 = 2),
        |f AS (SELECT doc_id, w, h, base,
        |        unnest(generate_series(0, CAST(n - 1 AS INT))) AS fr
        |      FROM v)
        |SELECT doc_id, CAST(fr AS INT) AS frame_no, CAST(w AS INT) AS width,
        |  CAST(h AS INT) AS height,
        |  CAST((base + 7 * fr) % 256 AS DOUBLE) AS avg_px
        |FROM f WHERE fr % 2 = 0 ORDER BY doc_id, frame_no""".stripMargin,
    "mm_audio_decode" ->
      """WITH a AS (
        |  SELECT doc_id, (n_chars % 2000) + 100 AS n,
        |    CAST(8000 + (doc_id % 4) * 4000 AS INT) AS sample_rate,
        |    ((doc_id % 120) + 1) * 250 AS amp
        |  FROM documents WHERE doc_id % 3 = 1)
        |SELECT doc_id, CAST(n AS BIGINT) AS n_samples, sample_rate,
        |  CAST(1 AS INT) AS channels, CAST(amp AS INT) AS peak,
        |  CAST(amp AS DOUBLE) AS rms,
        |  CASE WHEN n % 2 = 0 THEN CAST(0 AS DOUBLE)
        |       ELSE CAST(amp AS DOUBLE) / n END AS avg_sample
        |FROM a ORDER BY doc_id""".stripMargin,
    "text_heavy_hitters" ->
      """WITH t AS (SELECT unnest(string_split(text, ' ')) AS term
        |           FROM documents),
        |c AS (SELECT term, COUNT(*) AS est FROM t GROUP BY term)
        |SELECT term, est FROM c ORDER BY est DESC, term LIMIT 20""".stripMargin,
    "text_repetition" ->
      """WITH tok AS (SELECT doc_id, string_split(text, ' ') AS toks
        |             FROM documents
        |             WHERE len(string_split(text, ' ')) >= 2),
        |t AS (SELECT doc_id, unnest(toks) AS w, len(toks) AS n FROM tok),
        |tc AS (SELECT doc_id, n, w, COUNT(*) AS c FROM t GROUP BY 1, 2, 3),
        |ttf AS (SELECT doc_id, any_value(n) AS n_tokens,
        |          CAST(MAX(c) AS INT) AS max_token_count
        |        FROM tc GROUP BY doc_id),
        |bgx AS (SELECT doc_id, toks,
        |          unnest(generate_series(1, len(toks) - 1)) AS i FROM tok),
        |bg AS (SELECT doc_id, toks[i] || ' ' || toks[i+1] AS b FROM bgx),
        |bc AS (SELECT doc_id, b, COUNT(*) AS c FROM bg GROUP BY 1, 2),
        |bs AS (SELECT doc_id, SUM(c) AS n_bg, MAX(c) AS max_bg,
        |         SUM(CASE WHEN c > 1 THEN c ELSE 0 END) AS dup_bg
        |       FROM bc GROUP BY doc_id)
        |SELECT doc_id, n_tokens, max_token_count,
        |  CAST(max_token_count AS DOUBLE) / n_tokens AS top_token_frac,
        |  CAST(max_bg AS DOUBLE) / n_bg AS top_bigram_frac,
        |  CAST(dup_bg AS DOUBLE) / n_bg AS dup_bigram_frac
        |FROM ttf JOIN bs USING (doc_id) ORDER BY doc_id""".stripMargin,
    "text_lm_score" ->
      """WITH tok AS (SELECT doc_id, string_split(text, ' ') AS toks
        |             FROM documents
        |             WHERE len(string_split(text, ' ')) >= 2),
        |idx AS (SELECT doc_id, toks,
        |          unnest(generate_series(1, len(toks) - 1)) AS i FROM tok),
        |bg AS (SELECT doc_id, toks[i] || ' ' || toks[i+1] AS bigram FROM idx),
        |c AS (SELECT bigram, COUNT(*) AS cnt FROM bg GROUP BY bigram
        |      ORDER BY cnt DESC, bigram LIMIT 50000),
        |s AS (SELECT doc_id, COUNT(*) AS n_bigrams,
        |        CAST(SUM(CASE WHEN COALESCE(cnt, 0) <= 1 THEN 1 ELSE 0 END)
        |          AS BIGINT) AS n_rare,
        |        CAST(SUM(COALESCE(cnt, 0)) AS BIGINT) AS sum_cnt
        |      FROM bg LEFT JOIN c USING (bigram) GROUP BY doc_id)
        |SELECT doc_id, n_bigrams, n_rare,
        |  CAST(n_rare AS DOUBLE) / n_bigrams AS rare_bigram_frac,
        |  CAST(sum_cnt AS DOUBLE) / n_bigrams AS mean_bigram_count
        |FROM s ORDER BY doc_id""".stripMargin,
    "text_bigrams" ->
      """WITH tok AS (SELECT string_split(text, ' ') AS toks FROM documents),
        |idx AS (SELECT toks, unnest(generate_series(1, len(toks) - 1)) AS i
        |        FROM tok),
        |bg AS (SELECT toks[i] || ' ' || toks[i+1] AS bigram FROM idx)
        |SELECT bigram, COUNT(*) AS n FROM bg GROUP BY bigram
        |ORDER BY n DESC, bigram LIMIT 50""".stripMargin,
    "mm_image_decode" ->
      """SELECT doc_id,
        |  CAST((n_chars % 64) + 8 AS INT) AS width,
        |  CAST((doc_id % 48) + 8 AS INT) AS height,
        |  CAST(doc_id % 256 AS DOUBLE) AS avg_px,
        |  CAST(doc_id % 256 AS INT) AS min_px,
        |  CAST(doc_id % 256 AS INT) AS max_px
        |FROM documents WHERE doc_id % 3 = 0 ORDER BY doc_id""".stripMargin,
    "mm_image_resize" ->
      """SELECT doc_id, CAST(16 AS INT) AS width, CAST(12 AS INT) AS height,
        |  CAST(doc_id % 256 AS DOUBLE) AS avg_px
        |FROM documents WHERE doc_id % 3 = 0 ORDER BY doc_id""".stripMargin,
    "mm_resize" ->
      """WITH m AS (
        |  SELECT doc_id,
        |    n_chars % 640 AS src_w, doc_id % 480 AS src_h,
        |    length(text) AS len
        |  FROM documents WHERE doc_id % 3 = 0),
        |r AS (
        |  SELECT doc_id, len,
        |    LEAST(CAST(1 AS DOUBLE),
        |      CAST(320 * 240 AS DOUBLE) / GREATEST(1, src_w * src_h)) AS ratio
        |  FROM m)
        |SELECT doc_id, 'image/png' AS mime,
        |  CAST(320 AS INT) AS width, CAST(240 AS INT) AS height,
        |  GREATEST(1, CAST(floor(len * ratio) AS BIGINT)) AS n_bytes
        |FROM r ORDER BY doc_id""".stripMargin,
    "text_quality" ->
      """WITH q AS (
        |  SELECT doc_id,
        |    len(string_split(text, ' ')) AS n_tokens,
        |    length(text) AS n_chars,
        |    len(list_filter(string_split(text, ' '),
        |      t -> list_contains(['the','a','of','and','to','in','is','it'], t))) AS n_stop,
        |    length(text) - length(regexp_replace(text, '[0-9]', '', 'g')) AS n_digits,
        |    len(list_distinct(string_split(text, ' '))) AS n_distinct_tokens
        |  FROM documents)
        |SELECT doc_id, n_tokens, n_chars,
        |  CAST(n_chars - (n_tokens - 1) AS DOUBLE) / n_tokens AS avg_token_len,
        |  CAST(n_stop AS DOUBLE) / n_tokens AS stopword_ratio,
        |  n_digits, n_distinct_tokens,
        |  CAST(n_distinct_tokens AS DOUBLE) / n_tokens AS distinct_ratio,
        |  CASE WHEN n_tokens < 10 THEN 'too_short'
        |       WHEN CAST(n_distinct_tokens AS DOUBLE) / n_tokens < 0.3 THEN 'repetitive'
        |       WHEN CAST(n_stop AS DOUBLE) / n_tokens < 0.01 THEN 'no_stopwords'
        |       ELSE 'ok' END AS quality_bucket
        |FROM q ORDER BY doc_id""".stripMargin,
    "text_langid" ->
      """WITH h AS (
        |  SELECT doc_id, lang AS lang_declared,
        |    len(list_filter(string_split(text, ' '),
        |      t -> list_contains(['the','a','of','and'], t))) AS hits_en,
        |    len(list_filter(string_split(text, ' '),
        |      t -> list_contains(['el','la','de','que'], t))) AS hits_es,
        |    len(list_filter(string_split(text, ' '),
        |      t -> list_contains(['der','die','und','das'], t))) AS hits_de,
        |    len(list_filter(string_split(text, ' '),
        |      t -> list_contains(['le','la','et','les'], t))) AS hits_fr
        |  FROM documents)
        |SELECT doc_id, lang_declared, hits_en, hits_es, hits_de, hits_fr,
        |  CASE WHEN hits_en >= greatest(hits_es, hits_de, hits_fr) THEN 'en'
        |       WHEN hits_es >= greatest(hits_de, hits_fr) THEN 'es'
        |       WHEN hits_de >= hits_fr THEN 'de'
        |       ELSE 'fr' END AS lang_pred
        |FROM h ORDER BY doc_id""".stripMargin,
    "text_tokens" ->
      """SELECT doc_id,
        |  len(string_split(text, ' ')) AS ws_tokens,
        |  len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]')) AS bpeish_tokens,
        |  CAST(ceil(length(text) / 4.0) AS BIGINT) AS chars_div4
        |FROM documents ORDER BY doc_id""".stripMargin,
    "text_tfidf" ->
      """WITH tok AS (
        |  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents),
        |tk AS (SELECT doc_id, term FROM tok WHERE length(term) > 3),
        |tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM tk GROUP BY 1, 2),
        |dfq AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY 1),
        |n AS (SELECT COUNT(*) AS n_docs FROM documents),
        |s AS (SELECT tf.doc_id, tf.term,
        |        CAST(tf.tf * n.n_docs AS DOUBLE) / CAST(dfq.df AS DOUBLE) AS score
        |      FROM tf JOIN dfq USING (term) CROSS JOIN n
        |      WHERE tf.doc_id % 100 = 0),
        |r AS (SELECT doc_id, term, score,
        |        row_number() OVER (PARTITION BY doc_id
        |          ORDER BY score DESC, term) AS rank
        |      FROM s)
        |SELECT doc_id, rank, term, score FROM r WHERE rank <= 5
        |ORDER BY doc_id, rank""".stripMargin,
    "text_vocab_encode" ->
      """WITH tok AS (
        |  SELECT unnest(string_split(text, ' ')) AS term FROM documents),
        |cnt AS (SELECT term, COUNT(*) AS cnt FROM tok GROUP BY 1),
        |top AS (
        |  SELECT term, CAST(row_number() OVER (ORDER BY cnt DESC, term) AS INT)
        |    AS id
        |  FROM cnt ORDER BY cnt DESC, term LIMIT 1000),
        |p AS (SELECT doc_id, string_split(text, ' ')[1:20] AS toks
        |      FROM documents WHERE doc_id % 100 = 0),
        |pt AS (SELECT doc_id, unnest(toks) AS term,
        |         unnest(generate_series(1, len(toks))) AS pos FROM p),
        |je AS (SELECT pt.doc_id, pt.pos, CAST(COALESCE(top.id, 0) AS INT) AS id
        |       FROM pt LEFT JOIN top USING (term))
        |SELECT doc_id, array_to_string(list(id ORDER BY pos), ' ') AS ids,
        |  COUNT(CASE WHEN id = 0 THEN 1 END) AS n_oov
        |FROM je GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "mm_frame_sample" ->
      """WITH v AS (
        |  SELECT doc_id, length(text) AS n FROM documents WHERE doc_id % 3 = 2),
        |f AS (SELECT doc_id, n,
        |        unnest(generate_series(0, CAST(ceil(n / 256.0) AS INT) - 1)) AS chunk
        |      FROM v)
        |SELECT doc_id, chunk AS frame_no,
        |  LEAST(256, n - 256 * chunk) AS n_bytes
        |FROM f WHERE chunk % 2 = 0
        |ORDER BY doc_id, frame_no""".stripMargin,
    "mm_decode_stats" ->
      """WITH m AS (
        |  SELECT doc_id, source,
        |    CASE WHEN doc_id % 3 = 0 THEN 'image/png'
        |         WHEN doc_id % 3 = 1 THEN 'audio/wav'
        |         ELSE 'video/mp4' END AS mime,
        |    length(text) AS n_bytes,
        |    unicode(substring(text, 1, 1)) AS first_byte,
        |    list_aggregate(list_transform(string_split(text, ''),
        |      c -> unicode(c)), 'sum') AS checksum
        |  FROM documents)
        |SELECT source, mime, COUNT(*) AS n_media,
        |  CAST(SUM(n_bytes) AS BIGINT) AS total_bytes,
        |  CAST(SUM(n_bytes) AS DOUBLE) / COUNT(*) AS avg_bytes,
        |  MIN(first_byte) AS min_first_byte,
        |  CAST(SUM(checksum) AS BIGINT) AS total_checksum
        |FROM m GROUP BY source, mime ORDER BY source, mime""".stripMargin,
    // text_fingerprint oracle (r10, formerly rows-only): DuckDB replays the
    // polynomial rolling hash (functions/texthash.scala `rollingHash`:
    // h = (h*1000003 mod 2^61-1) + byte + 1, one conditional subtraction)
    // exactly — HUGEINT holds the 81-bit product, list_reduce folds the
    // byte stream, the prepended 0 is the kernel's h=0 seed. Byte values
    // come from `ascii(char)`, which equals the UTF-8 byte ONLY for ASCII
    // text — true for the generated corpus (asserted: octet_length ==
    // length over all docs at every sf); a non-ASCII regeneration would
    // surface here as a hash mismatch, which is the desired loud failure.
    "text_fingerprint" -> {
      def fp(s: String) =
        s"""list_reduce(list_prepend(CAST(0 AS BIGINT),
           |    list_transform(range(1, length($s)+1),
           |      i -> CAST(ascii($s[i:i]) AS BIGINT))),
           |  (a, b) -> CAST(((CAST(a AS HUGEINT)*1000003)
           |     % 2305843009213693951 + b + 1)
           |     % 2305843009213693951 AS BIGINT))""".stripMargin
      s"""WITH n AS (SELECT doc_id, text,
        |  regexp_replace(lower(text), '\\s+', ' ', 'g') AS tn
        |  FROM documents)
        |SELECT doc_id, ${fp("text")} AS fp_raw,
        |  ${fp("tn")} AS fp_normalized
        |FROM n ORDER BY doc_id""".stripMargin
    })
}

/** DuckDB replay of [[graft.operators.Bpe.train]] — the VERDICT r10 #6
  * conversion: the driver merge loop is DETERMINISTIC over the bounded
  * word-frequency dict (winner = (count desc, left, right) total order),
  * so its first 30 iterations unroll into 30 chained CTE steps, the same
  * shape as the k-means unrolled-Lloyd oracle.
  *
  * State encoding is the key trick: each word's unit sequence is one
  * string `SEP u1 SEP SEP u2 SEP ... SEP un SEP` (SEP = chr(1), absent
  * from the corpus — TablesSpec drift-guards that), so applying a merge
  * is `replace(s, SEP||l||SEP||SEP||r||SEP, SEP||l||r||SEP)`: SQL
  * `replace` substitutes left-to-right non-overlapping occurrences and
  * resumes scanning AFTER each replacement — exactly the train loop's
  * greedy `i += 2` semantics (the double separator keeps adjacent
  * matches independent: each unit carries its own delimiters, so a
  * consumed trailing SEP never steals the next match's leading SEP).
  * Pair counting splits the state string back to units per step.
  *
  * Step CTEs are MATERIALIZED: DuckDB inlines plain CTEs, and with the
  * final union referencing every step the inlined plan re-expands each
  * step's full prefix chain — O(M^2) scans of the corpus (the naive form
  * exhausted file handles); materialization makes the chain linear.
  */
private[queries] object BpeOracle {
  private val M = 30 // merges; must match textBpe's nMerges
  private val S = "chr(1)"

  /** The training replay: wc (bounded word-frequency dict), st0..st{M-1}
    * (sentinel-encoded word states), c_k/w_k (pair counts + the rank-k
    * winner). Shared by [[mergesSql]] (text_bpe — emits the winners) and
    * [[bm25BpeSql]] (text_bm25_bpe — re-encodes the corpus through them).
    */
  private def trainCtes: Seq[String] = {
    val ctes = Seq.newBuilder[String]
    ctes += s"""wc AS MATERIALIZED (SELECT w, COUNT(*) AS cnt
      |  FROM (SELECT unnest(string_split(text, ' ')) AS w FROM documents)
      |  WHERE length(w) > 0 GROUP BY w
      |  ORDER BY cnt DESC, w LIMIT 100000)""".stripMargin
    ctes += s"""st0 AS MATERIALIZED (SELECT $S || array_to_string(
      |    list_transform(range(1, length(w)+1), i -> w[i:i]) || ['</w>'],
      |    $S||$S) || $S AS s, cnt FROM wc)""".stripMargin
    for (k <- 0 until M) {
      ctes += s"""c$k AS (SELECT u[i] AS l, u[i+1] AS r, SUM(cnt) AS c
        |  FROM (SELECT u, cnt, unnest(generate_series(1, len(u)-1)) AS i
        |        FROM (SELECT string_split(s[2:length(s)-1], $S||$S) AS u,
        |                cnt FROM st$k))
        |  GROUP BY 1, 2)""".stripMargin
      ctes += s"w$k AS MATERIALIZED (SELECT l, r, c FROM c$k " +
        "ORDER BY c DESC, l, r LIMIT 1)"
      if (k < M - 1)
        ctes += s"""st${k + 1} AS MATERIALIZED (SELECT
          |  replace(st.s, $S||w.l||$S||$S||w.r||$S, $S||w.l||w.r||$S) AS s,
          |  st.cnt FROM st$k st CROSS JOIN w$k w)""".stripMargin
    }
    ctes.result()
  }

  val mergesSql: String = {
    val union = (0 until M)
      .map(k => s"SELECT $k AS rank, l, r, c FROM w$k")
      .mkString("\nUNION ALL ")
    s"""WITH ${trainCtes.mkString(",\n")}
      |SELECT CAST(rank AS INT) AS rank, l AS "left", r AS "right",
      |  CAST(c AS BIGINT) AS "pairCount"
      |FROM ($union) ORDER BY rank""".stripMargin
  }

  /** BM25 over the BPE token space, replayed end-to-end in DuckDB:
    * retrain the M merges (the [[trainCtes]] chain), ENCODE every
    * distinct corpus word through them (e0..e$M — sequential
    * rank-ordered replace over the sentinel encoding, the exact
    * application order training used and [[graft.operators.Bpe
    * .encodeWord]] reproduces per BpeSpec's encode/train-consistency
    * proof), then the standard scaled-integer BM25 recompute over the
    * resulting subword token stream: dl = tokens per doc, df/tf per
    * DISTINCT query token (the query words' encodings — derived from
    * the same chain, so the token set matches [[graft.operators
    * .TextIndex.bpeQueryTokens]] by construction for in-vocabulary
    * query words). Docs rank by the summed per-token contribution with
    * score-0 docs included (LEFT JOIN), ties by doc_id — the
    * [[TextQueries]] bm25 oracle shape.
    */
  val bm25BpeSql: String = {
    val ctes = Seq.newBuilder[String]
    ctes ++= trainCtes
    ctes += """aw AS MATERIALIZED (SELECT DISTINCT w
      |  FROM (SELECT unnest(string_split(text, ' ')) AS w FROM documents)
      |  WHERE length(w) > 0)""".stripMargin
    ctes += s"""e0 AS MATERIALIZED (SELECT w, $S || array_to_string(
      |    list_transform(range(1, length(w)+1), i -> w[i:i]) || ['</w>'],
      |    $S||$S) || $S AS s FROM aw)""".stripMargin
    for (k <- 0 until M)
      ctes += s"""e${k + 1} AS MATERIALIZED (SELECT e.w,
        |  replace(e.s, $S||w.l||$S||$S||w.r||$S, $S||w.l||w.r||$S) AS s
        |  FROM e$k e CROSS JOIN w$k w)""".stripMargin
    ctes += s"""w2t AS MATERIALIZED (SELECT w,
      |  string_split(s[2:length(s)-1], $S||$S) AS toks FROM e$M)"""
      .stripMargin
    ctes += """qt AS (SELECT DISTINCT unnest(toks) AS tok FROM w2t
      |  WHERE w IN ('spark', 'merge', 'vector'))""".stripMargin
    ctes += """dw AS (SELECT doc_id, w
      |  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS w
      |        FROM documents)
      |  WHERE length(w) > 0)""".stripMargin
    ctes += """dt AS MATERIALIZED (SELECT dw.doc_id, unnest(w2t.toks) AS tok
      |  FROM dw JOIN w2t USING (w))""".stripMargin
    ctes += """dl AS (SELECT d.doc_id, count(dt.tok) AS dl
      |  FROM documents d LEFT JOIN dt ON d.doc_id = dt.doc_id
      |  GROUP BY 1)""".stripMargin
    ctes += """tf AS (SELECT dt.doc_id, dt.tok, count(*) AS tf
      |  FROM dt JOIN qt USING (tok) GROUP BY 1, 2)""".stripMargin
    ctes += "df AS (SELECT tok, count(*) AS df FROM tf GROUP BY 1)"
    ctes += "s AS (SELECT count(*) AS n, sum(dl) AS tl FROM dl)"
    ctes += """sc AS (SELECT tf.doc_id, SUM(
      |    (CAST(2*(n - df) + 1 AS HUGEINT) * 44 * tf * tl * 1000000000)
      |    // ((2*df + 1) * (20*tf*tl + 6*tl + 18*dl*n))) AS score
      |  FROM tf JOIN df USING (tok) JOIN dl USING (doc_id) CROSS JOIN s
      |  GROUP BY 1)""".stripMargin
    s"""WITH ${ctes.result().mkString(",\n")}
      |SELECT d.doc_id AS doc_id, CAST(COALESCE(sc.score, 0) AS BIGINT)
      |  AS score
      |FROM documents d LEFT JOIN sc ON d.doc_id = sc.doc_id
      |ORDER BY score DESC, doc_id LIMIT 20""".stripMargin
  }
}
