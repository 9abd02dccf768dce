package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.gcolumns.rolling_hash

/** Text-analysis operators for training-data curation: quality scoring,
  * language ID, token counting, fingerprinting. All pure column pipelines
  * (no shuffle, whole-stage codegen) — at 100 TB these run at scan speed.
  */
object TextAnalysis {

  /** Tiny per-language stopword profiles for the n-gram/stopword-vote
    * language-ID heuristic. Deterministic, SQL-expressible (oracle parity).
    */
  val langProfiles: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and"),
    "es" -> Seq("el", "la", "de", "que"),
    "de" -> Seq("der", "die", "und", "das"),
    "fr" -> Seq("le", "la", "et", "les"))

  val stopwordsEn: Seq[String] =
    Seq("the", "a", "of", "and", "to", "in", "is", "it")

  private def countIn(tokens: Column, words: Seq[String]): Column =
    size(filter(tokens, t => t.isInCollection(words)))

  /** Quality metrics per document: token counts, length stats, stopword
    * ratio, uppercase/digit/punct ratios, and a composite quality bucket —
    * the usual pre-training corpus filters (C4/Gopher-style rules).
    */
  def quality(docs: DataFrame): DataFrame = {
    val tokens = split(col("text"), " ")
    val nTokens = size(tokens)
    val nChars = length(col("text"))
    val stopRatio = countIn(tokens, stopwordsEn).cast("double") / nTokens
    val avgTokLen = (nChars - (nTokens - 1)).cast("double") / nTokens
    val digitCount = nChars - length(regexp_replace(col("text"), "[0-9]", ""))
    val nDistinct = size(array_distinct(tokens))
    val distinctRatio = nDistinct.cast("double") / nTokens
    docs.select(
      col("doc_id"),
      nTokens.as("n_tokens"),
      nChars.as("n_chars"),
      avgTokLen.as("avg_token_len"),
      stopRatio.as("stopword_ratio"),
      digitCount.as("n_digits"),
      nDistinct.as("n_distinct_tokens"),
      distinctRatio.as("distinct_ratio"),
      when(nTokens < 10, "too_short")
        .when(distinctRatio < lit(0.3), "repetitive")
        .when(stopRatio < lit(0.01), "no_stopwords")
        .otherwise("ok").as("quality_bucket"))
  }

  /** Stopword-vote language ID: count profile hits per language, pick the
    * max (ties broken by profile order). Returns (lang_pred, per-lang hits).
    */
  def languageId(docs: DataFrame): DataFrame = {
    val tokens = split(col("text"), " ")
    val scores = langProfiles.map { case (lang, words) =>
      lang -> countIn(tokens, words)
    }
    val best = scores.tail.foldLeft(
      struct(scores.head._2.as("score"), lit(scores.head._1).as("lang"))) {
      case (acc, (lang, score)) =>
        when(score > acc.getField("score"),
          struct(score.as("score"), lit(lang).as("lang"))).otherwise(acc)
    }
    docs.select(col("doc_id") +: col("lang").as("lang_declared") +:
      scores.map { case (l, c) => c.as(s"hits_$l") } :+
      best.getField("lang").as("lang_pred"): _*)
  }

  /** Token counting three ways: whitespace split, a BPE-ish regex token
    * count (letter runs / digit runs / single non-space symbols — the
    * classic pre-tokenizer shape), and a ~chars/4 heuristic.
    */
  def tokenCounts(docs: DataFrame): DataFrame = {
    val wsTokens = size(split(col("text"), " "))
    val bpeish = size(regexp_extract_all(col("text"), lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]"), lit(0)))
    docs.select(
      col("doc_id"),
      wsTokens.as("ws_tokens"),
      bpeish.as("bpeish_tokens"),
      ceil(length(col("text")) / 4.0).cast("long").as("chars_div4"))
  }

  /** Document fingerprints: rolling-hash (custom Catalyst expression) of the
    * raw text and of the normalized text (lowercased, collapsed whitespace)
    * — the near-canonical-form fingerprint used for fuzzy exact-dedup.
    */
  def fingerprints(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      rolling_hash(col("text")).as("fp_raw"),
      rolling_hash(regexp_replace(lower(col("text")), "\\s+", " "))
        .as("fp_normalized"))

  /** Max run length over a SORTED array — equals the max occurrence count
    * of any value, via one linear in-row scan (the O(n log n) sort replaces
    * the explode -> groupBy(doc, term) shuffle a naive count would pay).
    */
  private def maxRunLength(sorted: Column): Column =
    aggregate(sorted,
      struct(lit("").as("prev"), lit(0).as("run"), lit(0).as("mx")),
      (acc, x) => {
        val run = when(x === acc.getField("prev"),
          acc.getField("run") + 1).otherwise(lit(1))
        struct(x.as("prev"), run.as("run"),
          greatest(acc.getField("mx"), run).as("mx"))
      },
      acc => greatest(acc.getField("mx"), acc.getField("run")))

  /** Total occurrences belonging to values that repeat (count > 1) in a
    * SORTED array — same linear run scan, accumulating closed runs; the
    * finish lambda folds in the final run.
    */
  private def dupOccurrences(sorted: Column): Column =
    aggregate(sorted,
      struct(lit("").as("prev"), lit(0).as("run"), lit(0).as("dup")),
      (acc, x) => {
        val closes = x =!= acc.getField("prev")
        val closedDup = when(closes && acc.getField("run") > 1,
          acc.getField("dup") + acc.getField("run"))
          .otherwise(acc.getField("dup"))
        struct(x.as("prev"),
          when(closes, lit(1)).otherwise(acc.getField("run") + 1).as("run"),
          closedDup.as("dup"))
      },
      acc => when(acc.getField("run") > 1,
        acc.getField("dup") + acc.getField("run")).otherwise(acc.getField("dup")))

  /** Gopher-style within-document repetition signals: top-token fraction,
    * top-bigram fraction, and the fraction of bigram occurrences belonging
    * to repeated bigrams — the "repetitious document" filters (templated
    * spam, keyword stuffing, decode loops) that length/stopword rules miss.
    *
    * Scale: every metric is computed IN-ROW — tokens and bigrams are
    * sorted per document and scanned once for run lengths ([[maxRunLength]]
    * / [[dupOccurrences]]), so the operator is a narrow projection with NO
    * shuffle at any corpus size (the explode -> groupBy(doc, term) shape
    * would shuffle one row per token; this shuffles nothing). Fractions
    * are exact integer/integer IEEE divisions — oracle-reproducible.
    */
  def repetition(docs: DataFrame): DataFrame = {
    val toks = split(col("text"), " ")
    val bigrams = zip_with(
      slice(toks, lit(1), size(toks) - 1),
      slice(toks, lit(2), size(toks) - 1),
      (x, y) => concat_ws(" ", x, y))
    val nTok = size(toks)
    val nBg = size(bigrams)
    val maxTok = maxRunLength(sort_array(toks))
    val maxBg = maxRunLength(sort_array(bigrams))
    val dupBg = dupOccurrences(sort_array(bigrams))
    // sub-2-token docs have no bigrams: their fractions are 0/0. Rather
    // than pick a convention (null vs 0.0) that an exact-SQL oracle must
    // then reproduce, exclude them — the signal is meaningless there anyway
    docs.where(nTok >= 2).select(
      col("doc_id"),
      nTok.as("n_tokens"),
      maxTok.as("max_token_count"),
      (maxTok.cast("double") / nTok).as("top_token_frac"),
      (maxBg.cast("double") / nBg).as("top_bigram_frac"),
      (dupBg.cast("double") / nBg).as("dup_bigram_frac"))
  }

  /** Bigram language-model quality scoring — the perplexity-proxy filter
    * of CCNet/Gopher-class curation pipelines: documents whose bigrams the
    * corpus LM has rarely (or never) seen are flagged as low-quality /
    * novel. LOG-FREE by design: `ln` differs by ulps between engines and
    * float-sum order is partition-dependent, so instead of avg log-prob
    * the score is built from EXACT integers — per-doc rare-bigram fraction
    * (corpus count ≤ `rareMax`) and mean bigram corpus-frequency, each one
    * exact-long sum followed by a single IEEE division (the same
    * oracle-parity rule as the log-free TF-IDF and [[repetition]]).
    *
    * Scale: the LM "model" is the top-`vocabTop` bigram count table —
    * TakeOrderedAndProject-capped with a (count desc, bigram) TOTAL order,
    * so the cutoff is deterministic in both engines — and ships broadcast
    * (bounded by `vocabTop`, never corpus-sized); bigrams outside it score
    * as unseen, exactly the vocabulary-cutoff production LMs apply. The
    * doc-side lookup is then a broadcast LEFT join (no shuffle of the
    * token stream); the per-doc rollup is one hash aggregation whose
    * map-side partials absorb the Zipfian head.
    */
  def bigramLmScore(docs: DataFrame, vocabTop: Int = 50000,
                    rareMax: Long = 1): DataFrame = {
    val toks = split(col("text"), " ")
    val bigrams = zip_with(
      slice(toks, lit(1), size(toks) - 1),
      slice(toks, lit(2), size(toks) - 1),
      (x, y) => concat_ws(" ", x, y))
    val docBg = docs.where(size(toks) >= 2)
      .select(col("doc_id"), explode(bigrams).as("bigram"))
    val counts = docBg.groupBy("bigram").agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("bigram")).limit(vocabTop)
    docBg.join(broadcast(counts), Seq("bigram"), "left")
      .withColumn("cnt", coalesce(col("cnt"), lit(0L)))
      .groupBy("doc_id").agg(
        count(lit(1)).as("n_bigrams"),
        sum(when(col("cnt") <= rareMax, 1L).otherwise(0L)).as("n_rare"),
        sum(col("cnt")).as("sum_cnt"))
      .select(col("doc_id"), col("n_bigrams"), col("n_rare"),
        (col("n_rare").cast("double") / col("n_bigrams"))
          .as("rare_bigram_frac"),
        (col("sum_cnt").cast("double") / col("n_bigrams"))
          .as("mean_bigram_count"))
  }

  /** Corpus bigram counts, top `topN` — the n-gram language-model shape
    * (count tables are the classic data-quality signal AND the smoothing
    * base of statistical LM baselines). Counts ALL occurrences (unlike the
    * dedup family's per-doc DISTINCT shingles).
    *
    * Scale: adjacent-token pairing is `zip_with` over two in-row slices —
    * narrow, codegen'd, no self-join on position. The count aggregation is
    * one shuffle whose partial (map-side) phase absorbs the Zipfian head:
    * a hot bigram costs one counter per task, not one row per occurrence
    * across the wire. The global top-N runs as TakeOrderedAndProject
    * (per-partition bounded heaps, never a full sort).
    */
  def bigramCounts(docs: DataFrame, topN: Int = 50): DataFrame = {
    val toks = split(col("text"), " ")
    val bigrams = zip_with(
      slice(toks, lit(1), size(toks) - 1),
      slice(toks, lit(2), size(toks) - 1),
      (x, y) => concat_ws(" ", x, y))
    docs.select(explode(bigrams).as("bigram"))
      .groupBy(col("bigram")).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("bigram"))
      .limit(topN)
  }
}
