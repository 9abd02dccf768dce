package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` maps one entry per implemented operator (SURVEY.md §2 inventory);
  * `oracleSql` holds the DuckDB-equivalent ANSI SQL for every
  * SQL-expressible entry (hash-compared by the driver at sf0.01). Queries
  * without an oracle entry get a rows-only check (non-SQL-expressible ops:
  * sketches, LSH, custom hashes).
  */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0:
    * the full log data plane (decode -> parse -> classify -> enrich) feeding
    * the severity histogram per function.
    */
  def entry(spark: SparkSession): DataFrame =
    PipelineQueries.errorHist(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2.
    *
    * Deterministic (alphabetical) execution order, with two pinned
    * exceptions so shared-cache build cost lands on each family's exact
    * baseline rather than on an arbitrary hash-ordered sibling: the exact
    * n-gram Jaccard builds the shingle index the MinHash-LSH screen then
    * reuses, and brute-force top-k pays the first embeddings scan before
    * the ANN variants.
    */
  def queries: Map[String, (SparkSession, String) => DataFrame] = {
    val all = PipelineQueries.queries ++ RelationalQueries.queries ++
      GroupingQueries.queries ++ JoinQueries.queries ++
      FunctionQueries.queries ++ DedupQueries.queries ++
      SimilarityQueries.queries ++ TextQueries.queries ++
      CurationQueries.queries ++ AnalyticsQueries.queries ++
      GraphQueries.queries ++ ClusteringQueries.queries
    // "a00..." pins the exact n-gram Jaccard query to the very FRONT of the
    // bench: it pays the one-time JVM/codegen warmup AND builds the shared
    // shingle cache, exactly as in the recorded r01/r02 baselines, so
    // per-query numbers stay comparable across rounds.
    //
    // text_fingerprint is pinned AHEAD of the text_contaminate* pair: in r3
    // it ran alphabetically right after the then-10.9s contamination query
    // and absorbed its async unpersist/GC churn, drifting 0.47s -> 5.0s on
    // untouched code (VERDICT r3 "What's wrong" #2). Running it before the
    // curation screens restores a quiet neighborhood.
    // dedup_lsh_forget COPIES the shared append-grown index the
    // incremental query stages — pin it after dedup_lsh_incremental so
    // the one-time index build stays on the family's recorded baseline
    // instead of shifting to the (alphabetically earlier) forget query.
    // text_bm25_forget likewise COPIES the maintained BM25 index that
    // text_bm25_maintained stages — pin it after so the one-time
    // build+append cost lands on the family's baseline query.
    // curate_dataset_build CONSUMES the curated keep set (and its shared
    // df-cut shingle index) that curate_pipeline historically stages —
    // pin it after so the one-time build cost stays on the flagship's
    // recorded baseline instead of shifting to the (alphabetically
    // earlier) composition.
    val pinnedFirst = Map("dedup_ngram_jaccard" -> "a00_dedup",
      "sim_topk" -> "sim_a0", "text_fingerprint" -> "text_a0_fingerprint",
      "dedup_lsh_forget" -> "dedup_lsh_incremental_z_forget",
      "text_bm25_forget" -> "text_bm25_maintained_z_forget",
      "text_bm25_asof" -> "text_bm25_maintained_z_asof",
      "curate_dataset_build" -> "curate_pipeline_z_dataset_build")
    scala.collection.immutable.SeqMap.from(
      all.toSeq.sortBy { case (n, _) => pinnedFirst.getOrElse(n, n) })
  }

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    PipelineQueries.oracles ++ RelationalQueries.oracles ++
      GroupingQueries.oracles ++ JoinQueries.oracles ++
      FunctionQueries.oracles ++ DedupQueries.oracles ++
      SimilarityQueries.oracles ++ TextQueries.oracles ++
      CurationQueries.oracles ++ AnalyticsQueries.oracles ++
      GraphQueries.oracles ++ ClusteringQueries.oracles
}
