package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.{Curation, Dedup, Similarity}
import graft.sources.IndexCommit

/** AS-OF serving across the stored-index families (VERDICT r12 item #3):
  * the manifest history is the time-travel surface, and serving any
  * committed version reproduces EXACTLY what readers saw at that commit —
  * the takedown-audit question ("what did the gate serve on date X?").
  *
  * Resolvability contract (documented at
  * [[graft.sources.IndexCommit.pinnedFilesAt]]): a version resolves while
  * its pinned files survive. Appends and DELETES retire nothing in any
  * family — deletes are pure tombstone/delta appends — so the audit-
  * critical chain (state before vs after each erasure) stays fully
  * resolvable; the first COMPACTION (and, for LSH, an append that
  * restages a touched id range) rewrites pinned files and older versions
  * then fail FAST with a clear error instead of serving wrong data.
  * The BM25 family's as-of is covered by TextIndexSpec + the
  * `text_bm25_asof` oracle; this suite covers the other four
  * (LSH, IVF, curate, and the r15 budget gate).
  */
class TimeTravelSpec extends SparkSpec {

  private def tmp(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft-$tag").toString

  private def docs: DataFrame = Tables.t(spark, sf001, "documents")
    .select(col("doc_id"), col("text"))

  private def emb: DataFrame = Tables.t(spark, sf001, "embeddings")
    .select(col("vec_id"), col("embedding"))

  private def pairSet(df: DataFrame): Set[(Long, Long)] =
    df.select("da", "db").distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  test("LSH: pairsFromIndex/jaccardRoute as-of replay every delete-chain version") {
    val dir = tmp("lsh-asof")
    Dedup.writeLshIndex(docs, dir) // version 0
    val probes = docs.limit(40)
    val v0Pairs = pairSet(Dedup.pairsFromIndex(spark, dir))
    val v0Route = pairSet(Dedup.jaccardRoute(probes, dir))
    Dedup.deleteFromLshIndex(docs.filter(col("doc_id") % 7 === 3), dir) // v1
    val v1Pairs = pairSet(Dedup.pairsFromIndex(spark, dir))
    Dedup.deleteFromLshIndex(docs.filter(col("doc_id") % 11 === 5), dir) // v2
    val v2Pairs = pairSet(Dedup.pairsFromIndex(spark, dir))
    assert(v0Pairs != v1Pairs && v1Pairs != v2Pairs,
      "deletes must change the served pair set for the audit to be real")

    assert(IndexCommit.versionsOf(dir) == Seq(0, 1, 2))
    assert(pairSet(Dedup.pairsFromIndex(spark, dir, asOf = Some(0)))
      == v0Pairs)
    assert(pairSet(Dedup.pairsFromIndex(spark, dir, asOf = Some(1)))
      == v1Pairs)
    assert(pairSet(Dedup.pairsFromIndex(spark, dir, asOf = Some(2)))
      == v2Pairs)
    assert(pairSet(Dedup.jaccardRoute(probes, dir, asOf = Some(0)))
      == v0Route)
    // the live route sees the post-delete state, as-of v0 ignores it
    assert(pairSet(Dedup.jaccardRoute(probes, dir)) != v0Route)

    // unknown version fails fast
    val e = intercept[RuntimeException] {
      Dedup.pairsFromIndex(spark, dir, asOf = Some(99)).collect()
    }
    assert(e.getMessage.contains("not in the manifest history"))

    // compaction folds the tombstones: pre-compaction versions pinned
    // files that no longer exist -> fail fast, never serve wrong data
    Dedup.compactLshIndex(spark, dir, maxFilesPerRange = 1)
    val e2 = intercept[IllegalArgumentException] {
      Dedup.pairsFromIndex(spark, dir, asOf = Some(0)).collect()
    }
    assert(e2.getMessage.contains("no longer fully resolvable"))
    // ... while the latest view is unchanged by compaction
    assert(pairSet(Dedup.pairsFromIndex(spark, dir)) == v2Pairs)
  }

  test("IVF: annRoute as-of replays build -> append -> delete versions") {
    val dir = tmp("ivf-asof")
    Similarity.ivfWriteIndex(emb.filter(col("vec_id") < 400), dir) // v0
    val probes = emb.filter(col("vec_id") >= 450)
    def served(asOf: Option[Int] = None): Set[(Long, Int, Long)] =
      Similarity.annRoute(probes, dir, k = 5, asOf = asOf)
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    val v0 = served()
    Similarity.appendIvfIndex(
      emb.filter(col("vec_id") >= 400 && col("vec_id") < 450), dir) // v1
    val v1 = served()
    Similarity.deleteFromIvfIndex(
      emb.filter(col("vec_id") % 5 === 0).select("vec_id"), dir) // v2
    val v2 = served()
    assert(v0 != v1 && v1 != v2)

    // IVF appends AND deletes are pure adds, so the whole chain resolves
    assert(IndexCommit.versionsOf(dir) == Seq(0, 1, 2))
    assert(served(Some(0)) == v0)
    assert(served(Some(1)) == v1)
    assert(served(Some(2)) == v2)
    assert(served() == v2)
  }

  test("curate: curateRoute as-of replays the pre-erasure admission decisions") {
    val dir = tmp("curate-asof")
    Curation.writeCurateIndex(docs.filter(col("doc_id") % 2 === 0), dir) // v0
    val arrivals = docs.filter(col("doc_id") % 2 === 1).limit(120)
    def decisions(asOf: Option[Int] = None): Set[(Long, Boolean, String)] =
      Curation.curateRoute(arrivals, dir, asOf = asOf)
        .collect().map(r => (r.getLong(0), r.getBoolean(1),
          Option(r.getString(2)).getOrElse(""))).toSet
    val v0 = decisions()
    // erase a slice of the stored corpus: some arrivals that were exact /
    // near dups of erased keepers flip to accepted
    Curation.deleteFromCurateIndex(
      docs.filter(col("doc_id") % 2 === 0 && col("doc_id") % 3 === 0)
        .select("doc_id"), dir) // v1
    val v1 = decisions()
    assert(v0 != v1,
      "the erasure must change some admission decision for the audit to be real")

    assert(IndexCommit.versionsOf(dir) == Seq(0, 1))
    assert(decisions(Some(0)) == v0)
    assert(decisions(Some(1)) == v1)
    assert(decisions() == v1)
  }

  test("budget: budgetRoute as-of replays init -> fill -> fill -> " +
      "refund versions (the quota-audit question)") {
    val spark2 = spark
    import spark2.implicits._
    val dir = tmp("budget-asof")
    Curation.writeBudgetGate(spark, dir, Map("s" -> 10L)) // v0
    def doc(id: Long) =
      Seq((id, "s", "tok tok tok tok tok tok")).toDF("doc_id", "source",
        "text") // 6 tokens
    Curation.recordBudgetFills(
      Curation.budgetRoute(doc(1L), dir), dir) // v1: filled 6
    Curation.recordBudgetFills(
      Curation.budgetRoute(doc(2L), dir), dir) // v2: filled 12 (crossing)
    assert(Curation.refundBudgetFills(doc(1L), dir) == 6L) // v3: filled 6
    val probe = Seq((9L, "s", "tok")).toDF("doc_id", "source", "text")
    def admits(asOf: Option[Int]): Boolean =
      Curation.budgetRoute(probe, dir, asOf = asOf)
        .collect().head.getBoolean(3)
    assert(IndexCommit.versionsOf(dir) == Seq(0, 1, 2, 3))
    assert(admits(Some(0)), "v0: empty fills, the probe admits")
    assert(admits(Some(1)), "v1: filled 6 of 10, still admits")
    assert(!admits(Some(2)), "v2: filled past budget, rejects")
    assert(admits(Some(3)) && admits(None),
      "the refund must restore exactly the erased doc's headroom")
    // an empty refund is a no-op: no segment, no version
    assert(Curation.refundBudgetFills(
      probe.filter(col("doc_id") < 0), dir) == 0L)
    assert(IndexCommit.versionsOf(dir) == Seq(0, 1, 2, 3))
  }

  test("exportSnapshot: a version exports as an identically-serving " +
      "index with independent lineage") {
    import graft.operators.TextIndex
    import graft.sources.{AggView, StoredIndex}
    val dir = tmp("exp-src")
    val half = docs.filter(col("doc_id") % 2 === 0)
    TextIndex.writeBm25Index(half, dir)
    TextIndex.appendBm25Index(docs.filter(col("doc_id") % 2 === 1), dir)
    val terms = Seq("spark", "merge", "vector")
    def top(d: String, asOf: Option[Int]) =
      TextIndex.bm25TopK(spark, d, terms, asOf = asOf).collect()
        .map(r => (r.getLong(0), r.get(1).toString)).toSeq
    // export the PRE-APPEND version: serves exactly asOf=0 of the source
    val exp0 = tmp("exp-v0")
    assert(StoredIndex.exportSnapshot(dir, exp0, asOf = Some(0)) > 0)
    assert(top(exp0, None) == top(dir, Some(0)),
      "the v0 export must serve the source's v0 ranking")
    assert(IndexCommit.versionsOf(exp0) == Seq(0),
      "an export starts its own lineage at version 0")
    // latest export + INDEPENDENT lineage: appending to the export moves
    // only the export
    val agg = tmp("exp-agg-src")
    val full = spark.read.parquet(s"$sf001/documents.parquet")
    val halfFull = full.filter(col("doc_id") % 2 === 0)
    AggView.write(halfFull.select(col("lang"), col("n_chars")), agg,
      Seq("lang"), Seq("n_chars"))
    val aggExp = tmp("exp-agg")
    StoredIndex.exportSnapshot(agg, aggExp)
    def viewOf(d: String) = AggView.read(spark, d).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSet
    assert(viewOf(aggExp) == viewOf(agg))
    AggView.append(full.filter(col("doc_id") % 2 === 1)
      .select(col("lang"), col("n_chars")), aggExp)
    assert(viewOf(aggExp) != viewOf(agg),
      "appending to the export must not touch the source")
    assert(IndexCommit.versionsOf(agg) == Seq(0),
      "the source lineage must be untouched by the export's append")
    // a compacted-away version fails fast (unresolvable files or a
    // retention-dropped manifest), not with a mystifying scan error
    intercept[Exception] {
      for (_ <- 1 to 10)
        AggView.append(halfFull.select(col("lang"), col("n_chars")),
          aggExp)
      AggView.compact(spark, aggExp, maxSegments = 2)
      StoredIndex.exportSnapshot(aggExp, tmp("exp-dead"), asOf = Some(1))
    }
  }

  test("exportSnapshot refuses a non-empty target unless overwrite — " +
      "the copy is delete-then-write") {
    import graft.sources.{AggView, StoredIndex}
    val full = spark.read.parquet(s"$sf001/documents.parquet")
    val src = tmp("exp-guard-src")
    AggView.write(full.select(col("lang"), col("n_chars")), src,
      Seq("lang"), Seq("n_chars"))
    // a LIVE index at the target must not be silently destroyed
    val victim = tmp("exp-guard-victim")
    AggView.write(full.select(col("source"), col("n_chars")), victim,
      Seq("source"), Seq("n_chars"))
    val e = intercept[IllegalArgumentException] {
      StoredIndex.exportSnapshot(src, victim)
    }
    assert(e.getMessage.contains("not empty"),
      s"refusal must name the non-empty target (got: ${e.getMessage})")
    assert(AggView.read(spark, victim).count() > 0,
      "the refused export must leave the target untouched")
    // explicit overwrite replaces it; an empty dir needs no flag
    assert(StoredIndex.exportSnapshot(src, victim, overwrite = true) > 0)
    assert(AggView.read(spark, victim).columns.contains("lang"),
      "the overwrite must serve the source's view definition")
    assert(StoredIndex.exportSnapshot(src, tmp("exp-guard-empty")) > 0)
  }
}
