package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.Dedup
import graft.sources.IndexCommit

/** Incremental LSH-index maintenance ([[Dedup.appendLshIndex]]): growing an
  * index by a document batch must produce EXACTLY the index a full rebuild
  * over the union produces — table for table — including when the append
  * pushes a shingle across the df cut (the case where old docs must be
  * rewritten). The id-range partitioning additionally makes rewrite IO
  * proportional to TOUCHED ranges: an append must leave unaffected ranges'
  * files byte-identical on disk, and the df/bcounts LSMs must only ADD
  * segments. Plus (r12) crash atomicity: an append killed at any failpoint
  * leaves the committed index version intact for readers, and a re-run
  * converges to append-equals-rebuild.
  */
class IndexMaintenanceSpec extends SparkSpec {

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("graft-lshidx").toString

  /** Merged views of the LSM statistic tables (df / bcounts — the stored
    * tables are delta segments since r11/r12).
    */
  private def mergedDf(dir: String): DataFrame =
    spark.read.option("recursiveFileLookup", "true").parquet(s"$dir/df")
      .groupBy("shingle").agg(sum(col("df")).as("df"))

  private def mergedBcounts(dir: String): DataFrame =
    spark.read.option("recursiveFileLookup", "true").parquet(s"$dir/bcounts")
      .groupBy("band", "bh").agg(sum(col("n")).as("n"))

  /** The bucket-size-cut complement, derived from the bcounts LSM —
    * independent of the operator's own servedOversize/cache.
    */
  private def oversize(dir: String): DataFrame =
    mergedBcounts(dir).filter(col("n") > 1000).select("band", "bh")

  /** The consumer-facing search space: uncut rows minus oversize buckets
    * (recomputed here from public reads, independent of the operator's
    * own servedBuckets).
    */
  private def served(dir: String): DataFrame = {
    val raw = spark.read.parquet(s"$dir/buckets_raw")
      .select("id", "band", "bh")
    raw.join(oversize(dir), Seq("band", "bh"), "left_anti")
  }

  /** Sorted canonical rows of one index table (arrays' sa joined flat;
    * partition column dropped — layout is compared separately).
    */
  private def canon(dir: String, table: String): Seq[String] = {
    val flat = table match {
      case "arrays" => spark.read.parquet(s"$dir/$table")
        .select(col("id"), array_join(col("sa"), ""), col("n"))
      case "buckets_raw" => spark.read.parquet(s"$dir/$table")
        .select("id", "band", "bh")
      case "prefixes" => spark.read.parquet(s"$dir/$table")
        .select("id", "n", "rn", "shingle")
      case "served" => served(dir)
      case "df" => mergedDf(dir)
      case "bcounts" => mergedBcounts(dir).filter(col("n") =!= 0L)
      case "oversize" => oversize(dir)
      case _ => spark.read.parquet(s"$dir/$table")
    }
    flat.collect().map(_.mkString("|")).sorted.toSeq
  }

  private def assertSameIndex(incr: String, full: String): Unit =
    for (t <- Seq("df", "stop", "bcounts", "oversize", "arrays",
        "buckets_raw", "prefixes", "served")) {
      val (a, b) = (canon(incr, t), canon(full, t))
      assert(a == b, s"table $t diverges: incremental ${a.size} rows vs " +
        s"rebuild ${b.size} rows\n${a.diff(b).take(3)}\n${b.diff(a).take(3)}")
    }

  test("append-equals-rebuild on the corpus (even half + odd half)") {
    val docs = Tables.t(spark, sf001, "documents")
      .select(col("doc_id"), col("text"))
    val incr = tmp(); val full = tmp()
    Dedup.writeLshIndex(docs.filter(col("doc_id") % 2 === 0), incr)
    Dedup.appendLshIndex(docs.filter(col("doc_id") % 2 === 1), incr)
    Dedup.writeLshIndex(docs, full)
    assertSameIndex(incr, full)
    // the production consumer's view: pairs served from the grown index
    // equal the batch LSH pairs over the union corpus
    val servedPairs = Dedup.pairsFromIndex(spark, incr)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val batch = Dedup.minhashLshPairs(docs)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(servedPairs == batch && servedPairs.nonEmpty)
    // and the exact prefix-filter route over the same stored index
    // reproduces the exact-Jaccard pair set (deterministic completeness —
    // no LSH recall caveat anywhere in the route tier)
    val routed = Dedup.jaccardRoute(docs, incr)
      .select(col("da"), col("db")).distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = Dedup.ngramJaccardPairs(docs)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(routed == exact && routed.nonEmpty,
      s"route-only: ${(routed -- exact).take(3)}; " +
        s"exact-only: ${(exact -- routed).take(3)}")
  }

  test("chained appends carry state correctly (A, +B, +C == rebuild)") {
    // two successive appends: the second reads df/arrays state the FIRST
    // append wrote — catches any carry bug a single append can't see
    val docs = Tables.t(spark, sf001, "documents")
      .select(col("doc_id"), col("text"))
    val incr = tmp(); val full = tmp()
    Dedup.writeLshIndex(docs.filter(col("doc_id") % 3 === 0), incr)
    Dedup.appendLshIndex(docs.filter(col("doc_id") % 3 === 1), incr)
    Dedup.appendLshIndex(docs.filter(col("doc_id") % 3 === 2), incr)
    Dedup.writeLshIndex(docs, full)
    assertSameIndex(incr, full)
    // the same chain under an aggressive segment budget: every append
    // compacts both LSMs back to one base — equality must survive
    val compacted = tmp()
    Dedup.writeLshIndex(docs.filter(col("doc_id") % 3 === 0), compacted)
    Dedup.appendLshIndex(docs.filter(col("doc_id") % 3 === 1), compacted,
      compactSegmentsAt = 1)
    Dedup.appendLshIndex(docs.filter(col("doc_id") % 3 === 2), compacted,
      compactSegmentsAt = 1)
    assertSameIndex(compacted, full)
    import scala.jdk.CollectionConverters._
    for (table <- Seq("df", "bcounts")) {
      val segs = java.nio.file.Files.list(
          java.nio.file.Paths.get(s"$compacted/$table")).iterator().asScala
        .count(_.getFileName.toString.startsWith("seg-"))
      assert(segs == 1,
        s"compaction must fold the $table LSM to one base, got $segs")
    }
  }

  test("an empty append batch is an identity") {
    val docs = Tables.t(spark, sf001, "documents")
      .select(col("doc_id"), col("text"))
    val incr = tmp(); val full = tmp()
    Dedup.writeLshIndex(docs, incr)
    Dedup.appendLshIndex(docs.filter(lit(false)), incr)
    Dedup.writeLshIndex(docs, full)
    assertSameIndex(incr, full)
  }

  test("an append leaves unaffected id ranges' files byte-identical") {
    val docs = Tables.t(spark, sf001, "documents")
      .select(col("doc_id"), col("text"))
    val incr = tmp(); val full = tmp()
    // small ranges so the 500-doc corpus spans multiple partitions; the
    // appended batch lives in fresh top ranges and forces no df crossing,
    // so every original range must stay physically untouched
    Dedup.writeLshIndex(docs, incr, idRangeSize = 128L)
    def fileStamps(table: String): Map[String, (Long, Long)] = {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(java.nio.file.Paths.get(s"$incr/$table"))
        .iterator().asScala
        .filter(p => java.nio.file.Files.isRegularFile(p) &&
          p.toString.contains("pid="))
        .map(p => p.toString ->
          ((java.nio.file.Files.size(p),
            java.nio.file.Files.getLastModifiedTime(p).toMillis)))
        .toMap
    }
    def flatStamps(table: String): Map[String, (Long, Long)] = {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(java.nio.file.Paths.get(s"$incr/$table"))
        .iterator().asScala
        .filter(p => java.nio.file.Files.isRegularFile(p) &&
          p.toString.endsWith(".parquet"))
        .map(p => p.toString ->
          ((java.nio.file.Files.size(p),
            java.nio.file.Files.getLastModifiedTime(p).toMillis)))
        .toMap
    }
    val arraysBefore = fileStamps("arrays")
    val rawBefore = fileStamps("buckets_raw")
    val prefixesBefore = fileStamps("prefixes")
    val dfBefore = flatStamps("df")
    val bcountsBefore = flatStamps("bcounts")
    val stopBefore = flatStamps("stop")
    assert(arraysBefore.keys.map(_.split("pid=")(1).takeWhile(_ != '/'))
      .toSet.size > 1, "fixture must span multiple id ranges")
    val fresh = docs.filter(col("doc_id") % 5 === 0)
      .select((col("doc_id") + 100000L).as("doc_id"),
        concat(col("text"), lit(" zq unique tail")).as("text"))
    Dedup.appendLshIndex(fresh, incr)
    // every pre-append file survives with identical size + mtime
    for ((table, before) <- Seq("arrays" -> arraysBefore,
        "buckets_raw" -> rawBefore, "prefixes" -> prefixesBefore)) {
      val after = fileStamps(table)
      before.foreach { case (path, stamp) =>
        assert(after.get(path).contains(stamp),
          s"unaffected $table file rewritten: $path")
      }
    }
    // df and bcounts are LSMs: the append ADDS one segment each and
    // rewrites none — append IO is O(batch) regardless of index size
    for ((table, before) <- Seq("df" -> dfBefore,
        "bcounts" -> bcountsBefore)) {
      val after = flatStamps(table)
      before.foreach { case (path, stamp) =>
        assert(after.get(path).contains(stamp),
          s"existing $table segment rewritten: $path")
      }
      assert(after.size > before.size, s"append must add a $table segment")
    }
    // no crossing -> the stop list is untouched, file for file
    assert(flatStamps("stop") == stopBefore)
    // and the grown index still equals a rebuild at the same range size
    Dedup.writeLshIndex(docs.unionByName(fresh), full, idRangeSize = 128L)
    assertSameIndex(incr, full)
  }

  test("a df-crossing append rewrites exactly the affected old docs") {
    val spark2 = spark
    import spark2.implicits._
    // 600 + 600 docs all sharing the shingle "p q r" (df crosses the 1000
    // cut mid-append), each with a unique tail so every doc also keeps
    // private shingles; two of the A docs are near-dups of each other
    // through a long shared tail that must SURVIVE the crossing rewrite
    def mk(lo: Int, hi: Int) = (lo until hi).map(i =>
      (i.toLong, s"p q r u$i v$i w$i x$i y$i z$i"))
    val shared = "p q r s0 s1 s2 s3 s4 s5 s6 s7 s8 s9 s10 s11 s12 s13"
    val a = (mk(0, 598) :+ (598L, shared) :+ (599L, shared + " t599"))
      .toDF("doc_id", "text")
    val b = mk(1000, 1600).toDF("doc_id", "text")
    val incr = tmp(); val full = tmp()
    Dedup.writeLshIndex(a, incr)
    // before the append, "p q r" is under the cut and indexed
    assert(mergedDf(incr)
      .filter(col("shingle") === "p q r").head().getLong(1) == 600L)
    assert(spark.read.parquet(s"$incr/arrays")
      .filter(array_contains(col("sa"), "p q r")).count() == 600L)
    Dedup.appendLshIndex(b, incr)
    Dedup.writeLshIndex(a.unionByName(b), full)
    assertSameIndex(incr, full)
    // the crossed shingle is now stop, carried at its merged df, and
    // scrubbed from every stored array
    assert(mergedDf(incr)
      .filter(col("shingle") === "p q r").head().getLong(1) == 1200L)
    assert(spark.read.parquet(s"$incr/stop")
      .filter(col("shingle") === "p q r").count() == 1L)
    assert(spark.read.parquet(s"$incr/arrays")
      .filter(array_contains(col("sa"), "p q r")).count() == 0L)
    // and the near-dup pair that rode the surviving tail is still served
    val servedPairs = Dedup.pairsFromIndex(spark, incr)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(servedPairs.contains((598L, 599L)),
      s"crossing rewrite must preserve unaffected shingles: $servedPairs")
  }

  test("a killed append leaves the committed version intact; a re-run converges") {
    val docs = Tables.t(spark, sf001, "documents")
      .select(col("doc_id"), col("text")).limit(120)
    val even = docs.filter(col("doc_id") % 2 === 0)
    val odd = docs.filter(col("doc_id") % 2 === 1)
    val full = tmp()
    Dedup.writeLshIndex(docs.filter(col("doc_id") < 120), full)
    // abort at each failpoint: stage-complete, between table moves, and
    // right before the commit (everything moved in, nothing published)
    for (point <- Seq("staged", "moved:arrays", "moved:bcounts",
        "moved:df", "before-commit")) {
      val incr = tmp()
      Dedup.writeLshIndex(even.filter(col("doc_id") < 120), incr)
      val pinnedBefore = IndexCommit.pinnedFiles(incr).get.toSet
      val pairsBefore = Dedup.pairsFromIndex(spark, incr)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      IndexCommit.failpoint =
        p => if (p == point) throw new RuntimeException(s"boom:$p")
      val thrown = try {
        Dedup.appendLshIndex(odd.filter(col("doc_id") < 120), incr); false
      } catch {
        case e: RuntimeException if e.getMessage == s"boom:$point" => true
      } finally IndexCommit.failpoint = _ => ()
      assert(thrown, s"failpoint $point must have fired")
      // (a) the committed version is untouched: the manifest resolves the
      // exact pre-append file list, and the consumer serves it bit-exactly
      assert(IndexCommit.pinnedFiles(incr).get.toSet == pinnedBefore,
        s"$point: crash must not move the committed manifest")
      val pairsAfterCrash = Dedup.pairsFromIndex(spark, incr)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(pairsAfterCrash == pairsBefore,
        s"$point: readers must serve the pre-append index after a crash")
      // (b) a re-run append (which vacuums the crash orphans first)
      // converges to append-equals-rebuild, table for table
      Dedup.appendLshIndex(odd.filter(col("doc_id") < 120), incr)
      assertSameIndex(incr, full)
    }
  }

  test("compactLshIndex squashes append fragments: contents, crash-safety, idempotence") {
    val docs = Tables.t(spark, sf001, "documents")
      .select(col("doc_id"), col("text")).filter(col("doc_id") < 210)
    val incr = tmp(); val full = tmp()
    // default idRangeSize => every doc lands in pid=0, so each append
    // fragments the SAME range — the long-running-loop shape
    Dedup.writeLshIndex(docs.filter(col("doc_id") < 50), incr)
    for (lo <- Seq(50, 90, 130, 170))
      Dedup.appendLshIndex(
        docs.filter(col("doc_id") >= lo && col("doc_id") < lo + 40), incr)
    Dedup.writeLshIndex(docs, full)
    import scala.jdk.CollectionConverters._
    def dataFiles(sub: String): Int = {
      val p = java.nio.file.Paths.get(s"$incr/$sub")
      if (!java.nio.file.Files.exists(p)) 0
      else {
        val s = java.nio.file.Files.walk(p)
        try s.iterator().asScala.count(_.toString.endsWith(".parquet"))
        finally s.close()
      }
    }
    // partitioned tables restage touched ranges wholesale per append
    // through StoredIndex.writeByPart, so a range holds exactly ONE data
    // file no matter how many appends touched it or how many tasks wrote
    // it (r13: the small-files fix — before it, per-range file count
    // tracked write parallelism and the listing pass grew per append);
    // the LSMs DO grow one segment per append, so compaction still has
    // folds to sweep
    assert(dataFiles("arrays/pid=0") == 1,
      "writeByPart must keep a restaged range at one data file")
    assert(dataFiles("df") > 4, "df LSM must hold several segments")
    // a compaction killed right before its commit leaves the fragmented
    // version serving, bit for bit
    val pinnedBefore = IndexCommit.pinnedFiles(incr).get.toSet
    val pairsBefore = Dedup.pairsFromIndex(spark, incr)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    IndexCommit.failpoint =
      p => if (p == "before-commit") throw new RuntimeException("boom")
    val thrown = try {
      Dedup.compactLshIndex(spark, incr, maxFilesPerRange = 1); false }
      catch { case e: RuntimeException if e.getMessage == "boom" => true }
      finally IndexCommit.failpoint = _ => ()
    assert(thrown)
    assert(IndexCommit.pinnedFiles(incr).get.toSet == pinnedBefore)
    assert(Dedup.pairsFromIndex(spark, incr)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet == pairsBefore)
    // the real sweep: ranges rewritten, LSMs folded, contents unchanged
    val swept = Dedup.compactLshIndex(spark, incr, maxFilesPerRange = 1)
    assert(swept.nonEmpty, "fragmented index must compact")
    assert(dataFiles("arrays/pid=0") == 1 && dataFiles("buckets_raw/pid=0") == 1
      && dataFiles("prefixes/pid=0") == 1,
      "each fat range folds to one file")
    assert(dataFiles("df") == 1 && dataFiles("bcounts") == 1,
      "LSMs fold to one base segment")
    assertSameIndex(incr, full)
    // idempotent: nothing left over the threshold
    assert(Dedup.compactLshIndex(spark, incr, maxFilesPerRange = 1).isEmpty)
    // manifest-history retention: vacuum expires old versions (one tiny
    // file per append otherwise accumulates forever) and the survivor
    // still serves the index
    IndexCommit.vacuum(incr, keepManifests = 1)
    val manifests = java.nio.file.Files.list(
        java.nio.file.Paths.get(s"$incr/_manifests")).iterator().asScala
      .count(_.getFileName.toString.startsWith("manifest-"))
    assert(manifests == 1, s"retention must keep exactly 1, got $manifests")
    assert(Dedup.pairsFromIndex(spark, incr)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet == pairsBefore)
  }

  test("appendIvfIndex crash-atomicity: killed append invisible, re-run converges") {
    val emb = Tables.t(spark, sf001, "embeddings")
      .select(col("vec_id"), col("embedding"))
    val half1 = emb.filter(col("vec_id") % 2 === 0)
    val half2 = emb.filter(col("vec_id") % 2 === 1)
    val dir = tmp()
    graft.operators.Similarity.ivfWriteIndex(half1, dir)
    val pinnedBefore = IndexCommit.pinnedFiles(dir).get.toSet
    IndexCommit.failpoint =
      p => if (p == "ivf-before-commit") throw new RuntimeException("boom")
    val thrown = try {
      graft.operators.Similarity.appendIvfIndex(half2, dir); false
    } catch { case e: RuntimeException if e.getMessage == "boom" => true
    } finally IndexCommit.failpoint = _ => ()
    assert(thrown)
    assert(IndexCommit.pinnedFiles(dir).get.toSet == pinnedBefore)
    // re-run converges; grown postings = every vector exactly once
    graft.operators.Similarity.appendIvfIndex(half2, dir)
    val grown = spark.read.parquet(s"$dir/postings")
      .select(col("nid")).collect().map(_.getLong(0)).toSet
    assert(grown.size == emb.count(),
      "re-run append must post each vector exactly once (no crash dup)")
  }

  test("maintain(): each family's policy runs the indicated action; " +
      "re-runs are noops; a killed policy rebuild leaves the old " +
      "version serving and the re-run converges") {
    import graft.operators.{Curation, Similarity, TextIndex}
    val docs = Tables.t(spark, sf001, "documents")
      .select(col("doc_id"), col("text"))
    val terms = Seq("spark", "merge", "vector")

    // bm25: nine appends push the termdf/stats LSMs past segBudget (8),
    // so the indicated action is the fold+sweep compact
    val bDir = tmp()
    TextIndex.writeBm25Index(docs.filter(col("doc_id") % 10 === 0), bDir)
    for (m <- 1 to 9)
      TextIndex.appendBm25Index(docs.filter(col("doc_id") % 10 === m), bDir)
    val serveB = TextIndex.bm25TopK(spark, bDir, terms).collect().toSeq
    val mb = TextIndex.maintainBm25Index(spark, bDir)
    assert(mb.action == "compact" && mb.units > 0, s"bm25: $mb")
    assert(TextIndex.bm25TopK(spark, bDir, terms).collect().toSeq == serveB,
      "maintenance must not change the served ranking")
    assert(TextIndex.maintainBm25Index(spark, bDir).action == "noop")

    // lsh: chained appends fragment the df/bcounts LSMs
    val lDir = tmp()
    Dedup.writeLshIndex(docs.filter(col("doc_id") < 100), lDir)
    for (lo <- Seq(100, 180, 260, 340, 420))
      Dedup.appendLshIndex(
        docs.filter(col("doc_id") >= lo && col("doc_id") < lo + 80), lDir)
    val pairsL = Dedup.pairsFromIndex(spark, lDir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val ml = Dedup.maintainLshIndex(spark, lDir)
    assert(ml.action == "compact", s"lsh: $ml")
    assert(Dedup.pairsFromIndex(spark, lDir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet == pairsL)
    assert(Dedup.maintainLshIndex(spark, lDir).action == "noop")

    // curate: five appends fragment the file-append hashes table
    val cDir = tmp()
    Curation.writeCurateIndex(docs.filter(col("doc_id") % 2 === 0), cDir)
    for (m <- 0 to 4)
      Curation.appendCurateIndex(
        docs.filter(col("doc_id") % 10 === 2 * m + 1), cDir)
    val mc = Curation.maintainCurateIndex(spark, cDir)
    assert(mc.action == "compact", s"curate: $mc")
    assert(Curation.maintainCurateIndex(spark, cDir).action == "noop")

    // ivf: a distribution-shifted append puts the drift stats past the
    // documented thresholds, so the indicated action is a RETRAIN — and a
    // policy rebuild killed at its staging failpoint must be invisible
    val emb = Tables.t(spark, sf001, "embeddings")
      .select(col("vec_id"), col("embedding"))
    val iDir = tmp()
    Similarity.ivfWriteIndex(emb, iDir)
    val spark2 = spark
    import spark2.implicits._
    val dim = emb.select(size(col("embedding"))).head().getInt(0)
    val shifted = (0 until 400).map { i =>
      (900000L + i, (0 until dim).map(d =>
        (if (d == 0) 10f else 0.01f * ((i + d) % 7)): Float))
    }.toDF("vec_id", "embedding")
    Similarity.appendIvfIndex(shifted, iDir)
    def served(): Seq[org.apache.spark.sql.Row] =
      Similarity.annRoute(
        emb.filter(col("vec_id") % 100 === 0)
          .select(col("vec_id"), col("embedding")), iDir, k = 5)
        .collect().toSeq
    val beforeKill = served()
    IndexCommit.failpoint =
      p => if (p == "ivf-rebuild-staged") throw new RuntimeException("boom")
    val thrown = try {
      Similarity.maintainIvfIndex(spark, iDir); false
    } catch { case e: RuntimeException if e.getMessage == "boom" => true
    } finally IndexCommit.failpoint = _ => ()
    assert(thrown, "the policy must have chosen the rebuild path")
    assert(served() == beforeKill, "killed policy rebuild must be invisible")
    val mi = Similarity.maintainIvfIndex(spark, iDir)
    assert(mi.action == "rebuild", s"ivf: $mi")
    // the rebuild reset the drift baseline: the re-run finds nothing
    assert(Similarity.maintainIvfIndex(spark, iDir).action == "noop")
  }
}
