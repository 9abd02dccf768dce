package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.Dedup
import graft.sources.IndexCommit

/** Tombstone deletes on the stored LSH index ([[Dedup.deleteFromLshIndex]])
  * — the FORGET half of the maintenance tier. Contract under test:
  *
  *  - a delete hides the docs from EVERY served consumer (stored-pair
  *    search, the exact prefix-filter route, the minhash route) at the
  *    next committed version, while remaining docs' results are exactly
  *    the pre-delete results restricted to live ids;
  *  - the bucket-occupancy statistic (`bcounts`) stays EXACT for the live
  *    set (the negative delta segment), and a re-delete of the same ids
  *    never re-subtracts;
  *  - the delete is crash-atomic (one IndexTxn, one manifest rename):
  *    killed at any failpoint, readers serve the pre-delete version and a
  *    re-run converges to the clean-delete state;
  *  - [[Dedup.compactLshIndex]] folds tombstones: dead rows physically
  *    leave every partitioned table, the tombstone table itself retires,
  *    and the served view is unchanged;
  *  - appends after a delete keep serving correctly (df stays a monotone
  *    historical upper bound by documented design, so kept sets equal the
  *    full-corpus build's and pair results are the full-corpus results
  *    restricted to live ids).
  */
class IndexDeleteSpec extends SparkSpec {

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("graft-lshdel").toString

  private def docs: DataFrame = Tables.t(spark, sf001, "documents")
    .select(col("doc_id"), col("text"))

  private val deadPred = col("doc_id") % 7 === 3

  private def pairsOf(df: DataFrame): Set[(Long, Long)] =
    df.select(col("da"), col("db")).distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  private def mergedBcounts(dir: String): Seq[String] =
    spark.read.option("recursiveFileLookup", "true").parquet(s"$dir/bcounts")
      .groupBy("band", "bh").agg(sum(col("n")).as("n"))
      .filter(col("n") =!= 0L)
      .collect().map(_.mkString("|")).sorted.toSeq

  test("delete hides docs from pairs + routes; occupancy stays exact; re-delete idempotent") {
    val dir = tmp()
    Dedup.writeLshIndex(docs, dir)
    val pairsBefore = pairsOf(Dedup.pairsFromIndex(spark, dir))
    val deadIds = docs.filter(deadPred).select(col("doc_id"))
      .collect().map(_.getLong(0)).toSet
    assert(deadIds.nonEmpty)

    val n = Dedup.deleteFromLshIndex(docs.filter(deadPred), dir)
    assert(n == deadIds.size, s"returned $n, expected ${deadIds.size}")

    // (a) stored-pair search: exactly the pre-delete pairs restricted to
    // live ids — remaining docs' rows and statistics are untouched, dead
    // docs are gone
    val live = (p: (Long, Long)) => !deadIds(p._1) && !deadIds(p._2)
    val pairsAfter = pairsOf(Dedup.pairsFromIndex(spark, dir))
    assert(pairsAfter == pairsBefore.filter(live))
    assert(pairsAfter.nonEmpty && pairsAfter != pairsBefore,
      "fixture must drop at least one pair and keep at least one")

    // (b) the exact route over live arrivals = the full-corpus exact
    // pair set restricted to live (the index df IS the full-corpus df —
    // deletes leave it a documented historical upper bound)
    val routed = pairsOf(Dedup.jaccardRoute(docs.filter(!deadPred), dir))
    val exactFull = pairsOf(Dedup.ngramJaccardPairs(docs))
    assert(routed == exactFull.filter(live) && routed.nonEmpty)

    // (c) the minhash route never surfaces a dead stored doc
    val mh = Dedup.minhashRoute(docs, dir)
      .select(col("da"), col("db")).collect()
      .flatMap(r => Seq(r.getLong(0), r.getLong(1))).toSet
    // arrivals include dead ids (they may appear as the probe side);
    // every pair partner that came from the INDEX must be live — strip
    // probe ids by checking pairs among stored docs only
    val mhStoredHits = Dedup.minhashRoute(docs.filter(!deadPred), dir)
      .select(col("da"), col("db")).collect()
      .flatMap(r => Seq(r.getLong(0), r.getLong(1))).toSet
    assert(mhStoredHits.intersect(deadIds).isEmpty,
      s"dead ids served by the minhash route: ${mhStoredHits.intersect(deadIds).take(3)}")
    assert(mh.nonEmpty) // the unfiltered replay still routes

    // (d) occupancy exactness: merged bcounts == live rows recomputed
    // from the physical buckets (dead rows still on disk, statistic must
    // already exclude them)
    val tombs = spark.read.parquet(s"$dir/tombstones")
    val liveCounts = spark.read.parquet(s"$dir/buckets_raw")
      .join(tombs, Seq("id"), "left_anti")
      .groupBy("band", "bh").agg(count(lit(1)).as("n"))
      .collect().map(_.mkString("|")).sorted.toSeq
    assert(mergedBcounts(dir) == liveCounts)

    // (e) re-delete of the same ids: a no-op (no double subtraction, no
    // new tombstones)
    val bcBefore = mergedBcounts(dir)
    val n2 = Dedup.deleteFromLshIndex(docs.filter(deadPred), dir)
    assert(n2 == 0L)
    assert(mergedBcounts(dir) == bcBefore)
  }

  test("a delete killed at any failpoint leaves the pinned version; re-run converges") {
    // clean-delete reference
    val ref = tmp()
    Dedup.writeLshIndex(docs, ref)
    Dedup.deleteFromLshIndex(docs.filter(deadPred), ref)
    val refPairs = pairsOf(Dedup.pairsFromIndex(spark, ref))
    val refBc = mergedBcounts(ref)

    for (point <- Seq("del-staged", "del-moved", "del-before-commit")) {
      val dir = tmp()
      Dedup.writeLshIndex(docs, dir)
      val pinnedBefore = IndexCommit.pinnedFiles(dir).get.toSet
      val pairsBefore = pairsOf(Dedup.pairsFromIndex(spark, dir))
      IndexCommit.failpoint =
        p => if (p == point) throw new RuntimeException(s"boom:$p")
      val thrown = try {
        Dedup.deleteFromLshIndex(docs.filter(deadPred), dir); false
      } catch {
        case e: RuntimeException if e.getMessage == s"boom:$point" => true
      } finally IndexCommit.failpoint = _ => ()
      assert(thrown, s"failpoint $point must have fired")
      assert(IndexCommit.pinnedFiles(dir).get.toSet == pinnedBefore,
        s"$point: crash must not move the committed manifest")
      assert(pairsOf(Dedup.pairsFromIndex(spark, dir)) == pairsBefore,
        s"$point: readers must serve the pre-delete index after a crash")
      // re-run (vacuums the orphans) converges to the clean delete
      Dedup.deleteFromLshIndex(docs.filter(deadPred), dir)
      assert(pairsOf(Dedup.pairsFromIndex(spark, dir)) == refPairs)
      assert(mergedBcounts(dir) == refBc, s"$point: bcounts diverged")
      val tombIds = spark.read.parquet(s"$dir/tombstones")
        .collect().map(_.getLong(0)).toSet
      val refTombIds = spark.read.parquet(s"$ref/tombstones")
        .collect().map(_.getLong(0)).toSet
      assert(tombIds == refTombIds, s"$point: tombstones diverged")
    }
  }

  test("compaction folds tombstones: physical reclaim, served view unchanged") {
    val dir = tmp()
    Dedup.writeLshIndex(docs, dir, idRangeSize = 128L)
    // a range-localized delete slice, so the byte-identity claim below
    // has dead-free ranges to witness
    val foldPred = deadPred && col("doc_id") < 128
    Dedup.deleteFromLshIndex(docs.filter(foldPred), dir)
    val deadIds = docs.filter(foldPred).select(col("doc_id"))
      .collect().map(_.getLong(0)).toSet
    assert(deadIds.nonEmpty)
    val pairsBefore = pairsOf(Dedup.pairsFromIndex(spark, dir))
    val bcBefore = mergedBcounts(dir)
    // the fold must be partition-pruned: stamp every file in a range
    // holding NO dead id — those must survive byte-identical (size+mtime)
    val deadPids = deadIds.map(_ / 128L)
    def untouchedStamps(): Map[String, (Long, Long)] = {
      import scala.jdk.CollectionConverters._
      Seq("arrays", "buckets_raw", "prefixes").flatMap { table =>
        java.nio.file.Files.walk(
            java.nio.file.Paths.get(s"$dir/$table"))
          .iterator().asScala
          .filter(p => java.nio.file.Files.isRegularFile(p) &&
            p.toString.contains("pid="))
          .filter { p =>
            val pid = p.toString.split("pid=")(1).takeWhile(_ != '/').toLong
            !deadPids.contains(pid)
          }
          .map(p => p.toString ->
            ((java.nio.file.Files.size(p),
              java.nio.file.Files.getLastModifiedTime(p).toMillis)))
          .toSeq
      }.toMap
    }
    val stampsBefore = untouchedStamps()
    assert(stampsBefore.nonEmpty, "fixture must have dead-free ranges")

    val result = Dedup.compactLshIndex(spark, dir)
    assert(result.exists(_._1 == "tombstones"),
      s"compaction must report the tombstone fold, got $result")
    val stampsAfter = untouchedStamps()
    stampsBefore.foreach { case (path, stamp) =>
      assert(stampsAfter.get(path).contains(stamp),
        s"dead-free range file rewritten by the fold: $path")
    }
    // tombstone table retired and pruned away
    assert(!java.nio.file.Files.exists(
      java.nio.file.Paths.get(s"$dir/tombstones")))
    // dead rows physically gone from every partitioned table
    for (table <- Seq("arrays", "buckets_raw", "prefixes")) {
      val idsOnDisk = spark.read.parquet(s"$dir/$table")
        .select("id").distinct().collect().map(_.getLong(0)).toSet
      assert(idsOnDisk.intersect(deadIds).isEmpty,
        s"$table still holds dead rows after the fold")
    }
    // served view and the occupancy statistic are unchanged
    assert(pairsOf(Dedup.pairsFromIndex(spark, dir)) == pairsBefore)
    assert(mergedBcounts(dir) == bcBefore)
    // a second sweep finds no tombstones to fold
    val again = Dedup.compactLshIndex(spark, dir)
    assert(!again.exists(_._1 == "tombstones"), s"second sweep: $again")
  }

  // ---- curation state: the GDPR forget loop --------------------------

  test("curate forget loop: delete unblocks exact + near dups, relearns, composite-atomic") {
    import graft.operators.Curation
    val dir = tmp()
    Curation.writeCurateIndex(docs, dir)
    val accepted = Curation.curateKeep(docs)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    // a forgettable admitted doc: accepted, long enough to build a robust
    // near-dup, and in no near-dup relation of its own (so after the
    // delete nothing else blocks its content)
    val paired = Dedup.ngramJaccardPairs(docs).collect()
      .flatMap(r => Seq(r.getLong(0), r.getLong(1))).toSet
    val dRow = docs.filter(col("doc_id").isin(accepted.toSeq: _*) &&
        !col("doc_id").isin(paired.toSeq: _*) &&
        graft.operators.Curation.tokenCount(col("text")) >= 40)
      .orderBy("doc_id").limit(1).collect().head
    val (dId, dText) = (dRow.getLong(0), dRow.getString(1))

    val spark2 = spark
    import spark2.implicits._
    // fresh ids, none on the held-out slice
    val xId = 97L * 300000 + 1; val yId = 97L * 300000 + 2
    val zId = 97L * 300001 + 1
    def route(rows: (Long, String)*) =
      Curation.curateRoute(rows.toSeq.toDF("doc_id", "text"), dir)
        .collect().map(r => r.getLong(0) ->
          ((r.getBoolean(1), if (r.isNullAt(2)) "" else r.getString(2))))
        .toMap
    val nearText = dText + " graftforgetmarker"

    // before the delete: an exact copy and a near-dup both reject
    val before = route(xId -> dText, yId -> nearText)
    assert(before(xId) == ((false, "exact_dup")))
    assert(before(yId) == ((false, "near_dup")))

    // composite crash-atomicity: kill between the curate tombstone move
    // and the lsh delete ("del-staged" fires inside the nested delete),
    // and right before the joint commit — both halves must roll back
    for (point <- Seq("curate-del-staged", "del-staged",
        "curate-del-before-commit")) {
      IndexCommit.failpoint =
        p => if (p == point) throw new RuntimeException(s"boom:$p")
      val thrown = try {
        Curation.deleteFromCurateIndex(Seq(dId).toDF("doc_id"), dir); false
      } catch {
        case e: RuntimeException if e.getMessage == s"boom:$point" => true
      } finally IndexCommit.failpoint = _ => ()
      assert(thrown, s"failpoint $point must have fired")
      val after = route(xId -> dText, yId -> nearText)
      assert(after(xId) == ((false, "exact_dup")) &&
        after(yId) == ((false, "near_dup")),
        s"$point: a crashed delete must leave both verdict halves serving")
    }

    // the clean delete: both arrivals now admit (the GDPR re-ingest).
    // Routed as SEPARATE batches: in one batch the copy X becomes a
    // batch keeper and correctly self-screens its near-dup Y — the
    // intra-batch rule, not a forget failure
    val n = Curation.deleteFromCurateIndex(Seq(dId).toDF("doc_id"), dir)
    assert(n == 1L)
    val afterX = route(xId -> dText)
    val afterY = route(yId -> nearText)
    assert(afterX(xId) == ((true, "")), s"exact re-ingest: ${afterX(xId)}")
    assert(afterY(yId) == ((true, "")), s"near re-ingest: ${afterY(yId)}")
    // and the same-batch pair decides like the batch pipeline would:
    // keeper X admits, near-dup Y drops against it
    val sameBatch = route(xId -> dText, yId -> nearText)
    assert(sameBatch(xId) == ((true, "")) &&
      sameBatch(yId) == ((false, "near_dup")))
    // idempotent re-delete
    assert(Curation.deleteFromCurateIndex(Seq(dId).toDF("doc_id"), dir) == 0L)

    // LEARN the re-ingested copy; a later copy rejects against ITS id
    Curation.appendCurateIndex(Seq(xId -> dText).toDF("doc_id", "text"), dir)
    assert(route(zId -> dText)(zId) == ((false, "exact_dup")))

    // compaction reclaims: tombstone dirs retire, dead keeper leaves the
    // physical hash table, decisions are unchanged
    val replayBefore = route(docs.collect()
      .map(r => (r.getLong(0), r.getString(1))).toIndexedSeq: _*)
    val result = Curation.compactCurateIndex(spark, dir)
    assert(result.nonEmpty)
    assert(!java.nio.file.Files.exists(
      java.nio.file.Paths.get(s"$dir/tombstones")))
    assert(!java.nio.file.Files.exists(
      java.nio.file.Paths.get(s"$dir/lsh/tombstones")))
    val keepersOnDisk = spark.read.parquet(s"$dir/hashes")
      .select("keeper").collect().map(_.getLong(0)).toSet
    assert(!keepersOnDisk(dId) && keepersOnDisk(xId))
    val replayAfter = route(docs.collect()
      .map(r => (r.getLong(0), r.getString(1))).toIndexedSeq: _*)
    assert(replayAfter == replayBefore)
  }

  test("append after delete serves the union's live pairs") {
    val dir = tmp()
    val older = docs.filter(col("doc_id") % 2 === 0)
    val newer = docs.filter(col("doc_id") % 2 === 1)
    Dedup.writeLshIndex(older, dir)
    Dedup.deleteFromLshIndex(older.filter(deadPred), dir)
    Dedup.appendLshIndex(newer, dir)
    val deadIds = older.filter(deadPred).select(col("doc_id"))
      .collect().map(_.getLong(0)).toSet
    val live = (p: (Long, Long)) => !deadIds(p._1) && !deadIds(p._2)
    // the full-corpus batch pairs restricted to live ids: df never
    // un-counts dead docs (documented), so kept sets equal the
    // full-corpus build's and the restriction is exact
    val expected = pairsOf(Dedup.minhashLshPairs(docs)).filter(live)
    assert(pairsOf(Dedup.pairsFromIndex(spark, dir)) == expected)
    assert(expected.nonEmpty)
  }

  test("randomized delete waves serve exactly the live-restricted pairs, compose with compaction") {
    val exactFull = pairsOf(Dedup.ngramJaccardPairs(docs))
    val ids = docs.select(col("doc_id")).collect().map(_.getLong(0))
    val spark2 = spark
    import spark2.implicits._
    for (seed <- Seq(7, 23)) {
      val dir = tmp()
      Dedup.writeLshIndex(docs, dir)
      val rnd = new scala.util.Random(seed)
      // wave 1: a random ~15% slice
      val dead1 = ids.filter(_ => rnd.nextDouble() < 0.15).toSet
      Dedup.deleteFromLshIndex(dead1.toSeq.toDF("doc_id"), dir)
      def live(dead: Set[Long]) =
        (p: (Long, Long)) => !dead(p._1) && !dead(p._2)
      assert(pairsOf(Dedup.pairsFromIndex(spark, dir)) ==
        exactFull.filter(live(dead1)), s"seed $seed wave 1")
      // wave 2 composes on the same index (overlapping re-deletes are
      // no-ops by idempotence)
      val dead2 = dead1 ++ ids.filter(_ => rnd.nextDouble() < 0.10)
      Dedup.deleteFromLshIndex(dead2.toSeq.toDF("doc_id"), dir)
      assert(pairsOf(Dedup.pairsFromIndex(spark, dir)) ==
        exactFull.filter(live(dead2)), s"seed $seed wave 2")
      // physical reclaim changes nothing served
      Dedup.compactLshIndex(spark, dir)
      assert(pairsOf(Dedup.pairsFromIndex(spark, dir)) ==
        exactFull.filter(live(dead2)), s"seed $seed post-compaction")
      // and a delete AFTER compaction still composes
      val dead3 = dead2 ++ ids.filter(_ => rnd.nextDouble() < 0.05)
      Dedup.deleteFromLshIndex(dead3.toSeq.toDF("doc_id"), dir)
      assert(pairsOf(Dedup.pairsFromIndex(spark, dir)) ==
        exactFull.filter(live(dead3)), s"seed $seed wave 3")
    }
  }

  // ---- IVF index: the vector forget + retrain loop -------------------

  test("ivf forget: delete hides vectors from the route, crash-atomic, compaction reclaims") {
    import graft.operators.Similarity
    val emb = Tables.t(spark, sf001, "embeddings")
    val dir = java.nio.file.Files.createTempDirectory("graft-ivfdel").toString
    Similarity.ivfWriteIndex(emb, dir)
    val probes = emb.filter(col("vec_id") % 10 === 0)
      .select(col("vec_id"), col("embedding"))
    def served(): Set[(Long, Long)] = Similarity.annRoute(probes, dir, k = 5)
      .select(col("qid"), col("nid")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val before = served()
    // delete actually-served neighbors, so the route's answer must change
    val deadIds = before.map(_._2).toSeq.sorted.take(30)
    val spark2 = spark
    import spark2.implicits._
    def deadDF = deadIds.toDF("vec_id")

    // crash-atomicity: killed at either failpoint, readers serve the
    // pre-delete version and nothing is lost
    for (point <- Seq("ivf-del-staged", "ivf-del-before-commit")) {
      IndexCommit.failpoint =
        p => if (p == point) throw new RuntimeException(s"boom:$p")
      val thrown = try {
        Similarity.deleteFromIvfIndex(deadDF, dir); false
      } catch {
        case e: RuntimeException if e.getMessage == s"boom:$point" => true
      } finally IndexCommit.failpoint = _ => ()
      assert(thrown, s"failpoint $point must have fired")
      assert(served() == before,
        s"$point: a crashed delete must leave the pre-delete index serving")
    }

    val n = Similarity.deleteFromIvfIndex(deadDF, dir)
    assert(n == deadIds.size.toLong)
    val dead = deadIds.toSet
    val after = served()
    assert(after.nonEmpty && after != before)
    assert(after.forall(p => !dead(p._2)),
      s"dead neighbors still served: ${after.filter(p => dead(p._2)).take(3)}")
    // idempotent re-delete; absent ids are no-ops
    assert(Similarity.deleteFromIvfIndex(deadDF, dir) == 0L)
    assert(Similarity.deleteFromIvfIndex(
      Seq(987654321L).toDF("vec_id"), dir) == 0L)

    // compaction reclaims: dead rows physically leave their cells, the
    // tombstone table retires, the served answers are unchanged — and
    // the fold prunes to the DEAD cells (dead-free cells byte-identical)
    val deadCells = spark.read.parquet(s"$dir/tombstones")
      .select(col("cell")).collect().map(_.getLong(0)).toSet
    def cellStamps(): Map[String, (Long, Long)] = {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(
          java.nio.file.Paths.get(s"$dir/postings"))
        .iterator().asScala
        .filter(p => java.nio.file.Files.isRegularFile(p) &&
          p.toString.contains("cell="))
        .filter { p =>
          val c = p.toString.split("cell=")(1).takeWhile(_ != '/').toLong
          !deadCells.contains(c)
        }
        .map(p => p.toString ->
          ((java.nio.file.Files.size(p),
            java.nio.file.Files.getLastModifiedTime(p).toMillis)))
        .toMap
    }
    val cellsBefore = cellStamps()
    val swept = Similarity.compactIvfIndex(spark, dir)
    assert(swept > 0, "tombstone fold must rewrite the dead cells")
    if (cellsBefore.nonEmpty) {
      val cellsAfter = cellStamps()
      cellsBefore.foreach { case (path, stamp) =>
        assert(cellsAfter.get(path).contains(stamp),
          s"dead-free cell file rewritten by the fold: $path")
      }
    }
    assert(!java.nio.file.Files.exists(
      java.nio.file.Paths.get(s"$dir/tombstones")))
    val onDisk = spark.read.parquet(s"$dir/postings")
      .select(col("nid")).collect().map(_.getLong(0)).toSet
    assert(onDisk.intersect(dead).isEmpty, "dead rows must leave the disk")
    assert(served() == after, "compaction must not change the served answers")
  }

  test("rebuildIvfIndex: retrain == fresh build over the live corpus, resets drift, crash-atomic") {
    import graft.operators.Similarity
    val emb = Tables.t(spark, sf001, "embeddings")
    val dir = java.nio.file.Files.createTempDirectory("graft-ivfrb").toString
    val dir2 = java.nio.file.Files.createTempDirectory("graft-ivfrb2").toString
    // an append-grown index with pending tombstones — the state a
    // drift-flagged production index is actually in
    Similarity.ivfWriteIndex(emb.filter(col("vec_id") % 2 === 0), dir)
    Similarity.appendIvfIndex(emb.filter(col("vec_id") % 2 === 1), dir)
    Similarity.deleteFromIvfIndex(emb.filter(col("vec_id") % 9 === 1)
      .select(col("vec_id")), dir)
    val probes = emb.filter(col("vec_id") % 10 === 0)
      .select(col("vec_id"), col("embedding"))
    def served(): Set[(Long, Int, Long)] = Similarity.annRoute(probes, dir, k = 5)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    val before = served()

    for (point <- Seq("ivf-rebuild-staged", "ivf-rebuild-before-commit")) {
      IndexCommit.failpoint =
        p => if (p == point) throw new RuntimeException(s"boom:$p")
      val thrown = try {
        Similarity.rebuildIvfIndex(spark, dir); false
      } catch {
        case e: RuntimeException if e.getMessage == s"boom:$point" => true
      } finally IndexCommit.failpoint = _ => ()
      assert(thrown, s"failpoint $point must have fired")
      assert(served() == before,
        s"$point: a crashed rebuild must leave the old version serving")
    }

    Similarity.rebuildIvfIndex(spark, dir)
    // content-identical to a from-scratch build over the live corpus:
    // the index's own postings ARE the corpus (lossless double round-trip)
    Similarity.ivfWriteIndex(emb.filter(col("vec_id") % 9 =!= 1), dir2)
    def canon(d: String, table: String): Seq[String] = table match {
      case "postings" => spark.read.parquet(s"$d/postings")
        .select(col("cell").cast("long"), col("nid"), col("nv"), col("nn"))
        .collect().map(_.mkString("|")).sorted.toSeq
      case tb => spark.read.parquet(s"$d/$tb")
        .collect().map(_.mkString("|")).sorted.toSeq
    }
    for (tb <- Seq("centroids", "postings"))
      assert(canon(dir, tb) == canon(dir2, tb),
        s"$tb differs from the fresh build")
    // the stats baseline: counts exact; mean_qerr is a distributed avg()
    // whose accumulation order follows the physical row order (postings
    // files vs the raw embeddings scan), so it matches to reassociation
    def stats(d: String): Map[Long, (Long, Double)] =
      spark.read.parquet(s"$d/stats/gen-00000")
        .collect().map(r => r.getLong(1) -> ((r.getLong(2), r.getDouble(3))))
        .toMap
    val (sA, sB) = (stats(dir), stats(dir2))
    assert(sA.keySet == sB.keySet)
    sA.foreach { case (cell, (nv, q)) =>
      assert(nv == sB(cell)._1, s"cell $cell occupancy differs")
      assert(math.abs(q - sB(cell)._2) <= 1e-12 * math.max(1.0, math.abs(q)),
        s"cell $cell mean_qerr beyond reassociation: $q vs ${sB(cell)._2}")
    }
    // tombstones folded for free; drift history reset to the new gen-0
    // baseline (tv 0, qerr_ratio 1 against itself)
    assert(!java.nio.file.Files.exists(
      java.nio.file.Paths.get(s"$dir/tombstones")))
    val drift = Similarity.ivfDriftStats(spark, dir).collect()
    assert(drift.map(_.getInt(0)).toSeq == Seq(0))
    assert(math.abs(drift.head.getDouble(2)) < 1e-12 &&
      math.abs(drift.head.getDouble(4) - 1.0) < 1e-12)
    assert(served().nonEmpty)
  }
}
