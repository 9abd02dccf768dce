package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.Dedup

/** Incremental LSH-index maintenance ([[Dedup.appendLshIndex]]): growing an
  * index by a document batch must produce EXACTLY the index a full rebuild
  * over the union produces — table for table — including when the append
  * pushes a shingle across the df cut (the case where old docs must be
  * rewritten). The id-range partitioning additionally makes rewrite IO
  * proportional to TOUCHED ranges: an append must leave unaffected ranges'
  * files byte-identical on disk. Plus the served-pairs equivalence the
  * production consumer cares about.
  */
class IndexMaintenanceSpec extends SparkSpec {

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("graft-lshidx").toString

  /** The consumer-facing search space: uncut rows minus oversize buckets
    * (recomputed here from public reads, independent of the operator's
    * own servedBuckets).
    */
  private def served(dir: String): DataFrame = {
    val raw = spark.read.parquet(s"$dir/buckets_raw")
      .select("id", "band", "bh")
    val over = spark.read.parquet(s"$dir/oversize")
    raw.join(over, Seq("band", "bh"), "left_anti")
  }

  /** Sorted canonical rows of one index table (arrays' sa joined flat;
    * partition column dropped — layout is compared separately).
    */
  /** The merged df view (the stored table is LSM segments since r11). */
  private def mergedDf(dir: String): DataFrame =
    spark.read.option("recursiveFileLookup", "true").parquet(s"$dir/df")
      .groupBy("shingle").agg(sum(col("df")).as("df"))

  private def canon(dir: String, table: String): Seq[String] = {
    val flat = table match {
      case "arrays" => spark.read.parquet(s"$dir/$table")
        .select(col("id"), array_join(col("sa"), ""), col("n"))
      case "buckets_raw" => spark.read.parquet(s"$dir/$table")
        .select("id", "band", "bh")
      case "served" => served(dir)
      case "df" => mergedDf(dir)
      case _ => spark.read.parquet(s"$dir/$table")
    }
    flat.collect().map(_.mkString("|")).sorted.toSeq
  }

  private def assertSameIndex(incr: String, full: String): Unit =
    for (t <- Seq("df", "stop", "oversize", "arrays", "buckets_raw",
        "served")) {
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
    // compacts the df LSM back to one base — equality must survive
    val compacted = tmp()
    Dedup.writeLshIndex(docs.filter(col("doc_id") % 3 === 0), compacted)
    Dedup.appendLshIndex(docs.filter(col("doc_id") % 3 === 1), compacted,
      compactSegmentsAt = 1)
    Dedup.appendLshIndex(docs.filter(col("doc_id") % 3 === 2), compacted,
      compactSegmentsAt = 1)
    assertSameIndex(compacted, full)
    import scala.jdk.CollectionConverters._
    val segs = java.nio.file.Files.list(
        java.nio.file.Paths.get(s"$compacted/df")).iterator().asScala
      .count(_.getFileName.toString.startsWith("seg-"))
    assert(segs == 1, s"compaction must fold the LSM to one base, got $segs")
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
    val dfBefore = flatStamps("df")
    val stopBefore = flatStamps("stop")
    assert(arraysBefore.keys.map(_.split("pid=")(1).takeWhile(_ != '/'))
      .toSet.size > 1, "fixture must span multiple id ranges")
    val fresh = docs.filter(col("doc_id") % 5 === 0)
      .select((col("doc_id") + 100000L).as("doc_id"),
        concat(col("text"), lit(" zq unique tail")).as("text"))
    Dedup.appendLshIndex(fresh, incr)
    val arraysAfter = fileStamps("arrays")
    val rawAfter = fileStamps("buckets_raw")
    // every pre-append file survives with identical size + mtime
    arraysBefore.foreach { case (path, stamp) =>
      assert(arraysAfter.get(path).contains(stamp),
        s"unaffected arrays file rewritten: $path")
    }
    rawBefore.foreach { case (path, stamp) =>
      assert(rawAfter.get(path).contains(stamp),
        s"unaffected buckets_raw file rewritten: $path")
    }
    // df is LSM: the append ADDS one segment and rewrites none
    val dfAfter = flatStamps("df")
    dfBefore.foreach { case (path, stamp) =>
      assert(dfAfter.get(path).contains(stamp),
        s"existing df segment rewritten: $path")
    }
    assert(dfAfter.size > dfBefore.size, "append must add a df segment")
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
}
