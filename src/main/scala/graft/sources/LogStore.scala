package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The long-term log store: partitioned parquet layout + pruned reads.
  *
  * Layout: `severity=<s>/log_date=<yyyy-MM-dd>/part-*.parquet` — the two
  * predicates every log query starts with ("errors yesterday") become
  * partition pruning, so a 100 TB store answers them by listing a handful
  * of directories instead of scanning. Within a partition, files stay
  * columnar (projection pruning + min/max skipping from the parquet
  * footers). This is the engine-side replacement for the reference's
  * Elasticsearch index-per-day retention model (retentionDays config,
  * subscriber.js:12-16 — here: drop date partitions past the TTL).
  */
object LogStore {

  /** Write parsed docs partitioned by (severity, log_date). `tsCol` must be
    * a timestamp column on the frame (log_date derives from it).
    */
  def write(docs: DataFrame, dir: String, tsCol: String = "event_ts"): Unit =
    docs.withColumn("log_date", date_format(col(tsCol), "yyyy-MM-dd"))
      .write.mode("append")
      .partitionBy("severity", "log_date")
      .parquet(dir)

  def read(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(dir)

  // -------------------------------------------------------------------------
  // Manifest-pinned snapshots (Delta-lite)
  // -------------------------------------------------------------------------

  private def manifestDir(dir: String) =
    new org.apache.hadoop.fs.Path(dir, "_manifests")

  private def fsOf(spark: SparkSession) =
    org.apache.hadoop.fs.FileSystem.get(
      spark.sparkContext.hadoopConfiguration)

  /** All committed data files, store-relative (`severity=…/log_date=…/part-…`). */
  private def listDataFiles(fs: org.apache.hadoop.fs.FileSystem,
                            root: org.apache.hadoop.fs.Path): Seq[String] =
    if (!fs.exists(root)) Seq.empty
    else for {
      sev <- fs.listStatus(root).toSeq
      if sev.isDirectory && !sev.getPath.getName.startsWith("_")
      datePart <- fs.listStatus(sev.getPath).toSeq if datePart.isDirectory
      f <- fs.listStatus(datePart.getPath).toSeq
      if f.isFile && f.getPath.getName.startsWith("part-")
    } yield s"${sev.getPath.getName}/${datePart.getPath.getName}/${f.getPath.getName}"

  private def manifestVersions(fs: org.apache.hadoop.fs.FileSystem,
                               dir: String): Seq[(Int, org.apache.hadoop.fs.Path)] = {
    val md = manifestDir(dir)
    if (!fs.exists(md)) Seq.empty
    else fs.listStatus(md).toSeq.map(_.getPath)
      .filter(_.getName.matches("manifest-\\d+"))
      .map(p => p.getName.stripPrefix("manifest-").toInt -> p)
      .sortBy(_._1)
  }

  /** Commit the CURRENT file set (minus `exclude`) as the next manifest
    * version — write-temp-then-rename, so readers never observe a partial
    * manifest. The manifest is the logical table state: [[readPinned]]
    * resolves exactly one committed version, which later physical changes
    * (appends, compaction swaps) cannot mutate. Call after [[write]] to
    * publish the new files; [[compact]] commits its own swap when the store
    * is manifest-tracked.
    */
  def commitManifest(spark: SparkSession, dir: String,
                     exclude: Set[String] = Set.empty): Int = {
    val fs = fsOf(spark)
    val files = listDataFiles(fs, new org.apache.hadoop.fs.Path(dir))
      .filterNot(exclude)
    val version = manifestVersions(fs, dir).lastOption.map(_._1 + 1).getOrElse(0)
    val md = manifestDir(dir)
    fs.mkdirs(md)
    val tmp = new org.apache.hadoop.fs.Path(md, s".tmp-manifest-$version")
    val outS = fs.create(tmp, true)
    try outS.write(files.mkString("\n").getBytes("UTF-8")) finally outS.close()
    val fin = new org.apache.hadoop.fs.Path(md, f"manifest-$version%09d")
    if (!fs.rename(tmp, fin))
      throw new java.io.IOException(s"manifest commit lost a race: $fin")
    version
  }

  /** Snapshot-isolated read: resolve the latest COMMITTED manifest and scan
    * exactly its file list (basePath keeps the partition columns). A
    * concurrent [[compact]] — which first adds its rewritten files, commits
    * the swap as a NEW manifest version, and only then deletes the
    * originals (deferred entirely under `deferDelete`) — never changes a
    * resolved snapshot's file set: no duplicates, no partial swaps.
    */
  def readPinned(spark: SparkSession, dir: String): DataFrame = {
    val fs = fsOf(spark)
    val (_, latest) = manifestVersions(fs, dir).lastOption.getOrElse(
      throw new IllegalStateException(
        s"no committed manifest under $dir — call commitManifest after write"))
    val inS = fs.open(latest)
    val body = try scala.io.Source.fromInputStream(inS, "UTF-8").mkString
               finally inS.close()
    val files = body.split("\n").filter(_.nonEmpty).map(rel => s"$dir/$rel")
    if (files.isEmpty) spark.emptyDataFrame
    else spark.read.option("basePath", dir).parquet(files.toIndexedSeq: _*)
  }

  /** Physical cleanup of files no manifest-visible snapshot needs: deletes
    * data files absent from the LATEST manifest and older than it (the
    * age guard protects appends written but not yet committed). This is
    * where `deferDelete` compaction originals — and crash leftovers from a
    * compaction that died between rename-in and delete — actually go away.
    */
  def vacuum(spark: SparkSession, dir: String): Seq[String] = {
    val fs = fsOf(spark)
    val root = new org.apache.hadoop.fs.Path(dir)
    val latestOpt = manifestVersions(fs, dir).lastOption
    if (latestOpt.isEmpty) return Seq.empty
    val latest = latestOpt.get._2
    val inS = fs.open(latest)
    val keep = try scala.io.Source.fromInputStream(inS, "UTF-8")
        .mkString.split("\n").filter(_.nonEmpty).toSet
      finally inS.close()
    val manifestTime = fs.getFileStatus(latest).getModificationTime
    val dropped = Seq.newBuilder[String]
    listDataFiles(fs, root).filterNot(keep).foreach { rel =>
      val p = new org.apache.hadoop.fs.Path(root, rel)
      if (fs.getFileStatus(p).getModificationTime < manifestTime) {
        fs.delete(p, false)
        dropped += rel
      }
    }
    dropped.result()
  }

  /** Small-files compaction: rewrite every leaf partition whose file count
    * exceeds what `targetBytes`-sized files need — THE operational fix for
    * streaming sinks at scale (each micro-batch appends a file per task;
    * a month of 1-minute batches turns a 100 TB store into hundreds of
    * millions of tiny files whose footer reads dominate every scan).
    *
    * Returns (partition, filesBefore, filesAfter) per rewritten partition;
    * already-compact partitions are untouched (idempotent — a second run
    * returns empty). Swap order is crash-safe: staged files RENAME IN first
    * (their UUID part- names cannot collide with the originals), the swap
    * is committed as a new manifest version when the store is
    * manifest-tracked, and only then do the originals delete — a crash at
    * any point leaves transient extra files (plus the staging dir as the
    * in-progress marker, and [[vacuum]] as the cleanup), never data loss.
    * With `deferDelete` the originals are not deleted at all: a
    * manifest-pinned concurrent reader ([[readPinned]]) keeps its full
    * snapshot until a later [[vacuum]] — which must run before the NEXT
    * compaction (a recompaction over still-present originals would bake
    * their rows in twice; the directory, unlike the manifest, holds both
    * sets). Single-writer assumption; the
    * partition-at-a-time loop IS the scale shape (each rewrite is one
    * bounded Spark job; partitions compact independently and can be
    * parallelized or incrementalized by date).
    */
  def compact(spark: SparkSession, dir: String,
              targetBytes: Long = 128L * 1024 * 1024,
              deferDelete: Boolean = false): Seq[(String, Int, Int)] = {
    val fs = fsOf(spark)
    val root = new org.apache.hadoop.fs.Path(dir)
    if (!fs.exists(root)) return Seq.empty
    val out = Seq.newBuilder[(String, Int, Int)]
    val obsolete = Seq.newBuilder[String] // store-relative original paths
    for {
      sev <- fs.listStatus(root)
      if sev.isDirectory && !sev.getPath.getName.startsWith("_")
      datePart <- fs.listStatus(sev.getPath) if datePart.isDirectory
    } {
      val files = fs.listStatus(datePart.getPath)
        .filter(f => f.isFile && !f.getPath.getName.startsWith("_")
          && !f.getPath.getName.startsWith("."))
      val bytes = files.map(_.getLen).sum
      val want = math.max(1, math.ceil(bytes.toDouble / targetBytes).toInt)
      if (files.length > want) {
        val part = datePart.getPath
        val staging = new org.apache.hadoop.fs.Path(
          part.getParent, s".compact_${part.getName}")
        spark.read.parquet(part.toString).coalesce(want)
          .write.mode("overwrite").parquet(staging.toString)
        val staged = fs.listStatus(staging)
          .filter(f => f.isFile && f.getPath.getName.startsWith("part-"))
        staged.foreach(f => fs.rename(f.getPath,
          new org.apache.hadoop.fs.Path(part, f.getPath.getName)))
        obsolete ++= files.map(f =>
          s"${sev.getPath.getName}/${part.getName}/${f.getPath.getName}")
        out += ((s"${sev.getPath.getName}/${part.getName}",
          files.length, staged.length))
      }
    }
    val swapped = obsolete.result()
    // logical swap BEFORE physical delete: pinned readers resolve either
    // the pre-compaction or the post-compaction manifest, never a mix
    if (swapped.nonEmpty && fs.exists(manifestDir(dir)))
      commitManifest(spark, dir, exclude = swapped.toSet)
    if (!deferDelete) swapped.foreach(rel =>
      fs.delete(new org.apache.hadoop.fs.Path(root, rel), false))
    // staging dirs last — while present they mark the swap as in progress
    for {
      sev <- fs.listStatus(root)
      if sev.isDirectory && !sev.getPath.getName.startsWith("_")
      st <- fs.listStatus(sev.getPath)
      if st.isDirectory && st.getPath.getName.startsWith(".compact_")
    } fs.delete(st.getPath, true)
    out.result()
  }

  /** Retention: drop date partitions strictly older than `keepDays` days
    * before `asOf` (the catalog-level TTL analog of putRetentionPolicy).
    */
  def expire(spark: SparkSession, dir: String, keepDays: Int,
             asOf: java.time.LocalDate): Seq[String] = {
    val cutoff = asOf.minusDays(keepDays.toLong).toString
    val fs = org.apache.hadoop.fs.FileSystem.get(
      spark.sparkContext.hadoopConfiguration)
    val root = new org.apache.hadoop.fs.Path(dir)
    if (!fs.exists(root)) return Seq.empty
    val dropped = Seq.newBuilder[String]
    fs.listStatus(root).filter(_.isDirectory).foreach { sev =>
      fs.listStatus(sev.getPath).filter(_.isDirectory).foreach { datePart =>
        val name = datePart.getPath.getName // log_date=yyyy-MM-dd
        val date = name.stripPrefix("log_date=")
        if (name.startsWith("log_date=") && date < cutoff) {
          fs.delete(datePart.getPath, true)
          dropped += s"${sev.getPath.getName}/$name"
        }
      }
    }
    dropped.result()
  }
}
