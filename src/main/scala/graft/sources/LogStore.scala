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

  /** Small-files compaction: rewrite every leaf partition whose file count
    * exceeds what `targetBytes`-sized files need — THE operational fix for
    * streaming sinks at scale (each micro-batch appends a file per task;
    * a month of 1-minute batches turns a 100 TB store into hundreds of
    * millions of tiny files whose footer reads dominate every scan).
    *
    * Returns (partition, filesBefore, filesAfter) per rewritten partition;
    * already-compact partitions are untouched (idempotent — a second run
    * returns empty). The rewrite stages into a hidden sibling dir, then
    * swaps: delete originals, move staged files in. Single-writer
    * assumption, like the store itself — a concurrent-reader-safe swap
    * needs a table format's commit protocol, which is out of scope here;
    * the partition-at-a-time loop IS the scale shape (each rewrite is one
    * bounded Spark job; partitions compact independently and can be
    * parallelized or incrementalized by date).
    */
  def compact(spark: SparkSession, dir: String,
              targetBytes: Long = 128L * 1024 * 1024): Seq[(String, Int, Int)] = {
    val fs = org.apache.hadoop.fs.FileSystem.get(
      spark.sparkContext.hadoopConfiguration)
    val root = new org.apache.hadoop.fs.Path(dir)
    if (!fs.exists(root)) return Seq.empty
    val out = Seq.newBuilder[(String, Int, Int)]
    for {
      sev <- fs.listStatus(root) if sev.isDirectory
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
        files.foreach(f => fs.delete(f.getPath, false))
        staged.foreach(f => fs.rename(f.getPath,
          new org.apache.hadoop.fs.Path(part, f.getPath.getName)))
        fs.delete(staging, true)
        out += ((s"${sev.getPath.getName}/${part.getName}",
          files.length, staged.length))
      }
    }
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
