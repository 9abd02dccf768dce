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
