package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Throughput record for the r11 streaming ADMISSION GATE
  * ([[graft.operators.Curation.curateRoute]]): arriving documents are
  * screened against the full curation index built from the sf0.1 corpus
  * (hash keeper table + LSH index over the curated frame), exactly the
  * deployment shape CurationSpec proves batch-equal. Reports sustained
  * admitted+rejected decisions/s per input rate.
  *
  * Arrival synthesis: rate-source rows pick a text from a broadcast
  * 500-doc literal pool (sf0.001 texts) under fresh ids — so every
  * arrival pays real shingle/minhash/verify work against the standing
  * sf0.1 index, and a stable fraction collides with indexed content.
  *
  * The per-batch cost structure is the stream-static one: the static
  * index tables re-scan per micro-batch (hashes ~ corpus rows of
  * 16-byte keys; LSH buckets ~ bands x docs) — at 100 TB those scans
  * prune by partition (hash-prefix / band), which is the documented
  * stored-index layout; this record measures the unpartitioned worst
  * case on local[32].
  *
  * Prints ONE JSON line {"metric":"route_docs_per_sec", ...}.
  */
object RouteBench {
  def main(args: Array[String]): Unit = {
    val rates = sys.env.getOrElse("SPARK_GRAFT_ROUTE_RATES", "2000,5000,10000")
      .split(",").map(_.trim.toInt)
    val secs = sys.env.getOrElse("SPARK_GRAFT_ROUTE_SECS", "40").toInt
    val triggerMs = sys.env.getOrElse("SPARK_GRAFT_ROUTE_TRIGGER_MS", "5000").toLong
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val poolDir = sys.env.getOrElse("SPARK_GRAFT_ROUTE_POOL", "/root/testdata/sf0.001")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def r1(v: Double): String = "%.1f".formatLocal(java.util.Locale.ROOT, v)

    val dir = java.nio.file.Files.createTempDirectory("graft-routebench").toString
    val t0 = System.nanoTime()
    graft.operators.Curation.writeCurateIndex(
      graft.Tables.t(spark, sfDir, "documents").select(col("doc_id"), col("text")),
      dir)
    val buildSec = (System.nanoTime() - t0) / 1e9
    System.err.println(s"[route-bench] index build ${r1(buildSec)}s from $sfDir")

    val pool = graft.Tables.t(spark, poolDir, "documents")
      .select("text").limit(500).collect().map(_.getString(0)).toSeq
    val poolLit = typedlit(pool)

    def arrivals(rate: Int): DataFrame =
      spark.readStream.format("rate")
        .option("rowsPerSecond", rate.toString).load()
        .select((col("value") + 1000000000L).as("doc_id"),
          element_at(poolLit, (pmod(col("value"), lit(pool.size)) + 1)
            .cast("int")).as("text"))

    // discarded warmup: JIT + codegen + footer caches
    locally {
      val accepted = spark.sparkContext.longAccumulator("warm")
      val q = arrivals(2000).writeStream
        .foreachBatch { (b: DataFrame, _: Long) =>
          accepted.add(graft.operators.Curation.curateRoute(b, dir).count()); ()
        }
        .trigger(org.apache.spark.sql.streaming.Trigger.ProcessingTime(triggerMs))
        .option("checkpointLocation", s"$dir/ckpt-warm").start()
      Thread.sleep(25000L)
      q.stop()
    }

    val results = rates.map { rate =>
      val decided = spark.sparkContext.longAccumulator(s"decided-$rate")
      val acc = spark.sparkContext.longAccumulator(s"accepted-$rate")
      val q = arrivals(rate).writeStream
        .foreachBatch { (b: DataFrame, _: Long) =>
          val rows = graft.operators.Curation.curateRoute(b, dir)
            .groupBy("accepted").count().collect()
          rows.foreach { r =>
            decided.add(r.getLong(1))
            if (r.getBoolean(0)) acc.add(r.getLong(1))
          }
          ()
        }
        .trigger(org.apache.spark.sql.streaming.Trigger.ProcessingTime(triggerMs))
        .option("checkpointLocation", s"$dir/ckpt-$rate").start()
      Thread.sleep(secs * 1000L)
      val progress = q.recentProgress.toSeq
      q.stop()
      val settled = progress.drop(math.max(1, progress.size / 5))
        .filter(_.numInputRows > 0)
      val rows = settled.map(_.numInputRows).sum
      val durMs = settled.map(_.durationMs.get("triggerExecution").toLong).sum
      val pps = if (durMs == 0) 0.0 else rows * 1000.0 / durMs
      val meanBatchMs = if (settled.isEmpty) Long.MaxValue else durMs / settled.size
      val keptUp = settled.nonEmpty && meanBatchMs <= triggerMs * 1.5
      System.err.println(s"[route-bench] rate=$rate decisions/s=${r1(pps)} " +
        s"meanBatchMs=$meanBatchMs keptUp=$keptUp batches=${settled.size} " +
        s"accepted=${acc.value}/${decided.value}")
      (rate, pps, meanBatchMs, keptUp, settled.size, acc.value, decided.value)
    }
    val sustained = results.filter(_._4).map(_._2).maxOption.getOrElse(0.0)
    val per = results.map { case (rate, pps, mb, ok, n, a, d) =>
      s""""$rate":{"decisions_per_sec":${r1(pps)},"mean_batch_ms":$mb,""" +
        s""""kept_up":$ok,"batches":$n,"accepted":$a,"decided":$d}"""
    }.mkString("{", ",", "}")
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
    spark.stop()
    println(s"""{"metric":"route_docs_per_sec","value":${r1(sustained)},""" +
      s""""unit":"docs/sec","index_sf":"$sfDir","index_build_sec":${r1(buildSec)},""" +
      s""""trigger_ms":$triggerMs,"secs":$secs,"rates":$per}""")
  }
}
