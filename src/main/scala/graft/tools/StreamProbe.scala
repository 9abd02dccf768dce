package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.operators.LogPipeline
import graft.streaming.{BulkSink, RateSourceAdapter}

/** Attribute the small-trigger per-batch constant: run the shipper plane
  * at a 1 s trigger under several sink/pipeline configurations and print
  * the mean addBatch per config. Usage: StreamProbe [rate] [secs]
  */
object StreamProbe {
  def main(args: Array[String]): Unit = {
    val rate = args.headOption.map(_.toInt).getOrElse(10000)
    val secs = args.drop(1).headOption.map(_.toInt).getOrElse(20)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def run(name: String, sink: (DataFrame, Long) => Unit,
            pipe: DataFrame => DataFrame): Unit = {
      val base = java.nio.file.Files.createTempDirectory(s"probe-$name")
      val q = pipe(RateSourceAdapter(rate).records(spark))
        .writeStream
        .option("checkpointLocation", s"$base/ckpt")
        .trigger(Trigger.ProcessingTime(1000L))
        .foreachBatch(sink)
        .start()
      Thread.sleep(secs * 1000L)
      val progress = q.recentProgress.toSeq
      q.stop()
      val settled = progress.drop(math.max(1, progress.size / 5))
        .filter(_.numInputRows > 0)
      def mean(k: String) = if (settled.isEmpty) -1L
        else settled.map(p => Option(p.durationMs.get(k))
          .map(_.longValue).getOrElse(0L)).sum / settled.size
      val rows = settled.map(_.numInputRows).sum / math.max(1, settled.size)
      println(s"PROBE $name batches=${settled.size} meanRows=$rows " +
        s"addBatch=${mean("addBatch")} planning=${mean("queryPlanning")} " +
        s"wal=${mean("walCommit")} commit=${mean("commitOffsets")}")
      org.apache.commons.io.FileUtils.deleteQuietly(base.toFile)
    }

    val outBase = java.nio.file.Files.createTempDirectory("probe-out")
    // 1. full shipper plane + full BulkSink (the StreamBench config)
    run("full-sink", (b, id) =>
      BulkSink.ship(b, s"$outBase/full", id, 10000, None), df => LogPipeline.pipeline(df))
    // 2. pipeline + count only (no persist / isEmpty / file write)
    run("count-sink", (b, _) => { b.count(); () }, df => LogPipeline.pipeline(df))
    // 3. raw rate records + count (no decode pipeline either)
    run("no-pipe", (b, _) => { b.count(); () }, identity)
    // 4. pipeline + persist/isEmpty probe but NO file write
    run("probe-sink", (b, _) => {
      b.persist(); try { if (!b.isEmpty) () } finally { b.unpersist(); () }
    }, df => LogPipeline.pipeline(df))
    // 5. pipeline + direct file write (no persist, no isEmpty)
    run("write-sink", (b, id) =>
      b.select(to_json(struct(col("*"))).as("value"))
        .write.mode("overwrite").text(s"$outBase/w/batch=$id"),
      df => LogPipeline.pipeline(df))
    // 6. direct write but coalesced to 4 files (committer cost probe)
    run("write-coalesce4", (b, id) =>
      b.select(to_json(struct(col("*"))).as("value")).coalesce(4)
        .write.mode("overwrite").text(s"$outBase/w4/batch=$id"),
      df => LogPipeline.pipeline(df))
    // 7. full wire serialization + bulk building + write, but SINGLE-PASS
    //    (no persist, no isEmpty probe) — the candidate BulkSink fast path
    run("onepass-sink", (b, id) => {
      val spark2 = b.sparkSession
      import spark2.implicits._
      b.select(LogPipeline.wireJson(b).as("doc"),
          to_json(struct(struct(col("severity")).as("index"))).as("action"))
        .as[(String, String)]
        .mapPartitions(_.grouped(10000).map(ch =>
          ch.map { case (d, a) => s"$a\n$d" }.mkString("\n")))
        .write.mode("overwrite").text(s"$outBase/op/batch=$id")
    }, df => LogPipeline.pipeline(df))
    spark.stop()
  }
}
