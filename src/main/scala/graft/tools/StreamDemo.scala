package graft.tools

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

import graft.functions.GzipCodec
import graft.streaming.ShipperStream

/** Drive the streaming shipper end-to-end from the command line. */
object StreamDemo {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val root = Files.createTempDirectory("graft-demo").toString
    val in = s"$root/in"; new java.io.File(in).mkdirs()

    def env(msgs: String*): String = {
      val events = msgs.zipWithIndex.map { case (m, i) =>
        val esc = m.replace("\\", "\\\\").replace("\"", "\\\"").replace("\t", "\\t")
        s"""{"id":"$i","timestamp":1,"message":"$esc"}"""
      }.mkString("[", ",", "]")
      val p = s"""{"messageType":"DATA_MESSAGE","logGroup":"/aws/lambda/demo-fn","logStream":"2024/01/01/[$$LATEST]s","logEvents":$events}"""
      val b64 = java.util.Base64.getEncoder.encodeToString(GzipCodec.gzip(p.getBytes("UTF-8")))
      s"""{"data":"$b64","region":"us-east-1"}"""
    }

    Files.writeString(Paths.get(s"$in/r1.json"), env(
      "json-free text line",
      "Task timed out after 9 seconds",
      """{"message":"from json","requestId":"r-1","k":"7"}""",
      "2024-01-01T00:00:00.000Z aaaaaaaa-bbbb-cccc-dddd-eeeeeeeeeeee space-separated-malformed",
      "START RequestId: dropped"))

    val q = ShipperStream.start(spark, in, s"$root/out", s"$root/cp",
      bulkSize = 2, triggerMs = 100L)
    q.processAllAvailable()
    val progress = q.recentProgress.filter(_.numInputRows > 0)
      .map(p => p.observedMetrics.get("graft_counters")).filter(_ != null)
    progress.foreach(m => println(s"OBSERVE docCounter=${m.getLong(0)} errorCounter=${m.getLong(1)}"))
    q.stop()

    println("--- shipped bulks (batch=0):")
    spark.read.text(s"$root/out/batch=0").collect().foreach(r => println(r.getString(0)))
    spark.stop()
  }
}
