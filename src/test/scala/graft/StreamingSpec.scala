package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.functions.GzipCodec
import graft.streaming.ShipperStream

/** End-to-end Structured Streaming run of the shipper: file source ->
  * pipeline -> foreachBatch bulk sink, incl. empty-batch short-circuit and
  * the windowed streaming aggregations.
  */
class StreamingSpec extends SparkSpec {

  private def envelope(messages: Seq[String]): String = {
    val events = messages.zipWithIndex.map { case (m, i) =>
      val esc = m.replace("\\", "\\\\").replace("\"", "\\\"").replace("\t", "\\t")
      s"""{"id":"$i","timestamp":155,"message":"$esc"}"""
    }.mkString("[", ",", "]")
    val payload = s"""{"messageType":"DATA_MESSAGE","logGroup":"/aws/lambda/s-fn","logStream":"2019/03/08/[$$LATEST]x","logEvents":$events}"""
    val b64 = java.util.Base64.getEncoder
      .encodeToString(GzipCodec.gzip(payload.getBytes("UTF-8")))
    s"""{"data":"$b64","region":"us-east-1"}"""
  }

  test("shipper stream ships bulks; empty batches short-circuit") {
    val root = Files.createTempDirectory("graft-stream").toString
    val in = s"$root/in"; val out = s"$root/out"; val cp = s"$root/cp"
    new java.io.File(in).mkdirs()
    Files.writeString(java.nio.file.Paths.get(s"$in/r1.json"),
      envelope(Seq("hello one", "Task timed out after 3 seconds",
        "START RequestId: drop-me")) + "\n" +
        envelope(Seq("2019-03-08T15:58:45.736Z\taaaaaaaa-bbbb-cccc-dddd-eeeeeeeeeeee\tstructured!")))

    val q = ShipperStream.start(spark, in, out, cp, bulkSize = 2, triggerMs = 100L)
    try q.processAllAvailable() finally q.stop()

    val shipped = spark.read.text(s"$out/batch=0").collect().map(_.getString(0))
    val body = shipped.mkString("\n")
    assert(body.contains("\"message\":\"hello one\""))
    assert(body.contains("\"severity\":\"error\""))          // timeout doc
    assert(body.contains("\"error.type\":\"timeout\""))
    assert(body.contains("structured!"))
    assert(body.contains("\"@timestamp\":\"2019-03-08T15:58:45.736Z\""))
    assert(!body.contains("drop-me"))                        // platform drop
    // 3 docs, bulkSize 2 -> index lines present per doc
    assert(body.linesIterator.count(_.startsWith("{\"index\"")) == 3)

    // empty batch: a payload of only droppable messages ships nothing new
    Files.writeString(java.nio.file.Paths.get(s"$in/r2.json"),
      envelope(Seq("END RequestId: nothing")))
    val q2 = ShipperStream.start(spark, in, out, cp, bulkSize = 2, triggerMs = 100L)
    try q2.processAllAvailable() finally q2.stop()
    assert(!new java.io.File(s"$out/batch=1").exists() ||
      spark.read.text(s"$out/batch=1").isEmpty)
  }

  test("rate-source envelope generator decodes through the pipeline") {
    import graft.operators.LogPipeline
    import org.apache.spark.sql.streaming.Trigger
    val q = LogPipeline.pipeline(ShipperStream.rateRecords(spark, rowsPerSecond = 500))
      .writeStream.format("memory").queryName("rate_docs")
      .trigger(Trigger.ProcessingTime(100L)).start()
    try {
      val deadline = System.nanoTime() + 30L * 1000 * 1000 * 1000
      while (spark.table("rate_docs").isEmpty && System.nanoTime() < deadline)
        Thread.sleep(200)
      val docs = spark.table("rate_docs").collect()
      assert(docs.nonEmpty, "rate stream produced no docs in 30s")
      val d = docs.head
      assert(d.getAs[String]("function_name").startsWith("rate-fn-"))
      assert(d.getAs[String]("message").startsWith("rate event "))
      assert(d.getAs[String]("severity") == "debug")
    } finally q.stop()
  }

  test("windowed error rates aggregate by tumbling window (batch-mode check)") {
    import spark.implicits._
    val docs = Seq(
      ("fn-a", "error", "2024-01-01 00:01:00"),
      ("fn-a", "debug", "2024-01-01 00:02:00"),
      ("fn-a", "error", "2024-01-01 00:07:00"),
      ("fn-b", "debug", "2024-01-01 00:01:30"))
      .toDF("function_name", "severity", "ts_s")
      .withColumn("event_ts", to_timestamp(col("ts_s")))
    val out = ShipperStream.errorRates(docs).orderBy("window_start", "function_name")
      .collect()
    assert(out.length == 3)
    val first = out.head
    assert(first.getAs[Long]("n_docs") == 2 && first.getAs[Long]("n_errors") == 1)
  }

  test("session windows close after the gap (batch-mode check)") {
    import spark.implicits._
    val docs = Seq(
      ("fn-a", "2024-01-01 00:00:00"), ("fn-a", "2024-01-01 00:10:00"),
      ("fn-a", "2024-01-01 01:00:00"))
      .toDF("function_name", "ts_s")
      .withColumn("event_ts", to_timestamp(col("ts_s")))
    val out = ShipperStream.sessions(docs).collect()
    assert(out.length == 2)  // 30-min gap splits the third doc into a new session
    assert(out.map(_.getAs[Long]("n_docs")).sorted.toSeq == Seq(1L, 2L))
  }
}
