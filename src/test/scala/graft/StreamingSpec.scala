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

  test("Kinesis adapter contract: connector-shaped records flow through the shipper") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.streaming.KinesisSourceAdapter
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    // connector emits RAW record bytes (Kinesis base64-decodes on the
    // wire), plus shard bookkeeping — replay exactly that shape
    val payload = """{"messageType":"DATA_MESSAGE","logGroup":"/aws/lambda/kin-fn","logStream":"2019/03/08/[$LATEST]k","logEvents":[{"id":"1","timestamp":155,"message":"Task timed out after 3 seconds"},{"id":"2","timestamp":156,"message":"kinesis hello"}]}"""
    val raw = graft.functions.GzipCodec.gzip(payload.getBytes("UTF-8"))
    val input = MemoryStream[(Array[Byte], String, String, String,
      java.sql.Timestamp)]
    val connectorFrame = input.toDF().toDF("data", "streamName",
      "partitionKey", "sequenceNumber", "approximateArrivalTimestamp")
    assert(connectorFrame.schema == KinesisSourceAdapter.connectorSchema,
      "test stream must replay the connector's exact output schema")
    val docs = graft.operators.LogPipeline.pipeline(
      KinesisSourceAdapter.normalize(connectorFrame, "eu-west-1"))
    val q = docs.writeStream.format("memory").queryName("kinesis_docs").start()
    try {
      input.addData((raw, "logs", "shard-0", "49590338271490256608559692538361571095921575989136588898",
        java.sql.Timestamp.valueOf("2024-01-01 00:00:00")))
      q.processAllAvailable()
      val out = spark.table("kinesis_docs").collect()
      assert(out.length == 2)
      val byMsg = out.map(r => r.getAs[String]("message") -> r).toMap
      assert(byMsg.keySet == Set("Task timed out after 3 seconds", "kinesis hello"))
      val timeout = byMsg("Task timed out after 3 seconds")
      assert(timeout.getAs[String]("severity") == "error")
      assert(timeout.getAs[String]("error_type") == "timeout")
      out.foreach { r =>
        assert(r.getAs[String]("function_name") == "kin-fn")
        assert(r.getAs[String]("region") == "eu-west-1")
      }
    } finally q.stop()
  }

  test("bulk action line survives hostile field values as valid NDJSON") {
    import spark.implicits._
    // a doc-shaped batch whose severity carries quotes, a newline escape
    // target, and backslashes — the one-schema-change-away case the
    // hand-interpolated action line would have corrupted
    val hostile = "err\"or\n{\"inject\":1}\\"
    val batch = Seq(("s-fn", "$LATEST", "2019-03-08T15:58:45.736Z",
        "req-1", "boom", "us-east-1", "lambda", hostile, "runtime"))
      .toDF("function_name", "function_version", "timestamp", "request_id",
        "message", "region", "type", "severity", "error_type")
      .withColumn("attrs",
        map(lit("k"), lit("v\twithcontrol")))
    val out = Files.createTempDirectory("graft-bulk-esc").toString
    graft.streaming.BulkSink.ship(batch, out, batchId = 0L, bulkSize = 10)
    val lines = spark.read.text(s"$out/batch=0").collect().map(_.getString(0))
    assert(lines.length == 2, s"action + doc line expected, got ${lines.length}")
    // every physical line must independently parse as a JSON object
    val om = new com.fasterxml.jackson.databind.ObjectMapper()
    lines.foreach { l =>
      val node = om.readTree(l)
      assert(node.isObject, s"line is not a JSON object: $l")
    }
    assert(om.readTree(lines(0)).path("index").path("severity")
      .asText() == hostile, "severity must round-trip byte-exact")
    assert(om.readTree(lines(1)).path("severity").asText() == hostile)
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

  test("late data beyond the watermark is dropped (errorRates, append mode)") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[(String, String, java.sql.Timestamp)]
    val docs = input.toDF().toDF("function_name", "severity", "event_ts")
    val q = ShipperStream.errorRates(docs).writeStream
      .format("memory").queryName("late_docs").outputMode("append").start()
    try {
      input.addData(("fn-a", "error", ts("2024-01-01 00:01:00")),
        ("fn-a", "debug", ts("2024-01-01 00:02:00")))
      q.processAllAvailable()
      // advance the watermark past window [00:00, 00:05): 00:30 - 10min
      input.addData(("fn-a", "debug", ts("2024-01-01 00:30:00")))
      q.processAllAvailable()
      // LATE row inside the already-finalized first window: must be dropped
      input.addData(("fn-a", "error", ts("2024-01-01 00:01:30")))
      q.processAllAvailable()
      // close the 00:30 window as well
      input.addData(("fn-a", "debug", ts("2024-01-01 01:00:00")))
      q.processAllAvailable()
      val rows = spark.table("late_docs").collect()
      val w1 = rows.filter(_.getAs[java.sql.Timestamp]("window_start")
        .toString.startsWith("2024-01-01 00:00"))
      assert(w1.length == 1, "finalized window must emit exactly once")
      assert(w1.head.getAs[Long]("n_docs") == 2, "late row must be excluded")
      assert(w1.head.getAs[Long]("n_errors") == 1)
    } finally q.stop()
  }

  test("HTTP _bulk transport retries through a failing-then-recovering receiver") {
    import com.sun.net.httpserver.{HttpExchange, HttpHandler, HttpServer}
    val received = new java.util.concurrent.CopyOnWriteArrayList[String]()
    val failures = new java.util.concurrent.atomic.AtomicInteger(2)
    val attempts = new java.util.concurrent.atomic.AtomicInteger(0)
    val server = HttpServer.create(
      new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/_bulk", new HttpHandler {
      override def handle(x: HttpExchange): Unit = {
        attempts.incrementAndGet()
        val body = new String(x.getRequestBody.readAllBytes(), "UTF-8")
        if (failures.getAndDecrement() > 0) {
          x.sendResponseHeaders(503, -1); x.close()
        } else {
          received.add(body)
          x.sendResponseHeaders(200, -1); x.close()
        }
      }
    })
    server.start()
    val port = server.getAddress.getPort
    try {
      val root = Files.createTempDirectory("graft-http").toString
      val in = s"$root/in"; new java.io.File(in).mkdirs()
      Files.writeString(java.nio.file.Paths.get(s"$in/r1.json"),
        envelope(Seq("http one", "http two", "http three")))
      val q = ShipperStream.start(spark,
        graft.streaming.FileSourceAdapter(in), s"$root/out", s"$root/cp",
        bulkSize = 2, triggerMs = 100L,
        Some(graft.streaming.HttpBulkTransport(
          s"http://127.0.0.1:$port/_bulk", maxRetries = 6, backoffMs = 10L)))
      try q.processAllAvailable() finally q.stop()
      val bodies = received.toArray.map(_.toString)
      val docCount = bodies.mkString("\n").linesIterator
        .count(_.startsWith("{\"index\""))
      assert(docCount == 3, s"all 3 docs must arrive post-recovery: $docCount")
      assert(attempts.get() >= bodies.length + 2,
        "the 503 responses must have been retried")
      assert(bodies.mkString.contains("\"message\":\"http one\""))
    } finally server.stop(0)
  }

  test("streaming dedup drops at-least-once redeliveries within the watermark") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[(Long, java.sql.Timestamp)]
    val docs = input.toDF().toDF("event_id", "event_ts")
    val q = ShipperStream.dedupedDocs(docs).writeStream
      .format("memory").queryName("deduped").outputMode("append").start()
    try {
      input.addData((1L, ts("2024-01-01 00:01:00")),
        (2L, ts("2024-01-01 00:01:30")))
      q.processAllAvailable()
      // redelivery of id 1 (the Kinesis retry case) inside the watermark
      input.addData((1L, ts("2024-01-01 00:02:00")),
        (3L, ts("2024-01-01 00:03:00")))
      q.processAllAvailable()
      val ids = spark.table("deduped").collect().map(_.getLong(0)).sorted
      assert(ids.toSeq == Seq(1L, 2L, 3L), s"got ${ids.toSeq}")
    } finally q.stop()
  }

  test("stream-stream interval join attributes errors to recent deploys only") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val errIn = MemoryStream[(String, java.sql.Timestamp, String)]
    val depIn = MemoryStream[(String, java.sql.Timestamp, String)]
    val joined = graft.streaming.StreamJoins.errorsNearDeploys(
      errIn.toDF().toDF("function_name", "err_ts", "message"),
      depIn.toDF().toDF("dep_function", "dep_ts", "version"))
    val q = joined.writeStream.format("memory").queryName("attributed")
      .outputMode("append").start()
    try {
      depIn.addData(("fn-1", ts("2024-01-01 00:00:00"), "v2"))
      errIn.addData(
        ("fn-1", ts("2024-01-01 00:02:00"), "boom after deploy"), // inside
        ("fn-1", ts("2024-01-01 00:09:00"), "too late"),          // > horizon
        ("fn-2", ts("2024-01-01 00:02:00"), "other fn"))          // no deploy
      q.processAllAvailable()
      // advance both watermarks so join state can be finalized
      depIn.addData(("fn-9", ts("2024-01-01 01:00:00"), "v9"))
      errIn.addData(("fn-9", ts("2024-01-01 01:30:00"), "late heartbeat"))
      q.processAllAvailable()
      val rows = spark.table("attributed")
        .select("function_name", "version", "message").collect()
        .map(r => (r.getString(0), r.getString(1), r.getString(2))).toSet
      assert(rows == Set(("fn-1", "v2", "boom after deploy")), s"got $rows")
    } finally q.stop()
  }

  test("content-hash sampling/splitting is streaming-safe and batch-consistent") {
    // the curation decisions are pure per-row expressions (md5 thresholds),
    // so the SAME operator runs unchanged over a stream: no state, no
    // watermark, and a doc lands in the same split no matter which
    // micro-batch (or batch job) carried it
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[(Long, String)]
    val streamed = input.toDF().toDF("doc_id", "text")
      .withColumn("split",
        when(md5(col("text")) < "c", "train")
          .when(md5(col("text")) < "e", "val").otherwise("test"))
    val q = streamed.writeStream.format("memory").queryName("splits")
      .outputMode("append").start()
    try {
      val docs = Tables.t(spark, sf001, "documents")
        .select("doc_id", "text").limit(40)
        .collect().map(r => (r.getLong(0), r.getString(1)))
      input.addData(docs.take(20).toSeq)
      q.processAllAvailable()
      input.addData(docs.drop(20).toSeq)
      q.processAllAvailable()
      val streamedSplits = spark.table("splits")
        .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("split"))
        .toMap
      // batch recomputation over the SAME collected rows assigns identical
      // splits (a second independent limit() could pick different rows)
      val batch = docs.toSeq.toDF("doc_id", "text")
        .withColumn("split",
          when(md5(col("text")) < "c", "train")
            .when(md5(col("text")) < "e", "val").otherwise("test"))
        .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("split"))
        .toMap
      assert(streamedSplits == batch)
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
