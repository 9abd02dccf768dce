package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** S1 source seam: where Kinesis-shaped records come from
  * (`/root/reference/serverless.yml:24-32` — Kinesis trigger, batchSize
  * 1000, startingPosition LATEST).
  *
  * Every adapter yields the same frame shape ([[ShipperStream.recordSchema]]:
  * `data` = base64(gzip(CloudWatch payload)), `region`), so the decode ->
  * parse -> classify -> ship pipeline is source-agnostic: swapping file
  * fixtures for a live Kinesis stream is a constructor change, not a
  * pipeline change.
  */
trait SourceAdapter extends Serializable {
  def records(spark: SparkSession): DataFrame
}

/** File-backed adapter (tests/fixtures): JSON-lines of Kinesis-shaped
  * records. `maxFilesPerTrigger` is the per-micro-batch cap, the analog of
  * the reference's `batchSize: 1000` (serverless.yml:30).
  */
final case class FileSourceAdapter(inputDir: String,
                                   maxFilesPerTrigger: Int = 10)
    extends SourceAdapter {
  override def records(spark: SparkSession): DataFrame =
    spark.readStream
      .schema(ShipperStream.recordSchema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger.toString)
      .json(inputDir)
}

/** Rate-source load generator: `rowsPerSecond` synthetic envelopes (see
  * [[ShipperStream.rateRecords]]) — the throughput-testing adapter.
  */
final case class RateSourceAdapter(rowsPerSecond: Int = 1000)
    extends SourceAdapter {
  override def records(spark: SparkSession): DataFrame =
    ShipperStream.rateRecords(spark, rowsPerSecond)
}

/** Live Kinesis adapter — the implementation point for the reference's
  * actual source (BASELINE "Structured Streaming + Kinesis source").
  *
  * Uses the Spark Kinesis SQL connector's `format("kinesis")` contract
  * (stream name + endpoint, `startingPosition` ≙ serverless.yml:31 LATEST,
  * per-fetch record cap ≙ serverless.yml:30 batchSize). The connector
  * emits `data` as the raw record bytes — Kinesis itself base64-decodes on
  * the wire — so [[KinesisSourceAdapter.normalize]] re-encodes to base64 to
  * present the exact envelope the Lambda handler saw (shipper.js:122
  * decodes it back; the shim keeps every downstream operator byte-identical
  * across adapters).
  *
  * The connector jar is not in this zero-egress build, so constructing the
  * reader throws at `load()` unless `spark-sql-kinesis` is on the
  * classpath. The normalization half of the contract IS testable without
  * it: StreamingSpec replays a [[KinesisSourceAdapter.connectorSchema]]-
  * shaped MemoryStream through [[KinesisSourceAdapter.normalize]] and the
  * full shipper pipeline, network-free.
  */
final case class KinesisSourceAdapter(streamName: String,
                                      awsRegion: String,
                                      startingPosition: String = "LATEST",
                                      maxRecordsPerFetch: Int = 1000)
    extends SourceAdapter {
  override def records(spark: SparkSession): DataFrame =
    KinesisSourceAdapter.normalize(
      spark.readStream.format("kinesis")
        .option("streamName", streamName)
        .option("region", awsRegion)
        .option("endpointUrl", s"https://kinesis.$awsRegion.amazonaws.com")
        .option("startingPosition", startingPosition)
        .option("maxFetchRecordsPerShard", maxRecordsPerFetch.toString)
        .load(),
      awsRegion)
}

object KinesisSourceAdapter {
  import org.apache.spark.sql.types.{BinaryType, StringType, StructField, StructType, TimestampType}

  /** The connector's output schema contract (spark-sql-kinesis): raw record
    * bytes + stream/shard bookkeeping. The contract test builds exactly
    * this shape.
    */
  val connectorSchema: StructType = StructType(Seq(
    StructField("data", BinaryType),
    StructField("streamName", StringType),
    StructField("partitionKey", StringType),
    StructField("sequenceNumber", StringType),
    StructField("approximateArrivalTimestamp", TimestampType)))

  /** Connector frame -> [[ShipperStream.recordSchema]]: re-encode the raw
    * bytes to base64 (the Lambda-event presentation, shipper.js:121-122)
    * and stamp the region the reader was built for.
    */
  def normalize(connector: DataFrame, awsRegion: String): DataFrame =
    connector.select(base64(col("data")).as("data"),
      lit(awsRegion).as("region"))
}
