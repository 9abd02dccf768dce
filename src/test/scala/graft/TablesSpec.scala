package graft

import java.nio.file.Files

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Schema-robustness for the `events` loader.
  *
  * The driver's testdata generator has shipped `events.ts` in two parquet
  * shapes across rounds: TIMESTAMP(NANOS) (resolvable only as a raw long via
  * `spark.sql.legacy.parquet.nanosAsLong`) and TIMESTAMP(MICROS,
  * isAdjustedToUTC=false) (resolves as TIMESTAMP_NTZ). `Tables.events` must
  * load either to the same session-zone micro-precision timestamps so a
  * generator change can never again break the whole events query family.
  */
class TablesSpec extends SparkSpec {

  // One row per interesting case: epoch, a post-2^53-ns instant (double math
  // would corrupt it), and a sub-second value exercising micro precision.
  private val micros = Seq(0L, 1700000000123456L, 987654L)

  private def tmp(name: String): String = {
    val d = Files.createTempDirectory(s"graft-$name").toFile
    d.deleteOnExit()
    d.getAbsolutePath
  }

  private def loadedMicros(dir: String): Seq[Long] = {
    val df = Tables.events(spark, dir)
    assert(df.schema("ts").dataType === TimestampType)
    df.select(unix_micros(col("ts"))).collect().map(_.getLong(0)).toSeq.sorted
  }

  test("events loads ts written as TIMESTAMP_NTZ (micros) parquet") {
    val dir = tmp("ntz")
    val rows = micros.map(m => Row(java.time.LocalDateTime.ofEpochSecond(
      m / 1000000L, (m % 1000000L).toInt * 1000, java.time.ZoneOffset.UTC)))
    spark.createDataFrame(
        spark.sparkContext.parallelize(rows, 1),
        StructType(Seq(StructField("ts", TimestampNTZType))))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    assert(loadedMicros(dir) === micros.sorted)
  }

  test("events loads ts written as nanos-long parquet") {
    val dir = tmp("nanos")
    // The legacy nanosAsLong read path resolves TIMESTAMP(NANOS) to LongType —
    // identical to a plain int64 column, which is what we can write from here.
    spark.createDataFrame(
        spark.sparkContext.parallelize(micros.map(m => Row(m * 1000L)), 1),
        StructType(Seq(StructField("ts", LongType))))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    assert(loadedMicros(dir) === micros.sorted)
  }

  test("events loads the driver-generated testdata with a timestamp ts") {
    val df = Tables.events(spark, sf001)
    assert(df.schema("ts").dataType === TimestampType)
    assert(df.limit(1).count() === 1L)
  }
}
