package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.{DecimalType, DoubleType}
import org.apache.spark.sql.Column

/** Testdata table loaders + oracle-parity numeric helpers. */
object Tables {
  def t(spark: SparkSession, dir: String, name: String): DataFrame =
    if (name == "events") events(spark, dir)
    else spark.read.parquet(s"$dir/$name.parquet")

  /** `events.ts` is parquet TIMESTAMP(NANOS), which Spark's vectorized reader
    * rejects outright. Read it as a long (legacy conf) and rebuild a
    * micro-precision timestamp with exact integer division (a double division
    * would lose precision above 2^53 ns — i.e. for any date after 1970).
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.read.parquet(s"$dir/events.parquet")
      .withColumn("ts",
        org.apache.spark.sql.functions.timestamp_micros(
          org.apache.spark.sql.functions.expr("ts div 1000")))
  }

  /** Exact-decimal cast for money/ratio doubles.
    *
    * Oracle-parity rule: never sum raw doubles — summation order differs
    * between Spark partitions and DuckDB, so hashes would drift. Casting the
    * (bit-identical) parquet doubles to decimal first makes every sum exact;
    * the final `toDouble` cast of an exact decimal is deterministic, so the
    * output doubles are bit-identical on both sides.
    */
  def dec(c: Column): Column = c.cast(DecimalType(12, 2))

  /** Small-scale decimal for discount/tax-like ratios. */
  def pct(c: Column): Column = c.cast(DecimalType(4, 2))

  def toDouble(c: Column): Column = c.cast(DoubleType)
}
