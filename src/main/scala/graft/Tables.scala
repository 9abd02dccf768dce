package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.{DecimalType, DoubleType}
import org.apache.spark.sql.Column

/** Testdata table loaders + oracle-parity numeric helpers. */
object Tables {
  def t(spark: SparkSession, dir: String, name: String): DataFrame =
    if (name == "events") events(spark, dir)
    else spark.read.parquet(s"$dir/$name.parquet")

  /** Schema-adaptive `events` loader. The testdata generator has shipped
    * `ts` as parquet TIMESTAMP(NANOS) (which Spark's vectorized reader only
    * accepts as a raw long via the legacy conf) and as TIMESTAMP(MICROS,
    * isAdjustedToUTC=false) (which resolves to TIMESTAMP_NTZ). Inspect the
    * resolved type and normalize either shape to a session-zone timestamp:
    *  - LongType (nanos-as-long): rebuild with exact integer division —
    *    a double division would lose precision above 2^53 ns, i.e. for any
    *    date after 1970.
    *  - TIMESTAMP_NTZ: reinterpret the wall-clock value in the session zone
    *    (UTC everywhere in this repo), matching what the DuckDB oracle sees.
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions.{col, expr, timestamp_micros}
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    // The legacy conf is required for Spark to even RESOLVE a
    // TIMESTAMP(NANOS) column, and it is consulted again at scan planning
    // time (lazily, at the first action on the returned frame), so it
    // cannot be set-and-restored around the read — for a nanos file it
    // must persist for the session. Footer-based detection keeps that
    // session mutation scoped to files that actually need it; for every
    // other shape the loader now has no side effect at all.
    if (tsIsParquetNanos(spark, dir))
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = spark.read.parquet(s"$dir/events.parquet")
    raw.schema("ts").dataType match {
      case LongType =>
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType =>
        raw.withColumn("ts", col("ts").cast(TimestampType))
      case TimestampType => raw
      case other =>
        throw new IllegalStateException(s"events.ts: unsupported parquet type $other")
    }
  }

  /** True iff `events.parquet` stores `ts` as INT64 TIMESTAMP(NANOS) —
    * read straight from one part file's footer with parquet-java, so the
    * detection itself needs no session conf.
    */
  private def tsIsParquetNanos(spark: SparkSession, dir: String): Boolean = {
    import org.apache.parquet.hadoop.ParquetFileReader
    import org.apache.parquet.hadoop.util.HadoopInputFile
    import org.apache.parquet.schema.LogicalTypeAnnotation
    val conf = spark.sparkContext.hadoopConfiguration
    val root = new org.apache.hadoop.fs.Path(s"$dir/events.parquet")
    val fs = root.getFileSystem(conf)
    // `events.parquet` is either a single file (the driver's pyarrow
    // writer) or a Spark-written directory of part files — one footer is
    // authoritative either way (single-writer invariant).
    val file = fs.listStatus(root).map(_.getPath)
      .find(_.getName.endsWith(".parquet"))
      .getOrElse(throw new IllegalStateException(s"no parquet files under $root"))
    val reader = ParquetFileReader.open(HadoopInputFile.fromPath(file, conf))
    try {
      val schema = reader.getFooter.getFileMetaData.getSchema
      schema.containsField("ts") && {
        val t = schema.getType(schema.getFieldIndex("ts"))
        t.isPrimitive && (t.getLogicalTypeAnnotation match {
          case ts: LogicalTypeAnnotation.TimestampLogicalTypeAnnotation =>
            ts.getUnit == LogicalTypeAnnotation.TimeUnit.NANOS
          case _ => false
        })
      }
    } finally reader.close()
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
