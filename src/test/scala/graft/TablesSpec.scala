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

  test("events loader has no session side effect for non-nanos files") {
    // VERDICT r10 #3: the loader used to set
    // spark.sql.legacy.parquet.nanosAsLong unconditionally — a global
    // mutation inside a table loader. It is now footer-gated: loading any
    // non-TIMESTAMP(NANOS) events file must leave the conf untouched, so
    // other readers in the same session are unaffected.
    val key = "spark.sql.legacy.parquet.nanosAsLong"
    spark.conf.unset(key) // back to the registered default ("false")
    Tables.events(spark, sf001).limit(1).count()        // driver NTZ shape
    assert(spark.conf.get(key) === "false")
    val dir = tmp("plain-long")
    spark.createDataFrame(
        spark.sparkContext.parallelize(micros.map(m => Row(m * 1000L)), 1),
        StructType(Seq(StructField("ts", LongType))))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    Tables.events(spark, dir).limit(1).count()          // plain-int64 shape
    assert(spark.conf.get(key) === "false")
  }

  // Early-warning drift guard, generalized from the round-9 break: the
  // driver regenerates /root/testdata between rounds and has already
  // changed a column's physical type once (events.ts). If regeneration
  // drifts ANY table's loaded shape, fail HERE with the exact column —
  // not as dozens of downstream query errors. Expected shapes are the
  // post-`Tables.t`-normalization schemas as of round 10.
  private val expectedSchemas = Map(
    "region" -> Seq("r_regionkey" -> "int", "r_name" -> "string"),
    "nation" -> Seq("n_nationkey" -> "int", "n_name" -> "string",
      "n_regionkey" -> "int"),
    "customer" -> Seq("c_custkey" -> "bigint", "c_name" -> "string",
      "c_nationkey" -> "int", "c_acctbal" -> "double",
      "c_mktsegment" -> "string"),
    "supplier" -> Seq("s_suppkey" -> "bigint", "s_name" -> "string",
      "s_nationkey" -> "int", "s_acctbal" -> "double"),
    "part" -> Seq("p_partkey" -> "bigint", "p_name" -> "string",
      "p_brand" -> "string", "p_type" -> "string", "p_size" -> "int",
      "p_retailprice" -> "double"),
    "orders" -> Seq("o_orderkey" -> "bigint", "o_custkey" -> "bigint",
      "o_orderstatus" -> "string", "o_totalprice" -> "double",
      "o_orderdate" -> "timestamp_ntz", "o_orderpriority" -> "string"),
    "lineitem" -> Seq("l_orderkey" -> "bigint", "l_partkey" -> "bigint",
      "l_suppkey" -> "bigint", "l_linenumber" -> "int",
      "l_quantity" -> "double", "l_extendedprice" -> "double",
      "l_discount" -> "double", "l_tax" -> "double",
      "l_returnflag" -> "string", "l_linestatus" -> "string",
      // raw NTZ passthrough (oracle-parity: DuckDB sees the same naive
      // micros; only `events.ts` is normalized, because only it has
      // SHIPPED in two different physical types)
      "l_shipdate" -> "timestamp_ntz"),
    "events" -> Seq("event_id" -> "bigint", "ts" -> "timestamp",
      "user_id" -> "bigint", "event_type" -> "string",
      "value" -> "double", "props" -> "string"),
    "documents" -> Seq("doc_id" -> "bigint", "text" -> "string",
      "lang" -> "string", "source" -> "string", "n_chars" -> "bigint"),
    "embeddings" -> Seq("vec_id" -> "bigint",
      "embedding" -> "array<float>", "label" -> "int"))

  test("documents text is pure ASCII (the text_fingerprint oracle assumes it)") {
    // the DuckDB rolling-hash oracle reads bytes via ascii(char), which
    // equals the UTF-8 byte only for ASCII — if a regeneration plants
    // non-ASCII text, fail here with a count instead of as a hash mismatch
    val nonAscii = Tables.t(spark, sf001, "documents")
      .filter(octet_length(col("text")) =!= length(col("text"))).count()
    assert(nonAscii === 0L,
      s"$nonAscii documents contain non-ASCII text; rewrite the " +
        "text_fingerprint oracle to fold real UTF-8 bytes")
  }

  test("documents tokens stay under 32 bytes (the dedup_simhash oracle assumes it)") {
    // the DuckDB XXH64 replay implements only the <32-byte path (tokens at
    // or above 32 bytes enter the 4-lane stripe loop it does not unroll);
    // max observed token across sf0.001/0.01/0.1 is 8 bytes — if a
    // regeneration plants long tokens, fail here with the count instead of
    // as a dedup_simhash hash mismatch
    val longToks = Tables.t(spark, sf001, "documents")
      .select(explode(split(col("text"), " ")).as("tok"))
      .filter(octet_length(col("tok")) >= 32).count()
    assert(longToks === 0L,
      s"$longToks tokens >= 32 bytes; extend the dedup_simhash oracle " +
        "with XXH64's stripe loop before trusting its hashes")
  }

  test("documents text has no control chars (the text_bpe oracle assumes it)") {
    // the unrolled-merge BPE replay encodes each word's unit sequence as a
    // chr(1)-delimited string — a corpus word containing U+0001 would
    // corrupt the state encoding; if a regeneration plants control bytes,
    // fail here with the count instead of as a text_bpe hash mismatch
    val ctl = Tables.t(spark, sf001, "documents")
      .filter(col("text").rlike("[\\x00-\\x08]")).count()
    assert(ctl === 0L,
      s"$ctl documents contain C0 control bytes; pick a different " +
        "delimiter for the text_bpe oracle's unit-state encoding")
  }

  test("driver-generated tables keep their round-10 loaded schemas") {
    val drift = expectedSchemas.toSeq.sortBy(_._1).flatMap {
      case (name, expected) =>
        val got = Tables.t(spark, sf001, name).schema.fields.toSeq
          .map(f => f.name -> f.dataType.simpleString)
        if (got == expected) None
        else Some(s"$name: expected $expected, got $got")
    }
    assert(drift.isEmpty,
      "testdata regeneration drifted these tables (update loaders AND " +
        "oracles together):\n" + drift.mkString("\n"))
  }
}
