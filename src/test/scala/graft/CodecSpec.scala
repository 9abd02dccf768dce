package graft

import graft.functions.GzipCodec
import graft.functions.gcolumns.{gunzip, gzip}
import org.apache.spark.sql.functions._

/** Property tests for the custom gzip Catalyst expressions (S2/S3). */
class CodecSpec extends SparkSpec {

  test("JVM codec round-trip property (seeded random corpora)") {
    val rnd = new scala.util.Random(42)
    for (n <- Seq(0, 1, 7, 256, 65536, 1 << 20)) {
      val bytes = new Array[Byte](n)
      rnd.nextBytes(bytes)
      assert(GzipCodec.gunzip(GzipCodec.gzip(bytes)).toSeq == bytes.toSeq)
    }
  }

  test("expression round-trip through codegen path") {
    import spark.implicits._
    val strings = Seq("", "hello", "x" * 100000, "unicode: 你好 ñ é")
    val df = strings.toDF("s")
    val back = df.select(gunzip(gzip(encode(col("s"), "UTF-8"))).cast("string").as("s"))
      .as[String].collect().toSeq
    assert(back == strings)
  }

  test("gunzip matches the base64+gzip envelope encoding of CloudWatch") {
    // bytes produced independently via java.util's streams (what AWS does)
    val payload = """{"messageType":"DATA_MESSAGE"}"""
    val gz = GzipCodec.gzip(payload.getBytes("UTF-8"))
    val b64 = java.util.Base64.getEncoder.encodeToString(gz)
    import spark.implicits._
    val out = Seq(b64).toDF("data")
      .select(gunzip(unbase64(col("data"))).cast("string").as("s"))
      .as[String].collect().head
    assert(out == payload)
  }

  test("null propagates (nullIntolerant)") {
    import spark.implicits._
    val out = Seq(Option.empty[Array[Byte]]).toDF("b")
      .select(gunzip(col("b"))).collect().head
    assert(out.isNullAt(0))
  }
}
