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

  // The r10 hand-parsed gunzip (thread-reused Inflater) must keep every
  // GZIPInputStream behavior: RFC 1952 flag fields, member concatenation,
  // and loud failure on corruption/truncation.
  test("gunzip handles header flag fields, concatenation, and corruption") {
    import java.io.ByteArrayOutputStream
    import java.util.zip.{Deflater, CRC32, ZipException}
    val payload = "flagged content".getBytes("UTF-8")
    // hand-build a member with FEXTRA + FNAME + FCOMMENT + FHCRC set
    def member(body: Array[Byte]): Array[Byte] = {
      val d = new Deflater(Deflater.DEFAULT_COMPRESSION, true)
      d.setInput(body); d.finish()
      val buf = new Array[Byte](4096)
      val n = d.deflate(buf); d.end()
      val crc = new CRC32(); crc.update(body)
      val out = new ByteArrayOutputStream()
      out.write(Array[Byte](0x1f.toByte, 0x8b.toByte, 8, (4 | 8 | 16 | 2).toByte,
        0, 0, 0, 0, 0, 0))
      out.write(Array[Byte](3, 0)); out.write(Array[Byte](9, 9, 9)) // FEXTRA
      out.write("name".getBytes); out.write(0) // FNAME
      out.write("comment".getBytes); out.write(0) // FCOMMENT
      out.write(Array[Byte](0x42, 0x42)) // FHCRC (value unchecked, as JDK)
      out.write(buf, 0, n)
      def le32(v: Long): Unit =
        (0 to 3).foreach(i => out.write(((v >> (8 * i)) & 0xff).toInt))
      le32(crc.getValue); le32(body.length.toLong)
      out.toByteArray
    }
    assert(GzipCodec.gunzip(member(payload)).toSeq == payload.toSeq)
    // concatenated members decode to concatenated bodies (RFC 1952 §2.2)
    val two = member(payload) ++ member("second".getBytes("UTF-8"))
    assert(new String(GzipCodec.gunzip(two), "UTF-8") == "flagged contentsecond")
    // corrupt CRC trailer must throw, not return garbage
    val corrupt = member(payload)
    corrupt(corrupt.length - 6) = (corrupt(corrupt.length - 6) ^ 0xff).toByte
    intercept[ZipException](GzipCodec.gunzip(corrupt))
    // truncated stream must throw
    intercept[Exception](
      GzipCodec.gunzip(member(payload).dropRight(9)))
    // non-gzip bytes must throw the GZIPInputStream error
    intercept[ZipException](GzipCodec.gunzip("plain".getBytes))
  }

  test("null propagates (nullIntolerant)") {
    import spark.implicits._
    val out = Seq(Option.empty[Array[Byte]]).toDF("b")
      .select(gunzip(col("b"))).collect().head
    assert(out.isNullAt(0))
  }
}
