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
      // FHCRC: low 16 bits of the CRC32 over the header so far (JDK
      // GZIPInputStream.readHeader verifies this — so does GzipCodec)
      val hdr = out.toByteArray
      val hcrc = new CRC32(); hcrc.update(hdr)
      out.write((hcrc.getValue & 0xff).toInt)
      out.write(((hcrc.getValue >> 8) & 0xff).toInt)
      out.write(buf, 0, n)
      def le32(v: Long): Unit =
        (0 to 3).foreach(i => out.write(((v >> (8 * i)) & 0xff).toInt))
      le32(crc.getValue); le32(body.length.toLong)
      out.toByteArray
    }
    assert(GzipCodec.gunzip(member(payload)).toSeq == payload.toSeq)
    // a wrong FHCRC must throw (JDK: "Corrupt GZIP header")
    val badHcrc = member(payload)
    // FHCRC bytes sit right after the FCOMMENT terminator
    val hcrcPos = 10 + 2 + 3 + 5 + 8
    badHcrc(hcrcPos) = (badHcrc(hcrcPos) ^ 0xff).toByte
    intercept[ZipException](GzipCodec.gunzip(badHcrc))
    // concatenated members decode to concatenated bodies (RFC 1952 §2.2)
    val two = member(payload) ++ member("second".getBytes("UTF-8"))
    assert(new String(GzipCodec.gunzip(two), "UTF-8") == "flagged contentsecond")
    // trailing non-gzip garbage after the last member is silently ignored
    // (JDK GZIPInputStream.readTrailer swallows a malformed next header)
    val padded = member(payload) ++ Array.fill[Byte](32)(0x55)
    assert(GzipCodec.gunzip(padded).toSeq == payload.toSeq)
    // corrupt CRC trailer must throw, not return garbage
    val corrupt = member(payload)
    corrupt(corrupt.length - 6) = (corrupt(corrupt.length - 6) ^ 0xff).toByte
    intercept[ZipException](GzipCodec.gunzip(corrupt))
    // truncated stream must throw
    intercept[Exception](
      GzipCodec.gunzip(member(payload).dropRight(9)))
    // truncation INSIDE an optional header field must be the same loud
    // EOFException as a truncated body, not ArrayIndexOutOfBounds
    val hdrOnly = member(payload).take(14) // cut mid-FNAME scan
    intercept[java.io.EOFException](GzipCodec.gunzip(hdrOnly))
    // non-gzip bytes must throw the GZIPInputStream error
    intercept[ZipException](GzipCodec.gunzip("plain".getBytes))
  }

  test("gunzip/JDK parity on lenient and strict edges") {
    // Differential check against GZIPInputStream on the exact edge cases
    // the hand parser re-implements.
    import java.util.zip.GZIPInputStream
    def jdk(b: Array[Byte]): Array[Byte] = {
      val in = new GZIPInputStream(new java.io.ByteArrayInputStream(b))
      val out = new java.io.ByteArrayOutputStream()
      val buf = new Array[Byte](4096)
      var k = in.read(buf)
      while (k >= 0) { out.write(buf, 0, k); k = in.read(buf) }
      out.toByteArray
    }
    val body = "parity".getBytes("UTF-8")
    val base = GzipCodec.gzip(body)
    // trailing garbage of assorted lengths: JDK ignores; so must we
    for (pad <- Seq(1, 9, 17, 18, 26, 100)) {
      val padded = base ++ Array.fill[Byte](pad)(0x21)
      assert(jdk(padded).toSeq == body.toSeq)
      assert(GzipCodec.gunzip(padded).toSeq == body.toSeq)
    }
    // a VALID concatenated member is decoded by both
    val twice = base ++ base
    assert(jdk(twice).toSeq == (body ++ body).toSeq)
    assert(GzipCodec.gunzip(twice).toSeq == (body ++ body).toSeq)
  }

  test("null propagates (nullIntolerant)") {
    import spark.implicits._
    val out = Seq(Option.empty[Array[Byte]]).toDF("b")
      .select(gunzip(col("b"))).collect().head
    assert(out.isNullAt(0))
  }
}
