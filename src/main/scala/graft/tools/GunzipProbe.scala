package graft.tools

/** Micro-probe: per-call cost of the allocating GZIPInputStream gunzip vs
  * a thread-reused raw Inflater on a CloudWatch-sized payload.
  */
object GunzipProbe {
  def main(args: Array[String]): Unit = {
    val payload =
      ("""{"messageType":"DATA_MESSAGE","logGroup":"/aws/lambda/rate-fn-3",""" +
        """"logStream":"2024/01/01/[$LATEST]r","logEvents":[{"id":"12345",""" +
        """"timestamp":12345,"message":"rate event 12345"}]}""").getBytes("UTF-8")
    val gz = graft.functions.GzipCodec.gzip(payload)
    val n = 300000

    def time(name: String)(f: => Array[Byte]): Unit = {
      var i = 0
      while (i < n / 10) { f; i += 1 } // warm
      val t0 = System.nanoTime()
      i = 0
      var sink = 0
      while (i < n) { sink += f.length; i += 1 }
      val ns = (System.nanoTime() - t0).toDouble / n
      println(f"$name%-18s ${ns / 1000}%8.2f us/call  (sink=$sink)")
    }

    time("GzipCodec.gunzip")(graft.functions.GzipCodec.gunzip(gz))

    time("GZIPInputStream (old)") {
      val in = new java.util.zip.GZIPInputStream(
        new java.io.ByteArrayInputStream(gz), 8192)
      val out = new java.io.ByteArrayOutputStream(math.max(64, gz.length * 4))
      val buf = new Array[Byte](8192)
      var n = in.read(buf)
      while (n >= 0) { out.write(buf, 0, n); n = in.read(buf) }
      in.close()
      out.toByteArray
    }

    time("GzipCodec.gzip")(graft.functions.GzipCodec.gzip(payload))
  }
}
