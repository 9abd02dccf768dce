package graft

import org.apache.spark.sql.functions._

import graft.operators.Multimodal

/** Multimodal plumbing: manifest schema, batched decode/resize/frame-sample
  * contracts — with REAL kernels for PNG decode/resize (javax.imageio),
  * WAV decode (javax.sound.sampled), and multi-frame GIF frame extraction
  * (javax.imageio sequence API); only true video codecs stay stubbed, with
  * the batching/numbering/byte accounting still the real asserted surface.
  */
class MultimodalSpec extends SparkSpec {
  private lazy val media =
    Multimodal.manifest(Tables.t(spark, sf001, "documents"))

  test("encodePng emits a real PNG container; decode recovers dims + pixels") {
    val bytes = Multimodal.encodePng(37, 21, gray = 200)
    // PNG signature: 0x89 'P' 'N' 'G'
    assert((bytes(0) & 0xff) == 0x89 && bytes(1) == 'P' &&
      bytes(2) == 'N' && bytes(3) == 'G')
    val d = Multimodal.decodeImageBatch(Seq(Multimodal.MediaRecord(
      7L, "s", "image/png", 37, 21, bytes))).head
    assert(d.width == 37 && d.height == 21)
    assert(d.avg_px == 200.0 && d.min_px == 200 && d.max_px == 200)
  }

  test("decode kernel reads real pixels, not metadata (gradient image)") {
    // a NON-constant image: the kernel must report stats no manifest field
    // carries — proof the path decodes actual rasters
    val img = new java.awt.image.BufferedImage(16, 4,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 4; x <- 0 until 16) {
      val g = x * 16 + y
      img.setRGB(x, y, (g << 16) | (g << 8) | g)
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    val d = Multimodal.decodeImageBatch(Seq(Multimodal.MediaRecord(
      1L, "s", "image/png", 16, 4, bos.toByteArray))).head
    val expected = (for (y <- 0 until 4; x <- 0 until 16) yield x * 16 + y)
    assert(d.min_px == expected.min && d.max_px == expected.max)
    assert(math.abs(d.avg_px - expected.sum.toDouble / expected.size) < 1e-12)
  }

  test("real resize: bilinear resample preserves constant color at new dims") {
    val rec = Multimodal.MediaRecord(9L, "s", "image/png", 40, 30,
      Multimodal.encodePng(40, 30, gray = 77))
    val r = Multimodal.resizeImageBatch(Seq(rec), 16, 12).head
    assert(r.width == 16 && r.height == 12 && r.avg_px == 77.0)
  }

  test("decode kernel is format-agnostic: JPEG round-trips dims (lossy pixels near)") {
    // same kernel, different container: ImageIO sniffs the format from the
    // bytes, so a JPEG manifest needs zero code changes. JPEG is lossy —
    // dims are exact, pixels only near (tolerance covers the color-space
    // round-trip), which is exactly why the ORACLE queries use PNG.
    val img = new java.awt.image.BufferedImage(24, 18,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 18; x <- 0 until 24)
      img.setRGB(x, y, (120 << 16) | (120 << 8) | 120)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "jpg", bos)
    val d = Multimodal.decodeImageBatch(Seq(Multimodal.MediaRecord(
      3L, "s", "image/jpeg", 24, 18, bos.toByteArray))).head
    assert(d.width == 24 && d.height == 18)
    assert(math.abs(d.avg_px - 120.0) <= 2.0, s"avg drifted: ${d.avg_px}")
  }

  test("image manifest carries decodable PNGs through the distributed path") {
    val docs = Tables.t(spark, sf001, "documents")
    val decoded = Multimodal.decodeImages(Multimodal.imageManifest(docs))
    val n = docs.filter(col("doc_id") % 3 === 0).count()
    assert(decoded.count() == n)
    decoded.collect().take(10).foreach { d =>
      assert(d.width >= 8 && d.height >= 8)
      assert(d.min_px == d.max_px, "constant-gray source")
      assert(d.avg_px == (d.min_px: Double))
    }
  }

  test("encodeWav emits a real RIFF/WAVE container; decode recovers format + stats") {
    val bytes = Multimodal.encodeWav(nSamples = 101, sampleRate = 16000, amp = 5000)
    assert(bytes(0) == 'R' && bytes(1) == 'I' && bytes(2) == 'F' && bytes(3) == 'F')
    assert(bytes(8) == 'W' && bytes(9) == 'A' && bytes(10) == 'V' && bytes(11) == 'E')
    val d = Multimodal.decodeAudioBatch(Seq(Multimodal.MediaRecord(
      5L, "s", "audio/wav", 101, 16000, bytes))).head
    assert(d.n_samples == 101 && d.sample_rate == 16000 && d.channels == 1)
    assert(d.peak == 5000 && d.rms == 5000.0)
    // odd sample count: one more +amp than -amp
    assert(d.avg_sample == 5000.0 / 101)
  }

  test("audio kernel reads real samples, not metadata (linear ramp)") {
    // a NON-square waveform: stats only a genuine PCM pass can produce
    val n = 200
    val pcm = new Array[Byte](n * 2)
    for (i <- 0 until n) {
      val s = i * 10 // 0,10,...,1990
      pcm(2 * i) = (s & 0xff).toByte
      pcm(2 * i + 1) = ((s >> 8) & 0xff).toByte
    }
    val fmt = new javax.sound.sampled.AudioFormat(
      javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED,
      8000f, 16, 1, 2, 8000f, false)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, n.toLong)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    val d = Multimodal.decodeAudioBatch(Seq(Multimodal.MediaRecord(
      6L, "s", "audio/wav", n, 8000, bos.toByteArray))).head
    assert(d.peak == 1990)
    val mean = (0 until n).map(_ * 10).sum.toDouble / n
    assert(d.avg_sample == mean)
    val rms = math.sqrt((0 until n).map(i => (i * 10.0) * (i * 10)).sum / n)
    assert(math.abs(d.rms - rms) < 1e-9)
  }

  test("audio manifest carries decodable WAVs through the distributed path") {
    val docs = Tables.t(spark, sf001, "documents")
    val decoded = Multimodal.decodeAudio(Multimodal.audioManifest(docs))
    val n = docs.filter(col("doc_id") % 3 === 1).count()
    assert(decoded.count() == n)
    decoded.collect().take(10).foreach { d =>
      assert(d.n_samples >= 100 && d.sample_rate >= 8000 && d.channels == 1)
      assert(d.peak.toDouble == d.rms, "square wave: RMS equals peak")
    }
  }

  test("encodeGif emits a real multi-frame container; kernel decodes frames") {
    val bytes = Multimodal.encodeGif(10, 8, nFrames = 4, base = 100)
    assert(new String(bytes.take(3), "ASCII") == "GIF")
    val frames = Multimodal.gifFrameBatch(Seq(Multimodal.MediaRecord(
      2L, "s", "image/gif", 10, 8, bytes)), stride = 1)
    assert(frames.map(_.frame_no) == Seq(0, 1, 2, 3))
    frames.foreach { f =>
      assert(f.width == 10 && f.height == 8)
      assert(f.avg_px == ((100 + 7 * f.frame_no) % 256).toDouble)
    }
    // stride skips frames at the decode level, not after
    assert(Multimodal.gifFrameBatch(Seq(Multimodal.MediaRecord(
      2L, "s", "image/gif", 10, 8, bytes)), stride = 2)
      .map(_.frame_no) == Seq(0, 2))
  }

  test("GIF kernel reads real frame rasters (two-tone frame, not metadata)") {
    // a frame whose mean no manifest field carries: half 0, half 250.
    // 16x8, inside the verified envelope: the JDK GIF codec corrupts the
    // LAST ROW of very small frames (e.g. 8x2, 16x4 — an LZW edge);
    // exhaustively verified clean for 6..30 x 6..22, the gifManifest range
    val img = new java.awt.image.BufferedImage(16, 8,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 8; x <- 0 until 16) {
      val g = if (x < 8) 0 else 250
      img.setRGB(x, y, (g << 16) | (g << 8) | g)
    }
    val writer = javax.imageio.ImageIO.getImageWritersByFormatName("gif").next()
    val bos = new java.io.ByteArrayOutputStream()
    val ios = new javax.imageio.stream.MemoryCacheImageOutputStream(bos)
    writer.setOutput(ios)
    writer.prepareWriteSequence(null)
    writer.writeToSequence(new javax.imageio.IIOImage(img, null, null), null)
    writer.endWriteSequence()
    writer.dispose(); ios.close()
    val f = Multimodal.gifFrameBatch(Seq(Multimodal.MediaRecord(
      8L, "s", "image/gif", 16, 8, bos.toByteArray)), stride = 1).head
    assert(f.avg_px == 125.0)
  }

  test("encodeMjpegAvi emits a real RIFF/AVI container; kernel demuxes + decodes") {
    val bytes = Multimodal.encodeMjpegAvi(18, 11, nFrames = 4, base = 100)
    assert(new String(bytes.take(4), "ASCII") == "RIFF")
    assert(new String(bytes.slice(8, 12), "ASCII") == "AVI ")
    // genuine container structure: an hdrl list with an MJPG stream header
    val s = new String(bytes.take(200), "ISO-8859-1")
    assert(s.contains("hdrl") && s.contains("strh") && s.contains("MJPG"))
    // each demuxed frame is a standalone JPEG (SOI marker)
    val raw = Multimodal.parseAviFrames(bytes)
    assert(raw.size == 4)
    raw.foreach(f => assert(((f(0) & 0xff), (f(1) & 0xff)) == ((0xff, 0xd8)),
      "frame must start with JPEG SOI"))
    val frames = Multimodal.aviFrameBatch(Seq(Multimodal.MediaRecord(
      3L, "s", "video/x-msvideo", 18, 11, bytes)), stride = 1)
    assert(frames.map(_.frame_no) == Seq(0, 1, 2, 3))
    frames.foreach { f =>
      assert(f.width == 18 && f.height == 11)
      assert(f.avg_px == ((100 + 7 * f.frame_no) % 256).toDouble,
        "quality-1.0 constant JPEG frames round-trip bit-exactly")
    }
    // stride skips frames at the decode level, not after
    assert(Multimodal.aviFrameBatch(Seq(Multimodal.MediaRecord(
      3L, "s", "video/x-msvideo", 18, 11, bytes)), stride = 2)
      .map(_.frame_no) == Seq(0, 2))
  }

  test("AVI kernel reads real frame rasters (two-tone JPEG frame, not metadata)") {
    // a frame whose mean no manifest field carries: left half gray 0,
    // right half gray 250, boundary on the 8-px JPEG block edge so the
    // lossy codec reproduces it exactly at quality 1.0
    val img = new java.awt.image.BufferedImage(16, 16,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 16; x <- 0 until 16) {
      val g = if (x < 8) 0 else 250
      img.setRGB(x, y, (g << 16) | (g << 8) | g)
    }
    val avi = Multimodal.encodeAvi(16, 16, fps = 25,
      Seq(Multimodal.encodeJpeg(img)))
    val f = Multimodal.aviFrameBatch(Seq(Multimodal.MediaRecord(
      9L, "s", "video/x-msvideo", 16, 16, avi)), stride = 1).head
    assert(f.avg_px == 125.0)
  }

  test("AVI demuxer skips unknown chunks by declared size (JUNK tolerance)") {
    // players tolerate JUNK/INFO padding lists; so must a real demuxer.
    // Splice a JUNK chunk between hdrl and movi and expect identical frames.
    val bytes = Multimodal.encodeMjpegAvi(10, 10, nFrames = 3, base = 5)
    val moviAt = {
      val s = new String(bytes, "ISO-8859-1")
      s.indexOf("movi") - 8 // back up over the LIST header
    }
    assert(moviAt > 12)
    val junkBody = Array.fill[Byte](17)(0x4a) // odd size exercises padding
    val junk = Array.concat("JUNK".getBytes("US-ASCII"),
      Array[Byte](17, 0, 0, 0), junkBody, Array[Byte](0))
    val spliced = Array.concat(bytes.take(moviAt), junk, bytes.drop(moviAt))
    // patch the RIFF size field (little-endian u32 at offset 4)
    val newSz = spliced.length - 8
    spliced(4) = (newSz & 0xff).toByte
    spliced(5) = ((newSz >> 8) & 0xff).toByte
    spliced(6) = ((newSz >> 16) & 0xff).toByte
    spliced(7) = ((newSz >> 24) & 0xff).toByte
    val a = Multimodal.parseAviFrames(bytes).map(_.toSeq)
    val b = Multimodal.parseAviFrames(spliced).map(_.toSeq)
    assert(a == b, "JUNK chunk must not change demuxed frames")
  }

  test("avi manifest carries decodable MJPEG videos through the distributed path") {
    val docs = Tables.t(spark, sf001, "documents")
    val decoded = Multimodal.aviFrames(Multimodal.aviManifest(docs), stride = 2)
    val expected = docs.filter(col("doc_id") % 3 === 2)
      .select(col("doc_id"), ((col("doc_id") % 4) + 2).as("n"))
      .collect().map(r => r.getLong(0) ->
        (0 until r.getLong(1).toInt).count(_ % 2 == 0)).toMap
    val got = decoded.collect().groupBy(_.doc_id).map { case (k, v) => k -> v.length }
    assert(got == expected, "every 2nd frame of every AVI decodes")
    // blobs stay narrow: no Exchange in the frame-sampling plan
    val plan = decoded.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"AVI sampling must not shuffle:\n$plan")
  }

  test("decode: every record decodes once, checksum = payload byte sum") {
    val decoded = Multimodal.decode(media).collect()
    assert(decoded.length == media.count())
    val byId = decoded.map(d => d.doc_id -> d).toMap
    media.collect().take(20).foreach { r =>
      val d = byId(r.doc_id)
      assert(d.n_bytes == r.payload.length.toLong)
      assert(d.checksum == r.payload.map(_ & 0xffL).sum)
    }
  }

  test("frame sample: every stride-th chunk, exact byte accounting") {
    val frames = Multimodal.frameSample(media, stride = 2).collect()
    val byDoc = frames.groupBy(_.doc_id)
    media.collect().take(20).foreach { r =>
      val chunks = (r.payload.length + Multimodal.frameBytes - 1) /
        Multimodal.frameBytes
      val fs = byDoc.getOrElse(r.doc_id, Array.empty).sortBy(_.frame_no)
      assert(fs.map(_.frame_no).toSeq == (0 until chunks).filter(_ % 2 == 0))
      // all bytes accounted for: full frames + possibly short last frame
      fs.foreach { f =>
        val expected = math.min(Multimodal.frameBytes,
          r.payload.length - f.frame_no * Multimodal.frameBytes)
        assert(f.n_bytes == expected && f.payload.length == expected)
      }
    }
  }

  test("resize: metadata updated, bytes scale with area ratio, never grow") {
    val resized = Multimodal.resize(media, 32, 32).collect()
    assert(resized.length == media.count())
    resized.foreach { r =>
      assert(r.width == 32 && r.height == 32)
      assert(r.n_bytes >= 1L)
    }
    val orig = media.collect().map(r => r.doc_id -> r.payload.length).toMap
    resized.foreach(r => assert(r.n_bytes <= math.max(1L, orig(r.doc_id))))
  }

  test("blobs stay out of shuffles: frame sampling is a narrow map") {
    val plan = Multimodal.frameSample(media, 2)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"frame sampling must not shuffle:\n$plan")
  }

  test("pixel dedup sees through container re-encoding (png vs bmp)") {
    val docs = Tables.t(spark, sf001, "documents")
    val media = Multimodal.mixedImageManifest(docs)
    val hashed = Multimodal.pixelHashes(media).collect()
    val groups = hashed.groupBy(_.pixel_md5).values.filter(_.size >= 2)
    assert(groups.nonEmpty, "fixture must produce duplicate rasters")
    val cross = groups.filter(_.map(_.container).distinct.size == 2)
    assert(cross.nonEmpty, "expect duplicate sets spanning png AND bmp")
    // the cross-container members are BYTE-distinct payloads — a
    // byte-level dedup would have missed exactly these pairs
    val byId = media.collect().map(m => m.doc_id -> m.payload).toMap
    cross.foreach { g =>
      val payloads = g.map(m => byId(m.doc_id).toSeq)
      assert(payloads.distinct.size > 1,
        s"cross-container group ${g.map(_.doc_id)} should differ in bytes")
    }
    // and the dedup operator reports the same accounting
    val dedup = Multimodal.pixelDedup(media).collect()
    assert(dedup.count(_.getLong(4) == 2) == cross.size)
    // blobs stay narrow: hashing has no Exchange before the digest agg
    val plan = Multimodal.pixelHashes(media)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"),
      s"pixel hashing must not shuffle payloads:\n$plan")
  }
}
