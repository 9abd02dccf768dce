package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column handling: media as opaque `binary` payloads + typed
  * metadata, with batch decode/feature-extract plumbing.
  *
  * The IMAGE path is REAL: [[encodePng]]/[[decodeImageBatch]]/
  * [[resizeImageBatch]] run actual PNG encode/decode/resample through the
  * JDK's `javax.imageio` + `java.awt` (zero new dependencies). The AUDIO
  * path is REAL too: [[encodeWav]]/[[decodeAudioBatch]] write and parse
  * genuine RIFF/WAVE PCM16 containers through `javax.sound.sampled`
  * (pure file-format work — no audio device, runs headless). The
  * video-shaped FRAME path is real too: [[encodeGif]]/[[gifFrameBatch]]
  * write and per-frame-decode genuine multi-frame (animated) GIF
  * containers. Only true video CODECS (H.264 etc., genuinely absent from
  * this container) keep STUBBED stand-ins — for those, everything
  * Spark-side is still
  * real and load-bearing: the schema (binary payload + metadata struct),
  * the partition-batched execution (`mapPartitions` with fixed-size
  * batches, the same shape a Pandas-UDF/Arrow path has in PySpark), and
  * the downstream aggregation. Swapping a stub for a real JNI/FFI decoder
  * changes nothing in the plan — the PNG path is the proof.
  *
  * Scale notes: payloads never pass through a shuffle here — decode is a
  * narrow map; only the small decoded features aggregate. At 100 TB you
  * keep blobs in their own parquet column (columnar pruning skips them when
  * untouched) and size `spark.sql.files.maxPartitionBytes` so one task's
  * batch of blobs fits executor memory.
  */
object Multimodal {

  /** A media record: opaque payload + closed metadata. */
  case class MediaRecord(doc_id: Long, source: String, mime: String,
                         width: Int, height: Int, payload: Array[Byte])

  /** Decoded features (what a real decoder would emit per blob). */
  case class DecodedMedia(doc_id: Long, source: String, mime: String,
                          n_bytes: Long, first_byte: Int, checksum: Long)

  /** Batch size for the decode kernel — models the Arrow batch shape. */
  val decodeBatchSize = 64

  /** Build a media manifest from the documents table: text bytes stand in
    * for the blob; metadata is derived deterministically.
    */
  def manifest(docs: DataFrame): Dataset[MediaRecord] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(
        col("doc_id"),
        col("source"),
        when(col("doc_id") % 3 === 0, "image/png")
          .when(col("doc_id") % 3 === 1, "audio/wav")
          .otherwise("video/mp4").as("mime"),
        (col("n_chars") % 640).cast("int").as("width"),
        (col("doc_id") % 480).cast("int").as("height"),
        encode(col("text"), "UTF-8").as("payload"))
      .as[MediaRecord]
  }

  /** STUB decode kernel: deterministic fake in place of a real media
    * decoder (`???`-equivalent, clearly marked). Consumes a whole batch at
    * once — the real-world contract (decoders amortize setup per batch).
    */
  def decodeBatch(batch: Seq[MediaRecord]): Seq[DecodedMedia] =
    batch.map { r =>
      // STUB: real impl would decode r.payload via an image/audio library.
      val first = if (r.payload.nonEmpty) r.payload(0) & 0xff else -1
      var sum = 0L
      var i = 0
      while (i < r.payload.length) { sum += (r.payload(i) & 0xffL); i += 1 }
      DecodedMedia(r.doc_id, r.source, r.mime, r.payload.length.toLong, first, sum)
    }

  /** Partition-batched decode: narrow map, fixed-size batches. */
  def decode(media: Dataset[MediaRecord]): Dataset[DecodedMedia] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions(_.grouped(decodeBatchSize).flatMap(decodeBatch))
  }

  /** One sampled frame of a media payload. */
  case class MediaFrame(doc_id: Long, frame_no: Int, n_bytes: Int,
                        payload: Array[Byte])

  /** A resized media record (metadata updated, payload re-encoded). */
  case class ResizedMedia(doc_id: Long, mime: String, width: Int,
                          height: Int, n_bytes: Long)

  /** Frame size for the stub frame-sampler (stands in for a codec's GOP). */
  val frameBytes = 256

  /** STUB frame-sample kernel: every `stride`-th fixed-size chunk of the
    * payload stands in for a decoded video frame. A real implementation
    * decodes the container and samples keyframes; the batch contract,
    * frame numbering, and byte accounting here are the real plumbing.
    */
  def frameSampleBatch(batch: Seq[MediaRecord],
                       stride: Int): Seq[MediaFrame] =
    batch.flatMap { r =>
      val chunks = (r.payload.length + frameBytes - 1) / frameBytes
      (0 until chunks).filter(_ % stride == 0).map { c =>
        val start = c * frameBytes
        val len = math.min(frameBytes, r.payload.length - start)
        MediaFrame(r.doc_id, c, len,
          java.util.Arrays.copyOfRange(r.payload, start, start + len))
      }
    }

  /** Partition-batched frame sampling (narrow flatMap — frames multiply
    * rows but never shuffle; downstream ops decide what aggregates).
    */
  def frameSample(media: Dataset[MediaRecord],
                  stride: Int = 2): Dataset[MediaFrame] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions(
      _.grouped(decodeBatchSize).flatMap(frameSampleBatch(_, stride)))
  }

  /** STUB resize kernel: output bytes scale with the target-area ratio
    * (a real implementation re-encodes pixels; metadata + size accounting
    * are the real plumbing).
    */
  def resizeBatch(batch: Seq[MediaRecord], w: Int, h: Int): Seq[ResizedMedia] =
    batch.map { r =>
      val srcArea = math.max(1L, r.width.toLong * r.height.toLong)
      val ratio = math.min(1.0, (w.toLong * h.toLong).toDouble / srcArea)
      ResizedMedia(r.doc_id, r.mime, w, h,
        math.max(1L, (r.payload.length * ratio).toLong))
    }

  /** Partition-batched resize. */
  def resize(media: Dataset[MediaRecord], w: Int,
             h: Int): Dataset[ResizedMedia] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions(
      _.grouped(decodeBatchSize).flatMap(resizeBatch(_, w, h)))
  }

  // ---------------------------------------------------------------------
  // REAL image kernels (javax.imageio — JDK only, no new dependencies)
  // ---------------------------------------------------------------------

  /** Pixel stats of a decoded image (gray channel of TYPE_INT_RGB). */
  case class DecodedImage(doc_id: Long, width: Int, height: Int,
                          avg_px: Double, min_px: Int, max_px: Int)

  /** A genuinely re-encoded resized image's stats. */
  case class ResizedImage(doc_id: Long, width: Int, height: Int,
                          avg_px: Double)

  // ImageIO's default scratch cache is a temp FILE per encode/decode; the
  // kernels below hand ImageIO explicit in-memory image streams instead,
  // which sidesteps the file cache WITHOUT flipping the JVM-global
  // `ImageIO.setUseCache` switch (a load-order-dependent side effect on
  // every other ImageIO user in the executor process).
  private def readImage(bytes: Array[Byte]): java.awt.image.BufferedImage = {
    val iis = new javax.imageio.stream.MemoryCacheImageInputStream(
      new java.io.ByteArrayInputStream(bytes))
    // ImageIO.read(ImageInputStream) closes the stream itself — except on
    // the null (no-registered-reader) return, where we must
    val img = javax.imageio.ImageIO.read(iis)
    if (img == null) iis.close()
    img
  }

  /** Deterministic constant-gray PNG — a REAL PNG container written by the
    * JDK encoder (signature, IHDR, zlib-compressed IDAT), so the decode
    * side exercises a full real parse, while every pixel statistic stays
    * closed-form for the DuckDB oracle (constant images survive any
    * resampling kernel bit-exactly).
    */
  def encodePng(width: Int, height: Int, gray: Int): Array[Byte] =
    encodeImage(width, height, gray, "png")

  /** Constant-gray image in any ImageIO-writable container (`png`, `bmp`,
    * …) — the SAME raster in DIFFERENT byte encodings, which is exactly
    * what container-invariant dedup ([[pixelDedup]]) must see through.
    */
  def encodeImage(width: Int, height: Int, gray: Int,
                  format: String): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(width, height,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    val rgb = (gray << 16) | (gray << 8) | gray
    var y = 0
    while (y < height) {
      var x = 0
      while (x < width) { img.setRGB(x, y, rgb); x += 1 }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    val ios = new javax.imageio.stream.MemoryCacheImageOutputStream(bos)
    try {
      if (!javax.imageio.ImageIO.write(img, format, ios))
        throw new IllegalArgumentException(s"no ImageIO writer for $format")
    } finally ios.close()
    bos.toByteArray
  }

  private def pixelStats(img: java.awt.image.BufferedImage): (Double, Int, Int) = {
    val (w, h) = (img.getWidth, img.getHeight)
    var sum = 0L
    var mn = 255
    var mx = 0
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val g = img.getRGB(x, y) & 0xff // gray == blue channel here
        sum += g
        if (g < mn) mn = g
        if (g > mx) mx = g
        x += 1
      }
      y += 1
    }
    (sum.toDouble / (w.toLong * h), mn, mx)
  }

  /** REAL image decode kernel: full PNG parse via ImageIO, pixel-stat pass
    * over the decoded raster. Batch contract identical to the stubs'.
    */
  def decodeImageBatch(batch: Seq[MediaRecord]): Seq[DecodedImage] =
    batch.map { r =>
      val img = readImage(r.payload)
      require(img != null, s"undecodable image payload for doc ${r.doc_id}")
      val (avg, mn, mx) = pixelStats(img)
      DecodedImage(r.doc_id, img.getWidth, img.getHeight, avg, mn, mx)
    }

  /** Partition-batched real image decode (narrow map, like [[decode]]). */
  def decodeImages(media: Dataset[MediaRecord]): Dataset[DecodedImage] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions(_.grouped(decodeBatchSize).flatMap(decodeImageBatch))
  }

  /** REAL resize kernel: decode, bilinear resample through Graphics2D onto
    * a `w x h` raster, re-measure pixels from the resized image.
    */
  def resizeImageBatch(batch: Seq[MediaRecord], w: Int,
                       h: Int): Seq[ResizedImage] =
    batch.map { r =>
      val src = readImage(r.payload)
      require(src != null, s"undecodable image payload for doc ${r.doc_id}")
      val dst = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      val g2 = dst.createGraphics()
      try {
        g2.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
          java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
        g2.drawImage(src, 0, 0, w, h, null)
      } finally g2.dispose()
      val (avg, _, _) = pixelStats(dst)
      ResizedImage(r.doc_id, w, h, avg)
    }

  /** Partition-batched real image resize. */
  def resizeImages(media: Dataset[MediaRecord], w: Int,
                   h: Int): Dataset[ResizedImage] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions(
      _.grouped(decodeBatchSize).flatMap(resizeImageBatch(_, w, h)))
  }

  // ---------------------------------------------------------------------
  // REAL audio kernels (javax.sound.sampled — JDK only, no new deps).
  // WAV parse is pure file-format work: no audio device is touched, so
  // these run headless on any executor.
  // ---------------------------------------------------------------------

  /** Decoded-audio features from a REAL RIFF/WAVE parse. */
  case class DecodedAudio(doc_id: Long, n_samples: Long, sample_rate: Int,
                          channels: Int, peak: Int, rms: Double,
                          avg_sample: Double)

  /** Deterministic mono PCM16 WAV — a REAL RIFF/WAVE container written by
    * the JDK encoder (RIFF header, fmt chunk, data chunk). The waveform is
    * a full-scale square wave (sample i = +amp when i is even, -amp when
    * odd), so every decoded statistic stays closed-form for the DuckDB
    * oracle: peak = amp, rms = sqrt(n*amp^2/n) = amp exactly (amp^2 is an
    * exact double and IEEE sqrt of a perfect square is exact), and the
    * mean is 0 (even n) or amp/n (odd n) — the identical integer division
    * both engines perform.
    */
  def encodeWav(nSamples: Int, sampleRate: Int, amp: Int): Array[Byte] = {
    require(amp <= Short.MaxValue, s"amp $amp overflows PCM16")
    val pcm = new Array[Byte](nSamples * 2)
    var i = 0
    while (i < nSamples) {
      val s = if (i % 2 == 0) amp else -amp
      pcm(2 * i) = (s & 0xff).toByte // little-endian PCM16
      pcm(2 * i + 1) = ((s >> 8) & 0xff).toByte
      i += 1
    }
    val fmt = new javax.sound.sampled.AudioFormat(
      javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED,
      sampleRate.toFloat, 16, 1, 2, sampleRate.toFloat, false)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, nSamples.toLong)
    val bos = new java.io.ByteArrayOutputStream()
    try javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    finally ais.close()
    bos.toByteArray
  }

  /** REAL audio decode kernel: full RIFF/WAVE parse via AudioSystem
    * (header + fmt validation, frame accounting), then a PCM16LE pass for
    * peak / RMS / mean over all interleaved channels. Batch contract
    * identical to the image kernels'.
    */
  def decodeAudioBatch(batch: Seq[MediaRecord]): Seq[DecodedAudio] =
    batch.map { r =>
      val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(r.payload))
      try {
        val f = ais.getFormat
        require(f.getEncoding ==
          javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED &&
          f.getSampleSizeInBits == 16 && !f.isBigEndian,
          s"unsupported WAV format for doc ${r.doc_id}: $f")
        val bytes = ais.readAllBytes()
        val n = bytes.length / 2
        var peak = 0
        var sum = 0L
        var sumSq = 0L
        var i = 0
        while (i < n) {
          val s = ((bytes(2 * i) & 0xff) | (bytes(2 * i + 1) << 8)).toShort.toInt
          val a = math.abs(s)
          if (a > peak) peak = a
          sum += s
          sumSq += s.toLong * s
          i += 1
        }
        val samples = n.toLong / f.getChannels
        DecodedAudio(r.doc_id, samples, f.getSampleRate.toInt, f.getChannels,
          peak, math.sqrt(sumSq.toDouble / n), sum.toDouble / n)
      } finally ais.close()
    }

  /** Partition-batched real audio decode (narrow map, like [[decode]]). */
  def decodeAudio(media: Dataset[MediaRecord]): Dataset[DecodedAudio] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions(_.grouped(decodeBatchSize).flatMap(decodeAudioBatch))
  }

  /** Audio manifest with REAL WAV payloads: the `audio/wav` document slice
    * carries an actual RIFF/WAVE container (sample count / rate / amplitude
    * derived deterministically from metadata, so decoded stats stay
    * oracle-expressible while the bytes are a genuine file format).
    */
  def audioManifest(docs: DataFrame): Dataset[MediaRecord] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.filter(col("doc_id") % 3 === 1)
      .select(col("doc_id"), col("source"),
        ((col("n_chars") % 2000) + 100).cast("int").as("n_samples"),
        (lit(8000) + (col("doc_id") % 4) * 4000).cast("int").as("rate"))
      .as[(Long, String, Int, Int)]
      .mapPartitions(_.map { case (id, src, n, rate) =>
        MediaRecord(id, src, "audio/wav", n, rate,
          encodeWav(n, rate, ((id % 120) + 1).toInt * 250))
      })
  }

  // ---------------------------------------------------------------------
  // REAL frame extraction (multi-frame GIF via javax.imageio — JDK only).
  // GIF is the one multi-frame container the JDK both writes and reads,
  // so the video-shaped path (container -> per-frame decode -> sampled
  // frame stats) runs a genuine parse end to end; only true video codecs
  // (H.264 etc.) remain out of reach in this build.
  // ---------------------------------------------------------------------

  /** One decoded frame's stats out of a real multi-frame container. */
  case class DecodedFrame(doc_id: Long, frame_no: Int, width: Int,
                          height: Int, avg_px: Double)

  /** Deterministic multi-frame GIF: `nFrames` constant-gray frames (frame f
    * = gray `(base + 7f) % 256`), written through the JDK GIF encoder's
    * sequence API — a genuine animated-GIF container (header, palette,
    * per-frame image descriptors). Constant frames survive palette
    * quantization exactly, keeping per-frame stats closed-form.
    *
    * Caveat: the JDK GIF codec corrupts the LAST ROW of very small
    * frames (observed at 8x2 and 16x4 — an LZW edge); exhaustively
    * verified clean for every dimension [[gifManifest]] emits
    * (6..30 x 6..22) — keep frames at least 6x6.
    */
  def encodeGif(width: Int, height: Int, nFrames: Int, base: Int): Array[Byte] = {
    val writer = javax.imageio.ImageIO.getImageWritersByFormatName("gif").next()
    val bos = new java.io.ByteArrayOutputStream()
    val ios = new javax.imageio.stream.MemoryCacheImageOutputStream(bos)
    try {
      writer.setOutput(ios)
      writer.prepareWriteSequence(null)
      var f = 0
      while (f < nFrames) {
        val g = (base + 7 * f) % 256
        val img = new java.awt.image.BufferedImage(width, height,
          java.awt.image.BufferedImage.TYPE_INT_RGB)
        val rgb = (g << 16) | (g << 8) | g
        var y = 0
        while (y < height) {
          var x = 0
          while (x < width) { img.setRGB(x, y, rgb); x += 1 }
          y += 1
        }
        writer.writeToSequence(new javax.imageio.IIOImage(img, null, null), null)
        f += 1
      }
      writer.endWriteSequence()
    } finally {
      writer.dispose()
      ios.close()
    }
    bos.toByteArray
  }

  /** REAL frame-sampling kernel: open the container once, read every
    * `stride`-th frame through the GIF decoder, measure the decoded
    * raster. Same batch contract as the stub [[frameSampleBatch]] — this
    * is the kernel a real keyframe sampler swaps in.
    */
  def gifFrameBatch(batch: Seq[MediaRecord], stride: Int): Seq[DecodedFrame] =
    batch.flatMap { r =>
      val reader = javax.imageio.ImageIO.getImageReadersByFormatName("gif").next()
      val iis = new javax.imageio.stream.MemoryCacheImageInputStream(
        new java.io.ByteArrayInputStream(r.payload))
      try {
        reader.setInput(iis)
        val n = reader.getNumImages(true)
        (0 until n).filter(_ % stride == 0).map { f =>
          val img = reader.read(f)
          val (avg, _, _) = pixelStats(img)
          DecodedFrame(r.doc_id, f, img.getWidth, img.getHeight, avg)
        }
      } finally {
        reader.dispose()
        iis.close()
      }
    }

  /** Partition-batched real frame sampling (narrow flatMap, like
    * [[frameSample]] — frames multiply rows but never shuffle).
    */
  def gifFrames(media: Dataset[MediaRecord],
                stride: Int = 2): Dataset[DecodedFrame] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions(
      _.grouped(decodeBatchSize).flatMap(gifFrameBatch(_, stride)))
  }

  // ---------------------------------------------------------------------
  // REAL video container: MJPEG-in-AVI (RIFF writer + parser, JDK only).
  // AVI is the classic RIFF video container; MJPEG ("MJPG" fourcc) streams
  // are just per-frame JPEG images in '00dc' chunks, which ImageIO decodes
  // natively. So a hand-written RIFF/AVI muxer + demuxer makes the VIDEO
  // path real end to end — genuine container (headers, stream format,
  // movi list, idx1 index), genuine per-frame codec decode — with zero new
  // dependencies. Only inter-frame codecs (H.264 etc.) stay out of reach.
  //
  // Lossiness note: JPEG is lossy in general, but at quality 1.0 the quant
  // tables are all-ones, and any frame whose 8x8 blocks are each constant
  // (constant frames; tone boundaries on block edges) round-trips
  // BIT-EXACTLY (verified for all 256 grays) — which keeps per-frame pixel
  // stats closed-form for the DuckDB oracle while the bytes are a real
  // lossy-codec bitstream.
  // ---------------------------------------------------------------------

  /** One constant-gray JPEG at quality 1.0 (all-ones quant tables). */
  def encodeJpeg(img: java.awt.image.BufferedImage): Array[Byte] = {
    val writer = javax.imageio.ImageIO.getImageWritersByFormatName("jpeg").next()
    val param = writer.getDefaultWriteParam
    param.setCompressionMode(javax.imageio.ImageWriteParam.MODE_EXPLICIT)
    param.setCompressionQuality(1.0f)
    val bos = new java.io.ByteArrayOutputStream()
    val ios = new javax.imageio.stream.MemoryCacheImageOutputStream(bos)
    try {
      writer.setOutput(ios)
      writer.write(null, new javax.imageio.IIOImage(img, null, null), param)
    } finally {
      writer.dispose()
      ios.close()
    }
    bos.toByteArray
  }

  private def constantImage(width: Int, height: Int, gray: Int): java.awt.image.BufferedImage = {
    val img = new java.awt.image.BufferedImage(width, height,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    val rgb = (gray << 16) | (gray << 8) | gray
    var y = 0
    while (y < height) {
      var x = 0
      while (x < width) { img.setRGB(x, y, rgb); x += 1 }
      y += 1
    }
    img
  }

  /** Mux pre-encoded JPEG frames into a genuine RIFF/AVI container: avih
    * main header, strh/strf stream headers (fourcc "MJPG", 24-bit DIB
    * format block), the 'movi' LIST of '00dc' frame chunks (word-aligned,
    * as RIFF requires), and the idx1 keyframe index. Layout per the
    * public AVI RIFF spec (msdn "AVI RIFF File Reference").
    */
  def encodeAvi(width: Int, height: Int, fps: Int,
                frames: Seq[Array[Byte]]): Array[Byte] = {
    val bb = new java.io.ByteArrayOutputStream()
    def u32(v: Long): Array[Byte] = Array[Byte](
      (v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
    def u16(v: Int): Array[Byte] = Array[Byte](
      (v & 0xff).toByte, ((v >> 8) & 0xff).toByte)
    def fcc(s: String): Array[Byte] = s.getBytes("US-ASCII")
    val maxFrame = if (frames.isEmpty) 0 else frames.map(_.length).max
    // avih: usec/frame, maxBytesPerSec, padding, flags(HASINDEX), total
    // frames, initialFrames, streams, suggestedBuf, w, h, reserved[4]
    val avih = Array.concat(u32(1000000L / math.max(1, fps)),
      u32(maxFrame.toLong * fps), u32(0), u32(0x10), u32(frames.size),
      u32(0), u32(1), u32(maxFrame), u32(width), u32(height),
      u32(0), u32(0), u32(0), u32(0))
    // strh: fccType vids, handler MJPG, flags, prio+lang, initialFrames,
    // scale, rate (fps = rate/scale), start, length, suggestedBuf,
    // quality, sampleSize, rcFrame
    val strh = Array.concat(fcc("vids"), fcc("MJPG"), u32(0), u16(0), u16(0),
      u32(0), u32(1), u32(fps), u32(0), u32(frames.size), u32(maxFrame),
      u32(10000), u32(0), u16(0), u16(0), u16(width), u16(height))
    // strf: BITMAPINFOHEADER with biCompression = 'MJPG'
    val strf = Array.concat(u32(40), u32(width), u32(height), u16(1), u16(24),
      fcc("MJPG"), u32(width.toLong * height * 3), u32(0), u32(0), u32(0), u32(0))
    def chunk(id: String, body: Array[Byte]): Array[Byte] = {
      val pad = if (body.length % 2 == 1) Array[Byte](0) else Array.empty[Byte]
      Array.concat(fcc(id), u32(body.length), body, pad)
    }
    def list(kind: String, body: Array[Byte]): Array[Byte] =
      Array.concat(fcc("LIST"), u32(body.length + 4L), fcc(kind), body)
    val strl = list("strl", Array.concat(chunk("strh", strh), chunk("strf", strf)))
    val hdrl = list("hdrl", Array.concat(chunk("avih", avih), strl))
    val frameChunks = frames.map(chunk("00dc", _))
    val movi = list("movi", Array.concat(frameChunks: _*))
    // idx1 offsets are relative to the 'movi' fourcc position; the first
    // chunk starts right after the 4-byte list type, i.e. offset 4
    val offsets = frameChunks.scanLeft(4L)((off, c) => off + c.length).init
    val idx1 = chunk("idx1", Array.concat(
      frames.zip(offsets).map { case (f, off) =>
        Array.concat(fcc("00dc"), u32(0x10), u32(off), u32(f.length))
      }: _*))
    val body = Array.concat(fcc("AVI "), hdrl, movi, idx1)
    bb.write(fcc("RIFF"))
    bb.write(u32(body.length.toLong))
    bb.write(body)
    bb.toByteArray
  }

  /** Constant-frame MJPEG/AVI: frame f is constant gray `(base+7f) % 256`
    * (same progression as [[encodeGif]]), each a real quality-1.0 JPEG.
    */
  def encodeMjpegAvi(width: Int, height: Int, nFrames: Int,
                     base: Int): Array[Byte] =
    encodeAvi(width, height, fps = 25,
      (0 until nFrames).map(f =>
        encodeJpeg(constantImage(width, height, (base + 7 * f) % 256))))

  /** Demux a RIFF/AVI payload: validate the RIFF/'AVI ' signature, walk
    * top-level chunks to the 'movi' LIST, and return every video frame
    * chunk's bytes ('NNdc' compressed / 'NNdb' uncompressed ids) in
    * stream order. A real demuxer — unknown chunks are skipped by their
    * declared (word-aligned) size, exactly how players tolerate extra
    * lists like INFO or JUNK.
    */
  def parseAviFrames(payload: Array[Byte]): Seq[Array[Byte]] = {
    def fourcc(off: Int): String =
      new String(payload, off, 4, "US-ASCII")
    def u32(off: Int): Long =
      (payload(off) & 0xffL) | ((payload(off + 1) & 0xffL) << 8) |
        ((payload(off + 2) & 0xffL) << 16) | ((payload(off + 3) & 0xffL) << 24)
    require(payload.length >= 12 && fourcc(0) == "RIFF" && fourcc(8) == "AVI ",
      "not a RIFF/AVI payload")
    val frames = scala.collection.mutable.ArrayBuffer.empty[Array[Byte]]
    var off = 12
    val end = math.min(payload.length.toLong, 8L + u32(4)).toInt
    while (off + 8 <= end) {
      val id = fourcc(off)
      val sz = u32(off + 4).toInt
      if (id == "LIST" && fourcc(off + 8) == "movi") {
        var p = off + 12
        val listEnd = off + 8 + sz
        while (p + 8 <= listEnd) {
          val cid = fourcc(p)
          val csz = u32(p + 4).toInt
          if (cid.endsWith("dc") || cid.endsWith("db"))
            frames += java.util.Arrays.copyOfRange(payload, p + 8, p + 8 + csz)
          p += 8 + csz + (csz % 2) // RIFF chunks are word-aligned
        }
      }
      off += 8 + sz + (sz % 2)
    }
    frames.toSeq
  }

  /** REAL video frame-sampling kernel: demux the AVI container, decode
    * every `stride`-th JPEG frame through ImageIO, measure the decoded
    * raster. Same batch contract and output row as [[gifFrameBatch]].
    */
  def aviFrameBatch(batch: Seq[MediaRecord], stride: Int): Seq[DecodedFrame] =
    batch.flatMap { r =>
      val frames = parseAviFrames(r.payload)
      frames.indices.filter(_ % stride == 0).map { f =>
        val img = readImage(frames(f))
        require(img != null, s"undecodable AVI frame $f for doc ${r.doc_id}")
        val (avg, _, _) = pixelStats(img)
        DecodedFrame(r.doc_id, f, img.getWidth, img.getHeight, avg)
      }
    }

  /** Partition-batched real video frame sampling (narrow flatMap). */
  def aviFrames(media: Dataset[MediaRecord],
                stride: Int = 2): Dataset[DecodedFrame] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions(
      _.grouped(decodeBatchSize).flatMap(aviFrameBatch(_, stride)))
  }

  /** Video-slice manifest with REAL MJPEG/AVI payloads (dims / frame count
    * / base gray derived deterministically from metadata). Constant frames
    * at quality 1.0 round-trip bit-exactly at ANY dims — JPEG's block
    * padding replicates edges, so padded blocks stay constant and the
    * all-ones quant tables preserve the DC term (verified for all 256
    * grays across odd/even dims).
    */
  def aviManifest(docs: DataFrame): Dataset[MediaRecord] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.filter(col("doc_id") % 3 === 2)
      .select(col("doc_id"), col("source"),
        ((col("n_chars") % 24) + 8).cast("int").as("width"),
        ((col("doc_id") % 16) + 8).cast("int").as("height"),
        ((col("doc_id") % 4) + 2).cast("int").as("frames"))
      .as[(Long, String, Int, Int, Int)]
      .mapPartitions(_.map { case (id, src, w, h, n) =>
        MediaRecord(id, src, "video/x-msvideo", w, h,
          encodeMjpegAvi(w, h, n, (id % 200).toInt))
      })
  }

  /** Video-slice manifest with REAL multi-frame GIF payloads (frame count /
    * dims / base gray derived deterministically from metadata).
    */
  def gifManifest(docs: DataFrame): Dataset[MediaRecord] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.filter(col("doc_id") % 3 === 2)
      .select(col("doc_id"), col("source"),
        ((col("n_chars") % 24) + 6).cast("int").as("width"),
        ((col("doc_id") % 16) + 6).cast("int").as("height"),
        ((col("doc_id") % 5) + 2).cast("int").as("frames"))
      .as[(Long, String, Int, Int, Int)]
      .mapPartitions(_.map { case (id, src, w, h, n) =>
        MediaRecord(id, src, "image/gif", w, h,
          encodeGif(w, h, n, (id % 200).toInt))
      })
  }

  /** Image manifest with REAL PNG payloads: the `image/png` document slice
    * carries an actual encoded PNG (dims + constant gray derived
    * deterministically from metadata, so decoded stats stay
    * oracle-expressible while the bytes are a genuine container).
    */
  def imageManifest(docs: DataFrame): Dataset[MediaRecord] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.filter(col("doc_id") % 3 === 0)
      .select(col("doc_id"), col("source"),
        ((col("n_chars") % 64) + 8).cast("int").as("width"),
        ((col("doc_id") % 48) + 8).cast("int").as("height"))
      .as[(Long, String, Int, Int)]
      .mapPartitions(_.map { case (id, src, w, h) =>
        MediaRecord(id, src, "image/png", w, h,
          encodePng(w, h, (id % 256).toInt))
      })
  }

  /** Per-image canonical pixel digest. */
  case class PixelHashed(doc_id: Long, container: String, width: Int,
                         height: Int, pixel_md5: String)

  /** Image manifest with MIXED containers: the same deterministic constant
    * raster goes out as PNG or BMP — byte-distinct payloads that are
    * pixel-identical whenever their (w, h, gray) collide, the re-encoded-
    * duplicate shape web-scraped image corpora are full of. Dims/gray are
    * deliberately coarse so collisions exist at test scale, and the
    * container choice keys on `(n_chars / 16) % 2` — INDEPENDENT of the
    * (doc_id-mod, n_chars-mod-16) collision lattice, so duplicate sets
    * genuinely span both encodings.
    */
  def mixedImageManifest(docs: DataFrame): Dataset[MediaRecord] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.filter(col("doc_id") % 3 === 0)
      .select(col("doc_id"), col("source"),
        ((col("n_chars") % 16) + 8).cast("int").as("width"),
        ((col("doc_id") % 8) + 8).cast("int").as("height"),
        (floor(col("n_chars") / 16).cast("long") % 2).cast("int").as("alt"))
      .as[(Long, String, Int, Int, Int)]
      .mapPartitions(_.map { case (id, src, w, h, alt) =>
        val fmt = if (alt == 0) "png" else "bmp"
        MediaRecord(id, src, s"image/$fmt", w, h,
          encodeImage(w, h, ((id % 16) * 16).toInt, fmt))
      })
  }

  /** REAL canonicalization kernel: full container parse via ImageIO, then
    * md5 over the decoded raster (dims + row-major 24-bit RGB) — the
    * digest identifies the IMAGE, not its encoding.
    */
  def pixelHashBatch(batch: Seq[MediaRecord]): Seq[PixelHashed] =
    batch.map { r =>
      val img = readImage(r.payload)
      require(img != null, s"undecodable image payload for doc ${r.doc_id}")
      val (w, h) = (img.getWidth, img.getHeight)
      val md = java.security.MessageDigest.getInstance("MD5")
      md.update(java.nio.ByteBuffer.allocate(8).putInt(w).putInt(h).array())
      val row = new Array[Byte](w * 3)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val rgb = img.getRGB(x, y)
          row(x * 3) = ((rgb >> 16) & 0xff).toByte
          row(x * 3 + 1) = ((rgb >> 8) & 0xff).toByte
          row(x * 3 + 2) = (rgb & 0xff).toByte
          x += 1
        }
        md.update(row)
        y += 1
      }
      PixelHashed(r.doc_id, r.mime, w, h,
        md.digest().map("%02x".format(_)).mkString)
    }

  /** Partition-batched pixel canonicalization (narrow map — blobs never
    * leave their scan partition; only the 16-byte digest + dims flow on).
    */
  def pixelHashes(media: Dataset[MediaRecord]): Dataset[PixelHashed] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions(_.grouped(decodeBatchSize).flatMap(pixelHashBatch))
  }

  /** Container-invariant image dedup: group by the canonical pixel digest,
    * keep groups of >= 2, account how many DISTINCT container formats each
    * duplicate set spans (n_containers = 2 is the proof a byte-level dedup
    * would have missed the pair). Exactly the exact-dedup plan shape —
    * one shuffle of digests, never of image bytes.
    */
  def pixelDedup(media: Dataset[MediaRecord]): DataFrame =
    pixelHashes(media)
      .groupBy(col("pixel_md5"))
      .agg(min(col("doc_id")).as("rep_doc_id"),
        min(col("width")).as("width"),
        min(col("height")).as("height"),
        count(lit(1)).as("n_dups"),
        count_distinct(col("container")).as("n_containers"))
      .where(col("n_dups") >= 2)
      .select(col("rep_doc_id"), col("width"), col("height"),
        col("n_dups"), col("n_containers"))

  /** End-to-end: manifest -> batched decode -> per-(source, mime) stats. */
  def decodeStats(spark: SparkSession, docs: DataFrame): DataFrame =
    decode(manifest(docs))
      .groupBy(col("source"), col("mime"))
      .agg(
        count(lit(1)).as("n_media"),
        sum(col("n_bytes")).as("total_bytes"),
        (sum(col("n_bytes")).cast("double") / count(lit(1))).as("avg_bytes"),
        min(col("first_byte")).as("min_first_byte"),
        sum(col("checksum")).as("total_checksum"))
}
