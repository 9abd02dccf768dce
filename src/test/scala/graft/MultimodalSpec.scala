package graft

import org.apache.spark.sql.functions._

import graft.operators.Multimodal

/** Multimodal plumbing: manifest schema, batched decode/resize/frame-sample
  * contracts (kernels are documented stubs; the batching, numbering, and
  * byte accounting are the real, asserted surface).
  */
class MultimodalSpec extends SparkSpec {
  private lazy val media =
    Multimodal.manifest(Tables.t(spark, sf001, "documents"))

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
}
