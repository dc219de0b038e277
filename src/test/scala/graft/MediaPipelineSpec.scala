package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.multimodal.MediaPipeline

class MediaPipelineSpec extends AnyFunSuite {
  import SparkTestBase.{spark, sf}

  test("synthesized payloads are real-format bytes with derived params") {
    val bmp = MediaPipeline.synthesize(7L, "image")
    assert(bmp(0) == 'B'.toByte && bmp(1) == 'M'.toByte)
    val (w, h, raster) = graft.multimodal.MediaCodec.decodeBmp(bmp)
    assert(w == 4 + 7 % 6 && h == 4 + 7 % 5 && raster.length == 3 * w * h)
    val wav = MediaPipeline.synthesize(8L, "audio")
    assert(new String(wav.take(4), "US-ASCII") == "RIFF")
    val (rate, ch, samples) = graft.multimodal.MediaCodec.decodeWavPcm16(wav)
    assert(rate == 8000 && ch == 1 && samples.length == 16 + 8 % 48)
    val y4m = MediaPipeline.synthesize(9L, "video")
    assert(new String(y4m.take(9), "US-ASCII") == "YUV4MPEG2")
    val (vw, vh, frames) = graft.multimodal.MediaCodec.decodeY4m(y4m)
    assert(vw == 4 + 2 * (9 % 3) && vh == 4 + 2 * (9 % 2) &&
      frames.length == 1 + 9 % 5)
    // deterministic: same id → same bytes
    assert(MediaPipeline.synthesize(7L, "image")
      .sameElements(MediaPipeline.synthesize(7L, "image")))
  }

  test("decode is partition-count invariant") {
    val items = MediaPipeline.itemsFromDocuments(spark, sf)
    val one = MediaPipeline.decode(items.repartition(1)).collect().sortBy(_.doc_id)
    val many = MediaPipeline.decode(items.repartition(7)).collect().sortBy(_.doc_id)
    assert(one.length == many.length && one.length > 0)
    assert(one.zip(many).forall { case (a, b) => a == b })
  }

  test("frame sampling: bounds, monotonic, includes frame 0") {
    assert(MediaPipeline.sampleFrames(10, 4) == Seq(0, 2, 5, 7))
    assert(MediaPipeline.sampleFrames(3, 5) == Seq(0, 1, 2))
    assert(MediaPipeline.sampleFrames(0, 5).isEmpty)
    val s = MediaPipeline.sampleFrames(241, 16)
    assert(s.head == 0 && s == s.sorted && s.distinct == s && s.forall(_ < 241))
  }
}
