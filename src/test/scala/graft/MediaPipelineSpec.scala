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

  test("patchify: exact hand-computed sums on a 3x2 raster, odd split") {
    import spark.implicits._
    // w=3, h=2: with g=2 the x split is ⌊2x/3⌋ → x∈{0,1} left, x=2
    // right; y split ⌊2y/2⌋ → y=0 top, y=1 bottom. Raster bytes are
    // pixel-major RGB: value = 10*p + c for pixel p, channel c.
    val raster = Array.tabulate(3 * 3 * 2)(i => (10 * (i / 3) + i % 3).toByte)
    val bmp = graft.multimodal.MediaCodec.encodeBmp(3, 2, raster)
    val feats = MediaPipeline
      .patchify(Seq(graft.multimodal.MediaItem(5L, "image", bmp)).toDS(), 2)
      .collect().sortBy(_.patch)
    assert(feats.map(_.patch).toSeq == Seq(0, 1, 2, 3))
    def sumPx(ps: Seq[Int]) = ps.map(p => 30 * p + 3).sum // Σc(10p+c)=30p+3
    // patch 0 = pixels (0,0),(1,0) = p0,p1; patch 1 = (2,0) = p2;
    // patch 2 = (0,1),(1,1) = p3,p4; patch 3 = (2,1) = p5
    val want = Seq(Seq(0, 1), Seq(2), Seq(3, 4), Seq(5)).map(sumPx)
    assert(feats.map(_.sum_v).toSeq == want.map(_.toLong))
    assert(feats.map(_.n_vals).toSeq == Seq(6, 3, 6, 3))
    feats.foreach(f => assert(f.mean_v == f.sum_v.toDouble / f.n_vals))
    // every byte lands in exactly one patch
    assert(feats.map(_.n_vals).sum == raster.length)
  }

  test("frameAudio: exact hand-computed energies, signed amplitudes, odd split") {
    import spark.implicits._
    // 5 samples [1, -2, 3, 4, -5], g=2: frame = ⌊i·2/5⌋ → i∈{0,1,2}
    // frame 0, i∈{3,4} frame 1. Energies: 1+4+9=14 and 16+25=41 —
    // sign extension matters (an unsigned read of -2 would give 65534²).
    val samples = Array[Short](1, -2, 3, 4, -5)
    val wav = graft.multimodal.MediaCodec.encodeWavPcm16(8000, samples)
    val feats = MediaPipeline
      .frameAudio(Seq(graft.multimodal.MediaItem(3L, "audio", wav)).toDS(), 2)
      .collect().sortBy(_.frame)
    assert(feats.map(_.frame).toSeq == Seq(0, 1))
    assert(feats.map(_.n_samples).toSeq == Seq(3, 2))
    assert(feats.map(_.energy).toSeq == Seq(14L, 41L))
    feats.foreach(f =>
      assert(f.rms == math.sqrt(f.energy.toDouble / f.n_samples)))
    // every sample lands in exactly one frame
    assert(feats.map(_.n_samples).sum == samples.length)
  }

  test("motion: exact hand-computed SAD over consecutive Y4M frames") {
    import spark.implicits._
    // 4x2 C420 → 12 plane bytes/frame. Three frames: f0[j]=j,
    // f1[j]=2j, f2[j]=0 → SAD(0→1)=Σj=66, SAD(1→2)=Σ2j=132.
    val m = 12
    val f0 = Array.tabulate(m)(j => j.toByte)
    val f1 = Array.tabulate(m)(j => (2 * j).toByte)
    val f2 = new Array[Byte](m)
    val y4m = graft.multimodal.MediaCodec.encodeY4m(4, 2, Array(f0, f1, f2))
    val feats = MediaPipeline
      .motion(Seq(graft.multimodal.MediaItem(7L, "video", y4m)).toDS())
      .collect().sortBy(_.step)
    assert(feats.map(_.step).toSeq == Seq(1, 2))
    assert(feats.map(_.sad).toSeq == Seq(66L, 132L))
    assert(feats.forall(_.n_bytes == m))
    // a single-frame clip emits no transitions
    val one = graft.multimodal.MediaCodec.encodeY4m(4, 2, Array(f0))
    assert(MediaPipeline
      .motion(Seq(graft.multimodal.MediaItem(8L, "video", one)).toDS())
      .count() == 0)
  }
}
