package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.multimodal.MediaPipeline

class MediaPipelineSpec extends AnyFunSuite {
  import SparkTestBase.{spark, sf}

  test("stub decode is deterministic and metadata is plausible") {
    val (w1, h1, f1, c1) = MediaPipeline.decodeStub("hello media".getBytes)
    val (w2, h2, f2, c2) = MediaPipeline.decodeStub("hello media".getBytes)
    assert((w1, h1, f1, c1) == (w2, h2, f2, c2))
    assert(w1 >= 64 && h1 >= 64 && f1 >= 1 && c1 >= 0)
    val (w3, _, _, c3) = MediaPipeline.decodeStub("other payload".getBytes)
    assert(c3 != c1 || w3 != w1)
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
