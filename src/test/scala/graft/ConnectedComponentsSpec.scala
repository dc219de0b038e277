package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.ConnectedComponents

/** Min-label propagation must find transitive components — chains force
 * multiple iterations, which a single pairwise pass would get wrong. */
class ConnectedComponentsSpec extends AnyFunSuite {
  import SparkTestBase.spark

  test("chain, pair, and triangle resolve to min-id components") {
    import spark.implicits._
    // chain 1-2-3-4 (diameter 3), pair 10-11, triangle 20-21-22
    val edges = Seq((2L, 1L), (2L, 3L), (3L, 4L),
      (10L, 11L), (20L, 21L), (21L, 22L), (20L, 22L)).toDF("a", "b")
    val got = ConnectedComponents.run(edges).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val want = Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L, 20L -> 20L, 21L -> 20L, 22L -> 20L)
    assert(got == want)
  }

  test("GraphX variant produces identical components") {
    import spark.implicits._
    val edges = Seq((2L, 1L), (2L, 3L), (3L, 4L),
      (10L, 11L), (20L, 21L), (21L, 22L), (20L, 22L)).toDF("a", "b")
    val df = ConnectedComponents.run(edges).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val gx = ConnectedComponents.runGraphX(edges).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(gx == df)
  }

  test("all three variants return empty labels on an empty edge set") {
    // a corpus with no near-duplicates yields an EMPTY pair table — a
    // real pipeline input, not a degenerate one. runStar and runGraphX
    // always handled it; run()'s decimal label-sum convergence read the
    // empty aggregate's SQL null into compareTo and NPE'd (r20 review).
    import spark.implicits._
    val empty = Seq.empty[(Long, Long)].toDF("a", "b")
    assert(ConnectedComponents.run(empty).count() == 0)
    assert(ConnectedComponents.runStar(empty).count() == 0)
    assert(ConnectedComponents.runGraphX(empty).count() == 0)
  }
}
