package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.ConnectedComponents

/**
 * Property pins for the large-star/small-star connected components
 * (VERDICT r2 stretch item): label-for-label agreement with GraphX's
 * Pregel CC on random graphs AND on the pathological shape the star
 * alternation exists for — a long path, where plain min-propagation
 * needs O(diameter) rounds but the star contraction stays O(log² n).
 */
class StarCCSpec extends AnyFunSuite {
  import SparkTestBase.spark

  private def compare(edges: Seq[(Long, Long)]): Unit = {
    import spark.implicits._
    val df = edges.toDF("a", "b")
    val star = ConnectedComponents.runStar(df).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    val gx = ConnectedComponents.runGraphX(df).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(star == gx, s"star=$star\ngraphx=$gx")
  }

  test("long path (diameter 199) matches GraphX within the iteration cap") {
    compare((0L until 199L).map(i => (i, i + 1)))
  }

  test("random multigraphs with self-loops match GraphX (fixed seeds)") {
    val rnd = new scala.util.Random(7)
    (1 to 5).foreach { _ =>
      val n = 50 + rnd.nextInt(50)
      val m = 30 + rnd.nextInt(80)
      val edges = Seq.fill(m)((rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
      compare(edges)
    }
  }

  test("self-loop-only nodes keep their own label") {
    compare(Seq((5L, 5L), (1L, 2L)))
  }

  test("two separate cliques get two labels") {
    val k1 = for (i <- 0L to 3L; j <- (i + 1) to 3L) yield (i, j)
    val k2 = for (i <- 10L to 13L; j <- (i + 1) to 13L) yield (i, j)
    compare(k1 ++ k2)
  }
}
