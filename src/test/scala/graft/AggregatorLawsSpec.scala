package graft

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.{MinHashAgg, SimHashAgg}

/**
 * The algebraic laws that make the custom aggregators safe under
 * Spark's partial aggregation: however the engine splits the input
 * across partitions (reduce locally, merge in any grouping), the result
 * must equal a single sequential fold. A violation here would be an
 * order-dependent aggregate that returns different results at different
 * parallelism — the class of bug that only shows at scale.
 */
class AggregatorLawsSpec extends AnyFunSuite {

  private def check(prop: Prop): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(200), prop)
    assert(res.passed, res.status.toString)
  }

  private val hashesGen: Gen[List[Long]] = Gen.listOf(Gen.long)
  private val md5Gen: Gen[String] =
    Gen.listOfN(32, Gen.oneOf("0123456789abcdef".toSeq)).map(_.mkString)
  private val md5sGen: Gen[List[String]] = Gen.listOf(md5Gen)
  private val cutGen: Gen[Int] = Gen.chooseNum(0, 100)

  test("MinHashAgg: split-reduce-merge equals one sequential fold") {
    check(Prop.forAll(hashesGen, cutGen) { (xs, cutPct) =>
      val agg = new MinHashAgg(8)
      val whole = xs.foldLeft(agg.zero)(agg.reduce).toSeq
      val (l, r) = xs.splitAt(xs.size * cutPct / 100)
      val merged = agg.merge(l.foldLeft(agg.zero)(agg.reduce),
        r.foldLeft(agg.zero)(agg.reduce)).toSeq
      merged == whole
    })
  }

  test("SimHashAgg: split-reduce-merge equals one sequential fold") {
    check(Prop.forAll(md5sGen, cutGen) { (xs, cutPct) =>
      val agg = new SimHashAgg
      val whole = agg.finish(xs.foldLeft(agg.zero)(agg.reduce))
      val (l, r) = xs.splitAt(xs.size * cutPct / 100)
      val merged = agg.finish(agg.merge(l.foldLeft(agg.zero)(agg.reduce),
        r.foldLeft(agg.zero)(agg.reduce)))
      merged == whole
    })
  }
}
