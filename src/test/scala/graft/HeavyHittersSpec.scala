package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.functions.{HeavyHittersAgg, HHState}

/**
 * Pins for the SpaceSaving heavy-hitters aggregator:
 *  - EXACT regime (capacity ≥ distinct keys): any split/merge tree gives
 *    the true counts — the property the q_heavy_hitters oracle rides on.
 *  - EVICTION regime (capacity < distinct keys): the invariant
 *    `true ≤ est ≤ true + floor` holds, the floor respects the
 *    sequential N/capacity bound, and the genuinely-frequent keys
 *    survive the summary.
 */
class HeavyHittersSpec extends AnyFunSuite {

  private def run(agg: HeavyHittersAgg, keys: Seq[String],
                  splits: Int): HHState = {
    val parts = keys.grouped(math.max(1, keys.size / splits)).toSeq
    parts.map(_.foldLeft(agg.zero)(agg.reduce)).reduce(agg.merge)
  }

  test("exact regime: any merge tree equals true counts") {
    val rnd = new scala.util.Random(11)
    val vocab = (1 to 20).map(i => s"w$i")
    val agg = new HeavyHittersAgg(32)
    (1 to 5).foreach { _ =>
      val stream = Seq.fill(500)(vocab(rnd.nextInt(vocab.size)))
      val truth = stream.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
      (1 to 7).foreach { splits =>
        val s = run(agg, stream, splits)
        assert(s.floor == 0L, "floor must stay 0 while under capacity")
        assert(s.counts == truth)
      }
    }
  }

  test("exact regime matches Spark's datasketches approx_top_k") {
    import org.apache.spark.sql.functions.col
    val spark = SparkTestBase.spark
    val toks = spark.read.parquet(s"${SparkTestBase.sf}/documents.parquet")
      .selectExpr("explode(split(text, ' ')) AS tok").cache()
    val ours = toks
      .select(HeavyHittersAgg.heavyHitters(64)(col("tok")).as("m"))
      .selectExpr("explode(m) AS (tok, n)")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // k ≥ vocabulary puts BOTH sketches in their exact regime, so the
    // two independent implementations must produce the same count map
    val theirs = toks.selectExpr("approx_top_k(tok, 64, 256) AS t")
      .selectExpr("inline(t)")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    toks.unpersist()
    assert(ours.nonEmpty && ours == theirs)
  }

  test("gate query partially aggregates the sketch map-side") {
    val df = SparkEntry.queries("q_heavy_hitters")(SparkTestBase.spark, SparkTestBase.sf)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    // typed Aggregators plan as ObjectHashAggregate; a partial mode
    // before the exchange is what bounds the shuffle to sketch state
    assert(plan.contains("ObjectHashAggregate"), s"no ObjectHashAggregate:\n$plan")
    assert(plan.toLowerCase.contains("partial"), s"no partial stage:\n$plan")
  }

  test("eviction regime: overestimate bounded, frequent keys survive") {
    val rnd = new scala.util.Random(13)
    // skewed stream: 'hot' is half the stream, 'warm' a quarter, the
    // rest spread over 100 rare keys — far more distinct than capacity
    val n = 2000
    val stream = rnd.shuffle(
      Seq.fill(n / 2)("hot") ++ Seq.fill(n / 4)("warm") ++
        Seq.fill(n / 4)(s"rare${rnd.nextInt(100)}"))
    val truth = stream.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val agg = new HeavyHittersAgg(8)
    // sequential bound: floor ≤ N / capacity
    val seq = stream.foldLeft(agg.zero)(agg.reduce)
    assert(seq.floor <= n / 8, s"floor ${seq.floor} above N/capacity")
    Seq(seq, run(agg, stream, 4)).foreach { s =>
      assert(s.counts.contains("hot") && s.counts.contains("warm"),
        "true heavy hitters evicted")
      s.counts.foreach { case (k, est) =>
        val t = truth.getOrElse(k, 0L)
        assert(est >= t, s"$k underestimated: $est < $t")
        assert(est <= t + s.floor, s"$k overestimated past the floor")
      }
    }
  }
}
