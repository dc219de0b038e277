package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.operators.PrefixSum

class PrefixSumSpec extends AnyFunSuite
    with org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanHelper {
  import SparkTestBase.{spark, sf}
  import spark.implicits._

  /** All WindowExec nodes of the AQE final plan. */
  private def windowNodes(df: org.apache.spark.sql.DataFrame) =
    collectWithSubqueries(df.queryExecution.executedPlan) {
      case w: org.apache.spark.sql.execution.window.WindowExec => w
    }

  private def flat(rows: Seq[(Long, Long, Long)]) = {
    // the naive single-task reference: one global unpartitioned window
    val w = Window.orderBy("k").rowsBetween(Window.unboundedPreceding, -1)
    rows.toDF("k", "a", "b")
      .withColumn("ea", coalesce(sum($"a").over(w), lit(0L)))
      .withColumn("eb", coalesce(sum($"b").over(w), lit(0L)))
      .collect().map(r => (r.getLong(0), r.getLong(3), r.getLong(4))).toSet
  }

  private def dist(rows: Seq[(Long, Long, Long)]) =
    PrefixSum.exclusive(rows.toDF("k", "a", "b"), "k",
        Seq("a", "b"), Seq("ea", "eb"))
      .select("k", "ea", "eb")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

  test("matches the flat global cumsum on a deterministic spread") {
    // keys deliberately unsorted in input order; values include negatives
    val rows = (0L until 1000L).map { i =>
      val k = (i * 2654435761L) % 100003L   // scrambled, unique
      (k, (k % 17L) - 8L, k % 5L)
    }
    assert(dist(rows) == flat(rows))
  }

  test("fewer rows than shuffle partitions, and singleton") {
    val tiny = Seq((5L, 10L, 1L), (1L, 2L, 2L), (9L, 7L, 3L))
    assert(dist(tiny) == flat(tiny))
    assert(dist(Seq((42L, 9L, 9L))) ==
      Set((42L, 0L, 0L)))
  }

  test("empty input yields empty output with the added columns") {
    val e = PrefixSum.exclusive(
      Seq.empty[(Long, Long)].toDF("k", "a"), "k", Seq("a"), Seq("ea"))
    assert(e.columns.toSeq == Seq("k", "a", "ea") && e.count() == 0)
  }

  test("no unpartitioned window in the operator's plan (its whole point)") {
    val df = PrefixSum.exclusive(
      (0L until 100L).map(i => (i, i)).toDF("k", "a"), "k",
      Seq("a"), Seq("ea"))
    df.collect() // AQE final plan
    val ws = windowNodes(df)
    assert(ws.nonEmpty)
    assert(ws.forall(_.partitionSpec.nonEmpty),
      s"found an unpartitioned WindowExec:\n${df.queryExecution.executedPlan}")
  }

  // NOTE r22: the operator was built for the q_ks_drift / q_pps_sample
  // block-offset windows (VERDICT r21 item 2), verified result-identical
  // and warning-free there (plans/r22/*_distributed.txt), but NOT wired
  // in: the honest distributed-offsets machinery costs ~5 extra AQE
  // stages ≈ +0.2–0.4 s per query at gate scale (tools/PrefixSumAB,
  // every interleaved rep-pair), vs the 0.02 s adoption budget the r21
  // verdict set. The operator + this spec pin the shape for the scale
  // regime that needs it.
}
