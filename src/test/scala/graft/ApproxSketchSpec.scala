package graft

import org.scalatest.funsuite.AnyFunSuite

/**
 * Value pin for the no-oracle q_percentiles_approx row (the
 * q_approx_distinct pattern): the mergeable-sketch estimates must land
 * within tolerance of the exact quartiles that ride along in the same
 * result, and the plan must actually be the constant-state partial
 * aggregation that makes the sketch the 100 TB form.
 *
 * l_quantity is drawn from a small integer grid, so with accuracy=10000
 * the sketch's rank error is far below one grid step — tolerance 1.0 is
 * generous and stable.
 */
class ApproxSketchSpec extends AnyFunSuite {
  import SparkTestBase.{spark, sf}

  test("q_percentiles_approx: estimates within 1.0 of exact, partial-aggregated") {
    val df = SparkEntry.queries("q_percentiles_approx")(spark, sf)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("percentile_approx"), s"sketch missing from plan:\n$plan")
    // ObjectHashAggregate with a partial mode = map-side-combinable
    // sketch state (the whole point vs the exact sort-based percentile)
    assert(plan.contains("ObjectHashAggregate"), s"expected ObjectHashAggregate:\n$plan")
    // the 1.0-tolerance check lives IN the query since r6 (est_ok, also
    // oracle-pinned TRUE); the spec asserts it holds for every group
    val rows = df.collect()
    assert(rows.length == 3)
    rows.foreach(r => assert(r.getAs[Boolean]("est_ok"), s"estimate drifted: $r"))
  }

  test("q_hll_rollup: union of day sketches estimates the true total") {
    val r = SparkEntry.queries("q_hll_rollup")(spark, sf).collect()(0)
    assert(r.getAs[Boolean]("est_ok"), s"HLL union estimate drifted: $r")
    assert(r.getAs[Long]("n_days") > 1, "rollup is vacuous with one day")
    // the column that motivates sketches: summing per-day distincts
    // overcounts returning users, so it must strictly exceed the truth
    // (every user here is active on more than one day)
    assert(r.getAs[Long]("sum_day_users") > r.getAs[Long]("exact_total"))
  }
}
