package graft

import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.aggregate.BaseAggregateExec
import org.apache.spark.sql.execution.joins.BaseJoinExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/**
 * q_jl_project's two contracts beyond the bit-exact oracle: the
 * projection actually preserves norms in expectation (the property JL
 * compression exists for — a sign/scale bug passes no such test), and
 * the plan is a pure map stage (no join, no aggregation, no shuffle
 * before the final presentation sort), which is what makes it free to
 * append to any 100 TB scan.
 */
class JlProjectSpec extends AnyFunSuite {
  import SparkTestBase.{spark, sf}

  test("projection preserves norms in expectation (E[|y|^2] = |v|^2)") {
    val y = SparkEntry.queries("q_jl_project")(spark, sf)
    val v = graft.queries.Q.rd(spark, sf, "embeddings")
      .select(col("vec_id"),
        expr("aggregate(embedding, 0.0D, (a, t) -> a + CAST(t AS DOUBLE) * t)")
          .as("vnorm2"))
    val ratio = y.join(v, "vec_id")
      .filter(col("vnorm2") > 0)
      .agg(avg(col("ynorm2") / col("vnorm2")))
      .head.getDouble(0)
    // per-vector distortion at k=16 has sigma ~ sqrt(2/16) = 0.35, but the
    // mean over 500 vectors has sigma ~ 0.016 — [0.8, 1.2] only fails on a
    // broken matrix (e.g. all +1 signs push the ratio to ~4 on correlated
    // components, a dropped 1/sqrt(k) scales it by 16)
    assert(ratio > 0.8 && ratio < 1.2, s"mean norm ratio $ratio")
  }

  test("plan is a pure map stage: no join, no aggregate, no pre-sort shuffle") {
    val p = SparkEntry.queries("q_jl_project")(spark, sf)
      .queryExecution.sparkPlan
    def subtree(n: SparkPlan): Seq[SparkPlan] = n +: n.children.flatMap(subtree)
    val heavy = subtree(p).filter {
      case _: BaseJoinExec | _: BaseAggregateExec => true
      case _ => false
    }
    assert(heavy.isEmpty, s"non-map operators in a map-only transform:\n$p")
  }
}
