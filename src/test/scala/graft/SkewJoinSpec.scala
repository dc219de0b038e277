package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/**
 * AQE skew-join splitting — the runtime half of the skew story
 * (Joins.salted is the plan-time half, for shapes AQE can't fix).
 * Thresholds are lowered so the fixture-scale hot key triggers the same
 * OptimizeSkewedJoin path a 100 TB hot key would; the skewed partition
 * must be split into multiple tasks and the result stay identical.
 */
class SkewJoinSpec extends AnyFunSuite {
  import SparkTestBase.spark

  private def withConf[T](pairs: (String, String)*)(body: => T): T = {
    val prev = pairs.map { case (k, _) => k -> spark.conf.getOption(k) }
    pairs.foreach { case (k, v) => spark.conf.set(k, v) }
    try body
    finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("AQE splits a skewed join partition at runtime") {
    import spark.implicits._
    withConf(
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "10KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "2KB",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1") {
      // 50k rows of key 0 vs a handful of other keys → one hot partition
      val left = spark.range(0, 51000)
        .select(when(col("id") < 50000, 0L).otherwise(col("id") % 7).as("k"),
          col("id").as("v"))
      val right = spark.range(0, 7).select(col("id").as("k"), lit(1L).as("w"))
      val j = left.join(right, "k")
      val n = j.count()
      assert(n == 51000)
      // count() runs its own execution; re-run through this Dataset to
      // read the final adaptive plan
      j.collect()
      val plan = j.queryExecution.executedPlan.toString
      assert(plan.contains("isFinalPlan=true"))
      assert(plan.contains("skew=true"), s"no skew split in:\n$plan")
    }
  }
}
