package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/**
 * Runtime bloom-filter join pruning: when a selective dimension filter
 * can't broadcast (fact-fact sized sides), Catalyst injects a bloom
 * filter built from the dimension keys and applies it to the fact scan
 * — at 100 TB this is the difference between shuffling the whole fact
 * table and shuffling only rows that can possibly join. Pinned here so
 * a conf or plan regression that silently disables it fails.
 */
class RuntimeFilterSpec extends AnyFunSuite {
  import SparkTestBase.{spark, sf}

  private def withConf[T](pairs: (String, String)*)(body: => T): T = {
    val prev = pairs.map { case (k, _) => k -> spark.conf.getOption(k) }
    pairs.foreach { case (k, v) => spark.conf.set(k, v) }
    try body
    finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("selective dim join injects a bloom filter on the fact side") {
    withConf(
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
      // force the non-broadcast path the filter exists for
      "spark.sql.autoBroadcastJoinThreshold" -> "-1") {
      val li = spark.read.parquet(s"$sf/lineitem.parquet")
      val p = spark.read.parquet(s"$sf/part.parquet").filter("p_brand = 'Brand#1'")
      val j = li.join(p, li("l_partkey") === p("p_partkey"))
        .groupBy("p_brand").agg(count(lit(1)).as("n"))
      assert(j.queryExecution.optimizedPlan.toString.contains("bloom"),
        j.queryExecution.optimizedPlan.toString)
      // and the filter is semantics-free: same result as the plain plan
      val n = j.head().getLong(1)
      val plain = withConf(
        "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "false") {
        li.join(p, li("l_partkey") === p("p_partkey"))
          .groupBy("p_brand").agg(count(lit(1)).as("n")).head().getLong(1)
      }
      assert(n == plain)
    }
  }
}
