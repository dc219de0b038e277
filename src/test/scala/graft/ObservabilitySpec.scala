package graft

import org.apache.spark.sql.Observation
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/**
 * Production-pipeline observability surfaces:
 *  - `Dataset.observe` collects data-quality metrics DURING the job
 *    (one pass, no second scan) — how a 100 TB cleaning run reports
 *    drop rates without re-reading its input;
 *  - `percentile_approx` stays within its declared accuracy vs the
 *    exact sort-based percentile, the tradeoff that makes percentiles
 *    mergeable (sketch state) at scale.
 */
class ObservabilitySpec extends AnyFunSuite {
  import SparkTestBase.{spark, sf}

  test("observe() reports corpus-cleaning metrics in the same pass") {
    val obs = Observation("clean_metrics")
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .withColumn("n_tokens", size(split(col("text"), " ")))
      .observe(obs,
        count(lit(1)).as("rows_in"),
        sum(when(col("n_tokens") < 20, 1L).otherwise(0L)).as("too_short"),
        max(col("n_tokens")).as("max_tokens"))
      .filter(col("n_tokens") >= 20)
    val kept = docs.count()
    val m = obs.get
    assert(m("rows_in").asInstanceOf[Long] == kept + m("too_short").asInstanceOf[Long],
      m.toString)
    assert(m("max_tokens").asInstanceOf[Int] >= 20, m.toString)
  }

  test("percentile_approx lands within its accuracy bound of the exact percentile") {
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
    val r = li.agg(
      expr("percentile(l_quantity, 0.5)").as("exact"),
      expr("percentile_approx(l_quantity, 0.5, 100)").as("approx")).head()
    val exact = r.getDouble(0)
    val approx = r.getDouble(1)
    // quantities are 1..50; with accuracy=100 the sketch's rank error
    // (~1%) can move the estimate at most a couple of grid steps
    assert(math.abs(approx - exact) <= 2.0, s"exact=$exact approx=$approx")
  }
}
