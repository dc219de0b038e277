package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/**
 * Batch-equivalence pins for the append-mode tumbling/sliding twins
 * (VERDICT r2 next-round item 2): in append mode a window is emitted
 * exactly once, when the watermark passes its end — so the streaming
 * result must equal the batch aggregation restricted to windows whose
 * end is at or before the final watermark (max ts − 10 min). The DuckDB
 * oracle checks the same thing at the gate; this spec keeps the property
 * under `sbt test` with the batch twin computed in Spark itself.
 */
class StreamingAppendSpec extends AnyFunSuite {
  import SparkTestBase.{spark, sf}

  private def cutJoin(df: org.apache.spark.sql.DataFrame) = {
    val cut = graft.queries.Q.events(spark, sf)
      .agg((max(col("ts")) - expr("INTERVAL 10 MINUTES")).as("cut"))
    df.crossJoin(cut).filter(col("window.end") <= col("cut"))
  }

  test("s_tumbling_append equals batch windows closed by the final watermark") {
    val streamed = SparkEntry.queries("s_tumbling_append")(spark, sf)
      .collect().toSeq
    val expected = cutJoin(
      graft.queries.Q.events(spark, sf)
        .groupBy(window(col("ts"), "1 hour"), col("event_type"))
        .agg(count(lit(1)).as("n_events"),
          graft.queries.Q.dsum(col("value")).as("sum_value")))
      .select(col("window.start").as("window_start"), col("event_type"),
        col("n_events"), col("sum_value"))
      .orderBy("window_start", "event_type")
      .collect().toSeq
    assert(expected.nonEmpty, "vacuous: no closed windows at this sf")
    assert(streamed == expected)
  }

  test("s_sliding_append equals batch slide-aligned windows closed by the watermark") {
    val streamed = SparkEntry.queries("s_sliding_append")(spark, sf)
      .collect().toSeq
    val expected = cutJoin(
      graft.queries.Q.events(spark, sf)
        .groupBy(window(col("ts"), "1 hour", "15 minutes"))
        .agg(count(lit(1)).as("n_events"),
          (sum(col("value").cast("decimal(18,2)")).cast("double") / count(lit(1)))
            .as("avg_value")))
      .select(col("window.start").as("window_start"), col("n_events"),
        col("avg_value"))
      .orderBy("window_start")
      .collect().toSeq
    assert(expected.nonEmpty, "vacuous: no closed windows at this sf")
    assert(streamed == expected)
  }
}
