package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/**
 * Pins the streaming-cardinality entry (s_approx_users): a windowed
 * streaming aggregation carrying an HLL++ sketch must produce the SAME
 * estimates as the batch aggregation over the same data — HLL++ state
 * merge is commutative/associative and the estimator is deterministic,
 * so micro-batch arrival order must not show through. The gate row's
 * own max(3, 5%)-tolerance pin (est_ok) is additionally asserted here
 * at test scale.
 */
class StreamingSketchSpec extends AnyFunSuite {
  import SparkTestBase.{spark, sf}

  test("streaming windowed approx_count_distinct equals the batch sketch") {
    val schema = spark.read.parquet(s"$sf/events.parquet").schema
    def winAgg(df: org.apache.spark.sql.DataFrame) = graft.queries.Q.normalizeTs(df)
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(approx_count_distinct(col("user_id"), 0.02).as("n_approx"))
      .select(col("window.start").as("window_start"), col("event_type"),
        col("n_approx"))

    val streamIn = spark.readStream.schema(schema)
      .option("pathGlobFilter", "events.parquet").parquet(sf)
    val qn = "sketch_stream_" +
      java.util.UUID.randomUUID().toString.replace("-", "")
    val q = winAgg(streamIn).writeStream.outputMode("complete")
      .format("memory").queryName(qn).start()
    try q.processAllAvailable() finally q.stop()
    val streamed = spark.table(qn).collect()
      .map(r => (r.getTimestamp(0), r.getString(1)) -> r.getLong(2)).toMap

    val batch = winAgg(spark.read.parquet(s"$sf/events.parquet")).collect()
      .map(r => (r.getTimestamp(0), r.getString(1)) -> r.getLong(2)).toMap

    assert(streamed.nonEmpty)
    assert(streamed == batch,
      "HLL++ estimates must be identical between streaming and batch")
  }

  test("s_approx_users gate row: every emitted window within tolerance of exact") {
    val rows = SparkEntry.queries("s_approx_users")(spark, sf).collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getBoolean(3)), "est_ok must hold for every window")
  }
}
