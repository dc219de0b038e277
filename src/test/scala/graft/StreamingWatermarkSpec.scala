package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/**
 * Watermark semantics (SURVEY.md §5 test plan item 4): in append mode a
 * window is emitted only once the watermark passes its end, and an event
 * arriving later than (max seen ts - delay) for an already-finalized
 * window is dropped.
 */
class StreamingWatermarkSpec extends AnyFunSuite {
  import SparkTestBase.spark

  private def ts(m: Int): Timestamp = Timestamp.valueOf(f"2024-01-01 10:$m%02d:00")

  test("append-mode watermark finalizes windows and drops late rows") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Timestamp, String)]
    val agg = in.toDF().toDF("ts", "k")
      .withWatermark("ts", "5 minutes")
      .groupBy(window(col("ts"), "10 minutes"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("ws"), col("n"))
    val qn = "wm_spec_" + java.util.UUID.randomUUID().toString.replace("-", "")
    val q = agg.writeStream.outputMode("append").format("memory").queryName(qn).start()
    try {
      // batch 1: two rows in the 10:00 window, one in 10:10
      in.addData((ts(1), "a"), (ts(4), "b"), (ts(11), "c"))
      q.processAllAvailable()
      // watermark (computed from batch 1 for batch 2) = 10:11 - 5m = 10:06
      // → no window end ≤ 10:06 yet, nothing emitted
      assert(spark.table(qn).count() == 0)

      // batch 2: event time advances to 10:21 → next watermark 10:16,
      // which is past the END of both the 10:00 and 10:10 windows
      in.addData((ts(21), "d"))
      q.processAllAvailable()

      // batch 3: a row for the now-CLOSED 10:00 window (end 10:10 ≤
      // watermark 10:16) must be DROPPED, not merged. NB a row is late
      // only when its whole window is past the watermark — an event
      // merely older than the watermark still joins an open window.
      in.addData((ts(3), "late!"), (ts(22), "e"))
      q.processAllAvailable()

      // push the watermark past 10:20 to close the [10:10, 10:20) window
      // (wm advances at batch boundaries: one batch to raise it, one to
      // evict with it)
      in.addData((ts(26), "f"))
      q.processAllAvailable()
      in.addData((ts(27), "g"))
      q.processAllAvailable()

      val rows = spark.table(qn).collect()
        .map(r => (r.getTimestamp(0).toString, r.getLong(1))).toMap
      assert(rows.get("2024-01-01 10:00:00.0").contains(2L),
        s"expected finalized 10:00 window of 2 on-time rows, got $rows")
      assert(rows.get("2024-01-01 10:10:00.0").contains(1L), rows.toString)
    } finally q.stop()
  }
}
