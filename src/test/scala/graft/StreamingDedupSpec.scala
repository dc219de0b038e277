package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/**
 * Streaming dedup semantics behind `s_dedup_keys`:
 *  - plain dropDuplicates: state is unbounded, every duplicate ever seen
 *    is swallowed — the harness query's shape (bounded fixture).
 *  - dropDuplicatesWithinWatermark: the production scale path — state
 *    for a key is dropped once the watermark passes its event time +
 *    delay, so a duplicate arriving AFTER that re-emits. Correct
 *    exactly-once ingest under the usual "duplicates arrive close
 *    together" contract, with bounded state.
 */
class StreamingDedupSpec extends AnyFunSuite {
  import SparkTestBase.spark

  private def ts(m: Int): Timestamp = Timestamp.valueOf(f"2024-01-01 10:$m%02d:00")

  test("dropDuplicatesWithinWatermark bounds state: late re-occurrence re-emits") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Timestamp, String)]
    val dedup = in.toDF().toDF("ts", "k")
      .withWatermark("ts", "5 minutes")
      .dropDuplicatesWithinWatermark("k")
    val qn = "dd_spec_" + java.util.UUID.randomUUID().toString.replace("-", "")
    val q = dedup.writeStream.outputMode("append").format("memory").queryName(qn).start()
    try {
      // k=a emits once; its in-window duplicate is swallowed
      in.addData((ts(0), "a"), (ts(1), "a"), (ts(2), "b"))
      q.processAllAvailable()
      assert(spark.table(qn).groupBy("k").count().collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap == Map("a" -> 1L, "b" -> 1L))

      // advance the watermark far past a's expiry (0:01 + 5min delay)
      in.addData((ts(30), "c"))
      q.processAllAvailable()
      in.addData((ts(31), "c2")) // extra batch so eviction takes effect
      q.processAllAvailable()

      // a re-occurs AFTER its dedup state expired → emits again;
      // this is the bounded-state contract, not a bug
      in.addData((ts(32), "a"))
      q.processAllAvailable()
      val counts = spark.table(qn).groupBy("k").count().collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(counts("a") == 2L, s"expected expired key to re-emit, got $counts")
      assert(counts("b") == 1L, counts.toString)
    } finally q.stop()
  }
}
