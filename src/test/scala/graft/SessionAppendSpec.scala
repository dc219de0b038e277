package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/**
 * Pins the append-mode session-window scale path (VERDICT r1 item 6):
 * `s_session_append` (append mode → parquet file sink, the shape that
 * survives unbounded input) must emit exactly the sessions the
 * complete-mode harness adapter `s_session` produces, minus those still
 * open at the final watermark (max ts − 10 min) — each exactly once.
 */
class SessionAppendSpec extends AnyFunSuite {
  import SparkTestBase.spark

  private val dir = "/root/testdata/sf0.001"

  test("append-mode sessions == complete-mode sessions closed by the final watermark") {
    val append = SparkEntry.queries("s_session_append")(spark, dir)
      .select("user_id", "session_start", "session_end", "n_events")
    val complete = SparkEntry.queries("s_session")(spark, dir)
    val maxTs = graft.queries.Q.events(spark, dir)
      .select(max(col("ts"))).head().getTimestamp(0)
    val closed = complete.filter(
      col("session_end") <= lit(maxTs) - expr("INTERVAL 10 MINUTES"))

    val a = append.collect().map(_.toSeq).toSet
    val c = closed.collect().map(_.toSeq).toSet
    assert(a.nonEmpty, "append-mode sink emitted nothing")
    assert(a == c,
      s"append vs watermark-closed complete mismatch: " +
        s"append-only=${(a -- c).take(3)}, complete-only=${(c -- a).take(3)}")
    // and the watermark cut is non-vacuous: at least one session stays open
    assert(complete.count() > closed.count(),
      "watermark cut dropped nothing — test data no longer exercises the boundary")
  }
}
