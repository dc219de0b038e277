package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

/**
 * Trigger.AvailableNow — the modern batch-over-stream runner: process
 * everything currently available in bounded micro-batches, then STOP,
 * keeping the checkpoint so the next scheduled run resumes
 * incrementally. This is how a 100 TB backfill/catch-up job runs a
 * streaming pipeline without leaving a cluster resident.
 */
class AvailableNowSpec extends AnyFunSuite {
  import SparkTestBase.{spark, sf}

  test("AvailableNow drains the source in bounded batches and terminates") {
    val qn = "an_spec_" + java.util.UUID.randomUUID().toString.replace("-", "")
    val agg = spark.readStream.format("graft.sources.DocGen")
      .option("rows", 500).option("partitions", 4)
      .option("seed", 11).option("rowsPerBatch", 120)
      .load()
      .groupBy("lang").agg(count(lit(1)).as("n"))
    val q = agg.writeStream.outputMode("complete").format("memory")
      .queryName(qn).trigger(Trigger.AvailableNow()).start()
    // AvailableNow terminates on its own — no stop() needed
    assert(q.awaitTermination(120000), "AvailableNow query did not terminate")
    val streamed = spark.table(qn).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val batch = spark.read.format("graft.sources.DocGen")
      .option("rows", 500).option("partitions", 4).option("seed", 11)
      .load()
      .groupBy("lang").agg(count(lit(1)).as("n")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(streamed == batch)
  }
}
