package graft

import java.nio.file.Files
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

/**
 * Resume-from-checkpoint exactly-once: the property that makes a
 * streaming ingest restartable in production. Phase 1 drains the
 * initial files with Trigger.AvailableNow and terminates; new files
 * arrive; phase 2 restarts the SAME query (same checkpoint) — it must
 * process only the new files (no re-delivery of phase 1, no loss).
 * Deterministic by construction: each phase drains a known file set to
 * completion, no mid-batch stop races.
 */
class CheckpointRestartSpec extends AnyFunSuite {
  import SparkTestBase.{spark, sf}
  import org.apache.spark.sql.functions.col

  test("restarted query processes only new files — no loss, no duplicates") {
    val base = Files.createTempDirectory("graft-restart")
    val stage = base.resolve("in").toString
    val out = base.resolve("out").toString
    val chk = base.resolve("chk").toString
    val src = graft.queries.Q.events(spark, sf)
      .select("event_id", "user_id", "value")
    val phase1 = src.filter(col("event_id") % 2 === 0)
    val phase2 = src.filter(col("event_id") % 2 =!= 0)
    phase1.write.parquet(stage)
    val schema = spark.read.parquet(stage).schema

    def drain(): Unit = {
      val q = spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1).parquet(stage)
        .writeStream.format("parquet").option("path", out)
        .option("checkpointLocation", chk)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }

    drain()
    val afterP1 = spark.read.parquet(out).count()
    assert(afterP1 == phase1.count(), "phase 1 must drain exactly its files")

    // new files land in the same directory; the restart resumes from
    // the checkpoint and must pick up ONLY these
    phase2.write.mode("append").parquet(stage)
    drain()

    val back = spark.read.parquet(out)
    assert(back.count() == src.count(), "loss or duplication across restart")
    assert(back.select("event_id").except(src.select("event_id")).isEmpty &&
      src.select("event_id").except(back.select("event_id")).isEmpty)
  }
}
