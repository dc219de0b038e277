package graft

import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

/**
 * The foreachBatch idempotent-sink pattern: micro-batch output written
 * under the batch id, so a replayed batch (failure between write and
 * checkpoint commit) OVERWRITES its own directory instead of
 * duplicating rows — the standard recipe for exactly-once delivery to
 * stores without transactional streaming sinks.
 */
class ForeachBatchSinkSpec extends AnyFunSuite {
  import SparkTestBase.spark

  test("batch-id-keyed overwrite makes replays idempotent") {
    val base = java.nio.file.Files.createTempDirectory("graft_feb")
    val out = base.resolve("out")
    var replayed = false

    def writeBatch(df: DataFrame, batchId: Long): Unit = {
      val dir = out.resolve(s"batch=$batchId").toString
      df.write.mode("overwrite").parquet(dir) // idempotent under replay
      if (batchId == 1 && !replayed) {
        replayed = true
        // simulate the failure-and-replay: write the same batch again,
        // as a restarted query re-delivering batch 1 would
        df.write.mode("overwrite").parquet(dir)
      }
    }

    val q = spark.readStream.format("graft.sources.DocGen")
      .option("rows", 300).option("partitions", 4)
      .option("seed", 9).option("rowsPerBatch", 100)
      .load()
      .select("doc_id", "lang")
      .writeStream
      .option("checkpointLocation", base.resolve("chk").toString)
      .foreachBatch(writeBatch _)
      .start()
    try q.processAllAvailable() finally q.stop()

    val result = spark.read.parquet(out.toString + "/batch=*")
    assert(result.count() == 300, "replayed batch duplicated rows")
    assert(result.select("doc_id").distinct().count() == 300)
  }
}
