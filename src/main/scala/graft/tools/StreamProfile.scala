package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Decompose one bounded streaming run's wall clock: session-side prep
 * (schema read, plan), start()→first-progress, per-microbatch durations
 * as the engine reports them, and stop/teardown. Usage:
 *   runMain graft.tools.StreamProfile [sfDir] [reps]
 */
object StreamProfile {
  def main(args: Array[String]): Unit = {
    val dir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val reps = if (args.length > 1) args(1).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", sys.env.getOrElse("SP", "4"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // warm both engines like Bench does
    spark.read.parquet(s"$dir/lineitem.parquet").groupBy("l_returnflag").count().count()
    graft.SparkEntry.queries("s_tumbling_counts")(spark, dir).count()

    for (rep <- 1 to reps) {
      val t0 = System.nanoTime()
      def ms = (System.nanoTime() - t0) / 1e6
      val schema = spark.read.parquet(s"$dir/events.parquet").schema
      val raw = spark.readStream.schema(schema)
        .option("pathGlobFilter", "events.parquet").parquet(dir)
      val ev = graft.queries.Q.normalizeTs(raw)
      val agg = ev.withWatermark("ts", "10 minutes")
        .groupBy(window(col("ts"), "1 hour"), col("event_type"))
        .agg(count(lit(1)).as("n_events"))
      println(f"[profile] rep$rep plan built at $ms%.0f ms")
      val chk = java.nio.file.Files.createTempDirectory(
        java.nio.file.Paths.get("/dev/shm"), "graft_profile")
      val q = agg.writeStream.outputMode("complete").format("memory")
        .queryName(s"profile_$rep")
        .option("checkpointLocation", chk.resolve("chk").toString).start()
      println(f"[profile] rep$rep started at $ms%.0f ms")
      q.processAllAvailable()
      println(f"[profile] rep$rep drained at $ms%.0f ms")
      q.recentProgress.foreach { p =>
        val d = p.durationMs
        println(s"[profile]   batch ${p.batchId}: total=${d.get("triggerExecution")}" +
          s" addBatch=${d.get("addBatch")} getBatch=${d.get("getBatch")}" +
          s" latestOffset=${d.get("latestOffset")} queryPlanning=${d.get("queryPlanning")}" +
          s" walCommit=${d.get("walCommit")} stateCommit=${d.get("commitOffsets")}" +
          s" rows=${p.numInputRows}")
      }
      q.stop()
      println(f"[profile] rep$rep stopped at $ms%.0f ms")
      spark.sql(s"DROP TABLE IF EXISTS profile_$rep")
      graft.queries.Q.deleteRecursively(chk)
    }
    spark.stop()
  }
}
