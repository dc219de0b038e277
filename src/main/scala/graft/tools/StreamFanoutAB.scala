package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** r21: does the §2.5 single-task-scan fanout help INSIDE a bounded
 * streaming aggregation? The stream source is the same one-row-group
 * parquet file as the batch side, so each microbatch's scan + window
 * bucketing + partial aggregation runs as one task before the state
 * exchange. Arm "fanout" inserts repartition(col("event_id")) (unique →
 * uniform, deterministic) between the source and the windowed agg.
 * Complete-mode memory sink, same session, alternating reps; result
 * equality asserted on the drained table.
 *
 * runMain graft.tools.StreamFanoutAB [sfDir] [reps]
 */
object StreamFanoutAB {
  def main(args: Array[String]): Unit = {
    val dir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val reps = if (args.length > 1) args(1).toInt else 4
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", "1") // state width, as the gate runs
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.read.parquet(s"$dir/lineitem.parquet")
      .groupBy("l_returnflag").count().count()
    graft.SparkEntry.queries("s_tumbling_counts")(spark, dir).count() // engine warmup

    val schema = spark.read.parquet(s"$dir/events.parquet").schema
    def src(): DataFrame = graft.queries.Q.normalizeTs(
      spark.readStream.schema(schema)
        .option("pathGlobFilter", "events.parquet").parquet(dir))

    def agg(ev: DataFrame): DataFrame = ev
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n_events"))

    var n = 0
    def run(fan: Boolean): (Double, Long) = {
      n += 1
      val qn = s"sfab_$n"
      val chk = java.nio.file.Files.createTempDirectory(
        java.nio.file.Paths.get("/dev/shm"), "graft_sfab")
      val in = if (fan) src().repartition(col("event_id")) else src()
      val t0 = System.nanoTime()
      val q = agg(in).writeStream.outputMode("complete").format("memory")
        .queryName(qn)
        .option("checkpointLocation", chk.resolve("chk").toString).start()
      try q.processAllAvailable() finally q.stop()
      val dt = (System.nanoTime() - t0) / 1e9
      val r = spark.table(qn)
        .agg(count(lit(1)), org.apache.spark.sql.functions.sum(col("n_events")))
        .head()
      val sig = r.getLong(0) * 1000003L + r.getLong(1)
      spark.catalog.dropTempView(qn)
      graft.queries.Q.deleteRecursively(chk)
      (dt, sig)
    }

    var base = Double.MaxValue; var fanout = Double.MaxValue
    var sigB = 0L; var sigF = 0L
    for (rep <- 1 to reps) {
      val (db, sb) = run(fan = false)
      val (df, sf) = run(fan = true)
      base = math.min(base, db); fanout = math.min(fanout, df)
      sigB = sb; sigF = sf
      println(f"[sfab] rep$rep base=$db%.3f fanout=$df%.3f")
    }
    assert(sigB == sigF, s"result mismatch: $sigB vs $sigF")
    println(f"[sfab] RESULT min base=$base%.3f fanout=$fanout%.3f " +
      f"delta=${base - fanout}%+.3f (sigs agree)")
    spark.stop()
  }
}
