package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** r21: s_cdc_apply's per-microbatch merge is
 * `lww(prev ∪ lww(batch))` — but LWW (max of a (ts, event_id, …)
 * struct per user) is associative and commutative, so the inner
 * `lww(batch)` is a redundant second aggregation: the outer agg's
 * map-side partial_max performs the identical per-key reduction on the
 * batch rows before they shuffle, at any scale. Arm "single" runs
 * `lww(prev ∪ batch)` — one exchange per microbatch instead of two.
 * Results must be identical (asserted on the final state's row set).
 *
 * runMain graft.tools.CdcMergeAB [sfDir] [reps]
 */
object CdcMergeAB {
  def main(args: Array[String]): Unit = {
    val dir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val reps = if (args.length > 1) args(1).toInt else 4
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.read.parquet(s"$dir/lineitem.parquet")
      .groupBy("l_returnflag").count().count()
    graft.SparkEntry.queries("s_tumbling_counts")(spark, dir).count() // engine warmup

    def lww(df: DataFrame): DataFrame = df
      .groupBy("user_id")
      .agg(max(struct(col("ts"), col("event_id"), col("event_type"),
        col("value"))).as("w"))
      .select(col("user_id"), col("w.ts").as("ts"),
        col("w.event_id").as("event_id"),
        col("w.event_type").as("event_type"), col("w.value").as("value"))

    val feedDir = graft.queries.Q.ensureStamped("graft_cdc_feed_f2_",
      graft.queries.Q.contentStamp(dir, "events")) { staging =>
      graft.queries.Q.events(spark, dir)
        .select("event_id", "ts", "user_id", "event_type", "value")
        .repartitionByRange(4, col("ts"))
        .write.mode("overwrite").parquet(staging.toString)
    }
    val schema = spark.read.parquet(feedDir.toString).schema

    def run(single: Boolean): (Double, String) = {
      val base = java.nio.file.Files.createTempDirectory(
        java.nio.file.Paths.get("/dev/shm"), "graft_cdcab")
      val stream = spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1").parquet(feedDir.toString)
      @volatile var cur: Option[String] = None
      var batches = 0
      def applyBatch(b: DataFrame, id: Long): Unit = {
        batches += 1
        val merged = cur match {
          case Some(prev) =>
            if (single) lww(spark.read.parquet(prev).unionByName(b))
            else lww(spark.read.parquet(prev).unionByName(lww(b)))
          case None => lww(b)
        }
        val out = base.resolve(s"state_v$id").toString
        merged.coalesce(1).write.mode("overwrite").parquet(out)
        cur = Some(out)
      }
      val prevConf = spark.conf.get("spark.sql.shuffle.partitions")
      spark.conf.set("spark.sql.shuffle.partitions", "2")
      val t0 = System.nanoTime()
      try {
        val q = stream.writeStream
          .option("checkpointLocation", base.resolve("chk").toString)
          .foreachBatch(applyBatch _)
          .start()
        try q.processAllAvailable() finally q.stop()
      } finally spark.conf.set("spark.sql.shuffle.partitions", prevConf)
      val dt = (System.nanoTime() - t0) / 1e9
      // full canonical row dump, not a lossy Int hash — the per-rep
      // assert below compares the complete final state (ADVICE r21)
      val sig = spark.read.parquet(cur.get)
        .filter(col("event_type") =!= "error")
        .orderBy("user_id")
        .collect().map(_.toString).mkString("|")
      graft.queries.Q.deleteRecursively(base)
      require(batches == 4, s"expected 4 microbatches, got $batches")
      (dt, sig)
    }

    var cMin = Double.MaxValue; var sMin = Double.MaxValue
    for (rep <- 1 to reps) {
      val (dc, sc) = run(single = false)
      val (ds, ss) = run(single = true)
      cMin = math.min(cMin, dc); sMin = math.min(sMin, ds)
      // assert EVERY rep's full final state equal, not just the last pair
      assert(sc == ss, s"rep$rep result mismatch:\n$sc\nvs\n$ss")
      println(f"[cdc-ab] rep$rep nested=$dc%.3f single=$ds%.3f")
    }
    println(f"[cdc-ab] RESULT min nested=$cMin%.3f single=$sMin%.3f " +
      f"delta=${cMin - sMin}%+.3f (sigs agree)")
    spark.stop()
  }
}
