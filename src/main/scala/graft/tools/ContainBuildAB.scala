package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** r21 micro-A/B: q_containment's cached docs frame (tokenize + shingle
 * + hash + in-row sort over 5k documents) builds inside the single-task
 * scan stage. Does fanning the build out (repartition(doc_id) before
 * the shingle projection) pay at gate scale? Build-only timing —
 * cache().count() then unpersist — interleaved.
 *
 * runMain graft.tools.ContainBuildAB [sfDir] [reps]
 */
object ContainBuildAB {
  def main(args: Array[String]): Unit = {
    val dir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val reps = if (args.length > 1) args(1).toInt else 5
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.read.parquet(s"$dir/lineitem.parquet")
      .groupBy("l_returnflag").count().count()
    graft.functions.HashArray.register(spark)

    def build(fan: Boolean): Double = {
      val base = graft.queries.Q.rd(spark, dir, "documents")
      val in = if (fan) base.repartition(col("doc_id")) else base
      val docs = graft.queries.LlmOps.shingled(in)
        .filter(size(col("sh")) > 0)
        .select(col("doc_id"), sort_array(
          graft.functions.HashArray.arrayHash(col("sh"))).as("hs"))
        .cache()
      val t0 = System.nanoTime()
      docs.count()
      val dt = (System.nanoTime() - t0) / 1e9
      docs.unpersist(blocking = true)
      dt
    }

    var b = Double.MaxValue; var f = Double.MaxValue
    for (rep <- 1 to reps) {
      val db = build(fan = false); val dfan = build(fan = true)
      b = math.min(b, db); f = math.min(f, dfan)
      println(f"[contain-ab] rep$rep base=$db%.3f fanout=$dfan%.3f")
    }
    println(f"[contain-ab] RESULT min base=$b%.3f fanout=$f%.3f delta=${b - f}%+.3f")
    spark.stop()
  }
}
