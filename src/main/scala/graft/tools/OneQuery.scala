package graft.tools

import graft.SparkEntry
import org.apache.spark.sql.SparkSession

/** Time a single query in isolation (repeat N times):
 * runMain graft.tools.OneQuery <name> [sfDir] [reps] */
object OneQuery {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val reps = if (args.length > 2) args(2).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // session warmup
    spark.read.parquet(s"$dir/lineitem.parquet").groupBy("l_returnflag").count().count()
    for (i <- 1 to reps) {
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, dir).count()
      spark.catalog.clearCache()
      println(f"[onequery] $name rep$i ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    spark.stop()
  }
}
