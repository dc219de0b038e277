package graft.tools

import org.apache.spark.sql.SparkSession

/** Throwaway-style harness for timing/diagnosing ConnectedComponents
 * variants on synthetic graphs (kept for future CC work; not part of the
 * engine surface). */
object StarDebug {
  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toInt else 60
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val edges = (0L until (n - 1).toLong).map(i => (i, i + 1)).toDF("a", "b")
    val t0 = System.nanoTime()
    val out = graft.operators.ConnectedComponents.runStar(edges)
    val comps = out.collect().map(r => (r.getLong(0), r.getLong(1)))
    println(s"path n=$n: ${(System.nanoTime() - t0) / 1e9}s, " +
      s"all-min=${comps.forall(_._2 == 0L)}, rows=${comps.length}")
    spark.stop()
  }
}
