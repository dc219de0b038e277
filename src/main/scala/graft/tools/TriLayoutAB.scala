package graft.tools

import org.apache.spark.sql.SparkSession

/** Interleaved same-JVM A/B for the q_triangles serve-layout question
 * (VERDICT r13 item 1): time the IDENTICAL query code against two
 * pre-built edge-index stores — one laid out by the r12 writeSeg
 * (repartitionByRange), one by the r13 writeSeg (hash half-split +
 * sortWithinPartitions) — alternating every rep so ambient-load drift
 * hits both cells equally. The sequential per-HEAD bench could not
 * resolve the question: the same cell re-measured 1.73 then 2.45 s
 * across twenty minutes (window drift larger than the effect).
 *
 * Setup contract: dirA and dirB are two distinct path STRINGS (e.g.
 * symlinks) resolving to the same parquet tables, whose stores were
 * populated beforehand by the respective HEADs. This tool only serves.
 *
 * runMain graft.tools.TriLayoutAB <dirA> <dirB> [reps] */
object TriLayoutAB {
  def main(args: Array[String]): Unit = {
    val dirA = args(0)
    val dirB = args(1)
    val reps = if (args.length > 2) args(2).toInt else 7
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.read.parquet(s"$dirA/lineitem.parquet")
      .groupBy("l_returnflag").count().count()
    val q = graft.SparkEntry.queries("q_triangles")
    def one(dir: String): Double = {
      val t0 = System.nanoTime()
      q(spark, dir).count()
      val dt = (System.nanoTime() - t0) / 1e9
      spark.catalog.clearCache()
      dt
    }
    // one untimed warm pass per cell (memoFrame + JIT), then alternate
    one(dirA); one(dirB)
    val as = collection.mutable.ArrayBuffer[Double]()
    val bs = collection.mutable.ArrayBuffer[Double]()
    for (i <- 1 to reps) {
      as += one(dirA)
      bs += one(dirB)
      println(f"[tri-ab] rep$i A=${as.last}%.3f B=${bs.last}%.3f")
    }
    def stats(x: Seq[Double]) =
      f"min=${x.min}%.3f med=${x.sorted.apply(x.size / 2)}%.3f"
    println(s"[tri-ab] A(${dirA}) ${stats(as.toSeq)}")
    println(s"[tri-ab] B(${dirB}) ${stats(bs.toSeq)}")
    spark.stop()
  }
}
