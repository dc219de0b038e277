package graft.tools

import org.apache.spark.sql.SparkSession

/** r21: interleaved same-session A/B for RUNTIME SQL configs — each rep
 * runs the query list once per arm (baseline session defaults vs the
 * candidate conf set), alternating, and the verdict is the element-wise
 * min per query. Runtime SQL confs re-resolve at each query's planning,
 * so one JVM can carry both arms — the only honest layout on a
 * co-tenanted box (cross-window config comparisons drown in drift).
 *
 * runMain graft.tools.ConfAB <sfDir> <reps> <q1,q2,...> <k=v[;k=v]...>
 */
object ConfAB {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val reps = args(1).toInt
    val names = args(2).split(",").map(_.trim).filter(_.nonEmpty)
    val confs = args(3).split(";").map(_.trim).filter(_.nonEmpty)
      .map { kv => val Array(k, v) = kv.split("=", 2); (k, v) }
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold",
        "1048576")
      // adopted into Bench/Verify in r21; keep the base arm = bench session
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning",
        "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.read.parquet(s"$dir/lineitem.parquet")
      .groupBy("l_returnflag").count().count() // warmup

    val qs = names.map(n => n -> graft.SparkEntry.queries(n))
    val mins = collection.mutable.Map[(String, String), Double]()
      .withDefaultValue(Double.MaxValue)

    def runArm(arm: String): Unit = {
      for ((n, fn) <- qs) {
        val t0 = System.nanoTime()
        fn(spark, dir).count()
        val dt = (System.nanoTime() - t0) / 1e9
        spark.catalog.clearCache()
        mins((arm, n)) = math.min(mins((arm, n)), dt)
      }
    }

    val saved = confs.map { case (k, _) =>
      k -> spark.conf.getOption(k) }
    for (rep <- 1 to reps) {
      runArm("base")
      confs.foreach { case (k, v) => spark.conf.set(k, v) }
      runArm("cand")
      saved.foreach {
        case (k, Some(v)) => spark.conf.set(k, v)
        case (k, None)    => spark.conf.unset(k)
      }
      println(s"[conf-ab] rep$rep done")
    }
    var baseSum = 0.0
    var candSum = 0.0
    for (n <- names) {
      val b = mins(("base", n)); val c = mins(("cand", n))
      baseSum += b; candSum += c
      println(f"[conf-ab] $n%-22s base=$b%.3f cand=$c%.3f delta=${b - c}%+.3f")
    }
    println(f"[conf-ab] TOTAL base=$baseSum%.3f cand=$candSum%.3f " +
      f"delta=${baseSum - candSum}%+.3f confs=${confs.mkString(";")}")
    spark.stop()
  }
}
