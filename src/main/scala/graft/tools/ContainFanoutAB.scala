package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** r21 follow-up to ContainBuildAB: that A/B showed the docs CACHE BUILD
 * does not benefit from fanout — but the cache itself materializes at
 * the scan's single partition (no exchange below it, so the cached-plan
 * AQE conf has nothing to widen), which means q_containment's heavy
 * CONSUMER chain — explode to ~500k (doc, shingle-hash) rows →
 * broadcast df join → TopKPerKey partial prune — also runs as ONE task.
 * Arm "fanout" repartitions the cached frame by doc_id before deriving
 * `ex`, so the explode/join/prune map work runs wide while the cache
 * build and every downstream result stay identical (asserted).
 *
 * runMain graft.tools.ContainFanoutAB [sfDir] [reps]
 */
object ContainFanoutAB {
  def main(args: Array[String]): Unit = {
    val dir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val reps = if (args.length > 1) args(1).toInt else 5
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold",
        "1048576")
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.read.parquet(s"$dir/lineitem.parquet")
      .groupBy("l_returnflag").count().count()

    def containment(fan: Boolean): DataFrame = {
      graft.functions.HashArray.register(spark)
      graft.functions.SortedIntersect.register(spark)
      val docs = graft.queries.LlmOps.docsWithShingles(spark, dir)
        .filter(size(col("sh")) > 0)
        .select(col("doc_id"), sort_array(
          graft.functions.HashArray.arrayHash(col("sh"))).as("hs"))
        .cache()
      val exSrc = if (fan) docs.repartition(col("doc_id")) else docs
      val ex = exSrc.select(col("doc_id"), size(col("hs")).as("sz"),
        explode(col("hs")).as("h"))
      val dfreq = ex.groupBy("h").agg(count(lit(1)).as("df"))
      val maxSzRow = docs.agg(max(size(col("hs")))).head()
      val maxK =
        if (maxSzRow.isNullAt(0)) 1
        else math.floor(maxSzRow.getInt(0) * 0.2).toInt + 1
      val prefix = graft.plans.TopK.perKey(ex.join(dfreq, "h"),
          Seq("doc_id"), Seq(col("df").asc, col("h").asc), maxK)
        .withColumn("rk", row_number().over(
          Window.partitionBy("doc_id").orderBy(col("df").asc, col("h").asc)))
        .filter(col("rk") <= floor(col("sz") * lit(0.2)).cast("int") + lit(1))
        .select(col("doc_id").as("a_id"), col("sz").as("sza"), col("h"))
      val cand = prefix
        .join(ex.select(col("doc_id").as("b_id"), col("sz").as("szb"),
            col("h")),
          Seq("h"))
        .filter(col("a_id") =!= col("b_id") &&
          col("szb").cast("double") >= col("sza") * lit(0.8))
        .select("a_id", "b_id").distinct()
      cand
        .join(docs.select(col("doc_id").as("a_id"), col("hs").as("ha")), "a_id")
        .join(docs.select(col("doc_id").as("b_id"), col("hs").as("hb")), "b_id")
        .withColumn("containment",
          graft.functions.SortedIntersect.of(col("ha"), col("hb"))
            .cast("double") / size(col("ha")))
        .filter(col("containment") >= 0.8)
        .select(col("a_id"), col("b_id"),
          round(col("containment"), 4).as("containment"))
        .orderBy("a_id", "b_id")
    }

    var sigB = Option.empty[Int]; var sigF = Option.empty[Int]
    var b = Double.MaxValue; var f = Double.MaxValue
    for (rep <- 1 to reps) {
      for (fan <- Seq(false, true)) {
        val t0 = System.nanoTime()
        val df = containment(fan)
        df.count()
        val dt = (System.nanoTime() - t0) / 1e9
        val sig = df.collect().map(_.toString).mkString("|").hashCode
        spark.catalog.clearCache()
        if (fan) { f = math.min(f, dt)
          sigF.foreach(p => assert(p == sig)); sigF = Some(sig) }
        else { b = math.min(b, dt)
          sigB.foreach(p => assert(p == sig)); sigB = Some(sig) }
        println(f"[contain-fan] rep$rep fan=$fan $dt%.3f s")
      }
    }
    assert(sigB == sigF, s"arm mismatch $sigB vs $sigF")
    println(f"[contain-fan] RESULT min base=$b%.3f fanout=$f%.3f " +
      f"delta=${b - f}%+.3f (sigs agree)")
    spark.stop()
  }
}
