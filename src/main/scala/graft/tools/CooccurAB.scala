package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Interleaved A/B for q_cooccur's branch structure. The r10 decision
 * NOT to cache `baskets` (array-heavy rows through the block manager
 * measured 2.2 s vs 1.2 s) stands — but the r15 executed sweep read 4
 * lineitem scans with 0 reused exchanges, i.e. the basket aggregation
 * genuinely runs FOUR times (pairs + items ×2 references + tot), and
 * caching was never tried on the TINY frames derived from it. Arm B:
 * persist `items` (one row per distinct partkey — 12 B/row, nothing
 * like the basket arrays) so both broadcast references share one
 * basket pass, and compute `n_orders` as a count_distinct straight off
 * lineitem (no collect_set for a scalar). Checksums asserted equal.
 *
 * runMain graft.tools.CooccurAB [sfDir] [reps]
 */
object CooccurAB {
  def main(args: Array[String]): Unit = {
    val dir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val reps = if (args.length > 1) args(1).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.read.parquet(s"$dir/lineitem.parquet")
      .groupBy("l_returnflag").count().count() // warmup

    def current(): DataFrame = graft.SparkEntry.queries("q_cooccur")(spark, dir)

    def variant(): DataFrame = {
      val li = spark.read.parquet(s"$dir/lineitem.parquet")
      val baskets = li.groupBy(col("l_orderkey"))
        .agg(sort_array(collect_set(col("l_partkey"))).as("parts"))
      val items = baskets.select(explode(col("parts")).as("pk"))
        .groupBy(col("pk")).agg(count(lit(1)).as("cnt"))
        .persist()
      val tot = li.agg(countDistinct(col("l_orderkey")).as("n_orders"))
      val pairs = baskets
        .filter(size(col("parts")) >= 2)
        .select(posexplode(col("parts")).as(Seq("i", "pk1")), col("parts"))
        .select(col("pk1"), explode(
          slice(col("parts"), col("i") + lit(2), size(col("parts")))).as("pk2"))
        .groupBy(col("pk1"), col("pk2"))
        .agg(count(lit(1)).as("pair_cnt"))
      pairs
        .join(broadcast(items.select(col("pk").as("pk1"), col("cnt").as("cnt1"))), Seq("pk1"))
        .join(broadcast(items.select(col("pk").as("pk2"), col("cnt").as("cnt2"))), Seq("pk2"))
        .crossJoin(broadcast(tot))
        .withColumn("lift",
          (col("pair_cnt") * col("n_orders")).cast("double") /
            (col("cnt1") * col("cnt2")).cast("double"))
        .orderBy(col("pair_cnt").desc, col("pk1"), col("pk2"))
        .limit(100)
        .select("pk1", "pk2", "pair_cnt", "lift")
    }

    def checksum(df: DataFrame): (Long, Long, Double) = {
      val r = df.agg(sum("pair_cnt"), count(lit(1)),
        round(sum("lift"), 6)).head()
      (r.getLong(0), r.getLong(1), r.getDouble(2))
    }

    var sums = Map[String, (Long, Long, Double)]()
    for (rep <- 1 to reps; (name, form) <- Seq(
        "current" -> current _, "variant" -> variant _)) {
      val t0 = System.nanoTime()
      val s = checksum(form())
      val secs = (System.nanoTime() - t0) / 1e9
      spark.catalog.clearCache() // outside the timed window
      println(f"[cooccur-ab] $name rep$rep $secs%.2f s checksum=$s")
      sums.get(name).foreach(p => assert(p == s, s"unstable $name"))
      sums += name -> s
    }
    assert(sums("current") == sums("variant"),
      s"arm mismatch: ${sums("current")} vs ${sums("variant")}")
    println(s"[cooccur-ab] checksums agree: ${sums("current")}")
    spark.stop()
  }
}
