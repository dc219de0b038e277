package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Interleaved A/B for q_substr_dedup's declared swap-in (SURVEY
 * backlog #2): the shipping TWO-SCAN shape (dup-only aggregation +
 * gram_cnt from a second text projection) vs the ONE-SCAN variant
 * (carry pos_cnt through the explode and aggregate ALL gram rows per
 * doc — no second corpus scan, no join). The stride criterion fired in
 * round 15: dup_gram fraction measured 9.4% on the sf0.1 gate corpus
 * and 45% on the long-doc probe corpus (both above the ~5% line), so
 * the variant must be measured, not assumed.
 *
 * Arms alternate in one JVM (the r14 measurement discipline); both
 * reduce to identical (sum gram_cnt, sum dup_gram_cnt, row count)
 * checksums, asserted every rep.
 *
 * runMain graft.tools.SubstrOneScanAB [sfDir|gen] [reps] [rows] [blocks]
 */
object SubstrOneScanAB {
  def main(args: Array[String]): Unit = {
    val where = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val reps = if (args.length > 1) args(1).toInt else 3
    val rows = if (args.length > 2) args(2).toLong else 20000L
    val blocks = if (args.length > 3) args(3).toInt else 64
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.SubstrHash.register(spark)

    var cleanup: Option[java.nio.file.Path] = None
    val dir = if (where != "gen") where else {
      val d = java.nio.file.Files.createTempDirectory("substr_ab_")
      val b0 = spark.read.format("graft.sources.DocGen")
        .option("rows", rows * blocks).option("partitions", 64)
        .option("seed", 11L).load().select("doc_id", "text")
      b0.groupBy((col("doc_id") / blocks).cast("long").as("doc_id"))
        .agg(concat_ws(" ", collect_list(col("text"))).as("text"))
        .withColumn("source", lit("probe")).withColumn("lang", lit("en"))
        .write.parquet(d.resolve("documents.parquet").toString)
      cleanup = Some(d); d.toString
    }

    val k = 30
    def g1(s: SparkSession): DataFrame = s.read
      .parquet(s"$dir/documents.parquet")
      .filter(length(col("text")) >= k)
      .select(col("doc_id"),
        explode(graft.functions.SubstrHash.windowsRle(col("text"), k)).as("w"))
      .select(col("doc_id"), col("w.h").as("h"), col("w.c").as("pos_cnt"))

    // arm A: the two-scan shape spelled out EXPLICITLY (the gate entry
    // itself switched to one-scan once this A/B decided — calling it
    // here would compare one-scan against itself and the instrument
    // could never re-litigate its own decision): dup-only aggregation,
    // gram_cnt from a second text projection, left join
    def twoScan(): DataFrame = {
      val docs = spark.read.parquet(s"$dir/documents.parquet")
        .filter(length(col("text")) >= k)
      val dup = graft.plans.HotColdFreq.withFreq(
          g1(spark), "h", "tot", col("pos_cnt"), col("doc_id"))
        .filter(col("tot") >= 2)
        .groupBy(col("doc_id"))
        .agg(sum(col("pos_cnt")).as("dup_gram_cnt"))
      docs.select(col("doc_id"),
          (length(col("text")) - lit(k - 1)).cast("long").as("gram_cnt"))
        .join(dup, Seq("doc_id"), "left")
        .select(col("doc_id"), col("gram_cnt"),
          coalesce(col("dup_gram_cnt"), lit(0L)).as("dup_gram_cnt"))
        .withColumn("dup_ratio",
          col("dup_gram_cnt").cast("double") / col("gram_cnt").cast("double"))
        .orderBy(col("doc_id"))
    }

    // arm B: one-scan — aggregate every RLE row, gram_cnt included
    def oneScan(): DataFrame =
      graft.plans.HotColdFreq.withFreq(
          g1(spark), "h", "tot", col("pos_cnt"), col("doc_id"))
        .groupBy("doc_id")
        .agg(sum(col("pos_cnt")).as("gram_cnt"),
          sum(when(col("tot") >= 2, col("pos_cnt")).otherwise(0L))
            .as("dup_gram_cnt"))
        .withColumn("dup_ratio",
          col("dup_gram_cnt").cast("double") / col("gram_cnt").cast("double"))
        .orderBy(col("doc_id"))

    def checksum(df: DataFrame): (Long, Long, Long) = {
      val r = df.agg(sum("gram_cnt"), sum("dup_gram_cnt"), count(lit(1))).head()
      (r.getLong(0), r.getLong(1), r.getLong(2))
    }

    var sums = Map[String, (Long, Long, Long)]()
    for (rep <- 1 to reps; (name, form) <- Seq(
        "two-scan" -> twoScan _, "one-scan" -> oneScan _)) {
      val t0 = System.nanoTime()
      val s = checksum(form())
      val secs = (System.nanoTime() - t0) / 1e9
      spark.catalog.clearCache() // outside the timed window
      println(f"[substr-ab] $name rep$rep $secs%.2f s checksum=$s")
      sums.get(name).foreach(p => assert(p == s, s"unstable $name"))
      sums += name -> s
    }
    assert(sums("two-scan") == sums("one-scan"),
      s"arm mismatch: ${sums("two-scan")} vs ${sums("one-scan")}")
    println(s"[substr-ab] checksums agree: ${sums("one-scan")}")
    cleanup.foreach { d =>
      val w = java.nio.file.Files.walk(d)
      try w.sorted(java.util.Comparator.reverseOrder())
        .forEach(p => java.nio.file.Files.deleteIfExists(p))
      finally w.close()
    }
    spark.stop()
  }
}
