package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** 110×-scale probe for q_substr_dedup's round-14 window formulation:
 * the corpus-frequency WINDOW over h sorts the full gram stream per
 * partition where the pre-r14 shape hash-aggregated it — this probe
 * runs the ACTUAL gate entry against a DocGen corpus at N× to show the
 * sort survives scale (and to catch it if it doesn't).
 *
 * Round 15: optional `blocks` arg concatenates `blocks` distinct DocGen
 * texts per doc (the long-document corpus shape, ~10–50 KB/doc) and the
 * probe reports dup_gram rows / corpus gram rows — SURVEY backlog #2's
 * stride criterion: below ~5% the two-scan dup-only shape stands;
 * above, the one-scan variant (carry gram_cnt through the explode)
 * is worth benching.
 *
 * runMain graft.tools.SubstrScaleProbe [rows] [reps] [blocks] */
object SubstrScaleProbe {
  def main(args: Array[String]): Unit = {
    val rows = if (args.length > 0) args(0).toLong else 500000L
    val reps = if (args.length > 1) args(1).toInt else 2
    val blocks = if (args.length > 2) args(2).toInt else 1
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = java.nio.file.Files.createTempDirectory("substr_probe_")
    try {
      def gen(n: Long, idOff: Long): org.apache.spark.sql.DataFrame = {
        val b0 = spark.read.format("graft.sources.DocGen")
          .option("rows", n * blocks).option("partitions", 64)
          .option("seed", 11L).load().select("doc_id", "text")
        val b = if (blocks == 1) b0
          else b0.groupBy((col("doc_id") / blocks).cast("long").as("doc_id"))
            .agg(concat_ws(" ", collect_list(col("text"))).as("text"))
        b.select((col("doc_id") + idOff).as("doc_id"), col("text"))
      }
      gen(rows, 0L)
        // DocGen text is unique per id; plant 5% exact clones so the
        // dup-gram side has corpus-scale work, like the smoke does
        .union(gen(rows / 20, rows))
        .withColumn("source", lit("probe")).withColumn("lang", lit("en"))
        .write.parquet(dir.resolve("documents.parquet").toString)
      // stride criterion (SURVEY backlog #2): the duplicated-gram
      // fraction decides whether the second corpus scan (gram_cnt
      // projection) or the full-gram final aggregation is cheaper
      graft.functions.SubstrHash.register(spark)
      val g1 = spark.read.parquet(dir.resolve("documents.parquet").toString)
        .filter(length(col("text")) >= 30)
        .select(col("doc_id"),
          explode(graft.functions.SubstrHash.windowsRle(col("text"), 30))
            .as("w"))
        .select(col("doc_id"), col("w.h").as("h"), col("w.c").as("c"))
      val fr = graft.plans.HotColdFreq.withFreq(
          g1, "h", "tot", col("c"), col("doc_id"))
        .agg(count(lit(1)).as("rle_rows"),
          sum(when(col("tot") >= 2, 1L).otherwise(0L)).as("dup_rle_rows"),
          sum(col("c")).as("gram_mass"),
          sum(when(col("tot") >= 2, col("c")).otherwise(0L)).as("dup_mass"))
        .head()
      println(f"[substr-probe] dup_fraction rle_rows=" +
        f"${fr.getLong(1).toDouble / fr.getLong(0)}%.4f " +
        f"(${fr.getLong(1)}/${fr.getLong(0)}) " +
        f"gram_mass=${fr.getLong(3).toDouble / fr.getLong(2)}%.4f")
      // the criterion pass above persisted a freq frame whose plan can
      // canonically match the entry's own — drop it so rep1 is cold
      spark.catalog.clearCache()
      for (i <- 1 to reps) {
        val t0 = System.nanoTime()
        val n = graft.SparkEntry.queries("q_substr_dedup")(
          spark, dir.toString).count()
        val secs = (System.nanoTime() - t0) / 1e9
        spark.catalog.clearCache() // outside the timed window
        println(f"[substr-probe] rows=$rows rep$i $secs%.2f s out=$n")
      }
    } finally {
      // best-effort cleanup of the generated corpus
      try {
        val w = java.nio.file.Files.walk(dir)
        try w.sorted(java.util.Comparator.reverseOrder())
          .forEach(p => java.nio.file.Files.deleteIfExists(p))
        finally w.close()
      } catch { case _: Throwable => }
      spark.stop()
    }
  }
}
