package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** 110×-scale probe for q_substr_dedup's round-14 window formulation:
 * the corpus-frequency WINDOW over h sorts the full gram stream per
 * partition where the pre-r14 shape hash-aggregated it — this probe
 * runs the ACTUAL gate entry against a DocGen corpus at N× to show the
 * sort survives scale (and to catch it if it doesn't).
 *
 * runMain graft.tools.SubstrScaleProbe [rows] [reps] */
object SubstrScaleProbe {
  def main(args: Array[String]): Unit = {
    val rows = if (args.length > 0) args(0).toLong else 500000L
    val reps = if (args.length > 1) args(1).toInt else 2
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = java.nio.file.Files.createTempDirectory("substr_probe_")
    try {
      spark.read.format("graft.sources.DocGen")
        .option("rows", rows).option("partitions", 64).option("seed", 11L)
        .load().select("doc_id", "text")
        // DocGen text is unique per id; plant 5% exact clones so the
        // dup-gram side has corpus-scale work, like the smoke does
        .union(spark.read.format("graft.sources.DocGen")
          .option("rows", rows / 20).option("partitions", 8)
          .option("seed", 11L).load()
          .select((col("doc_id") + rows).as("doc_id"), col("text")))
        .withColumn("source", lit("probe")).withColumn("lang", lit("en"))
        .write.parquet(dir.resolve("documents.parquet").toString)
      for (i <- 1 to reps) {
        val t0 = System.nanoTime()
        val n = graft.SparkEntry.queries("q_substr_dedup")(
          spark, dir.toString).count()
        spark.catalog.clearCache()
        println(f"[substr-probe] rows=$rows rep$i " +
          f"${(System.nanoTime() - t0) / 1e9}%.2f s out=$n")
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
