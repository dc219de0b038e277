package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/**
 * Matched-window wall for the pair-table FIRST BUILD alone: writes the
 * ScaleSmoke corpus (unique DocGen + 5% exact clones + 5% near-dups)
 * to a temp documents.parquet, pre-builds the signature index (so the
 * timed number is the pair build, not sig+pair), then times
 * NeardupPairsIndex.pairs from a cold artifact store, `reps` times
 * (deleting the pair artifact between reps; the sig store persists).
 * Exists because full-ScaleSmoke walls ride ~80-minute windows of
 * varying machine load — cross-artifact comparisons of ONE stage need
 * an interleavable single-stage harness (the bench_repro convention).
 *
 *   sbt "runMain graft.tools.PairBuildBench [rows] [reps]"
 */
object PairBuildBench {
  def main(args: Array[String]): Unit = {
    val rows = if (args.length > 0) args(0).toLong else 500000L
    val reps = if (args.length > 1) args(1).toInt else 2
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold",
        sys.env.getOrElse("SPARK_GRAFT_OBJ_AGG_KEYS", "1048576"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val base = spark.read.format("graft.sources.DocGen")
      .option("rows", rows).option("partitions", 64).option("seed", 11L)
      .load().select("doc_id", "text")
    val corpus = base
      .union(base.filter(col("doc_id") % 20 === 0)
        .select((col("doc_id") + rows).as("doc_id"), col("text")))
      .union(base.filter(col("doc_id") % 20 === 1)
        .select((col("doc_id") + 2 * rows).as("doc_id"),
          concat(col("text"), lit(" trailing near dup marker")).as("text")))
    val dir = java.nio.file.Files
      .createTempDirectory("graft_pairbench").toString
    corpus
      .withColumn("lang", lit("l0")).withColumn("source", lit("gen"))
      .withColumn("n_chars", length(col("text")))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    // sig index built once, outside the timed region
    val nSigs = graft.sources.MinHashSigIndex.sigs(spark, dir).count()
    println(s"[pairbench] rows=$rows sigs=$nSigs")

    val pairDir = graft.sources.NeardupPairsIndex.artifactDir(dir)
    for (i <- 1 to reps) {
      graft.queries.Q.deleteRecursively(pairDir)
      // a FRESH child session per rep: the serve frame memoizes per
      // (session, store, stamp) under a WeakReference, and the stamp is
      // unchanged across reps — reusing the parent session would hand
      // rep 2 the rep-1 frame whose listed part files were just
      // deleted unless a GC happened to clear the reference (a flaky
      // FileNotFoundException). A child session shares the context but
      // gets its own memo map, so every rep deterministically re-reads.
      val s = spark.newSession()
      s.catalog.clearCache()
      val t0 = System.nanoTime()
      val n = graft.sources.NeardupPairsIndex.pairs(s, dir).count()
      println(f"[pairbench] rep$i build+serve ${(System.nanoTime() - t0) / 1e9}%.2f s pairs=$n")
    }
    graft.queries.Q.deleteRecursively(java.nio.file.Paths.get(dir))
    graft.queries.Q.deleteRecursively(pairDir)
    graft.queries.Q.deleteRecursively(
      graft.sources.MinHashSigIndex.store(dir))
    spark.stop()
  }
}
