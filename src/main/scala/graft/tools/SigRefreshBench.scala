package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/**
 * Matched-window wall for the signature index BUILD and 2% REFRESH in
 * isolation — exists because `sig index INCREMENTAL` rose monotonically
 * across the day's four smoke artifacts (3.6 → 6.9 → 11.8 → 29.7 s)
 * while neighbouring stages tracked window load, which smells like
 * state accumulating across runs (e.g. the day's orphaned sibling
 * stores in tmp) rather than load. Same corpus + delta shape as
 * ScaleSmoke's incremental section.
 *
 * Round 15: optional `blocks` arg synthesizes a LONG-document corpus
 * (each doc the concatenation of `blocks` distinct DocGen texts, so
 * shingle statistics stay realistic instead of self-repeating) — the
 * bucketed-corpus-mirror criterion (SURVEY backlog #1) was measured at
 * 4.5% on ~360 B docs but the identity scan reads 100% of corpus bytes
 * while the sig work reads only the delta's, so the share scales with
 * bytes/doc and must be re-read at the 10–50 KB/doc shape real
 * pretraining data has.
 *
 *   sbt "runMain graft.tools.SigRefreshBench [rows] [blocks]"
 */
object SigRefreshBench {
  def main(args: Array[String]): Unit = {
    val rows = if (args.length > 0) args(0).toLong else 500000L
    val blocks = if (args.length > 1) args(1).toInt else 1
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[sigbench] $label%-28s ${(System.nanoTime() - t0) / 1e9}%7.2f s ($r)")
      r
    }
    val base0 = spark.read.format("graft.sources.DocGen")
      .option("rows", rows * blocks).option("partitions", 64)
      .option("seed", 11L).load().select("doc_id", "text")
    val base =
      if (blocks == 1) base0
      else base0
        .groupBy((col("doc_id") / blocks).cast("long").as("doc_id"))
        .agg(concat_ws(" ", collect_list(col("text"))).as("text"))
    val dir = java.nio.file.Files
      .createTempDirectory("graft_sigbench").toString
    base.withColumn("lang", lit("l0")).withColumn("source", lit("gen"))
      .withColumn("n_chars", length(col("text")))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    println(f"[sigbench] corpus shape: $rows docs, avg bytes/doc " +
      spark.read.parquet(s"$dir/documents.parquet")
        .agg(avg(col("n_chars"))).head().getDouble(0).round)
    t("sig BUILD (cold store)")(
      graft.sources.MinHashSigIndex.sigs(spark, dir).count())
    // 2% delta, the ScaleSmoke shape
    base.filter(col("doc_id") % 50 === 0)
      .select((col("doc_id") + 3 * rows).as("doc_id"), col("text"))
      .withColumn("lang", lit("l0")).withColumn("source", lit("gen"))
      .withColumn("n_chars", length(col("text")))
      .write.mode("append").parquet(s"$dir/documents.parquet")
    val s2 = spark.newSession() // fresh serve memo; the refresh is timed
    t("sig REFRESH (2% delta)")(
      graft.sources.MinHashSigIndex.sigs(s2, dir).count())
    // the refresh's corpus-identity slice in isolation: the full-corpus
    // (doc_id, xxhash64(text)) projection delta detection pays even for
    // a 1-doc delta — the share that SURVEY's round-15 backlog item 1
    // (bucketed corpus mirror) would turn into a pruned scan. Ratio of
    // this wall to the refresh wall is that item's decision criterion.
    t("corpus identity scan alone")(
      spark.read.parquet(s"$dir/documents.parquet")
        .select(col("doc_id"), xxhash64(col("text")).as("text_hash"))
        .count())
    // the other two slices of the refresh wall, isolated: what the 2%
    // delta's shingle+minhash actually costs, and what a cold-session
    // serve of the CURRENT store costs (manifest hit, no refresh) —
    // together with the identity scan these bound where a long-doc
    // refresh's time goes
    t("delta sig compute alone")(
      graft.queries.LlmOps.sigsPlanFor(
        spark.read.parquet(s"$dir/documents.parquet")
          .filter(col("doc_id") >= 3 * rows)
          .select(col("doc_id"), col("text"))).count())
    t("serve count alone (warm store)")(
      graft.sources.MinHashSigIndex.sigs(spark.newSession(), dir).count())
    graft.queries.Q.deleteRecursively(java.nio.file.Paths.get(dir))
    graft.queries.Q.deleteRecursively(
      graft.sources.MinHashSigIndex.store(dir))
    spark.stop()
  }
}
