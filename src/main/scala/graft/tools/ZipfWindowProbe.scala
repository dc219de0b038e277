package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Planted-hot-key probe for the window-over-key corpus-frequency shape
 * (the r14 formulation of q_tfidf / q_lm_score / q_substr_dedup).
 *
 * Generates a 110×-scale DocGen corpus twice — plain, and with 8 "hot"
 * tokens appended to EVERY document so the single bigram ("hot","hot")
 * carries ~10% of all bigram occurrences (one key at 10% corpus mass,
 * the verdict's planted-skew criterion) — then times the raw-occurrence
 * corpus-frequency attachment both ways on each corpus:
 *
 *   window : freq = count(*) over (partition by h)   — 1 scan, but the
 *            hot key's every occurrence lands in ONE WindowExec task
 *   routed : plans.HotColdFreq.withFreq              — 2 scans, hot keys
 *            broadcast around the exchange, cold tail bounded
 *
 * Both reduce to the identical per-doc aggregate and a single corpus
 * checksum (sum over docs of sum(freq)) which the probe ASSERTS equal —
 * routing must never change a value. The bigram-occurrence stream is
 * the sharpest of the three exposures (unbounded per-doc mass); the
 * per-doc-collapsed windows (tfidf df, substr grams) are bounded by
 * n_docs, which at lake scale is the same failure.
 *
 * Optional third arg: hot tokens appended per doc (default 8 → ~10%
 * hot mass; 32 → ~34%) — the degradation-curve knob.
 *
 * runMain graft.tools.ZipfWindowProbe [rows] [reps] [hotToks]
 */
object ZipfWindowProbe {
  def main(args: Array[String]): Unit = {
    val rows = if (args.length > 0) args(0).toLong else 550000L
    val reps = if (args.length > 1) args(1).toInt else 2
    val hotToks = if (args.length > 2) args(2).toInt else 8
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def corpus(planted: Boolean): DataFrame = {
      val base = spark.read.format("graft.sources.DocGen")
        .option("rows", rows).option("partitions", 64).option("seed", 11L)
        .load().select(col("doc_id"), col("text"))
      if (!planted) base
      else base.withColumn("text",
        concat(col("text"), lit(" hot" * hotToks)))
    }

    // the q_lm_score bigram-occurrence stream, verbatim shape (r16:
    // kernel-hashed like the entry; BigramHashesSpec pins kernel ≡
    // composite, so the probe's history stays comparable)
    graft.functions.BigramHashes.register(spark)
    def bigrams(docs: DataFrame): DataFrame = docs
      .select(col("doc_id"), split(col("text"), " ").as("ts"))
      .select(col("doc_id"),
        explode(graft.functions.BigramHashes.of(col("ts"))).as("h"))

    def windowForm(docs: DataFrame): DataFrame = bigrams(docs)
      .withColumn("freq", count(lit(1)).over(Window.partitionBy("h")))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n"), sum(col("freq")).as("sum_freq"))

    def routedForm(persist: Boolean)(docs: DataFrame): DataFrame =
      graft.plans.HotColdFreq.withFreq(
          bigrams(docs), "h", "freq", lit(1L), col("doc_id"),
          persistFreq = persist)
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n"), sum(col("freq")).as("sum_freq"))

    // one exact corpus checksum: forces everything, fits the driver
    def checksum(df: DataFrame): Long =
      df.agg(sum(col("sum_freq"))).head().getLong(0)

    val metrics = scala.collection.mutable.LinkedHashMap[String, Any](
      "rows" -> rows, "reps" -> reps)
    for (planted <- Seq(false, true)) {
      val docs = corpus(planted)
      val tag = if (planted) s"planted-${hotToks}tok" else "plain"
      // skew facts, once per corpus: mass of the hottest key
      val top = bigrams(docs).groupBy("h").count()
        .agg(max("count").as("m"), sum("count").as("t")).head()
      println(f"[zipf-probe] $tag rows=$rows hottest_key=${top.getLong(0)}" +
        f" of ${top.getLong(1)} occ (${100.0 * top.getLong(0) / top.getLong(1)}%.1f%%)")
      metrics(s"$tag:hottest_key_occ") = top.getLong(0)
      metrics(s"$tag:total_occ") = top.getLong(1)
      var sums = Map[String, Long]()
      for (rep <- 1 to reps; (name, form) <- Seq(
          "window" -> windowForm _,
          "routed" -> routedForm(persist = true) _,
          "routed-noP" -> routedForm(persist = false) _)) {
        val t0 = System.nanoTime()
        val s = checksum(form(docs))
        val secs = (System.nanoTime() - t0) / 1e9
        // drop the routed form's persisted freq OUTSIDE the timed
        // window so every rep measures a cold build and no arm is
        // charged another arm's (or its own) unpersist
        spark.catalog.clearCache()
        metrics(f"$tag:$name:rep$rep%d_sec") = math.rint(secs * 1000) / 1000.0
        println(f"[zipf-probe] $tag $name rep$rep $secs%.2f s checksum=$s")
        sums.get(name + tag).foreach(p => assert(p == s, s"unstable $name"))
        sums += (name + tag) -> s
      }
      val w = sums("window" + tag)
      for (arm <- Seq("routed", "routed-noP")) {
        val r = sums(arm + tag)
        assert(w == r, s"window/$arm checksum mismatch: $w vs $r")
      }
      metrics(s"$tag:checksums_agree") = true
      println(s"[zipf-probe] $tag checksums agree: $w")
    }
    // one JSON artifact per run (committed as the skew-probe evidence)
    sys.env.get("SPARK_GRAFT_ZIPF_OUT").foreach { out =>
      ToolMetrics.write(metrics, out)
      println(s"[zipf-probe] metrics written to $out")
    }
    spark.stop()
  }
}
