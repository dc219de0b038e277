package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.plans.HotColdFreq

/** Freq-build share of an end-to-end 2% incremental refresh at 110× —
 * the SURVEY round-17 backlog #1 criterion probe (VERDICT r16 next #1).
 *
 * Context: [[HotColdFreq.freqTable]] OVERWRITES on every call — freq is
 * corpus-derived state, so a 2% corpus append currently re-pays the
 * full corpus scan + explode + aggregate + bucketed write. The
 * incremental shape (merge a delta-sized aggregation into the existing
 * bucketed table, the ManifestStore refresh idiom) is only worth its
 * maintenance surface if the full rebuild DOMINATES a real refresh
 * cycle. This probe measures that share directly:
 *
 *  1. Build the corpus-snapshot artifacts a text pipeline maintains —
 *     the signature index, the near-dup pair table, and a freqTable —
 *     over a 110×-gate DocGen corpus. TWO freq key shapes, because the
 *     share is regime-dependent: `bigram` (q_lm_score's
 *     `word_bigram_hashes` stream — DocGen's closed vocabulary keeps
 *     this in the few-hundred-key persist regime, the LOWER bound) and
 *     `gram` (q_substr_dedup's 30-char rolling-window stream, ~10^8
 *     distinct keys at this corpus — the key space freqTable exists
 *     for, the honest lake-regime point).
 *  2. Append the 2% delta (SigRefreshBench's shape).
 *  3. Re-run the refresh cycle end-to-end in a fresh session: sig
 *     refresh (delta-scoped by the manifest), pair refresh
 *     (delta-banded), freq FULL REBUILD (today's overwrite semantics)
 *     per shape.
 *  4. Report each shape's freq-rebuild share of the cycle wall,
 *     share = rebuild / (sig + pair + rebuild) — "if this were the
 *     freq artifact in the loop". Decision rule (declared in the r17
 *     backlog): share > ~30% → build the incremental merge; under it
 *     → document and keep overwrite.
 *
 * The criterion FIRED on the first (rebuild-only) run — gram share
 * 63.4%, bigram 11.7% — so [[HotColdFreq.freqTableRefresh]] exists and
 * the `incremental` arm times the delta-aggregate + bucket-merge
 * refresh on the SAME delta, checksum-asserted against the full
 * rebuild — the measured answer to "what does the incremental shape
 * actually buy".
 *
 *   sbt "runMain graft.tools.FreqRefreshProbe [rows] [arms]"
 *   // rows default 550000 (110× the sf0.1 gate corpus)
 *   // arms csv subset of rebuild,incremental (default both)
 *   SPARK_GRAFT_FREQREFRESH_OUT=<path> writes the JSON artifact.
 */
object FreqRefreshProbe {
  def main(args: Array[String]): Unit = {
    val rows = if (args.length > 0) args(0).toLong else 550000L
    val arms = (if (args.length > 1) args(1) else "rebuild,incremental")
      .split(",").map(_.trim).toSet
    require(arms.nonEmpty && arms.subsetOf(Set("rebuild", "incremental")),
      s"unknown arm in $arms")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // the bucketed freq write: cap row groups so 32 concurrent
      // writers stay modest (the FreqCardinalityProbe precedent)
      .config("spark.hadoop.parquet.block.size", s"${32 * 1024 * 1024}")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val metrics = scala.collection.mutable.LinkedHashMap[String, Any](
      "rows" -> rows, "arms" -> arms.toSeq.sorted.mkString(","),
      "heap_max_mb" -> (Runtime.getRuntime.maxMemory() / (1024 * 1024)))
    def t[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      val secs = math.rint((System.nanoTime() - t0) / 1e6) / 1000.0
      println(f"[freq-refresh] $label%-32s $secs%8.2f s")
      metrics("sec: " + label) = secs
      r
    }

    // ---- corpus + 110× snapshot artifacts -------------------------------
    val dir = java.nio.file.Files
      .createTempDirectory("graft_freqrefresh").toString
    val base = spark.read.format("graft.sources.DocGen")
      .option("rows", rows).option("partitions", 64).option("seed", 11L)
      .load().select("doc_id", "text")
    base.withColumn("lang", lit("l0")).withColumn("source", lit("gen"))
      .withColumn("n_chars", length(col("text")))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")

    // the two freq key shapes: (name, occurrence-stream builder,
    // freq column, weight column) — per-session kernel registration
    // because the refresh cycle runs in a fresh session
    def bigrams(docs: DataFrame): DataFrame = {
      graft.functions.BigramHashes.register(docs.sparkSession)
      docs.select(col("doc_id"), split(col("text"), " ").as("ts"))
        .select(col("doc_id"),
          explode(graft.functions.BigramHashes.of(col("ts"))).as("h"))
    }
    def grams(docs: DataFrame): DataFrame = {
      graft.functions.SubstrHash.register(docs.sparkSession)
      docs.filter(length(col("text")) >= 30)
        .select(col("doc_id"),
          explode(graft.functions.SubstrHash.windowsRle(col("text"), 30))
            .as("w"))
        .select(col("doc_id"), col("w.h").as("h"), col("w.c").as("pos_cnt"))
    }
    val shapes: Seq[(String, DataFrame => DataFrame, org.apache.spark.sql.Column)] =
      Seq(("bigram", bigrams, lit(1L)), ("gram", grams, col("pos_cnt")))
    def corpusDocs(s: SparkSession): DataFrame =
      s.read.parquet(s"$dir/documents.parquet").select("doc_id", "text")
    def tblOf(shape: String) = s"graft_freq_refresh_probe_$shape"

    t("sig BUILD (cold store)")(
      graft.sources.MinHashSigIndex.sigs(spark, dir).count())
    t("pair BUILD (cold store)")(
      graft.sources.NeardupPairsIndex.pairs(spark, dir).count())
    for ((shape, stream, w) <- shapes) {
      spark.sql(s"DROP TABLE IF EXISTS ${tblOf(shape)}")
      val nKeys = t(s"freq BUILD ($shape)") {
        HotColdFreq.freqTable(stream(corpusDocs(spark)), "h", "freq",
          w, tblOf(shape), cpus.toInt).count()
      }
      println(s"[freq-refresh]   distinct $shape keys=$nKeys")
      metrics(s"freq_distinct_keys_$shape") = nKeys
    }

    // ---- the 2% delta (SigRefreshBench's shape) -------------------------
    val delta = base.filter(col("doc_id") % 50 === 0)
      .select((col("doc_id") + 3 * rows).as("doc_id"), col("text"))
    delta.withColumn("lang", lit("l0")).withColumn("source", lit("gen"))
      .withColumn("n_chars", length(col("text")))
      .write.mode("append").parquet(s"$dir/documents.parquet")

    // ---- the refresh cycle, end-to-end, fresh session -------------------
    val s2 = spark.newSession()
    val sigSec = { t("sig REFRESH (2% delta)")(
      graft.sources.MinHashSigIndex.sigs(s2, dir).count())
      metrics("sec: sig REFRESH (2% delta)").asInstanceOf[Double] }
    val pairSec = { t("pair REFRESH (2% delta)")(
      graft.sources.NeardupPairsIndex.pairs(s2, dir).count())
      metrics("sec: pair REFRESH (2% delta)").asInstanceOf[Double] }

    def tableChecksum(s: SparkSession, tbl: String): (Long, Long) = {
      val r = s.table(tbl)
        .agg(sum(col("freq")), bit_xor(xxhash64(col("h"), col("freq"))))
        .head()
      (r.getLong(0), r.getLong(1))
    }

    for ((shape, stream, w) <- shapes) {
      // incremental FIRST: the table is in exactly its pre-delta state
      // right after step 1's BUILD, so no reset rebuild is needed (an
      // earlier ordering paid an untimed full rebuild per shape just
      // to restore that state — r17 review finding)
      var incrCs: Option[(Long, Long)] = None
      if (arms("incremental")) {
        // delta docs live at doc_id >= 3*rows by construction
        val sec = { t(s"freq INCREMENTAL ($shape, merge)")(
          HotColdFreq.freqTableRefresh(stream(corpusDocs(s2)
              .filter(col("doc_id") >= 3 * rows)), "h", "freq",
            w, tblOf(shape)).count())
          metrics(s"sec: freq INCREMENTAL ($shape, merge)")
            .asInstanceOf[Double] }
        incrCs = Some(tableChecksum(s2, tblOf(shape)))
        println(s"[freq-refresh]   incremental $shape checksum=${incrCs.get}")
        val cycle = sigSec + pairSec + sec
        metrics(s"cycle_incremental_sec_$shape") =
          math.rint(cycle * 1000) / 1000.0
        val share = math.rint(1000.0 * sec / cycle) / 10.0
        metrics(s"freq_incremental_share_pct_$shape") = share
        println(f"[freq-refresh] $shape incremental share of cycle: " +
          f"$share%.1f%% (freq $sec%.2f / sig $sigSec%.2f + pair " +
          f"$pairSec%.2f + freq)")
      }

      if (arms("rebuild")) {
        val sec = { t(s"freq REBUILD ($shape, overwrite)")(
          HotColdFreq.freqTable(stream(corpusDocs(s2)), "h", "freq",
            w, tblOf(shape), cpus.toInt).count())
          metrics(s"sec: freq REBUILD ($shape, overwrite)")
            .asInstanceOf[Double] }
        val rebuildCs = tableChecksum(s2, tblOf(shape))
        println(s"[freq-refresh]   rebuilt $shape checksum=$rebuildCs")
        incrCs.foreach { cs =>
          assert(cs == rebuildCs,
            s"$shape incremental refresh diverged from rebuild: " +
              s"$cs vs $rebuildCs")
          metrics(s"checksums_agree_$shape") = true
        }
        val cycle = sigSec + pairSec + sec
        val share = math.rint(1000.0 * sec / cycle) / 10.0
        println(f"[freq-refresh] $shape rebuild share of cycle: $share%.1f%% " +
          f"(freq $sec%.2f / sig $sigSec%.2f + pair $pairSec%.2f + freq)")
        metrics(s"cycle_sec_$shape") = math.rint(cycle * 1000) / 1000.0
        metrics(s"freq_rebuild_share_pct_$shape") = share
        // the sig+freq-only view (a pipeline that maintains no pair
        // table): the share the decision is most conservative under
        metrics(s"freq_rebuild_share_no_pair_pct_$shape") =
          math.rint(1000.0 * sec / (sigSec + sec)) / 10.0
      }
    }

    shapes.foreach { case (shape, _, _) =>
      spark.sql(s"DROP TABLE IF EXISTS ${tblOf(shape)}") }
    // artifact paths are content-stamped — resolve them BEFORE the
    // corpus parquet they stamp from is deleted (the ScaleSmoke order)
    val sigStore = graft.sources.MinHashSigIndex.store(dir)
    val pairStore = graft.sources.NeardupPairsIndex.artifactDir(dir)
    graft.queries.Q.deleteRecursively(java.nio.file.Paths.get(dir))
    graft.queries.Q.deleteRecursively(sigStore)
    graft.queries.Q.deleteRecursively(pairStore)
    sys.env.get("SPARK_GRAFT_FREQREFRESH_OUT").foreach { out =>
      ToolMetrics.write(metrics, out)
      println(s"[freq-refresh] metrics written to $out")
    }
    spark.stop()
  }
}
