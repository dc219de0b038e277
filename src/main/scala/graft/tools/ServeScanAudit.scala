package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Executed-scan sweep over the ARTIFACT-SERVE frames (SURVEY backlog
 * #4, VERDICT r14 item 2): the window-over-joinback pruning-divergence
 * class also applies to a serve frame consumed by two
 * differently-pruned consumers — if each consumer re-listed and
 * re-derived the serve plan, a long analysis session would multiply
 * artifact scans the per-entry audit never sees.
 *
 * For each persisted artifact (pair table, signature table, edge
 * index), the audit warms the artifact, then runs ONE query whose two
 * branches prune the serve frame differently (narrow key aggregate ×
 * wide payload aggregate) and counts scans in the EXECUTED plan via
 * PlanAudit.executedScans.
 *
 * Expected reading, and why it is the CORRECT one rather than an
 * excess to fix: the serve frames are memoized per (session, store,
 * stamp) — ManifestStore.memoFrame — so the parquet file LISTING and
 * the manifest reconciliation happen once; the two branches then
 * each carry their own columnar scan of the SAME file index with
 * their own pruned schema (2 scans per artifact per two-consumer
 * query). Unlike the r14 q_tfidf/q_target_encode findings, there is
 * no derivation above these scans to re-run (steady-state serve is a
 * bare multi-path read; the one conditional anti-join only exists
 * while tombstones survive) — two pruned reads of a columnar artifact
 * read FEWER total bytes than one shared wide scan feeding both
 * consumers. A reading ABOVE 2 scans per branch pair (or any scan of
 * the raw corpus) would be a real finding.
 *
 * runMain graft.tools.ServeScanAudit [sfDir]
 */
object ServeScanAudit {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def audit(name: String, frame: => DataFrame,
              narrow: DataFrame => DataFrame,
              wide: DataFrame => DataFrame): Unit = {
      frame.count() // warm: build-if-absent outside the audited query
      val f = frame // memoized serve frame, second call is the memo hit
      val q = narrow(f).crossJoin(wide(f))
      val (nScan, nReuse, scanned) = PlanAudit.executedScans(q)
      println(s"##### serve:$name")
      println(s"  EXECUTED scans=$nScan reused_exchanges=$nReuse" +
        (if (scanned.nonEmpty) s" [${scanned.mkString("; ")}]" else ""))
      val corpusScans = scanned.count(p =>
        p.contains("documents.parquet") || p.contains("embeddings.parquet"))
      println(s"  corpus_scans=$corpusScans (must be 0: serve must never " +
        "fall back to the raw corpus)")
      // Fail loudly like the sibling instruments (CooccurAB,
      // ZipfWindowProbe): a serve frame regressing to a corpus re-scan
      // must not exit 0.
      assert(corpusScans == 0,
        s"serve:$name re-scanned the raw corpus $corpusScans time(s) — " +
          "serve frames must read only their persisted artifact")
    }

    audit("pairs",
      graft.sources.NeardupPairsIndex.pairs(spark, dir),
      f => f.agg(countDistinct("a_id").as("n_a")),
      f => f.agg(max("jaccard").as("mx"), count(lit(1)).as("n")))

    audit("sigs",
      graft.sources.MinHashSigIndex.sigs(spark, dir),
      f => f.agg(countDistinct("doc_id").as("n_docs")),
      f => f.select(explode(col("sig")).as("m")).agg(max("m").as("mx")))

    audit("edges",
      graft.sources.KnnGraphIndex.edges(spark, dir, 2),
      f => f.agg(countDistinct("a_id").as("n_a")),
      f => f.agg(max("cos").as("mx"), count(lit(1)).as("n")))

    spark.stop()
  }
}
