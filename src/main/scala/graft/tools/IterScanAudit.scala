package graft.tools

import org.apache.spark.sql.SparkSession

/** Per-iteration executed-scan growth audit for the iterative graph
 * entries (VERDICT r15 item 2; SURVEY round-16 backlog #4).
 *
 * q_pagerank and q_graph_bfs unroll a DataFrame loop; the scale
 * contract is that file scans are O(1) in the iteration count — the
 * edge index and the node set are cached once and every frontier /
 * rank round reads the caches, never the lake. Before r16 the
 * contract HELD for bfs but NOT for pagerank: its per-iteration
 * `nodes` join re-scanned embeddings every round (1 + iters direct
 * scans — exactly the r15 audit's "4 scans at depth 3" reading).
 * pageRankRanks now caches nodes (and deg), and this instrument pins
 * the fixed shape by sweeping depth 1..4 and ASSERTING the executed
 * direct-scan and cached-build-scan counts are depth-invariant.
 * PlanAuditSpec carries the same pin into the gate suite at two
 * depths; this tool is the full-curve evidence artifact.
 *
 * runMain graft.tools.IterScanAudit [maxDepth]
 * SPARK_GRAFT_ITERSCAN_OUT=<path> writes the JSON artifact.
 */
object IterScanAudit {
  def main(args: Array[String]): Unit = {
    val maxDepth = if (args.nonEmpty) args(0).toInt else 4
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.001"

    val metrics = scala.collection.mutable.LinkedHashMap[String, Any](
      "max_depth" -> maxDepth)
    for ((name, build) <- Seq[(String, Int => org.apache.spark.sql.DataFrame)](
        "q_pagerank" -> (d => graft.queries.LlmOps.pageRankRanks(spark, dir, d)),
        "q_graph_bfs" -> (d => graft.queries.LlmOps.graphBfsDist(spark, dir, d)))) {
      println(s"##### $name")
      val perDepth = (1 to maxDepth).map { d =>
        // every depth audits from a cold cache: a previous depth's
        // persisted edge/node frames would canonically match this
        // plan's subtrees and hide a depth-dependent scan
        spark.catalog.clearCache()
        val t0 = System.nanoTime()
        val (nScan, nReuse, scanned) = PlanAudit.executedScans(build(d))
        // wall covers build + plan + execute — the r17-backlog signal:
        // scans can stay O(1) while the LOGICAL tree (dist referenced
        // twice per round) grows the analysis/optimization wall
        // superlinearly with depth
        val secs = math.rint((System.nanoTime() - t0) / 1e6) / 1000.0
        val direct = scanned.count(!_.startsWith("cached:"))
        val cachedB = scanned.count(_.startsWith("cached:"))
        println(s"  depth=$d direct=$direct cached_build=$cachedB " +
          s"reused=$nReuse wall=${secs}s [${scanned.mkString("; ")}]")
        metrics(s"$name:d$d:direct") = direct
        metrics(s"$name:d$d:cached_build") = cachedB
        metrics(s"$name:d$d:reused") = nReuse
        metrics(s"$name:d$d:wall_sec") = secs
        (direct, cachedB)
      }
      // the O(1) contract, asserted loudly (the sibling-instrument
      // discipline): scan counts never EXCEED depth 1's at any depth,
      // and equal them exactly through the pre-truncation depths —
      // beyond BfsTruncateEvery the BFS loop's periodic lineage
      // truncation (r16: localCheckpoint, killing the exponential
      // plan-tree wall) legitimately REDUCES the scans visible in the
      // final frame's plan (the work ran eagerly at the checkpoint),
      // so only growth is a failure. The bound is DERIVED from the
      // shared constant so a truncation-interval change cannot
      // silently loosen the audit (ADVICE r16).
      val exactThrough = graft.queries.LlmOps.BfsTruncateEvery - 1
      val (d1direct, d1cached) = perDepth.head
      perDepth.zipWithIndex.foreach { case ((dir_, cch), i) =>
        assert(dir_ <= d1direct && cch <= d1cached,
          s"$name: scans grew with depth — depth ${i + 1} read " +
            s"($dir_ direct, $cch cached) vs depth 1's " +
            s"($d1direct, $d1cached); an iteration is re-reading the lake")
        assert(i >= exactThrough || (dir_ == d1direct && cch == d1cached),
          s"$name: pre-truncation depth ${i + 1} changed scan shape: " +
            s"($dir_, $cch) vs ($d1direct, $d1cached)")
      }
      metrics(s"$name:o1_scans") = true
      println(s"  O(1) scans over depth 1..$maxDepth: " +
        s"direct=$d1direct cached_build=$d1cached")
    }
    sys.env.get("SPARK_GRAFT_ITERSCAN_OUT").foreach { out =>
      ToolMetrics.write(metrics, out)
      println(s"[iter-scan] metrics written to $out")
    }
    spark.stop()
  }
}
