package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** The data-side half of the iterative-cost question (SURVEY r18
 * backlog #2, carried from r16/r17): IterScanAudit closed the
 * PLAN-side depth dimension (O(1) scans asserted; the exponential
 * plan-tree wall found and killed with lineage truncation), but wall
 * per iteration as FRONTIER MASS grows on a 110×-scale graph stayed
 * unmeasured — cache-hit cost scales with reached nodes, and a
 * superlinear wall-vs-frontier curve would name a scale-killer the
 * depth sweep at gate scale cannot see.
 *
 * Shape: synthesize a 110× embedding corpus (55k vectors — the
 * ScaleSmoke rows/10 convention for the 550k-doc corpus, same
 * sin-based generator), build the shared KnnGraphIndex edge artifact
 * once, then run the REAL gate BFS loop ([[graft.queries.LlmOps
 * .graphBfsDist]], the localCheckpoint-truncated one) at depth
 * 1..maxDepth from a cold cache per depth, recording per depth: wall,
 * total reached nodes, and the frontier mass at the final hop. The
 * criterion reads the artifact: wall growth SUPERLINEAR in frontier
 * mass fires a fix round; linear-or-better closes the item.
 *
 * runMain graft.tools.IterFrontierProbe [vectors] [maxDepth]
 * SPARK_GRAFT_ITERFRONTIER_OUT=<path> writes the JSON artifact.
 */
object IterFrontierProbe {
  def main(args: Array[String]): Unit = {
    val vectors = if (args.length > 0) args(0).toLong else 55000L
    val maxDepth = if (args.length > 1) args(1).toInt else 12
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val metrics = scala.collection.mutable.LinkedHashMap[String, Any](
      "vectors" -> vectors, "max_depth" -> maxDepth)
    val dir = java.nio.file.Files
      .createTempDirectory("graft_iterfrontier").toString
    // the ScaleSmoke synthetic-embedding shape: deterministic, spreads
    // across sign buckets so the edge build has realistic blocking
    spark.range(vectors).select(col("id").as("vec_id"),
        expr("transform(sequence(0, 63), i -> CAST(sin(id * 131 + i) AS FLOAT))")
          .as("embedding"),
        (col("id") % 10).cast("int").as("label"))
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")

    val t0 = System.nanoTime()
    val nEdges = graft.sources.KnnGraphIndex.edges(spark, dir).count()
    val buildSec = math.rint((System.nanoTime() - t0) / 1e6) / 1000.0
    println(f"[iter-frontier] edge build: $nEdges edges in $buildSec%.2f s")
    metrics("edges") = nEdges
    metrics("sec: edge build") = buildSec

    var prevWall = 0.0
    var prevReached = 0L
    for (d <- 1 to maxDepth) {
      spark.catalog.clearCache()
      val t1 = System.nanoTime()
      val dist = graft.queries.LlmOps.graphBfsDist(spark, dir, d)
      val reached = dist.count()
      val wall = math.rint((System.nanoTime() - t1) / 1e6) / 1000.0
      // frontier = nodes first reached at THIS depth; read after the
      // wall clock (dist is cached by the loop, the count is a
      // cache-sized aggregate, not a recompute)
      val frontier = dist.filter(col("hop") === d).count()
      val dWall = wall - prevWall
      val dReached = reached - prevReached
      println(f"[iter-frontier] depth=$d%2d wall=$wall%7.2f s " +
        f"reached=$reached%7d frontier=$frontier%7d " +
        f"(Δwall=$dWall%+6.2f Δreached=$dReached%+7d)")
      metrics(s"d$d:wall_sec") = wall
      metrics(s"d$d:reached") = reached
      metrics(s"d$d:frontier") = frontier
      prevWall = wall; prevReached = reached
    }
    graft.queries.Q.deleteRecursively(java.nio.file.Paths.get(dir))
    graft.queries.Q.deleteRecursively(graft.sources.KnnGraphIndex.store(dir))
    sys.env.get("SPARK_GRAFT_ITERFRONTIER_OUT").foreach { out =>
      ToolMetrics.write(metrics, out)
      println(s"[iter-frontier] metrics written to $out")
    }
    spark.stop()
  }
}
