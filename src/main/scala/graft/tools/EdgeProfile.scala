package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/**
 * Stage attribution for the kNN edge BUILD at smoke scale — the
 * heaviest artifact stage left at 110× (86–143 s across windows).
 * Times, over the same synthetic corpus ScaleSmoke uses:
 *
 *   1. pair enumeration only (join + a≠b filter, count)
 *   2. + cosine          (sum(cos) forces the kernel per pair)
 *   3. + sort/TopK/window (the full edgesFor plan, count)
 *   4. + the artifact write (edges() from a cold store)
 *
 * so the delta between consecutive rows names the expensive stage.
 *
 *   sbt "runMain graft.tools.EdgeProfile [vecs]"
 */
object EdgeProfile {
  def main(args: Array[String]): Unit = {
    val rows = if (args.length > 0) args(0).toLong else 50000L
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.VectorFunctions.register(spark)

    val dir = java.nio.file.Files
      .createTempDirectory("graft_edgeprof").toString
    spark.range(rows).select(col("id").as("vec_id"),
        expr("transform(sequence(0, 63), i -> CAST(sin(id * 131 + i) AS FLOAT))")
          .as("embedding"),
        (col("id") % 10).cast("int").as("label"))
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")

    val e = spark.read.parquet(s"$dir/embeddings.parquet")
      .select(col("vec_id"), col("embedding"),
        graft.sources.KnnGraphIndex.signBucket("embedding").as("bucket"))

    // job/stage attribution: between t() stages, print every Spark job
    // with its task count — a doubled pair join shows up as two jobs
    // with ~equal large task-duration sums
    val jobs = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onStageCompleted(
            sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
          val i = sc.stageInfo
          val ms = i.taskMetrics.executorRunTime
          if (ms > 2000)
            jobs.add(f"    stage ${i.stageId}%4d tasks=${i.numTasks}%5d " +
              f"cpuSum=${ms / 1000.0}%8.1f s  ${i.name.takeWhile(_ != '\n').take(90)}")
        }
      })
    def t[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[edgeprof] $label%-34s ${(System.nanoTime() - t0) / 1e9}%8.2f s ($r)")
      // listener events arrive asynchronously on the bus thread; give
      // the just-finished job's stage-completed events time to land so
      // they print under THIS label, not the next one
      Thread.sleep(500)
      var s = jobs.poll()
      while (s != null) { println(s); s = jobs.poll() }
      r
    }

    val (a, b) = graft.sources.KnnGraphIndex.saltedSides(
      e, graft.sources.KnnGraphIndex.SPLIT_ROWS)
    val joined = a.join(b, Seq("bucket", "sub"))
      .filter(col("a_id") =!= col("b_id"))
    t("1 pair enumeration (count)")(joined.count())
    t("2 + cosine (sum forced)")(
      joined.select(graft.functions.VectorFunctions
          .vecCosine(col("ea"), col("eb")).as("cos"))
        .agg(sum("cos")).head().getDouble(0).round)
    t("3 full edgesFor (count)")(
      graft.sources.KnnGraphIndex.edgesFor(
        e, graft.sources.KnnGraphIndex.SPLIT_ROWS).count())
    t("3b edgesFor + writeSeg-shaped write")({
      val out = s"$dir/_edges_probe"
      graft.sources.KnnGraphIndex.edgesFor(
          e, graft.sources.KnnGraphIndex.SPLIT_ROWS)
        .withColumn("pb", col("bucket"))
        .repartition(32, col("pb"),
          col("rn") <= lit(graft.sources.KnnGraphIndex.KMAX / 2))
        .sortWithinPartitions(col("pb"), col("rn"))
        .write.mode("overwrite").partitionBy("pb").parquet(out)
      spark.read.parquet(out).count()
    })
    // replicate refresh's cold-build frames exactly: corpusVecs carries
    // vec_hash, sizes come from the cached 24-byte projection
    val cur = spark.read.parquet(s"$dir/embeddings.parquet")
      .select(col("vec_id"), col("embedding"),
        graft.sources.KnnGraphIndex.signBucket("embedding").as("bucket"),
        xxhash64(col("embedding")).as("vec_hash"))
    val curMeta = cur.select("vec_id", "bucket", "vec_hash").cache()
    val sizes = curMeta.groupBy("bucket").agg(count(lit(1)).as("bucket_n"))
    val refreshShaped = graft.sources.KnnGraphIndex.edgesFor(
      cur, graft.sources.KnnGraphIndex.SPLIT_ROWS,
      Some(sizes))
    t("4a refresh-shaped edgesFor (count)")(refreshShaped.count())
    if (args.length > 1 && args(1) == "explain") {
      val bare = graft.sources.KnnGraphIndex.edgesFor(
        e, graft.sources.KnnGraphIndex.SPLIT_ROWS)
      bare.count()
      println("=== BARE executed plan ===")
      println(bare.queryExecution.executedPlan.toString.take(6000))
      println("=== REFRESH-SHAPED executed plan ===")
      println(refreshShaped.queryExecution.executedPlan.toString.take(6000))
    }
    curMeta.unpersist()
    t("4 artifact build+serve (cold store)")(
      graft.sources.KnnGraphIndex.edges(spark, dir).count())

    graft.queries.Q.deleteRecursively(java.nio.file.Paths.get(dir))
    graft.queries.Q.deleteRecursively(graft.sources.KnnGraphIndex.store(dir))
    spark.stop()
  }
}
