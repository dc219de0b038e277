package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** r22: interleaved A/B for the two-phase distributed prefix sum
 * (operators.PrefixSum) vs the flat unpartitioned-window cumsum in
 * q_ks_drift and q_pps_sample (VERDICT r21 item 2). The distributed
 * arm is the 100 TB-scale shape (no single-task window over a
 * data-proportional frame); this tool measures what it costs at gate
 * scale, with result equality asserted per rep. Both arms are built
 * INLINE so the tool stays a valid probe whichever shape the gate
 * queries currently declare.
 *
 * r22 verdict from this tool: the distributed machinery costs ~5 extra
 * AQE stages ≈ +0.2–0.4 s per query at sf0.1 in EVERY interleaved
 * rep-pair — rejected for the bench gate under the 0.02 s budget;
 * operators.PrefixSum + PrefixSumSpec keep the shape pinned for the
 * scale regime that needs it.
 *
 * runMain graft.tools.PrefixSumAB [sfDir] [reps]
 * runMain graft.tools.PrefixSumAB [sfDir] dump <outDir>   (plan dumps only)
 */
object PrefixSumAB {
  def main(args: Array[String]): Unit = {
    val dir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val reps =
      if (args.length > 1 && args(1) != "dump") args(1).toInt else 6
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold",
        "1048576")
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning",
        "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.read.parquet(s"$dir/lineitem.parquet")
      .groupBy("l_returnflag").count().count() // warmup

    // flat twins: the pre-r22 shapes, global unpartitioned windows
    def ksFlat(s: SparkSession): DataFrame = {
      val cnt = graft.queries.Q.rd(s, dir, "events")
        .filter(col("event_type").isin("click", "purchase"))
        .select(col("event_type"),
          expr("CAST(round(value * 100) AS BIGINT)").as("cents"))
        .groupBy("cents")
        .agg(sum(when(col("event_type") === "click", 1L).otherwise(0L)).as("c1"),
          sum(when(col("event_type") === "purchase", 1L).otherwise(0L)).as("c2"))
      val tot = cnt.agg(sum(col("c1")).as("n1"), sum(col("c2")).as("n2"))
      val w = Window.orderBy("cents")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      cnt.crossJoin(broadcast(tot))
        .withColumn("gap",
          abs(sum(col("c1")).over(w).cast("double") / col("n1").cast("double")
            - sum(col("c2")).over(w).cast("double") / col("n2").cast("double")))
        .orderBy(col("gap").desc, col("cents").asc)
        .limit(1)
        .select(col("n1"), col("n2"), round(col("gap"), 6).as("ks_stat"),
          col("cents").as("ks_at_cents"))
    }
    def ppsFlat(s: SparkSession): DataFrame = {
      val d = graft.queries.Q.rd(s, dir, "documents")
        .select(col("doc_id"), col("n_chars"),
          expr("doc_id DIV 100").as("blk"))
      val bs = d.groupBy("blk").agg(sum(col("n_chars")).as("bw"))
      val wOff = Window.orderBy("blk")
        .rowsBetween(Window.unboundedPreceding, -1)
      val boff = bs.withColumn("boff",
        coalesce(sum(col("bw")).over(wOff), lit(0L)))
      val tot = bs.agg(sum(col("bw")).as("tw"))
      val wIn = Window.partitionBy("blk").orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      d.join(boff.select("blk", "boff"), "blk")
        .crossJoin(broadcast(tot))
        .withColumn("ci", col("boff") + sum(col("n_chars")).over(wIn))
        .withColumn("step", expr("tw DIV 50"))
        .withColumn("n_hits",
          (expr("ci DIV step") - expr("(ci - n_chars) DIV step")).cast("int"))
        .filter(col("n_hits") > 0)
        .select(col("doc_id"), col("n_chars"), col("n_hits"))
        .orderBy("doc_id")
    }

    // distributed twins: block-hierarchical cumsum, block offsets via
    // operators.PrefixSum (one wide hash exchange; everything else is
    // block-table- or cluster-width-sized)
    def ksDist(s: SparkSession): DataFrame = {
      val cnt = graft.queries.Q.rd(s, dir, "events")
        .filter(col("event_type").isin("click", "purchase"))
        .select(col("event_type"),
          expr("CAST(round(value * 100) AS BIGINT)").as("cents"))
        .groupBy("cents")
        .agg(sum(when(col("event_type") === "click", 1L).otherwise(0L)).as("c1"),
          sum(when(col("event_type") === "purchase", 1L).otherwise(0L)).as("c2"))
      val tot = cnt.agg(sum(col("c1")).as("n1"), sum(col("c2")).as("n2"))
      val cb = cnt.withColumn("blkc", expr("cents DIV 256"))
      val bs = cb.groupBy("blkc")
        .agg(sum(col("c1")).as("b1"), sum(col("c2")).as("b2"))
      val boff = graft.operators.PrefixSum.exclusive(
        bs, "blkc", Seq("b1", "b2"), Seq("o1", "o2"))
      val wIn = Window.partitionBy("blkc").orderBy("cents")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      cb.join(broadcast(boff.select("blkc", "o1", "o2")), "blkc")
        .crossJoin(broadcast(tot))
        .withColumn("gap",
          abs((col("o1") + sum(col("c1")).over(wIn)).cast("double")
              / col("n1").cast("double")
            - (col("o2") + sum(col("c2")).over(wIn)).cast("double")
              / col("n2").cast("double")))
        .orderBy(col("gap").desc, col("cents").asc)
        .limit(1)
        .select(col("n1"), col("n2"), round(col("gap"), 6).as("ks_stat"),
          col("cents").as("ks_at_cents"))
    }
    def ppsDist(s: SparkSession): DataFrame = {
      val d = graft.queries.Q.rd(s, dir, "documents")
        .select(col("doc_id"), col("n_chars"),
          expr("doc_id DIV 100").as("blk"))
      val bs = d.groupBy("blk").agg(sum(col("n_chars")).as("bw"))
      val boff = graft.operators.PrefixSum.exclusive(
        bs, "blk", Seq("bw"), Seq("boff"))
      val tot = bs.agg(sum(col("bw")).as("tw"))
      val wIn = Window.partitionBy("blk").orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      d.join(broadcast(boff.select("blk", "boff")), "blk")
        .crossJoin(broadcast(tot))
        .withColumn("ci", col("boff") + sum(col("n_chars")).over(wIn))
        .withColumn("step", expr("tw DIV 50"))
        .withColumn("n_hits",
          (expr("ci DIV step") - expr("(ci - n_chars) DIV step")).cast("int"))
        .filter(col("n_hits") > 0)
        .select(col("doc_id"), col("n_chars"), col("n_hits"))
        .orderBy("doc_id")
    }

    val arms: Seq[(String, String, SparkSession => DataFrame)] = Seq(
      ("q_ks_drift", "flat", ksFlat _),
      ("q_ks_drift", "dist", ksDist _),
      ("q_pps_sample", "flat", ppsFlat _),
      ("q_pps_sample", "dist", ppsDist _))
    if (args.length > 1 && args(1) == "dump") {
      val outDir = args(2)
      java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
      for ((q, arm, fn) <- arms if arm == "dist") {
        val txt = fn(spark).queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        val p = java.nio.file.Paths.get(outDir, s"${q}_distributed.txt")
        java.nio.file.Files.writeString(p, txt)
        println(s"[psum-ab] wrote $p")
      }
      spark.stop(); return
    }
    val mins = collection.mutable.Map[(String, String), Double]()
      .withDefaultValue(Double.MaxValue)
    val sigs = collection.mutable.Map[(String, String), String]()
    for (rep <- 1 to reps) {
      for ((q, arm, fn) <- arms) {
        val t0 = System.nanoTime()
        val df = fn(spark)
        df.count()
        val dt = (System.nanoTime() - t0) / 1e9
        val sig = df.collect().map(_.toString).mkString("|")
        spark.catalog.clearCache()
        mins((q, arm)) = math.min(mins((q, arm)), dt)
        sigs.get((q, "flat")).foreach { ref =>
          if (arm == "dist") assert(ref == sig, s"$q rep$rep arm mismatch") }
        sigs((q, arm)) = sig
        println(f"[psum-ab] rep$rep $q $arm $dt%.3f s")
      }
    }
    for (q <- Seq("q_ks_drift", "q_pps_sample")) {
      assert(sigs((q, "flat")) == sigs((q, "dist")), s"$q arm mismatch")
      val fl = mins((q, "flat")); val di = mins((q, "dist"))
      println(f"[psum-ab] RESULT $q%-14s flat=$fl%.3f dist=$di%.3f " +
        f"delta=${fl - di}%+.3f (sigs agree)")
    }
    spark.stop()
  }
}
