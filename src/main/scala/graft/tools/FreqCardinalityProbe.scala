package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.plans.HotColdFreq

/** Distinct-key-cardinality sweep for HotColdFreq's freq frame —
 * the SURVEY round-16 backlog #1 criterion probe.
 *
 * The r15 three-arm ZipfWindowProbe decided persist > stage-reuse at a
 * CACHEABLE key space (~10^6 distinct bigrams). At true lake scale a
 * distinct-bigram space reaches ~10^10 keys (~160 GB at 16 B/key) —
 * no executor storage budget holds it, and the open question was
 * which sourcing survives: persist (MEMORY_AND_DISK, spills), plain
 * stage-reuse (re-aggregates map output per consumer), or freq
 * written ONCE to a bucketed table keyed like the stream and both
 * consumers served from the scan.
 *
 * This probe holds the stream FIXED (R rows of hashed keys + one
 * planted hot key at R/1000 mass) and sweeps the distinct-key count K
 * across the storage budget: each arm sources the freq frame
 * differently and flows it through the IDENTICAL
 * [[HotColdFreq.attachFreq]] join, so arm deltas measure sourcing
 * only. Checksums are ASSERTED equal across arms every rep. The
 * persist arm additionally records the cached frame's memory/disk
 * split (the "is it actually spilling" fact the criterion turns on).
 * Run it with a CONSTRAINED heap (SPARK_DRIVER_MEM=6g) so the high-K
 * point genuinely exceeds the storage pool the way 10^10 keys exceed
 * a cluster's.
 *
 * Bias note (deliberate): the synthetic stream regenerates from
 * spark.range at near-zero cost, so the stage-reuse arm's penalty —
 * re-running the map side per consumer — is UNDERSTATED relative to a
 * real parquet+explode stream (r15 measured that penalty directly).
 * Conclusions here are about the freq frame's size regime, not about
 * stream re-scan cost.
 *
 * runMain graft.tools.FreqCardinalityProbe [rows] [reps] [K1,K2,...] [arms]
 * `arms` (csv subset of persist,stage-reuse,table; default all) exists
 * because the hostile high-K point can kill the whole JVM in ONE arm —
 * the first 400M-row/360M-key run died of executor OOM inside the
 * persist arm's cache build before the other arms got to run. Arms in
 * separate JVMs still compare: the stream is deterministic, so the
 * printed checksums must agree across invocations.
 * SPARK_GRAFT_FREQPROBE_OUT=<path> writes the JSON artifact.
 */
object FreqCardinalityProbe {
  def main(args: Array[String]): Unit = {
    val rows = if (args.length > 0) args(0).toLong else 160000000L
    val reps = if (args.length > 1) args(1).toInt else 2
    val ks = (if (args.length > 2) args(2) else "1000000,40000000,120000000")
      .split(",").map(_.trim.toLong).toSeq
    val arms = (if (args.length > 3) args(3) else "persist,stage-reuse,table")
      .split(",").map(_.trim).toSet
    require(arms.subsetOf(Set("persist", "stage-reuse", "table")),
      s"unknown arm in $arms")
    // reps=0 (or an empty arm set) would skip every measurement and
    // still stamp checksums_agree below — an artifact claiming
    // agreement with no evidence
    require(reps >= 1, s"reps must be >= 1, got $reps")
    require(arms.nonEmpty, "at least one arm required")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // bucketed freq writes: 32 concurrent parquet writers × the
      // default 128 MB row group would outgrow the constrained heap
      // this probe is meant to run under — cap the row group
      .config("spark.hadoop.parquet.block.size", s"${32 * 1024 * 1024}")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val HotKey = -1L          // planted hot key, mass rows/1000
    val hotMin = 10000L       // cold keys carry ≤ ~rows/K ≪ this

    def stream(k: Long): DataFrame =
      spark.range(0, rows, 1, 64).select(
        col("id").as("doc_id"),
        when(col("id") % 1000 === 0, lit(HotKey))
          .otherwise(xxhash64(pmod(col("id"), lit(k)))).as("k"))

    // one exact corpus checksum: forces everything, fits the driver
    def checksum(df: DataFrame): (Long, Long) = {
      val r = df.agg(sum(col("freq")), count(lit(1))).head()
      (r.getLong(0), r.getLong(1))
    }

    val metrics = scala.collection.mutable.LinkedHashMap[String, Any](
      "rows" -> rows, "reps" -> reps,
      // the arm set travels with the artifact: a single-arm run (the
      // documented separate-JVM mode for a hostile K point) must not
      // be readable as a three-arm comparison
      "arms" -> arms.toSeq.sorted.mkString(","),
      "heap" -> sys.env.getOrElse("SPARK_DRIVER_MEM", "24g"))
    for (k <- ks) {
      val st = stream(k)
      val tag = s"k${k / 1000000}m"
      var sums = Map[String, (Long, Long)]()
      for (rep <- 1 to reps) {
        var repSums = Seq.empty[(String, (Long, Long))]

        if (arms("persist")) {
          // ---- arm 1: persist (the shipped default), via the loan --
          val t0 = System.nanoTime()
          val (csP, memB, diskB) = HotColdFreq.withFreqLoan(
              st, "k", "freq", lit(1L), col("doc_id"), hotMin,
              persistFreq = true) { out =>
            val cs = checksum(out)
            val secs = (System.nanoTime() - t0) / 1e9
            // the cached freq's memory/disk split — the spill fact; read
            // INSIDE the loan, while the frame is still persisted
            val infos = spark.sparkContext.getRDDStorageInfo
            val mem = infos.map(_.memSize).sum
            val dsk = infos.map(_.diskSize).sum
            metrics(f"$tag:persist:rep$rep%d_sec") = math.rint(secs * 1000) / 1000.0
            println(f"[freq-probe] $tag persist rep$rep $secs%.2f s " +
              f"cached_mem=${mem / 1e6}%.0fMB disk=${dsk / 1e6}%.0fMB cs=$cs")
            (cs, mem, dsk)
          }
          metrics(s"$tag:persist:cached_mem_mb") = memB / 1000000
          metrics(s"$tag:persist:spilled_disk_mb") = diskB / 1000000
          spark.catalog.clearCache()
          repSums :+= "persist" -> csP
        }

        if (arms("stage-reuse")) {
          // ---- arm 2: stage-reuse (persistFreq = false) ------------
          val t0 = System.nanoTime()
          val csN = checksum(HotColdFreq.withFreq(
            st, "k", "freq", lit(1L), col("doc_id"), hotMin,
            persistFreq = false))
          val secsN = (System.nanoTime() - t0) / 1e9
          metrics(f"$tag:stage-reuse:rep$rep%d_sec") = math.rint(secsN * 1000) / 1000.0
          println(f"[freq-probe] $tag stage-reuse rep$rep $secsN%.2f s cs=$csN")
          spark.catalog.clearCache()
          repSums :+= "stage-reuse" -> csN
        }

        if (arms("table")) {
          // ---- arm 3: freq as a bucketed TABLE keyed like the stream
          // end-to-end including the one-time write: that IS the arm's
          // cost model (build once, serve both consumers from the scan)
          spark.sql("DROP TABLE IF EXISTS graft_freq_probe")
          val t0 = System.nanoTime()
          val freqT = HotColdFreq.freqTable(st, "k", "freq", lit(1L),
            "graft_freq_probe", cpus.toInt)
          val csT = checksum(HotColdFreq.attachFreq(
            st, freqT, "k", "freq", col("doc_id"), hotMin))
          val secsT = (System.nanoTime() - t0) / 1e9
          metrics(f"$tag:table:rep$rep%d_sec") = math.rint(secsT * 1000) / 1000.0
          println(f"[freq-probe] $tag table rep$rep $secsT%.2f s cs=$csT")
          spark.sql("DROP TABLE IF EXISTS graft_freq_probe")
          repSums :+= "table" -> csT
        }

        for ((name, cs) <- repSums) {
          sums.get(name).foreach(p => assert(p == cs,
            s"$tag $name checksum unstable across reps: $p vs $cs"))
          sums += name -> cs
        }
        assert(sums.values.toSet.size == 1,
          s"$tag arms disagree: $sums — sourcing must never change a value")
      }
      assert(sums.nonEmpty, s"$tag: no arm produced a checksum")
      // one arm verifies cross-rep STABILITY only; cross-arm AGREEMENT
      // needs >= 2 arms — name the metric for what was actually checked
      if (arms.size == 1) {
        metrics(s"$tag:checksums_stable") = true
        println(s"[freq-probe] $tag single-arm checksum stable: ${sums.head._2}")
      } else {
        metrics(s"$tag:checksums_agree") = true
        println(s"[freq-probe] $tag checksums agree: ${sums.head._2}")
      }
    }
    sys.env.get("SPARK_GRAFT_FREQPROBE_OUT").foreach { out =>
      ToolMetrics.write(metrics, out)
      println(s"[freq-probe] metrics written to $out")
    }
    spark.stop()
  }
}
