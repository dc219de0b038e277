package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** r21 optimization-round A/B: the bench's parquet inputs are single
 * row-group files (tools/PartProbe: every core-table scan runs as ONE
 * non-empty task whatever the split config), so all map-side work that
 * precedes the first exchange — tokenize/explode, collect_set partials,
 * percentile buffer builds — runs on one core of local[32]. Guide §2.5
 * ("input skew: one huge unsplittable file → repartition immediately
 * after the read"): each variant inserts one early hash-repartition on
 * a deterministic key (never round-robin — §2.5's retry-determinism
 * note) so the heavy map-side work lands AFTER a cheap narrow-column
 * exchange. Downstreams here are order/partitioning-insensitive
 * (exact aggregates, exact-regime sketches), so results are unchanged —
 * asserted per rep via a canonical result checksum, and re-pinned
 * against the DuckDB oracle after the query code lands.
 *
 * runMain graft.tools.ScanFanoutAB [sfDir] [reps] [arm,arm,...]
 */
object ScanFanoutAB {
  def main(args: Array[String]): Unit = {
    val dir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val reps = if (args.length > 1) args(1).toInt else 5
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold",
        "1048576")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.read.parquet(s"$dir/lineitem.parquet")
      .groupBy("l_returnflag").count().count() // warmup

    import graft.queries.Q.rd

    // ---- variant builders (current arm = SparkEntry.queries(name)) ----

    def cooccurVariant(): DataFrame = {
      val baskets = rd(spark, dir, "lineitem")
        .select(col("l_orderkey"), col("l_partkey"))
        .repartition(col("l_orderkey"))
        .groupBy(col("l_orderkey"))
        .agg(sort_array(collect_set(col("l_partkey"))).as("parts"))
      val items = baskets.select(explode(col("parts")).as("pk"))
        .groupBy(col("pk")).agg(count(lit(1)).as("cnt"))
      val tot = baskets.agg(count(lit(1)).as("n_orders"))
      val pairs = baskets
        .filter(size(col("parts")) >= 2)
        .select(posexplode(col("parts")).as(Seq("i", "pk1")), col("parts"))
        .select(col("pk1"), explode(
          slice(col("parts"), col("i") + lit(2), size(col("parts")))).as("pk2"))
        .groupBy(col("pk1"), col("pk2"))
        .agg(count(lit(1)).as("pair_cnt"))
      pairs
        .join(broadcast(items.select(col("pk").as("pk1"), col("cnt").as("cnt1"))), Seq("pk1"))
        .join(broadcast(items.select(col("pk").as("pk2"), col("cnt").as("cnt2"))), Seq("pk2"))
        .crossJoin(broadcast(tot))
        .withColumn("lift",
          (col("pair_cnt") * col("n_orders")).cast("double") /
            (col("cnt1") * col("cnt2")).cast("double"))
        .orderBy(col("pair_cnt").desc, col("pk1"), col("pk2"))
        .limit(100)
        .select("pk1", "pk2", "pair_cnt", "lift")
    }

    def quantileBinsVariant(): DataFrame = {
      val o = rd(spark, dir, "orders")
        .select(expr("CAST(round(o_totalprice * 100) AS BIGINT)").as("pc"))
        .repartition(col("pc"))
      val cuts = o.agg(expr(
          """percentile(pc, array(0.125D, 0.25D, 0.375D, 0.5D,
            |                     0.625D, 0.75D, 0.875D))""".stripMargin)
          .as("cs"))
        .select((1 to 7).map(k =>
          expr(s"element_at(cs, $k)").as(s"c$k")): _*)
      o.crossJoin(broadcast(cuts))
        .withColumn("bin", expr(
          """CAST(CAST(CAST(pc AS DOUBLE) >= c1 AS INT)
            |   + CAST(CAST(pc AS DOUBLE) >= c2 AS INT)
            |   + CAST(CAST(pc AS DOUBLE) >= c3 AS INT)
            |   + CAST(CAST(pc AS DOUBLE) >= c4 AS INT)
            |   + CAST(CAST(pc AS DOUBLE) >= c5 AS INT)
            |   + CAST(CAST(pc AS DOUBLE) >= c6 AS INT)
            |   + CAST(CAST(pc AS DOUBLE) >= c7 AS INT) AS INT)""".stripMargin))
        .groupBy("bin")
        .agg(count(lit(1)).as("n"),
          min(col("pc")).as("lo_cents"), max(col("pc")).as("hi_cents"))
        .orderBy("bin")
    }

    def heavyHittersVariant(): DataFrame = {
      val hh = graft.functions.HeavyHittersAgg.heavyHitters(64)
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("lang").orderBy(col("n").desc, col("tok"))
      rd(spark, dir, "documents")
        .select(col("doc_id"), col("lang"), col("text"))
        .repartition(col("doc_id"))
        .select(col("lang"), explode(split(col("text"), " ")).as("tok"))
        .groupBy("lang").agg(hh(col("tok")).as("sketch"))
        .select(col("lang"), explode(col("sketch")).as(Seq("tok", "n")))
        .withColumn("rk", row_number().over(w))
        .filter(col("rk") <= 5)
        .select("lang", "tok", "n", "rk")
        .orderBy("lang", "rk")
    }

    def bpeApplyVariant(): DataFrame = {
      // merges re-derived exactly as current (bpeMerges is private —
      // replicate its 3-step loop over a fanned-out vocab build)
      val w0 = rd(spark, dir, "documents")
        .select(col("doc_id"), col("text"))
        .repartition(col("doc_id"))
        .select(explode(split(col("text"), " ")).as("word"))
        .filter(col("word").rlike("^[a-z]{2,}$"))
        .groupBy("word").agg(count(lit(1)).as("cnt"))
        .withColumn("str", concat(lit("<"),
          expr("array_join(transform(sequence(1, length(word)), " +
            "i -> substring(word, i, 1)), '><')"), lit(">")))
        .select("cnt", "str").cache()
      var w = w0
      val merges = Seq.newBuilder[(Int, String, String, Long)]
      for (step <- 1 to 3) {
        val top = w
          .select(col("cnt"),
            split(expr("substring(str, 2, length(str) - 2)"), "><").as("syms"))
          .select(col("cnt"), col("syms"),
            posexplode(col("syms")).as(Seq("i", "l")))
          .filter(col("i") < size(col("syms")) - 1)
          .select(col("cnt"), col("l"),
            element_at(col("syms"), col("i") + lit(2)).as("r"))
          .groupBy(col("l"), col("r"))
          .agg(sum(col("cnt")).as("c"))
          .orderBy(col("c").desc, col("l"), col("r"))
          .limit(1).collect()
        val (l, r, c) =
          (top(0).getString(0), top(0).getString(1), top(0).getLong(2))
        merges += ((step, l, r, c))
        w = w.withColumn("str", expr(s"replace(str, '<$l><$r>', '<$l$r>')"))
      }
      val ms = merges.result()
      val wrapped = rd(spark, dir, "documents")
        .select(col("doc_id"), col("source"), col("text"))
        .repartition(col("doc_id"))
        .select(col("source"), explode(split(col("text"), " ")).as("tok"))
        .filter(col("tok").rlike("^[a-z]+$"))
        .withColumn("str", concat(lit("<"),
          expr("array_join(transform(sequence(1, length(tok)), " +
            "i -> substring(tok, i, 1)), '><')"), lit(">")))
      val applied = ms.foldLeft(wrapped) { case (df, (_, l, r, _)) =>
        df.withColumn("str", expr(s"replace(str, '<$l><$r>', '<$l$r>')"))
      }
      applied
        .select(col("source"), length(col("tok")).cast("long").as("nc"),
          size(split(expr("substring(str, 2, length(str) - 2)"), "><"))
            .cast("long").as("ns"))
        .groupBy("source")
        .agg(count(lit(1)).as("n_tokens"),
          sum(col("nc")).as("n_chars"),
          sum(col("ns")).as("n_symbols"),
          (sum(col("ns")).cast("double") / sum(col("nc"))).as("syms_per_char"))
        .orderBy("source")
    }

    val arms: Seq[(String, String, () => DataFrame)] = Seq(
      ("q_cooccur", "repart(l_orderkey) before collect_set",
        () => cooccurVariant()),
      ("q_quantile_bins", "repart(pc) before percentile",
        () => quantileBinsVariant()),
      ("q_heavy_hitters", "repart(doc_id) before explode",
        () => heavyHittersVariant()),
      ("q_bpe_apply", "repart(doc_id) before tokenize (both passes)",
        () => bpeApplyVariant()))

    val only = if (args.length > 2) Some(args(2).split(",").toSet) else None

    def checksum(df: DataFrame): Int =
      df.collect().map(_.toString).mkString("|").hashCode

    for ((name, desc, variant) <- arms
         if only.forall(_.contains(name))) {
      var curSum = Option.empty[Int]
      var varSum = Option.empty[Int]
      var curMin = Double.MaxValue
      var varMin = Double.MaxValue
      for (rep <- 1 to reps; (arm, form) <- Seq(
          "current" -> (() => graft.SparkEntry.queries(name)(spark, dir)),
          "variant" -> variant)) {
        val t0 = System.nanoTime()
        val df = form()
        df.count()
        val secs = (System.nanoTime() - t0) / 1e9
        val s = checksum(df)
        spark.catalog.clearCache()
        if (arm == "current") {
          curSum.foreach(p => assert(p == s, s"unstable current $name"))
          curSum = Some(s); curMin = math.min(curMin, secs)
        } else {
          varSum.foreach(p => assert(p == s, s"unstable variant $name"))
          varSum = Some(s); varMin = math.min(varMin, secs)
        }
        println(f"[fanout-ab] $name $arm rep$rep $secs%.3f s")
      }
      assert(curSum == varSum,
        s"$name arm mismatch: $curSum vs $varSum")
      println(f"[fanout-ab] $name RESULT min current=$curMin%.3f " +
        f"variant=$varMin%.3f delta=${curMin - varMin}%+.3f ($desc; checksums agree)")
    }
    spark.stop()
  }
}
