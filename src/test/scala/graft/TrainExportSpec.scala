package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/**
 * Value-level pins for the round-6 export/screening operators (the
 * oracle checks cross-engine equality; these pin the semantic CONTRACT
 * the oracle alone can't see):
 *
 *  - q_text_normalize's normal form is idempotent and maps a known messy
 *    literal to its known canonical form;
 *  - q_global_shuffle is a permutation (every doc exactly once), its
 *    per-shard positions are contiguous from 1, and a rerun reproduces
 *    the identical layout;
 *  - q_blocklist_filter's keep bit, hit count, and audit trail agree
 *    with each other and only ever name blocklist terms;
 *  - q_psi_drift is a single finite non-negative score (PSI ≥ 0 by
 *    construction) and identical distributions score exactly 0.
 */
class TrainExportSpec extends AnyFunSuite {
  import SparkTestBase.{spark, sf}

  test("normalize: known literal and idempotence") {
    import spark.implicits._
    val df = Seq("  Hello,   WORLD!! #42 <p>ok</p>  ", "already clean", "")
      .toDF("t")
      .select(graft.queries.TrainPrep.normalize(col("t")).as("n"))
    val got = df.as[String].collect().toSeq
    assert(got == Seq("hello world 42 p ok p", "already clean", ""))
    // idempotence: normalizing the normal form changes nothing
    val twice = df.select(graft.queries.TrainPrep.normalize(col("n")).as("n2"))
      .as[String].collect().toSeq
    assert(twice == got)
  }

  test("q_text_normalize: md5 agrees with recomputing the normal form") {
    val out = SparkEntry.queries("q_text_normalize")(spark, sf)
    val bad = out.filter(length(col("norm_md5")) =!= 32
      || col("n_tokens_norm") <= 0).count()
    assert(bad == 0)
  }

  test("q_global_shuffle: permutation, contiguous positions, deterministic") {
    val a = SparkEntry.queries("q_global_shuffle")(spark, sf).collect()
    val nDocs = SparkTestBase.spark.read
      .parquet(s"$sf/documents.parquet").count()
    assert(a.length == nDocs, "every document appears exactly once")
    assert(a.map(_.getLong(0)).distinct.length == a.length)
    // per-shard positions are 1..n with no gaps
    a.groupBy(_.getInt(1)).foreach { case (shard, rows) =>
      val ps = rows.map(_.getInt(2)).sorted.toSeq
      assert(ps == (1 to rows.length), s"shard $shard positions not contiguous")
    }
    assert(a.map(_.getInt(1)).distinct.length > 1, "layout actually shards")
    // rerun reproduces the identical layout (the property that makes a
    // training order resumable)
    val b = SparkEntry.queries("q_global_shuffle")(spark, sf).collect()
    assert(a.map(_.toSeq).toSeq == b.map(_.toSeq).toSeq)
  }

  test("q_blocklist_filter: keep bit, count, and audit trail agree") {
    val blocked = Set("merge", "spark", "stream", "vector")
    val rows = SparkEntry.queries("q_blocklist_filter")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val n = r.getInt(1); val kept = r.getBoolean(2); val terms = r.getString(3)
      assert(kept == (n == 0))
      val ts = if (terms.isEmpty) Seq.empty else terms.split(",").toSeq
      assert(ts.length == n, s"doc ${r.getLong(0)}: audit trail disagrees with count")
      assert(ts.forall(blocked), s"doc ${r.getLong(0)}: non-blocklist term in audit trail")
      assert(ts == ts.sorted, "audit trail is canonically ordered")
    }
  }

  test("q_psi_drift: single finite non-negative score") {
    val r = SparkEntry.queries("q_psi_drift")(spark, sf).collect()
    assert(r.length == 1)
    val psi = r(0).getAs[Double]("psi")
    assert(!psi.isNaN && !psi.isInfinite && psi >= 0.0)
    assert(r(0).getAs[Long]("n1") > 0 && r(0).getAs[Long]("n2") > 0)
    assert(r(0).getAs[Int]("n_bins") > 0)
  }

  test("q_cluster_rep: representatives partition the corpus") {
    val reps = SparkEntry.queries("q_cluster_rep")(spark, sf).collect()
    val nDocs = spark.read.parquet(s"$sf/documents.parquet").count()
    // every document lands in exactly one cluster
    assert(reps.map(_.getAs[Long]("n_members")).sum == nDocs)
    assert(reps.map(_.getAs[Long]("cluster_id")).distinct.length == reps.length)
    // min-id labeling: the label can never exceed the representative
    reps.foreach { r =>
      assert(r.getAs[Long]("cluster_id") <= r.getAs[Long]("rep_doc_id"))
    }
    // the multi-member clusters agree with the oracle-checked cluster map
    val clusters = SparkEntry.queries("q_dedup_clusters")(spark, sf).collect()
      .groupBy(_.getAs[Long]("cluster_id")).map { case (c, rs) => c -> rs.length.toLong }
    val multi = reps.filter(_.getAs[Long]("n_members") > 1L)
      .map(r => r.getAs[Long]("cluster_id") -> r.getAs[Long]("n_members")).toMap
    assert(multi == clusters)
  }

  test("q_oov_rate: rates are consistent ratios strictly inside (0, 1)") {
    val rows = SparkEntry.queries("q_oov_rate")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val n = r.getAs[Long]("n_tokens"); val oov = r.getAs[Long]("n_oov")
      val rate = r.getAs[Double]("oov_rate")
      assert(n > 0 && oov >= 0 && oov <= n)
      assert(rate == oov.toDouble / n.toDouble)
      // a 10-token vocab over the ~31-token synthetic vocabulary must
      // leave both in-vocab and OOV mass in every source slice
      assert(rate > 0.0 && rate < 1.0)
    }
  }

  test("q_funnel: stages shrink monotonically and stay non-vacuous") {
    val r = SparkEntry.queries("q_funnel")(spark, sf).collect()(0)
    val (n, v, c, p) = (r.getAs[Long]("n_users"), r.getAs[Long]("n_viewed"),
      r.getAs[Long]("n_clicked"), r.getAs[Long]("n_converted"))
    assert(n >= v && v >= c && c >= p,
      "sequential funnel stages must shrink monotonically")
    assert(p > 0, "funnel is vacuous: nobody converted")
    assert(r.getAs[Double]("view_to_click") == c.toDouble / v.toDouble)
    assert(r.getAs[Double]("click_to_purchase") == p.toDouble / c.toDouble)
  }

  test("q_chi2_independence: finite non-negative statistic over a real table") {
    val r = SparkEntry.queries("q_chi2_independence")(spark, sf).collect()(0)
    val chi2 = r.getAs[Double]("chi2")
    assert(!chi2.isNaN && !chi2.isInfinite && chi2 >= 0.0)
    assert(r.getAs[Long]("n_types") > 1 && r.getAs[Long]("n_buckets") > 1,
      "contingency table degenerated to one row/column")
  }

  test("q_gini_sources: coefficient in [0, 1) and accounts for every doc") {
    val r = SparkEntry.queries("q_gini_sources")(spark, sf).collect()(0)
    val g = r.getAs[Double]("gini")
    assert(g >= 0.0 && g < 1.0)
    val nDocs = spark.read.parquet(s"$sf/documents.parquet").count()
    assert(r.getAs[Long]("n_docs") == nDocs)
  }

  test("Gini of a perfectly uniform distribution is exactly 0") {
    import spark.implicits._
    // same sorted-cumulative formula as q_gini_sources on equal counts:
    // (2·Σ i·x)/(n·Σx) − (n+1)/n = (2·x·n(n+1)/2)/(n·n·x) − (n+1)/n = 0,
    // all in exact integer arithmetic until the final divisions
    val x = Seq(("a", 7L), ("b", 7L), ("c", 7L), ("d", 7L)).toDF("source", "x")
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("x").asc, col("source").asc)
    val g = x.withColumn("i", row_number().over(w).cast("long"))
      .agg((lit(2.0) * sum(col("i") * col("x")).cast("double")
        / (count(lit(1)).cast("double") * sum(col("x")).cast("double"))
        - (count(lit(1)).cast("double") + lit(1.0))
          / count(lit(1)).cast("double")).as("g"))
      .head().getDouble(0)
    assert(g == 0.0)
  }

  test("q_mmr_rerank: greedy MMR invariants") {
    val rows = SparkEntry.queries("q_mmr_rerank")(spark, sf).collect()
    assert(rows.length == 4)
    assert(rows.map(_.getAs[Long]("vec_id")).distinct.length == 4,
      "MMR must never select the same candidate twice")
    // the first pick is pure relevance — it must equal the kNN top-1
    // (q_knn_cosine is oracle-checked, so this ties MMR to a verified
    // ranking)
    val top1 = SparkEntry.queries("q_knn_cosine")(spark, sf)
      .collect()(0).getAs[Long]("vec_id")
    assert(rows(0).getAs[Long]("vec_id") == top1)
    // the greedy max is non-increasing: penalties only grow as the
    // chosen set grows, and each step's winner was available earlier
    val scores = rows.sortBy(_.getAs[Int]("step")).map(_.getAs[Double]("mmr_score"))
    assert(scores.zip(scores.tail).forall { case (a, b) => a >= b },
      s"greedy MMR scores increased: ${scores.mkString(",")}")
  }

  test("q_pps_sample: exact draw count and stride-proportional hits") {
    val rows = SparkEntry.queries("q_pps_sample")(spark, sf).collect()
    // systematic PPS draws exactly floor(total/step) ≈ n samples in
    // total multiplicity (the stride walks the whole weight line)
    val totalHits = rows.map(_.getAs[Int]("n_hits")).sum
    assert(totalHits == 50 || totalHits == 49,
      s"systematic stride must draw ~n times, got $totalHits")
    rows.foreach { r =>
      assert(r.getAs[Int]("n_hits") >= 1)
      // multiplicity k requires weight covering at least k-1 full strides
      assert(r.getAs[Long]("n_chars") >= (r.getAs[Int]("n_hits") - 1).toLong)
    }
    // deterministic rerun
    val again = SparkEntry.queries("q_pps_sample")(spark, sf).collect()
    assert(rows.map(_.toSeq).toSeq == again.map(_.toSeq).toSeq)
  }

  test("q_skew_report: factors ordered, ≥ 1 for the heaviest key") {
    val rows = SparkEntry.queries("q_skew_report")(spark, sf).collect()
    assert(rows.length == 5)
    val fs = rows.map(_.getAs[Double]("skew_factor"))
    assert(fs.zip(fs.tail).forall { case (a, b) => a >= b })
    assert(fs.head >= 1.0, "the heaviest key is at least the mean")
  }

  test("q_scd2: per-user version chains are contiguous and collapse repeats") {
    val rows = SparkEntry.queries("q_scd2")(spark, sf).collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[String]("event_type"),
        r.getAs[java.sql.Timestamp]("valid_from"),
        Option(r.getAs[java.sql.Timestamp]("valid_to"))))
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (user, vs) =>
      val chain = vs.sortBy(_._3.getTime)
      // exactly one open (current) version per user, and it is the last
      assert(chain.count(_._4.isEmpty) == 1, s"user $user: open versions != 1")
      assert(chain.last._4.isEmpty, s"user $user: current version not last")
      // each version ends exactly where the next begins (no gaps or
      // overlaps — the SCD2 interval contract)
      chain.zip(chain.tail).foreach { case (a, b) =>
        assert(a._4.contains(b._3), s"user $user: chain broken at ${a._3}")
      }
      // consecutive versions always change the attribute
      chain.zip(chain.tail).foreach { case (a, b) =>
        assert(a._2 != b._2, s"user $user: repeat not collapsed")
      }
    }
  }

  test("PSI of a distribution against itself is exactly 0") {
    import spark.implicits._
    // same smoothing + grid arithmetic as q_psi_drift, p == q per bin:
    // every (p-q)*ln(p/q) term is exactly 0.0, so the decimal-grid sum
    // is exactly 0 — the score's fixed point, pinned here so smoothing
    // changes can never introduce a self-drift bias
    val c = Seq((0L, 5L, 5L), (1L, 3L, 3L), (2L, 9L, 9L)).toDF("bin", "c1", "c2")
    val tot = c.agg(sum("c1").as("n1"), sum("c2").as("n2"),
      count(lit(1)).as("k"))
    val psi = c.crossJoin(broadcast(tot))
      .withColumn("p", (col("c1").cast("double") + lit(0.5))
        / (col("n1").cast("double") + lit(0.5) * col("k").cast("double")))
      .withColumn("q", (col("c2").cast("double") + lit(0.5))
        / (col("n2").cast("double") + lit(0.5) * col("k").cast("double")))
      .agg(graft.queries.Q.dsumS((col("p") - col("q")) * log(col("p") / col("q")), 6)
        .as("psi"))
      .head().getDouble(0)
    assert(psi == 0.0)
  }
}
