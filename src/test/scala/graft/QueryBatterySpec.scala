package graft

import org.scalatest.funsuite.AnyFunSuite

/**
 * One spec per declared operator (SURVEY.md §2.C): every SparkEntry query
 * must build, execute, and produce a sane result at sf0.001. Value-level
 * correctness is the DuckDB oracle's job (driver t2 /
 * tools/oracle_check.py); these specs pin the structural contract —
 * runnable plan, expected columns, plausible row counts — so `sbt test`
 * catches breakage without the oracle loop.
 */
class QueryBatterySpec extends AnyFunSuite {
  import SparkTestBase.{spark, sf}

  // queries expected to return rows even at the smallest sf
  private val nonEmpty = Set(
    "q_scan_filter", "q_agg_pricing", "q_join_cust_orders", "q_join_5way",
    "q_broadcast_part", "q_semi_has_big_order", "q_window_rank",
    "q_window_running", "q_window_lag", "q_topk", "q_distinct", "q_rollup",
    "q_cube", "q_scalar_fns", "q_json_props", "q_time_bucket",
    "q_dedup_exact", "q_neardup_pairs", "q_corpus_pipeline", "q_text_tokens", "q_text_stats",
    "q_text_quality", "q_fingerprint", "q_vec_norm", "q_knn_cosine",
    "q_knn_ivf", "q_multimodal_meta", "s_tumbling_counts",
    "s_sliding_value", "s_session", "s_stateful_counts", "s_stream_join", "schema_columns",
    "ddl_lineitem", "q_asof_last_signup", "q_approx_distinct", "q_simhash",
    "q_intersect", "q_grouping_sets", "q_typed_count", "q_topk_per_key", "q_array_fns",
    "q_lang_id", "q_rolling_hash", "q_media_pipeline", "q_knn_ivf_kmeans",
    "ddl_extended", "q_decimal_agg", "s_approx_users",
    "q_decontaminate", "q_lm_score", "q_stratified_sample", "q_repetition",
    "q_vec_quantize", "q_cooccur", "q_substr_dedup", "q_markov_transitions",
    "q_winsorize", "q_ann_recall", "q_pit_join", "q_target_encode",
    "q_graph_bfs", "q_quantile_bins", "q_decay_agg", "q_purged_split",
    "q_class_weights", "q_hard_negatives", "q_cv_folds", "q_dataset_card")

  SparkEntry.allDefs.foreach { d =>
    test(s"${d.name} runs at sf0.001") {
      val df = d.run(spark, sf)
      val n = df.count()
      assert(n >= 0)
      if (nonEmpty(d.name)) assert(n > 0, s"${d.name} returned no rows")
    }
  }

  test("entry (driver t1 smoke) returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every oracle key has a query and aliases stay aligned") {
    SparkEntry.oracleSql.keys.foreach { k =>
      assert(SparkEntry.queries.contains(k), s"oracle without query: $k")
    }
  }

  test("q_topk returns exactly 10 descending prices") {
    val rows = SparkEntry.queries("q_topk")(spark, sf).collect()
    assert(rows.length == 10)
    val prices = rows.map(_.getAs[Double]("o_totalprice"))
    assert(prices.zip(prices.tail).forall { case (a, b) => a >= b })
  }

  test("q_neardup_pairs finds the planted >0.9-Jaccard duplicates") {
    val rows = SparkEntry.queries("q_neardup_pairs")(spark, sf).collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getAs[Double]("jaccard") > 0.5))
  }

  test("q_cooccur lift is positive and some pair genuinely co-occurs twice") {
    val rows = SparkEntry.queries("q_cooccur")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("pk1") < r.getAs[Long]("pk2"), s"unordered pair: $r")
      assert(r.getAs[Double]("lift") > 0.0, s"non-positive lift: $r")
    }
    // the top-100 cut is count-descending; a corpus where every pair
    // count is 1 would make the association signal vacuous
    assert(rows.head.getAs[Long]("pair_cnt") >= 2,
      "no pair co-occurs more than once — association mining is vacuous")
  }

  test("q_substr_dedup finds real duplicated spans with sane ratios") {
    val rows = SparkEntry.queries("q_substr_dedup")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (g, d) = (r.getAs[Long]("gram_cnt"), r.getAs[Long]("dup_gram_cnt"))
      assert(d >= 0 && d <= g, s"dup count outside [0, gram_cnt]: $r")
      val ratio = r.getAs[Double]("dup_ratio")
      assert(ratio >= 0.0 && ratio <= 1.0, s"ratio outside [0, 1]: $r")
    }
    assert(rows.exists(_.getAs[Long]("dup_gram_cnt") > 0),
      "no duplicated 30-char window anywhere — signal is vacuous")
    assert(rows.exists(r => r.getAs[Long]("dup_gram_cnt") <
        r.getAs[Long]("gram_cnt")),
      "every window duplicated — threshold k is too small to discriminate")
  }

  test("q_markov_transitions rows are distributions: per-prev probabilities sum to 1") {
    val rows = SparkEntry.queries("q_markov_transitions")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("cnt") > 0L)
      val p = r.getAs[Double]("p")
      assert(p > 0.0 && p <= 1.0, s"probability outside (0, 1]: $r")
    }
    rows.groupBy(_.getAs[String]("prev_type")).foreach { case (pt, rs) =>
      val tot = rs.map(_.getAs[Double]("p")).sum
      assert(math.abs(tot - 1.0) < 1e-9, s"row $pt sums to $tot")
    }
  }

  test("q_winsorize clips both tails and keeps the sum inside the clip band") {
    val rows = SparkEntry.queries("q_winsorize")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (n, lo, hi) = (r.getAs[Long]("n"), r.getAs[Double]("lo_cents"),
        r.getAs[Double]("hi_cents"))
      assert(lo < hi, s"degenerate clip band: $r")
      // 12.5%/87.5% cuts must actually clip on a 150+-row type
      assert(r.getAs[Long]("n_clip_lo") > 0 && r.getAs[Long]("n_clip_hi") > 0,
        s"winsorization clipped nothing: $r")
      val sum = r.getAs[Double]("wsum_cents")
      assert(sum >= n * lo && sum <= n * hi,
        s"winsorized sum outside [n*lo, n*hi]: $r")
    }
  }

  test("q_pit_join is leak-free: one row per purchase, version valid AT ts") {
    val purchases = graft.queries.Q.events(spark, sf)
      .filter(org.apache.spark.sql.functions.col("event_type") === "purchase")
      .count()
    val rows = SparkEntry.queries("q_pit_join")(spark, sf).collect()
    // intervals partition each user's timeline → the left join can never
    // duplicate a fact; a count mismatch means fanout or a dropped fact
    assert(rows.length.toLong == purchases,
      s"${rows.length} rows for $purchases purchases")
    var matched = 0
    rows.foreach { r =>
      val state = r.getAs[String]("state")
      if (state == null) assert(r.isNullAt(r.fieldIndex("valid_from")))
      else {
        matched += 1
        assert(Set("signup", "error")(state), s"non-status state: $r")
        // the PIT contract: the joined version began AT OR BEFORE the
        // fact's timestamp — a valid_from after ts is future leakage
        assert(!r.getAs[java.sql.Timestamp]("valid_from")
          .after(r.getAs[java.sql.Timestamp]("ts")), s"future leak: $r")
      }
    }
    assert(matched > 0, "no purchase matched any status version")
    assert(matched < rows.length,
      "every purchase matched — the no-feature-yet NULL path is untested")
  }

  test("q_target_encode is leave-one-out: a row's own label moves its encoding") {
    val rows = SparkEntry.queries("q_target_encode")(spark, sf).collect()
    val orders = graft.queries.Q.rd(spark, sf, "orders").count()
    assert(rows.length.toLong == orders, "encoder dropped or duplicated rows")
    rows.foreach { r =>
      val e = r.getAs[Double]("loo_enc")
      assert(e >= 0.0 && e <= 1.0, s"encoding outside [0,1]: $r")
    }
    // within a category the encoding depends ONLY on the row's own label
    // (two distinct values), and excluding a positive must LOWER the
    // mean-of-others — the signature that the row's label was held out
    rows.groupBy(_.getAs[String]("o_orderpriority")).foreach { case (c, rs) =>
      val byLabel = rs.groupBy(_.getAs[Long]("label"))
        .map { case (l, g) => l -> g.map(_.getAs[Double]("loo_enc")).distinct }
      assert(byLabel.values.forall(_.length == 1),
        s"$c: same-label rows got different LOO encodings")
      assert(byLabel(1L).head < byLabel(0L).head,
        s"$c: holding out a positive did not lower the encoding")
    }
  }

  test("q_graph_bfs hops are exact min distances from the seed set") {
    val rows = SparkEntry.queries("q_graph_bfs")(spark, sf).collect()
    val byId = rows.map(r =>
      r.getAs[Long]("vec_id") -> r.getAs[Int]("hop")).toMap
    assert(byId.values.forall(h => h >= 0 && h <= 3))
    val seeds = byId.filter(_._2 == 0).keySet
    assert(seeds == byId.keySet.filter(_ % 50 == 0),
      "hop-0 set is not exactly the seed set")
    // expansion is non-vacuous AND bounded: some node needed a real walk
    assert(byId.values.exists(_ == 1) && byId.values.exists(_ > 1),
      "BFS never left the seeds' immediate neighborhood")
    assert(byId.size > seeds.size, "no node reached beyond the seeds")
  }

  test("q_quantile_bins partitions the domain into 8 near-equal buckets") {
    val rows = SparkEntry.queries("q_quantile_bins")(spark, sf).collect()
    assert(rows.map(_.getAs[Int]("bin")).toSeq == (0 to 7),
      s"expected bins 0..7: ${rows.mkString(",")}")
    val total = rows.map(_.getAs[Long]("n")).sum
    rows.foreach { r =>
      // equal-frequency: every bucket within 2x of the ideal eighth
      // (ties can shift mass, but never hollow a bucket out)
      val n = r.getAs[Long]("n")
      assert(n * 8 >= total / 2 && n * 8 <= total * 2,
        s"bucket far from equal-frequency: $r (total $total)")
      assert(r.getAs[Long]("lo_cents") <= r.getAs[Long]("hi_cents"))
    }
    // buckets tile the axis in order without overlapping
    rows.sliding(2).foreach { case Array(a, b) =>
      assert(a.getAs[Long]("hi_cents") < b.getAs[Long]("lo_cents"),
        s"bins overlap: $a then $b")
    }
  }

  test("q_decay_agg never lets a decayed score exceed the raw sum") {
    val rows = SparkEntry.queries("q_decay_agg")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val dec = r.getAs[Double]("decayed_value")
      val raw = r.getAs[Double]("raw_value")
      // weights are in (0, 1]: positive values keep a positive score
      // but can never gain mass; strict < unless every event is week-0
      assert(dec > 0.0 && dec <= raw, s"decay out of (0, raw]: $r")
    }
    // the corpus spans >1 week, so decay must actually bite somewhere
    assert(rows.exists(r =>
      r.getAs[Double]("decayed_value") < r.getAs[Double]("raw_value") * 0.9),
      "no event type shows meaningful decay — weighting is vacuous")
  }

  test("q_purged_split: train < embargo < val with a non-empty gap") {
    val rows = SparkEntry.queries("q_purged_split")(spark, sf).collect()
      .map(r => r.getAs[String]("split") -> r).toMap
    assert(rows.keySet == Set("train", "embargo", "val"))
    def d(s: String, c: String) = rows(s).getAs[java.sql.Date](c).toLocalDate
    // strict temporal ordering: every train row precedes every embargo
    // row, which precedes every val row — the no-leak invariant
    assert(d("train", "d_max").isBefore(d("embargo", "d_min")))
    assert(d("embargo", "d_max").isBefore(d("val", "d_min")))
    // the embargo actually drops data (an empty gap guards nothing)
    assert(rows("embargo").getAs[Long]("n") > 0)
    val total = rows.values.map(_.getAs[Long]("n")).sum
    assert(total == queries.Q.rd(spark, sf, "orders").count(),
      "splits do not partition the table")
  }

  test("q_class_weights: inverse-frequency weights rebalance exactly") {
    val rows = SparkEntry.queries("q_class_weights")(spark, sf).collect()
    assert(rows.length == 10)
    val total = rows.map(_.getAs[Long]("n")).sum
    // Σ n_c · total/(k·n_c) = total — the defining property of
    // inverse-frequency weighting (each class contributes equal mass)
    val reweighted = rows.map(r =>
      r.getAs[Long]("n") * r.getAs[Double]("inv_weight")).sum
    assert(math.abs(reweighted - total) < 1e-6 * total, s"Σ n·w = $reweighted != $total")
    // rarest class carries the largest weight under both schemes
    val byN = rows.sortBy(_.getAs[Long]("n"))
    assert(byN.head.getAs[Double]("inv_weight") ==
      rows.map(_.getAs[Double]("inv_weight")).max)
    assert(byN.head.getAs[Double]("mf_weight") ==
      rows.map(_.getAs[Double]("mf_weight")).max)
  }

  test("q_hard_negatives ranks cross-class neighbors with consistent margins") {
    val rows = SparkEntry.queries("q_hard_negatives")(spark, sf).collect()
    assert(rows.nonEmpty && rows.length <= 15)
    rows.groupBy(_.getAs[Long]("probe_id")).foreach { case (p, rs) =>
      assert(p >= 0 && p < 5)
      val sorted = rs.sortBy(_.getAs[Int]("rn"))
      assert(sorted.map(_.getAs[Int]("rn")).toSeq == (1 to rs.length))
      // harder negatives rank first: cos non-increasing, margin
      // (distance below the best positive) non-decreasing
      val cs = sorted.map(_.getAs[Double]("neg_cos"))
      assert(cs.zip(cs.tail).forall { case (a, b) => a >= b }, s"probe $p")
      val ms = sorted.map(_.getAs[Double]("margin"))
      assert(ms.zip(ms.tail).forall { case (a, b) => a <= b }, s"probe $p")
    }
  }

  test("q_cv_folds partitions the corpus into 5 balanced folds") {
    val rows = SparkEntry.queries("q_cv_folds")(spark, sf).collect()
    assert(rows.map(_.getAs[Int]("fold")).toSeq == (0 to 4),
      s"expected folds 0..4: ${rows.mkString(",")}")
    val total = rows.map(_.getAs[Long]("n_docs")).sum
    assert(total == queries.Q.rd(spark, sf, "documents").count(),
      "folds do not partition the corpus")
    // md5 is uniform: no fold should hold more than twice its 1/5 share
    rows.foreach { r =>
      val n = r.getAs[Long]("n_docs")
      assert(n * 5 >= total / 2 && n * 5 <= total * 2, s"unbalanced fold: $r")
    }
  }

  test("q_dataset_card profiles every source with coherent shares") {
    val rows = SparkEntry.queries("q_dataset_card")(spark, sf).collect()
    assert(rows.length ==
      queries.Q.rd(spark, sf, "documents").select("source").distinct.count())
    rows.foreach { r =>
      val share = r.getAs[Double]("top_share")
      assert(share > 0.0 && share <= 1.0, s"share outside (0,1]: $r")
      assert(share * r.getAs[Long]("n_docs") >=
        r.getAs[Long]("n_docs").toDouble / r.getAs[Long]("n_langs") - 1e-9,
        s"mode below uniform share: $r")
      assert(r.getAs[Double]("mean_chars") > 0.0)
    }
    // the column must discriminate: not every shard is equally mixed
    val shares = rows.map(_.getAs[Double]("top_share"))
    assert(shares.max > shares.min, "top_share is constant — card is vacuous")
  }

  test("q_ann_recall is discriminative: some hit, nothing above 1.0") {
    val rows = SparkEntry.queries("q_ann_recall")(spark, sf).collect()
    assert(rows.length == 5)
    rows.foreach { r =>
      val rec = r.getAs[Double]("recall_at_10")
      assert(rec >= 0.0 && rec <= 1.0, s"recall outside [0, 1]: $r")
      assert(math.abs(rec - r.getAs[Long]("hits") / 10.0) < 1e-12)
    }
    assert(rows.exists(_.getAs[Long]("hits") > 0L),
      "single-bucket IVF found nothing the exact ranking found — vacuous eval")
    assert(rows.exists(_.getAs[Long]("hits") < 10L),
      "perfect recall everywhere — the eval cannot discriminate configurations")
  }

  test("query names are unique (toMap must not drop an operator)") {
    val names = SparkEntry.allDefs.map(_.name)
    assert(names.distinct.size == names.size)
  }

  test("q_approx_distinct estimates land within tolerance of exact") {
    // the tolerance check lives IN the query since r6 (est_ok, also
    // oracle-pinned TRUE); the spec asserts it holds for every group
    val rows = SparkEntry.queries("q_approx_distinct")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getAs[Boolean]("est_ok"),
      s"estimate drifted out of max(3, 10%) tolerance: $r"))
  }

  test("q_knn_cosine scores are a descending top-10 in [-1, 1]") {
    val rows = SparkEntry.queries("q_knn_cosine")(spark, sf).collect()
    assert(rows.length == 10)
    val cos = rows.map(_.getAs[Double]("cosine"))
    assert(cos.forall(c => c >= -1.0 && c <= 1.0))
    assert(cos.zip(cos.tail).forall { case (a, b) => a >= b })
  }
}
