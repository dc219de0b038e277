package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import scala.jdk.CollectionConverters._
import Q._

/**
 * Non-parquet source coverage promoted into the oracle gate (VERDICT r1
 * item 9; previously only spec-pinned in SourcesSpec): each query routes
 * a table parquet → text format → Spark's distributed reader → aggregate,
 * and the oracle computes the same aggregate straight from the parquet
 * table, so a value lost or mangled anywhere in the write/read round-trip
 * hash-fails.
 *
 * Columns are restricted to integers and strings: those round-trip
 * text formats exactly (doubles would re-enter via a parse), keeping
 * the comparison about the SOURCE path, not float formatting.
 *
 * Scale posture: both readers are ordinary distributed file scans
 * (CSV/JSON split by line), and the aggregation shuffles only the group
 * keys. The local temp dir stands in for any shared filesystem/object
 * store. Explicit schemas — never runtime inference — so the read is a
 * single pass and types are pinned (inference is a second full scan at
 * 100 TB and can widen types under dirty data).
 */
object SourceOps {

  /** Temp round-trip dir, written once per SOURCE CONTENT. The dir name
   * carries a content stamp of the source parquet (size ⊕ mtime, summed
   * over files if it's a directory), so regenerating the testdata in
   * place yields a fresh export dir instead of silently serving the
   * previous content's bytes across JVMs (VERDICT r2 finding 3 — the
   * old key was `dir.hashCode` alone). */
  private def roundTripDir(fmt: String, dir: String,
                           table: String): java.nio.file.Path = {
    // md5 dirTag, not dir.hashCode (r18 ADVICE): the 32-bit tag let two
    // colliding corpus dirs share an export name when stamps also
    // matched. src2 = the tag-layout bump; old-generation dirs are
    // swept once per JVM (they were never swept per-stamp anyway).
    graft.sources.ManifestStore.sweepLegacyPrefixes(Seq("graft_src_"))
    val stamp = Q.contentStamp(dir, table)
    val tag = graft.sources.ManifestStore.dirTag(dir)
    java.nio.file.Paths.get(System.getProperty("java.io.tmpdir"),
      s"graft_src2_${fmt}_${tag}_$stamp")
  }

  private def deleteRecursively(p: java.nio.file.Path): Unit =
    if (java.nio.file.Files.exists(p)) {
      val s = java.nio.file.Files.walk(p)
      try s.sorted(java.util.Comparator.reverseOrder())
        .forEach(q => java.nio.file.Files.deleteIfExists(q))
      finally s.close()
    }

  /** Crash-safe fixture-chain build: a complete chain is EXACTLY
   * versions 1..want. Guarding on "any version exists" would let a
   * build that crashed mid-chain (e.g. after v1 of 3) skip the build
   * forever and serve a wrong or missing chain out of the reused
   * content-stamped dir — so anything other than the full chain is
   * wiped and rebuilt (version dirs are immutable; delete+rebuild is
   * the only safe recovery). Same discipline as the IVF index's
   * last-written-_SUCCESS guard. */
  private def ensureChain(tbl: String, want: Int)(build: => Unit): String = {
    if (graft.sources.SnapshotStore.versions(tbl).toList != (1 to want).toList) {
      deleteRecursively(java.nio.file.Paths.get(tbl))
      build
    }
    tbl
  }

  /** The two-version chain shared by q_snapshot_diff and
   * q_snapshot_incr_agg (read-only consumers — neither appends, so the
   * chain is stable): v1 = the base orders projection; v2 applies
   * deletes (drop o_orderkey % 7 = 0), updates (double o_totalprice
   * where o_custkey % 5 = 0 — exact power-of-two double scaling in
   * both engines), and inserts (o_orderkey % 11 = 0 re-keyed +1e8) in
   * one commit, so every change class is non-vacuous. Built once per
   * source content. */
  private def snapDiffTable(s: org.apache.spark.sql.SparkSession,
                            dir: String): String = {
    import graft.sources.SnapshotStore
    ensureChain(roundTripDir("snapdiff", dir, "orders").toString, 2) {
      val tbl = roundTripDir("snapdiff", dir, "orders").toString
      val base = rd(s, dir, "orders")
        .select("o_orderkey", "o_custkey", "o_totalprice")
      SnapshotStore.writeVersion(base, tbl)
      val v1 = SnapshotStore.readAsOf(s, tbl, 1)
      val survived = v1.filter(col("o_orderkey") % 7 =!= 0)
        .withColumn("o_totalprice",
          when(col("o_custkey") % 5 === 0, col("o_totalprice") * 2)
            .otherwise(col("o_totalprice")))
      val inserted = v1.filter(col("o_orderkey") % 11 === 0)
        .select((col("o_orderkey") + 100000000L).as("o_orderkey"),
          col("o_custkey"), col("o_totalprice"))
      SnapshotStore.writeVersion(survived.unionByName(inserted), tbl)
    }
  }

  val defs: Vector[QueryDef] = Vector(

    // ---- CSV source: customer keys/segments through csv ---------------
    QueryDef("q_csv_source",
      (s, dir) => {
        val out = roundTripDir("csv", dir, "customer")
        if (!java.nio.file.Files.exists(out))
          rd(s, dir, "customer")
            .select("c_custkey", "c_nationkey", "c_mktsegment")
            .write.mode("overwrite").option("header", "true")
            .csv(out.toString)
        val schema = StructType(Seq(
          StructField("c_custkey", LongType),
          StructField("c_nationkey", LongType),
          StructField("c_mktsegment", StringType)))
        s.read.schema(schema).option("header", "true").csv(out.toString)
          .groupBy("c_mktsegment")
          .agg(count(lit(1)).as("n_cust"),
            sum(col("c_custkey")).as("sum_key"),
            countDistinct(col("c_nationkey")).as("n_nations"))
          .orderBy("c_mktsegment")
      },
      Some("""SELECT c_mktsegment, COUNT(*) AS n_cust,
             |  CAST(SUM(c_custkey) AS BIGINT) AS sum_key,
             |  COUNT(DISTINCT c_nationkey) AS n_nations
             |FROM customer GROUP BY c_mktsegment
             |ORDER BY c_mktsegment""".stripMargin)),

    // ---- JSON-lines source: order keys/status through json -------------
    QueryDef("q_json_source",
      (s, dir) => {
        val out = roundTripDir("json", dir, "orders")
        if (!java.nio.file.Files.exists(out))
          rd(s, dir, "orders")
            .select("o_orderkey", "o_custkey", "o_orderstatus", "o_orderpriority")
            .write.mode("overwrite").json(out.toString)
        val schema = StructType(Seq(
          StructField("o_orderkey", LongType),
          StructField("o_custkey", LongType),
          StructField("o_orderstatus", StringType),
          StructField("o_orderpriority", StringType)))
        s.read.schema(schema).json(out.toString)
          .groupBy("o_orderstatus", "o_orderpriority")
          .agg(count(lit(1)).as("n_orders"),
            min(col("o_orderkey")).as("min_key"),
            max(col("o_custkey")).as("max_cust"))
          .orderBy("o_orderstatus", "o_orderpriority")
      },
      Some("""SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n_orders,
             |  MIN(o_orderkey) AS min_key, MAX(o_custkey) AS max_cust
             |FROM orders GROUP BY o_orderstatus, o_orderpriority
             |ORDER BY o_orderstatus, o_orderpriority""".stripMargin)),

    // ---- ORC source: supplier through the columnar sibling -------------
    // Same round-trip contract as CSV/JSON, through Spark's built-in ORC
    // reader/writer — the other columnar format a lakehouse ingests.
    // Doubles survive ORC exactly (binary format, no text parse), so
    // acctbal can ride along here.
    QueryDef("q_orc_source",
      (s, dir) => {
        val out = roundTripDir("orc", dir, "supplier")
        if (!java.nio.file.Files.exists(out))
          rd(s, dir, "supplier")
            .select("s_suppkey", "s_nationkey", "s_acctbal")
            .write.mode("overwrite").orc(out.toString)
        s.read.orc(out.toString)
          .groupBy("s_nationkey")
          .agg(count(lit(1)).as("n_supp"),
            dsum(col("s_acctbal")).as("sum_bal"),
            max(col("s_suppkey")).as("max_key"))
          .orderBy("s_nationkey")
      },
      Some(s"""SELECT s_nationkey, COUNT(*) AS n_supp,
              |  ${dsumSql("s_acctbal")} AS sum_bal,
              |  MAX(s_suppkey) AS max_key
              |FROM supplier GROUP BY s_nationkey
              |ORDER BY s_nationkey""".stripMargin)),

    // ---- hive-partitioned sink + partition-pruned read -----------------
    // The 100 TB layout pattern: write the fact table partitioned by a
    // low-cardinality column (directory-per-value), then read ONE
    // partition back — the scan must touch only that directory's files
    // (SourcesSpec asserts every inputFile path carries the partition
    // value; the filter never reaches row groups of other partitions).
    // Oracle computes the same aggregate from the raw table with the
    // equivalent WHERE.
    QueryDef("q_partitioned_write",
      (s, dir) => {
        val out = roundTripDir("hivepart", dir, "orders")
        if (!java.nio.file.Files.exists(out))
          rd(s, dir, "orders")
            .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"),
              col("o_orderpriority"), col("o_orderstatus"))
            .write.mode("overwrite").partitionBy("o_orderstatus")
            .parquet(out.toString)
        s.read.parquet(out.toString)
          .filter(col("o_orderstatus") === "F")
          .groupBy("o_orderpriority")
          .agg(count(lit(1)).as("n_orders"),
            dsum(col("o_totalprice")).as("sum_price"))
          .orderBy("o_orderpriority")
      },
      Some(s"""SELECT o_orderpriority, COUNT(*) AS n_orders,
              |  ${dsumSql("o_totalprice")} AS sum_price
              |FROM orders WHERE o_orderstatus = 'F'
              |GROUP BY o_orderpriority
              |ORDER BY o_orderpriority""".stripMargin)),

    // ---- z-ordered layout + two-dimensional range read -----------------
    // Lay the orders table out on the Morton curve of (custkey, order
    // day) — operators/ZOrder — then answer a two-sided range query
    // from the laid-out copy. The gate checks result invariance (the
    // layout must never change answers); ZOrderSpec separately measures
    // the layout property itself: per-file min/max spread bounded in
    // BOTH dimensions, which is what lets parquet stats skip most files
    // for this exact filter shape at 100 TB.
    QueryDef("q_zorder_layout",
      (s, dir) => {
        val out = roundTripDir("zorder", dir, "orders")
        if (!java.nio.file.Files.exists(out))
          graft.operators.ZOrder.writeZOrdered(
            rd(s, dir, "orders")
              .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"),
                expr("unix_date(CAST(o_orderdate AS DATE))").as("o_day")),
            "o_custkey", "o_day", out.toString, numFiles = 8)
        s.read.parquet(out.toString)
          .filter(col("o_custkey").between(10, 60) &&
            col("o_day").between(9500, 10000))
          .groupBy("o_custkey")
          .agg(count(lit(1)).as("n_orders"),
            dsum(col("o_totalprice")).as("sum_price"))
          .orderBy("o_custkey")
      },
      Some(s"""SELECT o_custkey, COUNT(*) AS n_orders,
              |  ${dsumSql("o_totalprice")} AS sum_price
              |FROM orders
              |WHERE o_custkey BETWEEN 10 AND 60
              |  AND datediff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE))
              |        BETWEEN 9500 AND 10000
              |GROUP BY o_custkey ORDER BY o_custkey""".stripMargin)),

    // ---- DataSource V2 generator source --------------------------------
    // The graft.sources.DocGen TableProvider: deterministic synthetic
    // corpus with no input files, split into independent id ranges
    // (parallel at any executor count), column pruning pushed into the
    // reader. DocGenSpec pins determinism, pruning, and parallelism by
    // value; this entry keeps the source exercised in the bench loop.
    //
    // ORACLE (round 10, the media-checksum precedent): DuckDB cannot
    // open a Spark V2 source, but every DocGen row is CLOSED-FORM in
    // (seed, doc_id) — the oracle replays the generator's splittable
    // 64-bit mix in HUGEINT arithmetic (xor + floor-div for the
    // unsigned shifts; 64×64-bit products decomposed into 32-bit
    // halves so int128 never overflows) and recomputes each doc's lang
    // and exact n_chars (token count + per-token vocab lengths) from
    // id arithmetic alone. A generator change that shifts a single
    // token therefore hash-fails the gate.
    QueryDef("q_docgen_source",
      (s, dir) => {
        s.read.format("graft.sources.DocGen")
          .option("rows", 5000L).option("partitions", 16).option("seed", 7L)
          .load()
          .groupBy("lang")
          .agg(count(lit(1)).as("n_docs"),
            sum(col("n_chars")).cast("long").as("sum_chars"))
          .orderBy("lang")
      },
      Some("""WITH ids AS (SELECT unnest(generate_series(0, 4999)) AS id),
             |hh AS (
             |  SELECT id,
             |    xor(7::HUGEINT, (id::HUGEINT * 11400714819323198485::HUGEINT)
             |        % 18446744073709551616::HUGEINT) AS t0,
             |    xor(t0, t0 // 8589934592) AS u0,
             |    ((u0 % 4294967296) * 18397679294719823053::HUGEINT
             |      + ((u0 // 4294967296) * 18397679294719823053::HUGEINT % 4294967296)
             |        * 4294967296) % 18446744073709551616::HUGEINT AS t1,
             |    xor(t1, t1 // 8589934592) AS u1,
             |    ((u1 % 4294967296) * 14181476777654086739::HUGEINT
             |      + ((u1 // 4294967296) * 14181476777654086739::HUGEINT % 4294967296)
             |        * 4294967296) % 18446744073709551616::HUGEINT AS t2,
             |    xor(t2, t2 // 8589934592) AS h
             |  FROM ids),
             |d AS (
             |  SELECT id, h,
             |    ['en','es','de','fr','zh'][1 + CAST(h % 5 AS INTEGER)] AS lang,
             |    20 + CAST((h // 65536) % 81 AS INTEGER) AS n
             |  FROM hh),
             |t AS (
             |  SELECT id, lang, n,
             |    (n - 1) + list_sum(
             |      list_transform(
             |        list_transform(
             |          list_transform(
             |            list_transform(
             |              list_transform(
             |                list_transform(range(0, n),
             |                  i -> xor(h, (i::HUGEINT * 11400714819323198485::HUGEINT)
             |                       % 18446744073709551616::HUGEINT)),
             |                t0 -> xor(t0, t0 // 8589934592)),
             |              u0 -> ((u0 % 4294967296) * 18397679294719823053::HUGEINT
             |                + ((u0 // 4294967296) * 18397679294719823053::HUGEINT
             |                   % 4294967296) * 4294967296)
             |                % 18446744073709551616::HUGEINT),
             |            t1 -> xor(t1, t1 // 8589934592)),
             |          u1 -> ((u1 % 4294967296) * 14181476777654086739::HUGEINT
             |            + ((u1 // 4294967296) * 14181476777654086739::HUGEINT
             |               % 4294967296) * 4294967296)
             |            % 18446744073709551616::HUGEINT),
             |        t2 -> [3,4,3,4,5,4,5,6,4,6,5,6,4,3,5,5,5,4,5,5,4,4,5,4]
             |              [1 + CAST(xor(t2, t2 // 8589934592) % 24 AS INTEGER)])
             |    ) AS n_chars
             |  FROM d)
             |SELECT lang, COUNT(*) AS n_docs,
             |  CAST(SUM(n_chars) AS BIGINT) AS sum_chars
             |FROM t GROUP BY lang ORDER BY lang""".stripMargin)),

    // ---- schema evolution on read (mergeSchema) ------------------------
    // The 100 TB reality that a table's files span schema generations:
    // generation 1 (even order keys) lacks o_orderstatus, generation 2
    // (odd keys) carries it. `mergeSchema=true` unions the footers at
    // planning time — one extra footer pass, no data rewrite — and old
    // files surface the new column as null. The aggregate groups by the
    // evolved column with nulls folded to a sentinel (Spark and DuckDB
    // disagree on null ORDER BY placement, so the sentinel also keeps
    // the output ordering portable). The oracle reconstructs the same
    // generation split directly from the parquet table.
    QueryDef("q_schema_evolution",
      (s, dir) => {
        val out = roundTripDir("evo", dir, "orders")
        if (!java.nio.file.Files.exists(out)) {
          val orders = rd(s, dir, "orders")
          orders.filter(col("o_orderkey") % 2 === 0)
            .select("o_orderkey", "o_custkey", "o_totalprice")
            .write.mode("overwrite").parquet(s"$out/gen=1")
          orders.filter(col("o_orderkey") % 2 === 1)
            .select("o_orderkey", "o_custkey", "o_totalprice", "o_orderstatus")
            .write.mode("overwrite").parquet(s"$out/gen=2")
        }
        s.read.option("mergeSchema", "true").parquet(out.toString)
          .withColumn("status",
            coalesce(col("o_orderstatus"), lit("(pre-evolution)")))
          .groupBy("status")
          .agg(count(lit(1)).as("n_orders"),
            dsum(col("o_totalprice")).as("sum_total"))
          .orderBy("status")
      },
      Some(s"""SELECT COALESCE(CASE WHEN o_orderkey % 2 = 1
              |                     THEN o_orderstatus END,
              |                '(pre-evolution)') AS status,
              |  COUNT(*) AS n_orders,
              |  ${dsumSql("o_totalprice")} AS sum_total
              |FROM orders GROUP BY 1 ORDER BY status""".stripMargin)),

    // ---- small-file compaction -----------------------------------------
    // The operational fix for streaming-ingest fragmentation: a landing
    // zone of 64 tiny files is rewritten into 4 via coalesce — a pure
    // file-merge with NO shuffle (each output task concatenates input
    // splits), the cheapest correct compaction. The gate row proves
    // CONTENT invariance through the rewrite (exact decimal totals per
    // status vs the original table); SourcesSpec pins the file counts
    // and the no-shuffle plan. At 100 TB the same job runs per
    // partition-directory with the target file count sized to
    // bytes/128 MB.
    QueryDef("q_compact_files",
      (s, dir) => {
        val frag = roundTripDir("frag", dir, "orders")
        if (!java.nio.file.Files.exists(frag))
          rd(s, dir, "orders").repartition(64)
            .write.mode("overwrite").parquet(frag.toString)
        val compacted = roundTripDir("compacted", dir, "orders")
        if (!java.nio.file.Files.exists(compacted))
          s.read.parquet(frag.toString).coalesce(4)
            .write.mode("overwrite").parquet(compacted.toString)
        s.read.parquet(compacted.toString)
          .groupBy("o_orderstatus")
          .agg(count(lit(1)).as("n_orders"),
            dsum(col("o_totalprice")).as("sum_total"))
          .orderBy("o_orderstatus")
      },
      Some(s"""SELECT o_orderstatus, COUNT(*) AS n_orders,
              |  ${dsumSql("o_totalprice")} AS sum_total
              |FROM orders GROUP BY o_orderstatus
              |ORDER BY o_orderstatus""".stripMargin)),

    // ---- snapshot-versioned table: as-of + latest reads ----------------
    // graft.sources.SnapshotStore's time-travel convention through the
    // gate: three immutable versions of an orders projection are
    // committed once per source content — v1 the base, v2 a delete pass
    // (drop o_orderkey % 7 = 0), v3 an update pass over v2 (double
    // o_totalprice where o_custkey % 5 = 0; exact in both engines —
    // power-of-two scaling of a double). The query then time-travels:
    // aggregate AS OF v2 and at latest (v3), side by side. The oracle
    // recomputes both versions' content from the raw table, so the
    // as-of read proves RESULT INVARIANCE — v2's numbers must still be
    // v2's even though v3 exists. SnapshotReadSpec pins the listing
    // property (an as-of scan's inputFiles all live under its one v=N
    // directory) and write isolation (a new version never perturbs an
    // open as-of read).
    QueryDef("q_snapshot_asof",
      (s, dir) => {
        import graft.sources.SnapshotStore
        val tbl = ensureChain(roundTripDir("snap", dir, "orders").toString, 3) {
          val t = roundTripDir("snap", dir, "orders").toString
          val base = rd(s, dir, "orders")
            .select("o_orderkey", "o_custkey", "o_totalprice")
          SnapshotStore.writeVersion(base, t)
          SnapshotStore.writeVersion(
            base.filter(col("o_orderkey") % 7 =!= 0), t)
          val v2 = SnapshotStore.readAsOf(s, t, 2)
          SnapshotStore.writeVersion(
            v2.withColumn("o_totalprice",
              when(col("o_custkey") % 5 === 0, col("o_totalprice") * 2)
                .otherwise(col("o_totalprice"))), t)
        }
        val asOf2 = SnapshotStore.readAsOf(s, tbl, 2)
          .agg(count(lit(1)).as("n_orders"), dsum(col("o_totalprice")).as("sum_total"))
          .select(lit("v2_asof").as("snapshot"), col("n_orders"), col("sum_total"))
        val latest = SnapshotStore.readLatest(s, tbl)
          .agg(count(lit(1)).as("n_orders"), dsum(col("o_totalprice")).as("sum_total"))
          .select(lit("v3_latest").as("snapshot"), col("n_orders"), col("sum_total"))
        asOf2.union(latest).orderBy("snapshot")
      },
      Some(s"""WITH v2 AS (SELECT o_orderkey, o_custkey, o_totalprice
              |            FROM orders WHERE o_orderkey % 7 <> 0),
              |v3 AS (SELECT o_orderkey, o_custkey,
              |         CASE WHEN o_custkey % 5 = 0 THEN o_totalprice * 2
              |              ELSE o_totalprice END AS o_totalprice
              |       FROM v2)
              |SELECT * FROM (
              |  SELECT 'v2_asof' AS snapshot, COUNT(*) AS n_orders,
              |    ${dsumSql("o_totalprice")} AS sum_total FROM v2
              |  UNION ALL
              |  SELECT 'v3_latest', COUNT(*), ${dsumSql("o_totalprice")}
              |  FROM v3)
              |ORDER BY snapshot""".stripMargin)),

    // ---- manifest-pruned time travel (stats-pruned as-of scan) ---------
    // The composition a real table format runs on every query (VERDICT
    // r7 "what's missing" 2): a versioned AS-OF read whose file listing
    // is cut by the version's own min/max manifest BEFORE any data file
    // opens. The chain ("snapm", 2 versions, range-clustered on
    // o_totalprice so stats actually separate files) is written through
    // SnapshotStore.writeVersionWithManifest — data + per-file stats
    // published in ONE atomic rename, a version is never visible
    // half-built. The entry reads v2 through the manifest with
    // o_totalprice > 300000 AND as a plain full scan with the same
    // row filter, emitting both aggregates: the oracle computes the two
    // rows identically from the raw table, so a manifest that prunes a
    // file it shouldn't (or misses rows any other way) hash-fails the
    // gate. SnapshotReadSpec pins the listing side: genuinely fewer
    // files scanned, every scanned file inside v=2, and
    // pruned ≡ unpruned row-for-row.
    QueryDef("q_snapshot_pruned",
      (s, dir) => {
        import graft.sources.SnapshotStore
        val tbl = ensureChain(roundTripDir("snapm", dir, "orders").toString, 2) {
          val t = roundTripDir("snapm", dir, "orders").toString
          val base = rd(s, dir, "orders")
            .select("o_orderkey", "o_custkey", "o_totalprice")
            .repartitionByRange(8, col("o_totalprice"))
          SnapshotStore.writeVersionWithManifest(base, t, Seq("o_totalprice"))
          SnapshotStore.writeVersionWithManifest(
            base.filter(col("o_orderkey") % 7 =!= 0), t, Seq("o_totalprice"))
        }
        val pred = SnapshotStore.GreaterThan("o_totalprice", 300000.0)
        val pruned = SnapshotStore.readAsOfPruned(s, tbl, 2, pred).df
          .agg(count(lit(1)).as("n_orders"),
            dsum(col("o_totalprice")).as("sum_total"))
          .select(lit("v2_pruned").as("read_path"), col("n_orders"),
            col("sum_total"))
        val full = SnapshotStore.readAsOf(s, tbl, 2).filter(pred.rowFilter)
          .agg(count(lit(1)).as("n_orders"),
            dsum(col("o_totalprice")).as("sum_total"))
          .select(lit("v2_full_scan").as("read_path"), col("n_orders"),
            col("sum_total"))
        pruned.union(full).orderBy("read_path")
      },
      Some(s"""WITH v2 AS (SELECT o_totalprice FROM orders
              |            WHERE o_orderkey % 7 <> 0 AND o_totalprice > 300000)
              |SELECT * FROM (
              |  SELECT 'v2_full_scan' AS read_path, COUNT(*) AS n_orders,
              |    ${dsumSql("o_totalprice")} AS sum_total FROM v2
              |  UNION ALL
              |  SELECT 'v2_pruned', COUNT(*), ${dsumSql("o_totalprice")}
              |  FROM v2)
              |ORDER BY read_path""".stripMargin)),

    // ---- snapshot diff: CDC between two versions -----------------------
    // The incremental-read surface over SnapshotStore: classify every
    // key across two immutable versions as insert / update / delete /
    // unchanged — what a downstream consumer reads instead of the full
    // table. Its own version chain (v1 the base; v2 applies deletes,
    // updates AND inserts in one commit, so all three change classes
    // are non-vacuous) — deliberately NOT q_snapshot_asof's table, whose
    // oracle pins "latest" = its v3. The diff is one full-outer equi-
    // join on the key; update detection compares doubles both engines
    // derive identically (power-of-two scaling). At 100 TB the same
    // classification runs per partition-directory, and a manifest-
    // carrying format would first prune to files that changed between
    // the versions — the join shape is unchanged.
    QueryDef("q_snapshot_diff",
      (s, dir) => {
        import graft.sources.SnapshotStore
        val tbl = snapDiffTable(s, dir)
        val a = SnapshotStore.readAsOf(s, tbl, 1)
          .select(col("o_orderkey"), col("o_totalprice").as("old_price"))
        val b = SnapshotStore.readAsOf(s, tbl, 2)
          .select(col("o_orderkey"), col("o_totalprice").as("new_price"))
        a.join(b, Seq("o_orderkey"), "full_outer")
          .withColumn("change_type",
            when(col("old_price").isNull, "insert")
              .when(col("new_price").isNull, "delete")
              .when(col("old_price") =!= col("new_price"), "update")
              .otherwise("unchanged"))
          .groupBy("change_type")
          .agg(count(lit(1)).as("n_rows"),
            dsum(coalesce(col("new_price"), col("old_price"))).as("sum_price"))
          .orderBy("change_type")
      },
      Some(s"""WITH v1 AS (SELECT o_orderkey, o_totalprice FROM orders),
              |v2 AS (
              |  SELECT o_orderkey,
              |    CASE WHEN o_custkey % 5 = 0 THEN o_totalprice * 2
              |         ELSE o_totalprice END AS o_totalprice
              |  FROM orders WHERE o_orderkey % 7 <> 0
              |  UNION ALL
              |  SELECT o_orderkey + 100000000, o_totalprice
              |  FROM orders WHERE o_orderkey % 11 = 0),
              |d AS (SELECT a.o_totalprice AS oldp, b.o_totalprice AS newp
              |      FROM v1 a FULL OUTER JOIN v2 b
              |        ON a.o_orderkey = b.o_orderkey)
              |SELECT CASE WHEN oldp IS NULL THEN 'insert'
              |            WHEN newp IS NULL THEN 'delete'
              |            WHEN oldp <> newp THEN 'update'
              |            ELSE 'unchanged' END AS change_type,
              |  COUNT(*) AS n_rows,
              |  ${dsumSql("COALESCE(newp, oldp)")} AS sum_price
              |FROM d GROUP BY 1 ORDER BY change_type""".stripMargin)),

    // ---- incremental view maintenance over snapshot versions -----------
    // The 100 TB refresh pattern: a materialized per-bucket aggregate is
    // brought from version N to N+1 by applying the CDC DELTA (inserts
    // +row, deletes −row, updates ±price difference) to the stored
    // base aggregate — touching only the diff, never rescanning the new
    // version. The Spark side computes the aggregate INCREMENTALLY
    // (v1 aggregate ⊕ delta from the version diff); the oracle computes
    // the DIRECT aggregate of v2 — so the gate hash-proves the
    // incremental maintenance identity agg(v2) = agg(v1) ⊕ δ, the
    // correctness property the whole pattern rests on. Exact decimal
    // sums make ⊕ associative and order-free (float deltas would drift
    // under 1000-executor accumulation orders).
    QueryDef("q_snapshot_incr_agg",
      (s, dir) => {
        import graft.sources.SnapshotStore
        import org.apache.spark.sql.types.DecimalType
        val tbl = snapDiffTable(s, dir)
        val dec = (c: org.apache.spark.sql.Column) => c.cast(DecimalType(18, 2))
        val v1 = SnapshotStore.readAsOf(s, tbl, 1)
        val v2 = SnapshotStore.readAsOf(s, tbl, 2)
        // the stored base aggregate (at scale: read back, not recomputed)
        val baseAgg = v1.groupBy((col("o_custkey") % 10).as("bucket"))
          .agg(count(lit(1)).as("n1"), sum(dec(col("o_totalprice"))).as("s1"))
        // CDC delta per bucket — the only data beyond the base aggregate
        val a = v1.select(col("o_orderkey"), col("o_custkey").as("ck_a"),
          col("o_totalprice").as("old_price"))
        val b = v2.select(col("o_orderkey"), col("o_custkey").as("ck_b"),
          col("o_totalprice").as("new_price"))
        val delta = a.join(b, Seq("o_orderkey"), "full_outer")
          .select((coalesce(col("ck_b"), col("ck_a")) % 10).as("bucket"),
            when(col("old_price").isNull, 1L)
              .when(col("new_price").isNull, -1L).otherwise(0L).as("dn"),
            (coalesce(dec(col("new_price")), dec(lit(0)))
              - coalesce(dec(col("old_price")), dec(lit(0)))).as("ds"))
          .groupBy("bucket")
          .agg(sum(col("dn")).as("dn"), sum(col("ds")).as("ds"))
        baseAgg.join(delta, Seq("bucket"), "full_outer")
          .select(col("bucket"),
            (coalesce(col("n1"), lit(0L)) + coalesce(col("dn"), lit(0L)))
              .as("n_rows"),
            (coalesce(col("s1"), dec(lit(0))) + coalesce(col("ds"), dec(lit(0))))
              .cast("double").as("sum_price"))
          .orderBy("bucket")
      },
      Some("""WITH v2 AS (
             |  SELECT o_orderkey, o_custkey,
             |    CASE WHEN o_custkey % 5 = 0 THEN o_totalprice * 2
             |         ELSE o_totalprice END AS p
             |  FROM orders WHERE o_orderkey % 7 <> 0
             |  UNION ALL
             |  SELECT o_orderkey + 100000000, o_custkey, o_totalprice
             |  FROM orders WHERE o_orderkey % 11 = 0)
             |SELECT o_custkey % 10 AS bucket, COUNT(*) AS n_rows,
             |  CAST(SUM(CAST(p AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
             |FROM v2 GROUP BY 1 ORDER BY bucket""".stripMargin))
  )
}
