package graft

import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.sources.{ManifestStore, MinHashSigIndex}

/** Pins the persisted MinHash signature table's contract on the
 * round-10 per-partition manifest layout: persisted rows equal the
 * build plan, reuse is content-stamped at the metadata level (zero
 * file churn), incremental maintenance over a grown/changed corpus is
 * equivalent to a full rebuild AND carries still-covered rows over by
 * reference (tamper-proof), refresh WRITE bytes are delta-sized (the
 * r10 headline), removals tombstone + resurrect without re-signing,
 * long chains compact per bucket, and the schema survives an empty
 * corpus. */
class MinHashSigIndexSpec extends AnyFunSuite {
  import SparkTestBase.{spark, sf}

  private def row(r: org.apache.spark.sql.Row) =
    (r.getLong(0), r.getSeq[Long](1), r.getLong(2))

  private def fileState(p: java.nio.file.Path): Map[String, Long] = {
    val w = Files.walk(p)
    try w.iterator().asScala.filter(Files.isRegularFile(_))
      .map(f => f.toString -> Files.getLastModifiedTime(f).toMillis)
      .toMap
    finally w.close()
  }

  private def manifest(dir: String): ManifestStore.Manifest =
    ManifestStore.currentManifest(MinHashSigIndex.store(dir),
        graft.queries.Q.contentStamp(dir, "documents"))
      .getOrElse(fail(s"no current manifest for $dir"))

  private def entryBytes(dir: String,
                         es: Seq[ManifestStore.Entry]): Long =
    ManifestStore.entryBytes(MinHashSigIndex.store(dir), es)

  private def gen(lo: Int, hi: Int, marker: String) =
    spark.range(lo, hi).selectExpr("id AS doc_id",
      s"concat_ws(' ', 'alpha', 'beta', CAST(id AS STRING), '$marker', " +
        "CAST(id % 7 AS STRING), 'gamma', 'delta') AS text")

  test("persisted signatures equal the build plan; reuse is stamped, zero file churn") {
    val got = MinHashSigIndex.sigs(spark, sf)
      .collect().map(row).sortBy(_._1).toSeq
    val want = MinHashSigIndex.buildPlan(spark, sf)
      .collect().map(row).sortBy(_._1).toSeq
    assert(got == want, "persisted signature table diverged from the build plan")
    assert(got.nonEmpty && got.forall(_._2.length == 32),
      "every doc must carry a 32-permutation signature")
    // unchanged corpus → second call touches NO file in the store
    val store = MinHashSigIndex.store(sf)
    val before = fileState(store)
    MinHashSigIndex.sigs(spark, sf).count()
    assert(fileState(store) == before,
      "signature store churned files for unchanged content")
  }

  test("incremental refresh: append + edit ≡ full rebuild, carried rows reused, writes delta-sized") {
    val dir = Files.createTempDirectory("graft_sigidx_incr").toString
    gen(0, 3000, "v1").write.mode("overwrite")
      .parquet(s"$dir/documents.parquet")
    MinHashSigIndex.sigs(spark, dir).count()
    val m0 = manifest(dir)
    val baseBytes = entryBytes(dir, m0.entries)
    // tamper one still-covered row's signature INSIDE its published
    // bucket dir: a true carry-over serves it verbatim, a silent full
    // rebuild erases it
    val markId = 7L
    val markBucket = (markId % MinHashSigIndex.NBUCKETS).toInt
    val bdirRel = m0.entries
      .find(e => e.kind == "data" && e.bucket == markBucket)
      .getOrElse(fail("no data entry for the mark bucket")).rel
    val bdir = MinHashSigIndex.store(dir).resolve(bdirRel)
    val rows = spark.read.schema(MinHashSigIndex.schema)
      .parquet(bdir.toString).collect()
    val tampered = rows.map { r =>
      if (r.getLong(0) == markId)
        org.apache.spark.sql.Row(r.getLong(0),
          Seq.fill(32)(-1L), r.getLong(2), r.getInt(3))
      else r
    }
    val tmpDir = Files.createTempDirectory("graft_sigidx_tamper").toString
    spark.createDataFrame(
        spark.sparkContext.parallelize(tampered.toSeq),
        MinHashSigIndex.schema)
      .write.mode("overwrite").parquet(tmpDir)
    graft.queries.Q.deleteRecursively(bdir)
    Files.move(Paths.get(tmpDir), bdir)
    // grow AND change the corpus: append 60 docs and add a second text
    // version of doc 3 (both versions are corpus rows with distinct
    // text_hash, so both must be signed)
    gen(3000, 3060, "v1").write.mode("append")
      .parquet(s"$dir/documents.parquet")
    gen(3, 4, "v2").write.mode("append")
      .parquet(s"$dir/documents.parquet")
    val incr = MinHashSigIndex.sigs(spark, dir).collect().map(row)
    assert(incr.exists(t => t._1 == markId && t._2 == Seq.fill(32)(-1L)),
      "tampered still-covered row was not carried over — " +
        "incremental path silently full-rebuilt")
    val want = MinHashSigIndex.buildPlan(spark, dir)
      .collect().map(row).filterNot(_._1 == markId)
      .sortBy(t => (t._1, t._3)).toSeq
    val gotRest = incr.filterNot(_._1 == markId).sortBy(t => (t._1, t._3)).toSeq
    assert(gotRest == want,
      "incremental result diverged from full rebuild outside the tampered row")
    assert(gotRest.exists(_._1 == 3L) && gotRest.count(_._1 == 3L) == 2,
      "both text versions of the edited doc must be signed")
    // the r10 headline: refresh WRITE I/O ∝ delta. Unchanged buckets'
    // entries are carried by REFERENCE (identical rel paths), and the
    // bytes behind newly-written entries are a small fraction of the
    // base artifact (61 fresh docs vs 3000).
    val m1 = manifest(dir)
    val m0Rels = m0.entries.map(_.rel).toSet
    assert(m0.entries.forall(e => m1.entries.contains(e)),
      "append-only refresh must carry every base entry by reference")
    val newEntries = m1.entries.filterNot(e => m0Rels.contains(e.rel))
    val newBytes = entryBytes(dir, newEntries)
    assert(newBytes > 0L, "refresh wrote nothing?")
    assert(newBytes < baseBytes / 5,
      s"refresh write bytes not delta-sized: wrote $newBytes vs base $baseBytes")
    graft.queries.Q.deleteRecursively(Paths.get(dir))
  }

  test("removal tombstones, resurrection re-serves without re-signing") {
    val dir = Files.createTempDirectory("graft_sigidx_tomb").toString
    val docsPath = s"$dir/documents.parquet"
    gen(0, 300, "v1").write.mode("overwrite").parquet(docsPath)
    MinHashSigIndex.sigs(spark, dir).count()
    // shrink + edit: docs 250.. drop, doc 10 changes text
    gen(0, 250, "v1").filter(col("doc_id") =!= 10)
      .unionByName(gen(10, 11, "v2"))
      .write.mode("overwrite").parquet(docsPath)
    val shrunk = MinHashSigIndex.sigs(spark, dir)
    assert(shrunk.count() == 250L)
    val wantShrunk = MinHashSigIndex.buildPlan(spark, dir)
      .collect().map(row).sortBy(t => (t._1, t._3)).toSeq
    assert(shrunk.collect().map(row).sortBy(t => (t._1, t._3)).toSeq
      == wantShrunk, "post-removal serve diverged from full rebuild")
    // resurrect EVERY key ever signed (original 300 + the v2 edit):
    // all of them already live in the data segments (tombstoned), so
    // the refresh must re-serve by tombstone removal alone — ZERO new
    // data entries (the segment-key disjointness invariant in action)
    val m1 = manifest(dir)
    gen(0, 300, "v1").unionByName(gen(10, 11, "v2"))
      .write.mode("overwrite").parquet(docsPath)
    val res = MinHashSigIndex.sigs(spark, dir)
    val m2 = manifest(dir)
    val dataRels = (m: ManifestStore.Manifest) =>
      m.entries.filter(_.kind == "data").map(_.rel).toSet
    assert(dataRels(m2) == dataRels(m1),
      "resurrection must not write new data segments — rows were already signed")
    assert(m2.entries.forall(_.kind == "data"),
      "fully-resurrected corpus must carry no live tombstones")
    val wantRes = MinHashSigIndex.buildPlan(spark, dir)
      .collect().map(row).sortBy(t => (t._1, t._3)).toSeq
    assert(res.collect().map(row).sortBy(t => (t._1, t._3)).toSeq
      == wantRes, "resurrected serve diverged from full rebuild")
    graft.queries.Q.deleteRecursively(Paths.get(dir))
  }

  test("a bucket's chain compacts past MAXCHAIN; serve stays equivalent") {
    val dir = Files.createTempDirectory("graft_sigidx_compact").toString
    val docsPath = s"$dir/documents.parquet"
    gen(0, 200, "v1").write.mode("overwrite").parquet(docsPath)
    MinHashSigIndex.sigs(spark, dir).count()
    // each append lands rows in every bucket → every bucket's chain
    // grows by one per refresh, crossing MAXCHAIN together
    for (i <- 1 to MinHashSigIndex.MAXCHAIN + 1) {
      gen(200 + i * 100, 300 + i * 100, "v1").write.mode("append")
        .parquet(docsPath)
      MinHashSigIndex.sigs(spark, dir).count()
    }
    val m = manifest(dir)
    val chains = m.entries.filter(_.kind == "data").groupBy(_.bucket)
    assert(chains.nonEmpty)
    chains.foreach { case (b, es) =>
      assert(es.size <= MinHashSigIndex.MAXCHAIN,
        s"bucket $b chain ${es.size} exceeds MAXCHAIN after compaction")
    }
    val got = MinHashSigIndex.sigs(spark, dir)
      .collect().map(row).sortBy(t => (t._1, t._3)).toSeq
    val want = MinHashSigIndex.buildPlan(spark, dir)
      .collect().map(row).sortBy(t => (t._1, t._3)).toSeq
    assert(got == want, "post-compaction serve diverged from full rebuild")
    graft.queries.Q.deleteRecursively(Paths.get(dir))
  }

  test("delete pressure compacts: a shrink-only corpus reclaims dead rows and tombstones") {
    val dir = Files.createTempDirectory("graft_sigidx_shrink").toString
    val docsPath = s"$dir/documents.parquet"
    gen(0, 400, "v1").write.mode("overwrite").parquet(docsPath)
    MinHashSigIndex.sigs(spark, dir).count()
    // drop 75% of the corpus: no bucket appends a segment, so only the
    // delete-pressure trigger can stop the tombstone set from being
    // rewritten forever and the dead rows from being served-around
    gen(0, 100, "v1").write.mode("overwrite").parquet(docsPath)
    val shrunk = MinHashSigIndex.sigs(spark, dir)
    val want = MinHashSigIndex.buildPlan(spark, dir)
      .collect().map(row).sortBy(t => (t._1, t._3)).toSeq
    assert(shrunk.collect().map(row).sortBy(t => (t._1, t._3)).toSeq == want,
      "post-shrink serve diverged from full rebuild")
    val m = manifest(dir)
    assert(m.entries.forall(_.kind == "data"),
      "75% deletion must compact the affected buckets — no live tombstones")
    assert(m.entries.map(_.rows).sum == 100L,
      "compacted manifest must account exactly the live rows")
    graft.queries.Q.deleteRecursively(Paths.get(dir))
  }

  test("empty→grown and grown→empty transitions refresh correctly") {
    import org.apache.spark.sql.types._
    val dir = Files.createTempDirectory("graft_sigidx_trans").toString
    val docsPath = s"$dir/documents.parquet"
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType)))
    // a manifest with ZERO entries is a valid refresh base
    spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
      .write.mode("overwrite").parquet(docsPath)
    assert(MinHashSigIndex.sigs(spark, dir).count() == 0L)
    gen(0, 50, "v1").write.mode("overwrite").parquet(docsPath)
    val grown = MinHashSigIndex.sigs(spark, dir)
      .collect().map(row).sortBy(_._1).toSeq
    val want = MinHashSigIndex.buildPlan(spark, dir)
      .collect().map(row).sortBy(_._1).toSeq
    assert(grown == want && grown.size == 50,
      "growth from an empty base diverged from full rebuild")
    // and back to empty: every row tombstones, serve is empty but typed
    spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
      .write.mode("overwrite").parquet(docsPath)
    val emptied = MinHashSigIndex.sigs(spark, dir)
    assert(emptied.schema == MinHashSigIndex.schema)
    assert(emptied.count() == 0L)
    graft.queries.Q.deleteRecursively(Paths.get(dir))
  }

  test("empty corpus stays typed through the explicit read schema") {
    import org.apache.spark.sql.types._
    val dir = Files.createTempDirectory("graft_sigidx_spec").toString
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType),
      StructField("lang", StringType), StructField("source", StringType),
      StructField("n_chars", LongType)))
    spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val empty = MinHashSigIndex.sigs(spark, dir)
    assert(empty.schema == MinHashSigIndex.schema)
    assert(empty.count() == 0L)
  }
}
