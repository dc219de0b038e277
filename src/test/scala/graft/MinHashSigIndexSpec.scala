package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.sources.MinHashSigIndex

/** Pins the persisted MinHash signature table's contract, mirroring
 * KnnGraphIndexSpec: persisted rows equal the build plan, reuse is
 * content-stamped, incremental maintenance over a grown/changed corpus
 * is equivalent to a full rebuild AND actually reuses still-covered
 * rows, and the schema survives an empty corpus. */
class MinHashSigIndexSpec extends AnyFunSuite {
  import SparkTestBase.{spark, sf}

  private def row(r: org.apache.spark.sql.Row) =
    (r.getLong(0), r.getSeq[Long](1), r.getLong(2))

  test("persisted signatures equal the build plan; reuse is stamped") {
    val got = MinHashSigIndex.sigs(spark, sf)
      .collect().map(row).sortBy(_._1).toSeq
    val want = MinHashSigIndex.buildPlan(spark, sf)
      .collect().map(row).sortBy(_._1).toSeq
    assert(got == want, "persisted signature table diverged from the build plan")
    assert(got.nonEmpty && got.forall(_._2.length == 32),
      "every doc must carry a 32-permutation signature")
    // unchanged corpus → second call reuses the same directory untouched
    val tmp = java.nio.file.Paths.get(System.getProperty("java.io.tmpdir"))
    val s = java.nio.file.Files.list(tmp)
    val dirs = try {
      import scala.jdk.CollectionConverters._
      s.iterator().asScala.filter(p =>
        p.getFileName.toString.startsWith("graft_minhash_sigs_v4_") &&
          java.nio.file.Files.exists(p.resolve("_SUCCESS"))).toVector
    } finally s.close()
    assert(dirs.nonEmpty)
    val before = dirs.map(p => p -> java.nio.file.Files.getLastModifiedTime(p)).toMap
    MinHashSigIndex.sigs(spark, sf).count()
    dirs.foreach(p => assert(
      java.nio.file.Files.getLastModifiedTime(p) == before(p),
      s"signature index $p was rebuilt for unchanged content"))
  }

  test("incremental maintenance: append + in-place edit ≡ full rebuild, kept rows reused") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft_sigidx_incr").toString
    def gen(lo: Int, hi: Int, marker: String) =
      spark.range(lo, hi).selectExpr("id AS doc_id",
        s"concat_ws(' ', 'alpha', 'beta', CAST(id AS STRING), '$marker', " +
          "CAST(id % 7 AS STRING), 'gamma', 'delta') AS text")
    gen(0, 300, "v1").write.mode("overwrite")
      .parquet(s"$dir/documents.parquet")
    MinHashSigIndex.sigs(spark, dir).count()
    // tamper one still-covered row's signature in the published
    // artifact: a true incremental rebuild carries it over verbatim, a
    // silent full rebuild erases it
    val tmp = java.nio.file.Paths.get(System.getProperty("java.io.tmpdir"))
    val tag = java.lang.Integer.toHexString(dir.hashCode)
    val l = java.nio.file.Files.list(tmp)
    val art = try {
      import scala.jdk.CollectionConverters._
      l.iterator().asScala.filter(p =>
        p.getFileName.toString.startsWith(s"graft_minhash_sigs_v4_${tag}_") &&
          java.nio.file.Files.exists(p.resolve("_SUCCESS"))).toVector.head
    } finally l.close()
    val published = spark.read.schema(MinHashSigIndex.schema)
      .parquet(art.toString).collect()
    val markId = 7L
    val tampered = published.map { r =>
      if (r.getLong(0) == markId)
        org.apache.spark.sql.Row(r.getLong(0),
          Seq.fill(32)(-1L), r.getLong(2), r.getInt(3))
      else r
    }
    val tmpSigs = java.nio.file.Files
      .createTempDirectory("graft_sigidx_tamper").toString
    spark.createDataFrame(
        spark.sparkContext.parallelize(tampered.toSeq),
        MinHashSigIndex.schema)
      .write.mode("overwrite").parquet(tmpSigs)
    val artFiles = java.nio.file.Files.list(art)
    try {
      import scala.jdk.CollectionConverters._
      artFiles.iterator().asScala.toVector
        .foreach(java.nio.file.Files.deleteIfExists(_))
    } finally artFiles.close()
    val stamped = java.nio.file.Files.list(java.nio.file.Paths.get(tmpSigs))
    try {
      import scala.jdk.CollectionConverters._
      stamped.iterator().asScala.toVector.foreach { f =>
        java.nio.file.Files.move(f, art.resolve(f.getFileName))
      }
    } finally stamped.close()
    // grow AND change the corpus: append 60 docs and rewrite doc 3's
    // text (the in-place edit the text_hash key must catch)
    gen(300, 360, "v1").write.mode("append")
      .parquet(s"$dir/documents.parquet")
    gen(3, 4, "v2").write.mode("append")
      .parquet(s"$dir/documents.parquet")
    // NOTE: doc 3 now appears twice (v1 part file + v2 append) — both
    // versions are corpus rows with distinct text_hash, so both must be
    // signed; the incremental and full plans must agree on that too
    val incr = MinHashSigIndex.sigs(spark, dir).collect().map(row)
    assert(incr.exists(t => t._1 == markId && t._2 == Seq.fill(32)(-1L)),
      "tampered still-covered row was not carried over — " +
        "incremental path silently full-rebuilt")
    val want = MinHashSigIndex.buildPlan(spark, dir)
      .collect().map(row).filterNot(_._1 == markId)
      .sortBy(t => (t._1, t._3)).toSeq
    val got = incr.filterNot(_._1 == markId).sortBy(t => (t._1, t._3)).toSeq
    assert(got == want,
      "incremental result diverged from full rebuild outside the tampered row")
    assert(got.exists(_._1 == 3L) && got.count(_._1 == 3L) == 2,
      "both text versions of the edited doc must be signed")
    graft.queries.Q.deleteRecursively(java.nio.file.Paths.get(dir))
  }

  test("empty corpus stays typed through the explicit read schema") {
    import org.apache.spark.sql.types._
    val dir = java.nio.file.Files
      .createTempDirectory("graft_sigidx_spec").toString
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
