package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.sources.MinHashSigIndex

/** Pins the persisted MinHash signature table's contract (round 8),
 * mirroring KnnGraphIndexSpec: persisted rows equal the build plan,
 * reuse is content-stamped, and the schema survives an empty corpus. */
class MinHashSigIndexSpec extends AnyFunSuite {
  import SparkTestBase.{spark, sf}

  test("persisted signatures equal the build plan; reuse is stamped") {
    val got = MinHashSigIndex.sigs(spark, sf)
      .collect().map(r => (r.getLong(0), r.getSeq[Long](1))).sortBy(_._1).toSeq
    val want = MinHashSigIndex.buildPlan(spark, sf)
      .collect().map(r => (r.getLong(0), r.getSeq[Long](1))).sortBy(_._1).toSeq
    assert(got == want, "persisted signature table diverged from the build plan")
    assert(got.nonEmpty && got.forall(_._2.length == 32),
      "every doc must carry a 32-permutation signature")
    // unchanged corpus → second call reuses the same directory untouched
    val tmp = java.nio.file.Paths.get(System.getProperty("java.io.tmpdir"))
    val s = java.nio.file.Files.list(tmp)
    val dirs = try {
      import scala.jdk.CollectionConverters._
      s.iterator().asScala.filter(p =>
        p.getFileName.toString.startsWith("graft_minhash_sigs_") &&
          java.nio.file.Files.exists(p.resolve("_SUCCESS"))).toVector
    } finally s.close()
    assert(dirs.nonEmpty)
    val before = dirs.map(p => p -> java.nio.file.Files.getLastModifiedTime(p)).toMap
    MinHashSigIndex.sigs(spark, sf).count()
    dirs.foreach(p => assert(
      java.nio.file.Files.getLastModifiedTime(p) == before(p),
      s"signature index $p was rebuilt for unchanged content"))
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
