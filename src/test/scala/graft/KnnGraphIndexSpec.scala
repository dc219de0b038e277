package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.sources.KnnGraphIndex

/**
 * Pins the shared kNN edge index's contract (round 8): the persisted
 * edge set equals the build plan's result row-for-row, reuse is
 * content-stamped (same corpus → no rebuild; changed corpus → fresh
 * index), and the serve read carries the pinned schema even when the
 * corpus is empty.
 */
class KnnGraphIndexSpec extends AnyFunSuite {
  import SparkTestBase.{spark, sf}

  private def indexDirs(): Seq[java.nio.file.Path] = {
    val tmp = java.nio.file.Paths.get(System.getProperty("java.io.tmpdir"))
    val s = java.nio.file.Files.list(tmp)
    try {
      import scala.jdk.CollectionConverters._
      s.iterator().asScala
        .filter(_.getFileName.toString.startsWith("graft_knn_edges_"))
        .toVector
    } finally s.close()
  }

  test("persisted edges equal the build plan, and reuse is stamped") {
    val built = KnnGraphIndex.edges(spark, sf)
    val want = KnnGraphIndex.buildPlan(spark, sf)
      .collect().map(_.toString).sorted.toSeq
    val got = built.collect().map(_.toString).sorted.toSeq
    assert(got == want, "persisted edge set diverged from the build plan")
    assert(got.nonEmpty)
    // unchanged corpus → the second call reuses the SAME directory
    // (no rebuild: the dir's mtime is untouched)
    val dir = indexDirs().filter(p =>
      java.nio.file.Files.exists(p.resolve("_SUCCESS")))
    assert(dir.nonEmpty, "no published index directory found")
    val before = dir.map(p => p -> java.nio.file.Files.getLastModifiedTime(p)).toMap
    KnnGraphIndex.edges(spark, sf).count()
    dir.foreach(p => assert(
      java.nio.file.Files.getLastModifiedTime(p) == before(p),
      s"index $p was rebuilt for unchanged content"))
  }

  test("a different corpus content gets its own index; empty stays typed") {
    import org.apache.spark.sql.types._
    // an empty embeddings table in a fresh dir = different content stamp
    val dir = java.nio.file.Files
      .createTempDirectory("graft_knnidx_spec").toString
    val schema = StructType(Seq(
      StructField("vec_id", LongType),
      StructField("embedding", ArrayType(FloatType)),
      StructField("label", IntegerType)))
    spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val empty = KnnGraphIndex.edges(spark, dir)
    // the pinned schema survives an empty build (no part files to infer
    // from — the explicit read schema is what keeps this typed)
    assert(empty.schema == KnnGraphIndex.schema)
    assert(empty.count() == 0L)
    // and the real corpus's index is untouched by the other build
    assert(KnnGraphIndex.edges(spark, sf).count() > 0L)
  }
}
