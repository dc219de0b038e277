package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.sources.KnnGraphIndex

/**
 * Pins the shared kNN edge index's contract: the persisted edge set
 * equals the build plan's result row-for-row at every served k ≤ KMAX
 * (round 9: one top-KMAX artifact, k-filtered serve — no rebuild per
 * k), reuse is content-stamped, incremental maintenance over a grown
 * corpus is equivalent to a full rebuild AND actually reuses
 * unchanged-bucket edges, and the serve read stays typed on an empty
 * corpus.
 */
class KnnGraphIndexSpec extends AnyFunSuite {
  import SparkTestBase.{spark, sf}

  private def indexDirs(): Seq[java.nio.file.Path] = {
    val tmp = java.nio.file.Paths.get(System.getProperty("java.io.tmpdir"))
    val s = java.nio.file.Files.list(tmp)
    try {
      import scala.jdk.CollectionConverters._
      s.iterator().asScala
        .filter { p =>
          p.getFileName.toString.startsWith("graft_knn_edges_k") &&
            java.nio.file.Files.exists(p.resolve("vecs/_SUCCESS"))
        }
        .toVector
    } finally s.close()
  }

  test("persisted edges equal the build plan at k=2 and k=5; reuse is stamped") {
    val want2 = KnnGraphIndex.buildPlan(spark, sf)
      .filter(col("rn") <= 2)
      .collect().map(_.toString).sorted.toSeq
    val got2 = KnnGraphIndex.edges(spark, sf)
      .collect().map(_.toString).sorted.toSeq
    assert(got2 == want2, "k=2 serve diverged from the build plan")
    assert(got2.nonEmpty)
    // the SAME artifact serves k=5 — no rebuild, identical ranking
    val dirsBefore = indexDirs()
    assert(dirsBefore.nonEmpty, "no published index directory found")
    val before = dirsBefore
      .map(p => p -> java.nio.file.Files.getLastModifiedTime(p)).toMap
    val want5 = KnnGraphIndex.buildPlan(spark, sf)
      .filter(col("rn") <= 5)
      .collect().map(_.toString).sorted.toSeq
    val got5 = KnnGraphIndex.edges(spark, sf, k = 5)
      .collect().map(_.toString).sorted.toSeq
    assert(got5 == want5, "k=5 serve diverged from the build plan")
    assert(got5.size > got2.size,
      "k=5 must surface more edges than k=2 on the gate corpus")
    dirsBefore.foreach(p => assert(
      java.nio.file.Files.getLastModifiedTime(p) == before(p),
      s"index $p was rebuilt for an unchanged corpus / different k"))
    // k beyond the artifact's width is a loud error, not a silent serve
    intercept[IllegalArgumentException] {
      KnnGraphIndex.edges(spark, sf, k = KnnGraphIndex.KMAX + 1)
    }
  }

  test("incremental maintenance: grown corpus ≡ full rebuild, untouched buckets carried over") {
    import org.apache.spark.sql.types._
    val dir = java.nio.file.Files
      .createTempDirectory("graft_knnidx_incr").toString
    val base = spark.range(0, 400).selectExpr(
      "id AS vec_id",
      "transform(sequence(0, 63), i -> CAST(sin(id * 131 + i) AS FLOAT)) AS embedding",
      "CAST(id % 10 AS INT) AS label")
    base.write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val first = KnnGraphIndex.edges(spark, dir, KnnGraphIndex.KMAX)
      .collect().map(_.toString).sorted.toSeq
    assert(first.nonEmpty)
    // tamper one kept edge row in the published artifact: if the
    // incremental path below truly reuses unchanged-bucket edges, the
    // tampered row survives verbatim; a silent full rebuild would
    // erase it. The tampered bucket must be one the delta does NOT
    // touch — pick it from the published artifact after the delta's
    // buckets are known (the delta vectors' sign buckets).
    val tag = java.lang.Integer.toHexString(dir.hashCode)
    val art = indexDirs()
      .filter(_.getFileName.toString.startsWith(
        s"graft_knn_edges_k${KnnGraphIndex.KMAX}_${tag}_"))
      .maxBy(p => java.nio.file.Files.getLastModifiedTime(p).toMillis)
    // delta vectors engineered into ONE sign bucket (all components
    // positive → bucket 15) so most buckets stay untouched and the
    // carry-over path below is observable
    val delta = spark.range(400, 440).selectExpr(
      "id AS vec_id",
      "transform(sequence(0, 63), i -> CAST(abs(sin(id * 131 + i)) AS FLOAT)) AS embedding",
      "CAST(id % 10 AS INT) AS label")
    val deltaBuckets = delta.selectExpr(
        """CAST(element_at(embedding, 1) > 0 AS INT)
          |+ 2 * CAST(element_at(embedding, 2) > 0 AS INT)
          |+ 4 * CAST(element_at(embedding, 3) > 0 AS INT)
          |+ 8 * CAST(element_at(embedding, 4) > 0 AS INT) AS b""".stripMargin)
      .distinct().collect().map(_.getInt(0)).toSet
    val edgesPath = art.resolve("edges").toString
    val published = spark.read.schema(KnnGraphIndex.schema).parquet(edgesPath)
      .collect()
    val untouched = published.map(_.getInt(2)).toSet.diff(deltaBuckets)
    assume(untouched.nonEmpty,
      "delta touched every bucket — cannot observe carry-over")
    val markBucket = untouched.min
    val tampered = published.map { r =>
      if (r.getInt(2) == markBucket && r.getInt(4) == 1)
        org.apache.spark.sql.Row(r.getLong(0), r.getLong(1), r.getInt(2),
          -99.0, r.getInt(4))
      else r
    }
    val tmpEdges = java.nio.file.Files
      .createTempDirectory("graft_knnidx_tamper").toString
    spark.createDataFrame(
        spark.sparkContext.parallelize(tampered.toSeq),
        KnnGraphIndex.schema)
      .write.mode("overwrite").parquet(tmpEdges)
    graft.queries.Q.deleteRecursively(art.resolve("edges"))
    java.nio.file.Files.move(java.nio.file.Paths.get(tmpEdges),
      art.resolve("edges"))
    // grow the corpus: stamp changes, the tampered artifact is the base
    delta.write.mode("append").parquet(s"$dir/embeddings.parquet")
    val incr = KnnGraphIndex.edges(spark, dir, KnnGraphIndex.KMAX)
      .collect()
    // carried-over rows prove the keep path ran
    assert(incr.exists(r => r.getInt(2) == markBucket && r.getDouble(3) == -99.0),
      "tampered unchanged-bucket edge was not carried over — " +
        "incremental path silently full-rebuilt")
    // equivalence everywhere the tamper didn't touch
    val gotRest = incr.filter(_.getInt(2) != markBucket)
      .map(_.toString).sorted.toSeq
    val wantRest = KnnGraphIndex.buildPlan(spark, dir)
      .filter(col("bucket") =!= markBucket)
      .collect().map(_.toString).sorted.toSeq
    assert(gotRest == wantRest,
      "incremental result diverged from full rebuild outside the tampered bucket")
    graft.queries.Q.deleteRecursively(java.nio.file.Paths.get(dir))
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
