package graft

import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

import org.scalatest.funsuite.AnyFunSuite
import graft.sources.NeardupPairsIndex

/** Pins the persisted near-dup pair table (round 12): the artifact
 * equals a fresh candidates+verify run exactly, reuse is
 * content-stamped (zero file churn), and a corpus content change
 * rebuilds under the new stamp and sweeps the stale sibling — the
 * StampedArtifactSpec posture for the second corpus dedup artifact. */
class NeardupPairsIndexSpec extends AnyFunSuite {
  import SparkTestBase.{spark, sf}

  private def row(r: org.apache.spark.sql.Row) =
    (r.getLong(0), r.getLong(1), math.round(r.getDouble(2) * 1e9))

  private def fileState(p: java.nio.file.Path): Map[String, Long] = {
    if (!Files.isDirectory(p)) return Map.empty
    val w = Files.walk(p)
    try w.iterator().asScala.filter(Files.isRegularFile(_))
      .map(f => f.toString -> Files.getLastModifiedTime(f).toMillis)
      .toMap
    finally w.close()
  }

  private def gen(lo: Int, hi: Int, cloneEvery: Int) = {
    import org.apache.spark.sql.functions._
    val base = spark.range(lo, hi).selectExpr("id AS doc_id",
      "concat_ws(' ', 'alpha', 'beta', CAST(id AS STRING), 'gamma', " +
        "CAST(id % 5 AS STRING), 'delta', 'epsilon', 'zeta') AS text")
    // planted near-dups: every cloneEvery-th doc re-keyed with one
    // appended token (jaccard just under 1, far above 0.5). Clone ids
    // offset far past ANY batch's base range — `+ hi` would collide
    // with a later appended batch's base ids (gen(0,400).clones hit
    // 400.. which gen(400,500) then reuses), silently merging two
    // texts' shingles under one doc_id in the signature build
    base.union(base.filter(col("doc_id") % cloneEvery === 0)
      .select((col("doc_id") + 1000000L).as("doc_id"),
        concat(col("text"), lit(" tail")).as("text")))
  }

  test("persisted pairs equal the build plan; reuse is stamped, zero file churn") {
    val got = NeardupPairsIndex.pairs(spark, sf)
      .collect().map(row).sortBy(p => (p._1, p._2)).toSeq
    val want = NeardupPairsIndex.buildPlan(spark, sf)
      .collect().map(row).sortBy(p => (p._1, p._2)).toSeq
    assert(got == want, "persisted pair table diverged from the build plan")
    assert(got.nonEmpty, "testdata plants near-dup pairs; none surfaced")
    assert(got.forall(p => p._1 < p._2), "pairs must be a_id < b_id")
    // unchanged corpus → second call touches NO file anywhere in tmp
    // for this artifact's stamp
    val stamp = graft.queries.Q.contentStamp(sf, "documents")
    val tag = java.lang.Integer.toHexString(sf.hashCode)
    val idx = Paths.get(System.getProperty("java.io.tmpdir"),
      s"graft_neardup_pairs_t50_${tag}_$stamp")
    assert(Files.isDirectory(idx), "artifact dir must exist after a serve")
    val before = fileState(idx)
    NeardupPairsIndex.pairs(spark, sf).count()
    assert(fileState(idx) == before,
      "pair table churned files for unchanged content")
  }

  test("a corpus content change rebuilds under the new stamp and sweeps the stale artifact") {
    val dir = Files.createTempDirectory("graft_pairsidx").toString
    try {
      gen(0, 400, 20).write.mode("overwrite")
        .parquet(s"$dir/documents.parquet")
      val p1 = NeardupPairsIndex.pairs(spark, dir)
        .collect().map(row).toSet
      assert(p1.nonEmpty, "planted clones must pair")
      val stamp1 = graft.queries.Q.contentStamp(dir, "documents")
      // grow the corpus: stamp moves, artifact rebuilds, result tracks
      gen(400, 500, 20).write.mode("append")
        .parquet(s"$dir/documents.parquet")
      val stamp2 = graft.queries.Q.contentStamp(dir, "documents")
      assert(stamp1 != stamp2, "content change must move the stamp")
      val p2 = NeardupPairsIndex.pairs(spark, dir)
        .collect().map(row).toSet
      val want = NeardupPairsIndex.buildPlan(spark, dir)
        .collect().map(row).toSet
      assert(p2 == want, "post-change artifact must equal a fresh run")
      assert(p2 != p1, "grown corpus plants new pairs")
      val tag = java.lang.Integer.toHexString(dir.hashCode)
      val stale = Paths.get(System.getProperty("java.io.tmpdir"),
        s"graft_neardup_pairs_t50_${tag}_$stamp1")
      assert(!Files.exists(stale), "stale-stamp artifact must be swept")
    } finally {
      graft.queries.Q.deleteRecursively(Paths.get(dir))
      val tag = java.lang.Integer.toHexString(dir.hashCode)
      val tmp = Paths.get(System.getProperty("java.io.tmpdir"))
      val l = Files.list(tmp)
      try l.iterator().asScala.toVector
        .filter(_.getFileName.toString.startsWith(s"graft_neardup_pairs_t50_${tag}_"))
        .foreach(graft.queries.Q.deleteRecursively)
      finally l.close()
      // the scenario corpus also built a signature store; sweep it
      graft.queries.Q.deleteRecursively(
        graft.sources.MinHashSigIndex.store(dir))
    }
  }
}
