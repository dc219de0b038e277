package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.sources.SnapshotStore

/**
 * Pins the three properties the snapshot convention claims (see the
 * SnapshotStore scaladoc): one-directory listing for as-of reads,
 * snapshot isolation by immutability, and crash-invisible commits.
 */
class SnapshotReadSpec extends AnyFunSuite {
  import SparkTestBase.spark
  import spark.implicits._

  private def freshTable(): String =
    java.nio.file.Files.createTempDirectory("graft_snap_spec").toString

  test("as-of read lists exactly one version directory") {
    val tbl = freshTable()
    SnapshotStore.writeVersion(Seq((1L, "a"), (2L, "b")).toDF("k", "s"), tbl)
    SnapshotStore.writeVersion(Seq((3L, "c")).toDF("k", "s"), tbl)
    SnapshotStore.writeVersion(Seq((4L, "d"), (5L, "e")).toDF("k", "s"), tbl)
    assert(SnapshotStore.versions(tbl) == Seq(1, 2, 3))
    val files2 = SnapshotStore.readAsOf(spark, tbl, 2).inputFiles
    assert(files2.nonEmpty && files2.forall(_.contains("/v=2/")),
      s"as-of 2 listed outside v=2: ${files2.mkString(",")}")
    val latest = SnapshotStore.readLatest(spark, tbl)
    assert(latest.inputFiles.forall(_.contains("/v=3/")))
    assert(latest.select("k").collect().map(_.getLong(0)).sorted.toSeq == Seq(4L, 5L))
  }

  test("a reader holding version N is immune to later writes") {
    val tbl = freshTable()
    SnapshotStore.writeVersion(Seq((10L, "x")).toDF("k", "s"), tbl)
    val held = SnapshotStore.readAsOf(spark, tbl, 1)
    SnapshotStore.writeVersion(Seq((99L, "y"), (98L, "z")).toDF("k", "s"), tbl)
    assert(held.collect().map(_.getLong(0)).toSeq == Seq(10L))
    assert(SnapshotStore.readLatest(spark, tbl).count() == 2)
  }

  test("uncommitted directories are invisible and number-skipped") {
    val tbl = freshTable()
    SnapshotStore.writeVersion(Seq((1L, "a")).toDF("k", "s"), tbl)
    // simulate a crashed writer: a version directory with data files but
    // no _SUCCESS marker
    val crashed = java.nio.file.Paths.get(tbl, "v=2")
    java.nio.file.Files.createDirectory(crashed)
    java.nio.file.Files.writeString(crashed.resolve("part-zzz.parquet"), "junk")
    assert(SnapshotStore.versions(tbl) == Seq(1))
    assert(SnapshotStore.latestVersion(tbl).contains(1))
    intercept[IllegalArgumentException](SnapshotStore.readAsOf(spark, tbl, 2))
    // the next writer must not collide with the crashed directory
    assert(SnapshotStore.writeVersion(Seq((2L, "b")).toDF("k", "s"), tbl) == 3)
    assert(SnapshotStore.versions(tbl) == Seq(1, 3))
    assert(SnapshotStore.readLatest(spark, tbl).count() == 1)
  }
}
