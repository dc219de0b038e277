package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.sources.SnapshotStore
import scala.jdk.CollectionConverters._

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

  test("a crashed manifest writer's staging dir never breaks the table") {
    // writeVersionWithManifest stages at `v=N.stage_<pid>_<seq>` INSIDE
    // the table dir; the old dirNumbers parsed every `v=`-prefixed name
    // with a bare toInt and threw NumberFormatException on the staging
    // suffix — one mid-write crash made versions()/writeVersion()/
    // readLatest() unusable forever (r19 review)
    val tbl = freshTable()
    SnapshotStore.writeVersion(Seq((1L, "a")).toDF("k", "s"), tbl)
    val debris = java.nio.file.Paths.get(tbl, "v=2.stage_12345_7")
    java.nio.file.Files.createDirectory(debris)
    java.nio.file.Files.writeString(debris.resolve("part-zzz.parquet"), "junk")
    assert(SnapshotStore.versions(tbl) == Seq(1))
    assert(SnapshotStore.writeVersion(Seq((2L, "b")).toDF("k", "s"), tbl) == 2)
    assert(SnapshotStore.readLatest(spark, tbl).count() == 1)
  }

  test("all-digit debris beyond Int range never breaks the table; valid 10-digit versions still list") {
    // the r19 debris filter used Char.isDigit with no value bound:
    // `v=99999999999` (all digits, value > Int.MaxValue) still threw
    // NumberFormatException out of toInt — the same unlistable-table
    // failure the filter was meant to close (r19 ADVICE). Same class:
    // non-ASCII Unicode digits (isDigit true, toInt throws) — not
    // creatable on this container's fs charset, but the ASCII-range
    // check in the bounded parse excludes them by construction. The
    // bound must be Int's exact RANGE, not a digit count (r20 review:
    // a ≤9-digit cap silently hid committed versions ≥ 1e9 — readers
    // would serve the prior version forever and writers would wedge).
    val tbl = freshTable()
    SnapshotStore.writeVersion(Seq((1L, "a")).toDF("k", "s"), tbl)
    java.nio.file.Files.createDirectory(
      java.nio.file.Paths.get(tbl, "v=99999999999"))
    java.nio.file.Files.createDirectory(
      java.nio.file.Paths.get(tbl, "v=2147483648")) // Int.MaxValue + 1
    assert(SnapshotStore.versions(tbl) == Seq(1))
    assert(SnapshotStore.writeVersion(Seq((2L, "b")).toDF("k", "s"), tbl) == 2)
    assert(SnapshotStore.readLatest(spark, tbl).count() == 1)
    // a COMMITTED 10-digit version inside Int range is real, not debris
    val big = java.nio.file.Paths.get(tbl, "v=1000000000")
    java.nio.file.Files.createDirectory(big)
    java.nio.file.Files.writeString(big.resolve("_SUCCESS"), "")
    assert(SnapshotStore.versions(tbl) == Seq(1, 2, 1000000000),
      "a committed version >= 1e9 must stay visible to readers")
    assert(SnapshotStore.latestVersion(tbl).contains(1000000000))
  }

  test("a manifest writer losing the version-number race fails loudly, never silently drops its rows") {
    // two concurrent writers stage DIFFERENT dataframes for the same
    // next number; the loser must throw (its data was not published),
    // not return the winner's version as its own (r19 review — the
    // publishDirAtomic lost-race-is-success contract is only right for
    // content-stamped identical artifacts). Deterministic interleaving:
    // the loser's dataframe plants the winner's committed v=2 as an
    // evaluation-time side effect, so the winner lands exactly between
    // the loser's number pick and its publish move.
    val tbl = freshTable()
    SnapshotStore.writeVersion(Seq((1L, "a")).toDF("k", "s"), tbl)
    val loser = spark.range(1).map { _ =>
      val w = java.nio.file.Paths.get(tbl, "v=2")
      java.nio.file.Files.createDirectories(w)
      java.nio.file.Files.writeString(w.resolve("_SUCCESS"), "")
      7L
    }.toDF("k")
    val ex = intercept[IllegalStateException] {
      SnapshotStore.writeVersionWithManifest(loser, tbl, Seq("k"))
    }
    assert(ex.getMessage.contains("no version was written"), ex.getMessage)
    // the loser's staging is cleaned up, not leaked into the table dir
    val leftovers = java.nio.file.Files.list(java.nio.file.Paths.get(tbl))
    try assert(!leftovers.iterator().asScala.exists(
        _.getFileName.toString.contains(".stage_")),
      "the failed publish leaked its staging dir")
    finally leftovers.close()
    // the committed surface is the winner's v=2; the next writer skips to 3
    assert(SnapshotStore.versions(tbl) == Seq(1, 2))
    assert(SnapshotStore.writeVersion(Seq((3L, "c")).toDF("k", "s"), tbl) == 3)
  }

  test("manifest-pruned as-of read: fewer files, same rows, inside v=N") {
    val tbl = freshTable()
    // 100 rows range-clustered on k into 5 files → disjoint [min,max]
    // per file, so the manifest can genuinely separate them
    val df = spark.range(0, 100).toDF("k")
      .withColumn("v", $"k" * 2)
      .repartitionByRange(5, $"k")
    SnapshotStore.writeVersionWithManifest(df, tbl, Seq("k"))
    // second version drops multiples of 10 (so v=2 ≠ v=1)
    SnapshotStore.writeVersionWithManifest(
      df.filter($"k" % 10 =!= 0), tbl, Seq("k"))
    assert(SnapshotStore.versions(tbl) == Seq(1, 2))
    val pred = SnapshotStore.GreaterThan("k", 79.0)
    val pr = SnapshotStore.readAsOfPruned(spark, tbl, 2, pred)
    // pruning bit: strictly fewer files than the version holds
    assert(pr.totalFiles == 5, s"expected 5 files, saw ${pr.totalFiles}")
    assert(pr.keptFiles.nonEmpty && pr.keptFiles.size < pr.totalFiles,
      s"no pruning: kept ${pr.keptFiles.size} of ${pr.totalFiles}")
    // every scanned file lives under the requested version
    assert(pr.df.inputFiles.nonEmpty &&
      pr.df.inputFiles.forall(_.contains("/v=2/")),
      s"pruned scan left v=2: ${pr.df.inputFiles.mkString(",")}")
    // soundness: pruned ≡ unpruned + row filter, row for row
    val got = pr.df.select("k").collect().map(_.getLong(0)).sorted.toSeq
    val want = SnapshotStore.readAsOf(spark, tbl, 2)
      .filter(pred.rowFilter).select("k")
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(got == want, s"pruned read diverged: $got vs $want")
    assert(want == (80L to 99L).filterNot(_ % 10 == 0).toSeq)
    // the manifest dir is underscore-hidden: plain as-of reads ignore it
    assert(SnapshotStore.readAsOf(spark, tbl, 2).columns.toSeq == Seq("k", "v"))
    // a predicate no file can satisfy prunes everything and stays
    // schema-stable
    val none = SnapshotStore.readAsOfPruned(
      spark, tbl, 2, SnapshotStore.GreaterThan("k", 1e9))
    assert(none.keptFiles.isEmpty && none.df.count() == 0)
    assert(none.df.columns.toSeq == Seq("k", "v"))
  }
}
