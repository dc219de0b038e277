package graft

import java.nio.file.{Files, Paths}
import org.scalatest.funsuite.AnyFunSuite
import graft.queries.Q

/** Q.ensureStamped is the ONE implementation of the build-once
 * artifact protocol (kNN edges, MinHash signatures, IVF index,
 * s_incr_dedup corpus index, CDC feed all route through it) — these
 * pins cover the protocol itself: build-once reuse, half-artifact
 * replacement, stale-stamp sweep, and in-flight staging respect. */
class StampedArtifactSpec extends AnyFunSuite {

  private val tmp = Paths.get(System.getProperty("java.io.tmpdir"))

  private def withPrefix(test: String => Unit): Unit = {
    val prefix = s"graft_testart_${java.util.UUID.randomUUID().toString.take(8)}_"
    try test(prefix)
    finally {
      val l = Files.list(tmp)
      try l.iterator().forEachRemaining { p =>
        if (p.getFileName.toString.startsWith(prefix)) Q.deleteRecursively(p)
      } finally l.close()
    }
  }

  private def buildInto(n: java.util.concurrent.atomic.AtomicInteger)
      (staging: java.nio.file.Path): Unit = {
    n.incrementAndGet()
    Files.createDirectories(staging)
    Files.writeString(staging.resolve("data"), "payload")
    Files.createFile(staging.resolve("_SUCCESS"))
  }

  test("builds once, then every ensure reuses the published artifact") {
    withPrefix { prefix =>
      val n = new java.util.concurrent.atomic.AtomicInteger(0)
      val a = Q.ensureStamped(prefix, "s1")(buildInto(n))
      val b = Q.ensureStamped(prefix, "s1")(buildInto(n))
      assert(n.get() == 1 && a == b)
      assert(Files.readString(a.resolve("data")) == "payload")
      // no staging residue after a successful publish
      import scala.jdk.CollectionConverters._
      val l = Files.list(tmp)
      try assert(!l.iterator().asScala
        .exists(_.getFileName.toString.contains(prefix + "s1.stage_")))
      finally l.close()
    }
  }

  test("a markerless half-artifact at the target is replaced, not served") {
    withPrefix { prefix =>
      // simulate a pre-protocol crash: target dir exists, no marker
      val half = tmp.resolve(prefix + "s1")
      Files.createDirectories(half)
      Files.writeString(half.resolve("data"), "HALF")
      val n = new java.util.concurrent.atomic.AtomicInteger(0)
      val a = Q.ensureStamped(prefix, "s1")(buildInto(n))
      assert(n.get() == 1)
      assert(Files.exists(a.resolve("_SUCCESS")))
      assert(Files.readString(a.resolve("data")) == "payload")
    }
  }

  test("stale stamps of the same prefix are swept; other prefixes and in-flight staging survive") {
    withPrefix { prefix =>
      val old = tmp.resolve(prefix + "oldstamp")
      Files.createDirectories(old)
      Files.createFile(old.resolve("_SUCCESS"))
      // a concurrent builder's in-flight staging copy (different pid)
      val inflight = tmp.resolve(prefix + "s2.stage_99999999")
      Files.createDirectories(inflight)
      val n = new java.util.concurrent.atomic.AtomicInteger(0)
      Q.ensureStamped(prefix, "s2")(buildInto(n))
      assert(!Files.exists(old), "stale stamp must be swept")
      assert(Files.exists(inflight), "another pid's staging must survive")
    }
  }

  test("custom marker: rebuild is keyed on the marker, not the dir") {
    withPrefix { prefix =>
      val n = new java.util.concurrent.atomic.AtomicInteger(0)
      def build(staging: java.nio.file.Path): Unit = {
        n.incrementAndGet()
        Files.createDirectories(staging.resolve("part2"))
        Files.createFile(staging.resolve("part2").resolve("_SUCCESS"))
      }
      val a = Q.ensureStamped(prefix, "s3", marker = "part2/_SUCCESS")(build)
      Q.ensureStamped(prefix, "s3", marker = "part2/_SUCCESS")(build)
      assert(n.get() == 1)
      assert(Files.exists(a.resolve("part2").resolve("_SUCCESS")))
    }
  }
}
