package graft.sources

import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types.StructType

import graft.queries.Q

/**
 * Per-partition manifest protocol for the two corpus-scale persisted
 * artifacts (MinHash signature table, kNN edge index) — the round-10
 * upgrade that makes incremental refresh I/O DELTA-sized (VERDICT r9
 * item 1). The r9 layout republished the whole artifact dir through one
 * atomic rename on every refresh: compute was delta-proportional, but
 * the write side stayed corpus-sized. This store is the SnapshotStore
 * posture applied at partition granularity:
 *
 *  - One long-lived store dir per (artifact, source path):
 *    `tmpdir/<prefix><tag>/`. Inside it, `segs/` holds IMMUTABLE
 *    parquet segment dirs, each laid out `bucket=<b>/...` by the
 *    artifact's stable partition key (doc_id bucket for signatures,
 *    LSH sign bucket for edges).
 *  - A MANIFEST FILE per corpus content stamp (`manifest_<stamp>`)
 *    lists, per bucket, which segment dirs serve it. A refresh writes
 *    ONLY the delta's segment dirs and a new manifest referencing
 *    old + new — unchanged buckets are carried over at the metadata
 *    level, zero data I/O (exactly an Iceberg/Delta commit reusing
 *    unchanged data files).
 *  - Atomic visibility: segments are fully written (under a `.stage_`
 *    name, then renamed) BEFORE the manifest referencing them appears;
 *    the manifest itself is published by one atomic create-if-absent
 *    (hard link; see [[publish]]) — so a reader either sees a complete
 *    artifact state or none, and racing writers of the same stamp keep
 *    FIRST-writer-wins semantics: both built equivalent content, the
 *    loser's orphan segments are swept by GC, and the loser re-reads
 *    and serves the winner's manifest ([[publishAndServe]]).
 *  - GC after publish deletes superseded manifests and any segment no
 *    surviving manifest references (in-flight `.stage_` dirs are
 *    skipped). A manifest whose referenced dirs have vanished (a
 *    cross-process GC race — same loud-failure window the r9 protocol
 *    documented) is treated as broken: deleted and rebuilt rather than
 *    served.
 *
 * Builds are serialized per store within the JVM (the driver is one
 * process; in-process threads must not interleave refreshes of one
 * artifact). The SEMANTIC contract — what a segment holds, how
 * tombstones reconcile, when to compact — belongs to each index; this
 * object owns only layout, atomicity, and GC.
 */
object ManifestStore {

  /** One manifest line: `kind` is index-defined ("data"/"tomb"/
   * "edges"/"vecs"), `bucket` the partition it serves, `rel` the
   * store-relative segment-partition dir, `rows` the partition's row
   * count as recorded at write time (0 = unknown, for manifests
   * published before counts were recorded) — the statistic compaction
   * pressure is computed from, the manifest-level analog of a table
   * format's per-file row counts. */
  final case class Entry(kind: String, bucket: Int, rel: String,
                         rows: Long = 0L)

  final case class Manifest(stamp: String, entries: Seq[Entry])

  private val locks =
    new java.util.concurrent.ConcurrentHashMap[String, Object]()

  /** The per-store build lock (JVM-wide; cross-process safety comes
   * from the atomic manifest publish). */
  def lockFor(store: Path): Object =
    locks.computeIfAbsent(store.toString, _ => new Object)

  /** Resolve (and create) the long-lived store dir for an artifact. */
  def storeDir(prefix: String, tag: String): Path = {
    val d = Paths.get(System.getProperty("java.io.tmpdir"), prefix + tag)
    Files.createDirectories(d.resolve("segs"))
    d
  }

  /** Collision-safe store tag for a corpus dir: md5 prefix, NOT the
   * 32-bit String.hashCode the indexes originally used — two distinct
   * dirs colliding on hashCode shared one store, and each serve's gc
   * deleted the other's manifest out from under its memoized frame
   * (r18 review; latent at 2^-32 per pair, but silent cross-deletion
   * is the worst failure class this protocol has). One definition so
   * every index addresses stores identically. */
  def dirTag(dir: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(dir.getBytes("UTF-8")).take(6)
      .map(b => f"$b%02x").mkString

  private def manifestFile(store: Path, stamp: String): Path =
    store.resolve(s"manifest_$stamp")

  /** List a directory's children, tolerating the dir itself vanishing
   * (or never existing): a CONCURRENT process's gc deleting state
   * mid-listing is within this protocol's threat model, and the right
   * reading for a VANISHED dir is "nothing here", never a crash out of
   * the caller's build (r18 review findings). A vanish with the root
   * still present is different (r18 ADVICE): a CHILD vanished
   * mid-iteration, and returning empty would DISCARD entries already
   * read — in [[gcTo]] an empty manifest listing with a live segs
   * listing sweeps the kept manifest's live segments (self-healing via
   * valid()+rebuild, but at full-corpus rebuild cost). So on a vanish,
   * RE-CHECK the root like [[graft.queries.QueryDef.deleteRecursively]]
   * does: empty only if the dir is actually gone, retry while it
   * lives, propagate a persistent partial loudly. */
  private def listDir(p: Path): Vector[Path] = {
    def isVanish(t: Throwable): Boolean = t match {
      case _: java.nio.file.NoSuchFileException => true
      // Files.list wraps IO errors DURING iteration (an entry vanishing
      // mid-listing) in UncheckedIOException — same reading as the
      // bare form (the Q.deleteRecursively precedent)
      case e: java.io.UncheckedIOException =>
        e.getCause.isInstanceOf[java.nio.file.NoSuchFileException]
      case _ => false
    }
    var tries = 0
    while (true) {
      tries += 1
      if (!Files.isDirectory(p)) return Vector.empty
      try {
        val l = Files.list(p)
        try return l.iterator().asScala.toVector finally l.close()
      } catch {
        case t if isVanish(t) =>
          if (!Files.isDirectory(p)) return Vector.empty // root gone
          else if (tries >= 3) throw t // persistent partial: loud
        // else: a child vanished under a live root — list again
      }
    }
    Vector.empty // unreachable
  }

  /** All published manifest files in the store. */
  private def manifestFiles(store: Path): Vector[Path] =
    listDir(store).filter(_.getFileName.toString.startsWith("manifest_"))

  private def parse(file: Path): Manifest = {
    val stamp = file.getFileName.toString.stripPrefix("manifest_")
    val entries = Files.readAllLines(file).asScala.toVector
      .filter(_.nonEmpty)
      .map { line =>
        line.split('\t') match {
          case Array(kind, bucket, rel, rows) =>
            Entry(kind, bucket.toInt, rel, rows.toLong)
          case Array(kind, bucket, rel) => // pre-rows manifest: unknown
            Entry(kind, bucket.toInt, rel)
        }
      }
    Manifest(stamp, entries)
  }

  /** Outcome of reading one manifest file, classified BY EXCEPTION
   * TYPE at the point of failure — not by re-probing the filesystem
   * afterwards. [[currentManifest]] needs vanish vs corrupt to pick
   * delete-or-leave, and a post-hoc `Files.exists` probe is a TOCTOU:
   * a file that vanished during the parse can be REPUBLISHED by a
   * concurrent winner before the probe, and the probe would then
   * classify the winner's fresh, valid manifest as corrupt and delete
   * it (r19 ADVICE). The exception already carries the answer. */
  private sealed trait ParseResult
  private case object Vanished extends ParseResult
  private case object Corrupt extends ParseResult
  private final case class Parsed(m: Manifest) extends ParseResult

  /** [[parse]] tolerating the manifest file vanishing between the
   * listing and the read — a concurrent gc deleting a superseded
   * manifest mid-race — AND a corrupt one (truncated, garbled, or
   * binary-damaged content: fs-level damage only, the publish itself
   * is atomic). Both read like an invalid manifest: never a crash (the
   * same posture [[valid]] takes for vanished SEGMENTS). Without the
   * malformed-content arms (r19 review), a corrupt manifest threw
   * NumberFormatException/MatchError out of every serve — and even
   * skipped, it could never heal: the EEXIST-protected publish cannot
   * replace an existing file, so [[currentManifest]] must also DELETE
   * an unparseable manifest like it deletes a broken one. The
   * charset arm (r19 ADVICE): readAllLines decodes UTF-8 strictly and
   * throws MalformedInputException on non-UTF-8 bytes — exactly the
   * garbled-content damage the other arms handle — so it must read as
   * Corrupt too, or such a manifest throws out of every serve and
   * never reaches the self-heal delete. */
  private def parseResult(file: Path): ParseResult =
    try Parsed(parse(file))
    catch {
      case _: java.nio.file.NoSuchFileException => Vanished
      case _: java.nio.charset.CharacterCodingException => Corrupt
      case _: NumberFormatException => Corrupt
      case _: MatchError => Corrupt
    }

  private def parseIfPresent(file: Path): Option[Manifest] =
    parseResult(file) match {
      case Parsed(m) => Some(m)
      case _ => None
    }

  /** Last-modified millis, with a vanished file sorting oldest. */
  private def mtimeOrZero(p: Path): Long =
    try Files.getLastModifiedTime(p).toMillis
    catch { case _: java.nio.file.NoSuchFileException => 0L }

  /** Every referenced segment-partition dir must exist, or the
   * manifest is broken (cross-process GC race) and must be rebuilt. */
  private def valid(store: Path, m: Manifest): Boolean =
    m.entries.forall(e => Files.isDirectory(store.resolve(e.rel)))

  /** The published manifest for `stamp`, if present AND intact.
   * A broken (dangling-reference) or corrupt (unparseable) manifest is
   * deleted here so the caller's rebuild can publish a fresh one under
   * the same name — without the delete, the EEXIST-protected publish
   * loses to the corrupt file forever and every serve re-pays the
   * build (r19 review). */
  def currentManifest(store: Path, stamp: String): Option[Manifest] = {
    val f = manifestFile(store, stamp)
    parseResult(f) match {
      case Parsed(m) if valid(store, m) => Some(m)
      case Parsed(_) =>
        healUnservable(store, stamp) // dangling references: heal to absent
        None
      case Corrupt =>
        healUnservable(store, stamp) // corrupt content: heal to absent
        None
      case Vanished =>
        // VANISHED (classified by exception type at parse time, never
        // by a post-hoc exists probe — see [[parseResult]]): no delete —
        // a concurrent winner may have just republished this exact
        // path, and deleting here would kill its fresh manifest (the
        // same race discipline publish() keeps)
        None
    }
  }

  /** Heal a manifest this serve has judged unservable (corrupt
   * content, or intact content with dangling segment references) by
   * removing it — but never delete blind: the judgment was made on a
   * read that is already stale, and the gap between it and a bare
   * delete can span a concurrent healer's own delete + rebuild +
   * republish of the SAME path, so an unconditional delete could kill
   * that winner's fresh, VALID manifest (r20 review — the narrower
   * sibling of the vanish-vs-corrupt TOCTOU closed in [[parseResult]];
   * a deleted live manifest un-references the winner's segments, and
   * the next gc sweeps them under the winner's serve — the silent
   * cross-deletion class). Protocol: atomically MOVE the file to a
   * process-owned `.heal_<pid>_<seq>` quarantine name — taking
   * exclusive ownership of exactly the bytes on disk NOW — then
   * re-judge the owned copy. Unservable → delete it (the common
   * path). Servable → we raced a winner and quarantined its fresh
   * manifest: republish its entries under the stamp through
   * [[publish]]'s create-if-absent discipline (never replacing a
   * third publisher's file), then drop the quarantine copy. A crash
   * between the move and the resolution leaves a `.heal_` file that
   * [[gc]] reclaims under the dead-owner rule like a crashed temp
   * manifest; the absent manifest path is then an ordinary rebuild. */
  private[graft] def healUnservable(store: Path, stamp: String): Unit = {
    val f = manifestFile(store, stamp)
    val q = store.resolve(
      s".heal_${ProcessHandle.current().pid()}_${segSeq.incrementAndGet()}")
    try Files.move(f, q, java.nio.file.StandardCopyOption.ATOMIC_MOVE)
    catch { case _: java.nio.file.NoSuchFileException => return } // healed already
    parseResult(q) match {
      case Parsed(m) if valid(store, m) =>
        // the quarantined copy's stamp field derives from the
        // quarantine FILENAME — republish under the real stamp
        publish(store, Manifest(stamp, m.entries))
        Files.deleteIfExists(q)
      case _ =>
        Files.deleteIfExists(q)
    }
  }

  /** The newest intact manifest of a DIFFERENT stamp — the incremental
   * base for a refresh (None → full build). Vanished files (a
   * concurrent gc mid-listing) are skipped like invalid ones. */
  def newestOtherManifest(store: Path, excludeStamp: String): Option[Manifest] =
    manifestFiles(store)
      .filter(_.getFileName.toString != s"manifest_$excludeStamp")
      .sortBy(mtimeOrZero)
      .reverseIterator
      .flatMap(parseIfPresent)
      .find(valid(store, _))

  private val segSeq = new java.util.concurrent.atomic.AtomicLong(0L)

  /** Per-JVM token in staging/segment names: PID + counter alone is
   * NOT unique across PID recycling — a crashed builder's leftover
   * `seg_<pid>_<n>` plus a new process recycling that pid (counter
   * restarting at 1) would collide in [[finalizeSeg]]'s rename (r18
   * review finding). [[ownerAlive]] still finds the pid: it takes the
   * FIRST all-digit underscore token, and the pid precedes this. */
  private val jvmToken: String =
    java.lang.Long.toUnsignedString(System.nanoTime(), 36)

  /** A fresh staging dir under `segs/` — invisible to GC until
   * [[finalizeSeg]] renames it to its published name. */
  def newSegStaging(store: Path): Path =
    store.resolve("segs").resolve(
      ".stage_" + ProcessHandle.current().pid() + "_" + jvmToken +
        "_" + segSeq.incrementAndGet())

  /** Publish a fully-written staged segment (one rename; the name is
   * unique per invocation — pid + per-JVM token + counter — so this
   * cannot collide, even with a crashed predecessor's leftovers under
   * a recycled pid). */
  def finalizeSeg(staging: Path): Path = {
    val target = staging.resolveSibling(
      "seg_" + staging.getFileName.toString.stripPrefix(".stage_"))
    Files.move(staging, target, StandardCopyOption.ATOMIC_MOVE)
    target
  }

  /** Publish a segment's `<dirCol>=<b>` partition children as
   * manifest-referenceable roots: each is RENAMED `<dirCol>_<b>` —
   * the roots a reader is handed must not themselves look like
   * partition directories, or Spark's multi-root partition discovery
   * rejects them as conflicting structures (for the same reason,
   * nothing BELOW a root may use `k=v` dirs either — sub-bucket
   * clustering lives in file-level parquet stats, see the edge
   * index's writeSeg). Returns (bucket, store-relative path).
   * A segment written from an empty frame has none. */
  def bucketChildren(store: Path, seg: Path,
                     dirCol: String = "bucket"): Seq[(Int, String)] = {
    listDir(seg).flatMap { p =>
      val n = p.getFileName.toString
      if (n.startsWith(dirCol + "=") && Files.isDirectory(p)) {
        val v = n.stripPrefix(dirCol + "=")
        // a null partition key writes `<dirCol>=__HIVE_DEFAULT_PARTITION__`
        // — name the cause instead of a bare NumberFormatException; a
        // null bucket key means the writer's key derivation is broken
        // (every bucket expression here is pmod over a non-null hash).
        // ASCII digits only and length-bounded: Char.isDigit admits
        // Unicode digits toInt rejects, and an all-digit value past
        // Int.MaxValue would still throw the bare exception this
        // require replaces (r18 second-pass finding)
        require(v.nonEmpty && v.length <= 9 &&
            v.forall(c => c >= '0' && c <= '9'),
          s"ManifestStore: segment $seg has a non-integer $dirCol " +
            s"partition '$n' — null or non-integer bucket keys cannot " +
            "be published (null rows must be filtered or keyed before " +
            "the bucketed write)")
        val b = v.toInt
        val target = p.resolveSibling(s"${dirCol}_$b")
        Files.move(p, target, StandardCopyOption.ATOMIC_MOVE)
        Some(b -> store.relativize(target).toString)
      } else None
    }.sortBy(_._1)
  }

  /** Publish `m` as the manifest for its stamp: temp write, then an
   * ATOMIC CREATE-IF-ABSENT via hard link — `link(2)` fails with
   * EEXIST when the target exists, which is the first-writer-wins
   * semantic this protocol needs. (`Files.move(ATOMIC_MOVE)` is NOT
   * that: `rename(2)` silently REPLACES an existing target, so a
   * losing builder would overwrite the winner's manifest and its gc
   * would then delete the winner's segments out from under the
   * winner's live serve — caught by the r12 race spec.) Losing the
   * link race is fine — both manifests reference complete segments of
   * equivalent content; the loser discards its temp and serves the
   * winner via [[publishAndServe]]. On a filesystem without hard
   * links the fallback is the replace-prone rename; publishAndServe's
   * re-read still converges every caller onto the on-disk state. */
  def publish(store: Path, m: Manifest): Unit = {
    val tmp = store.resolve(
      s".manifest_tmp_${ProcessHandle.current().pid()}_${segSeq.incrementAndGet()}")
    val lines = m.entries.map(e =>
      s"${e.kind}\t${e.bucket}\t${e.rel}\t${e.rows}")
    Files.write(tmp, lines.asJava)
    val target = manifestFile(store, m.stamp)
    try { Files.createLink(target, tmp); Files.deleteIfExists(tmp) }
    catch {
      case _: java.nio.file.FileAlreadyExistsException =>
        Files.deleteIfExists(tmp) // lost the race benignly
      case _@(_: UnsupportedOperationException |
              _: java.nio.file.FileSystemException)
          if Files.exists(target) =>
        // link failed AND the target exists: a concurrent publisher
        // won between our attempt and this check — same benign loss
        Files.deleteIfExists(tmp)
      case _@(_: UnsupportedOperationException |
              _: java.nio.file.FileSystemException) =>
        // no winner on disk: the filesystem itself refused the link.
        // The JDK's default providers surface missing hard-link
        // support (vfat/exFAT, some network/overlay mounts — link(2)
        // EPERM/EOPNOTSUPP) as FileSystemException, NOT
        // UnsupportedOperationException, so both types must reach a
        // fallback. The fallback must stay create-if-absent as far as
        // the platform allows: a bare exists-check + ATOMIC_MOVE had a
        // TOCTOU where a winner landing between the check and the
        // rename was silently REPLACED (ADVICE r12) — re-creating the
        // gc-deletes-the-winner's-live-segments hazard the hard link
        // fixed. So: retry the link a few times (transient refusals —
        // e.g. a network mount hiccup — resolve), then fall to
        // Files.move WITHOUT options: the providers fail it with
        // FileAlreadyExistsException when a target exists at move
        // time (= a winner appeared → benign loss) instead of
        // replacing. The residual window is the provider's own
        // check-to-rename gap — microseconds, on link-less
        // filesystems only; publishAndServe's re-read still converges
        // every caller onto on-disk state.
        var done = false
        var attempts = 0
        while (!done && attempts < 3) {
          attempts += 1
          try { Files.createLink(target, tmp); done = true }
          catch {
            case _: java.nio.file.FileAlreadyExistsException => done = true
            case _@(_: UnsupportedOperationException |
                    _: java.nio.file.FileSystemException)
                if Files.exists(target) => done = true
            case _: UnsupportedOperationException =>
              // permanent by definition — retrying is pointless
              attempts = 3
            case _: java.nio.file.FileSystemException =>
              // transient refusals need time to resolve; back-to-back
              // retries would all land inside the same hiccup
              if (attempts < 3) Thread.sleep(25L << attempts)
          }
        }
        if (!done) {
          try Files.move(tmp, target) // no REPLACE: winner ⇒ loud loss
          catch {
            case _: java.nio.file.FileAlreadyExistsException => () // lost benignly
            case _: java.nio.file.FileSystemException =>
              if (!Files.exists(target)) {
                Files.deleteIfExists(tmp)
                throw new IllegalStateException(
                  s"manifest publish for ${m.stamp} failed")
              }
          }
        }
        Files.deleteIfExists(tmp)
    }
  }

  /** Publish `built`, GC superseded state, then re-read the stamp's
   * ON-DISK manifest and return that as the state to serve — never the
   * locally built one (VERDICT r11 item 1). If a concurrent builder of
   * the same stamp won the publish race, the surviving manifest is the
   * WINNER's: our freshly written segments are unreferenced by it and
   * are deleted by the very `gc` below (or the winner's) — serving
   * `built` would hand the caller references to just-deleted dirs.
   * Both builders computed equivalent content for the stamp, so the
   * winner's manifest is a correct serve for the loser too. The
   * fallback to `built` fires only if the manifest vanished entirely
   * between publish and re-read (a cross-stamp gc from a newer-content
   * writer) — in that window `built`'s segments are already gone
   * either way and the caller's NEXT ensure rebuilds under the newer
   * stamp; the broken-manifest self-heal in [[currentManifest]] keeps
   * this path loud rather than silently wrong. */
  def publishAndServe(store: Path, built: Manifest): Manifest = {
    publish(store, built)
    gc(store, built.stamp)
    currentManifest(store, built.stamp).getOrElse(built)
  }

  /** Is this `.stage_<pid>_<n>` / `.manifest_tmp_<pid>_<n>` name owned
   * by a process that is still alive? A crashed builder's staging must
   * not leak forever (the very tmp-leak class this protocol exists to
   * fix); a LIVE concurrent builder's must never be swept. */
  private def ownerAlive(name: String): Boolean = {
    val pid = name.split('_').collectFirst {
      case t if t.nonEmpty && t.forall(_.isDigit) => t.toLong
    }
    pid.flatMap(p =>
        scala.jdk.OptionConverters.RichOptional(ProcessHandle.of(p)).toScala)
      .exists(_.isAlive)
  }

  /** Staging with no write ACTIVITY for this long is reclaimable
   * regardless of PID liveness (ADVICE r11: PIDs recycle — an
   * unrelated long-lived process that happens to reuse a crashed
   * builder's PID would otherwise keep its `.stage_` dirs alive
   * indefinitely). Age is measured from the newest mtime anywhere
   * under the staging tree, not the dir's creation: an in-flight
   * write keeps producing files and so keeps refreshing its own
   * lease — even a multi-hour initial full-corpus segment build
   * stays protected while it streams — whereas a genuinely abandoned
   * tree goes quiet and ages out. */
  private[graft] val STAGE_MAX_AGE_MS: Long = 6L * 3600 * 1000

  /** Newest last-modified time under `p` (the dir itself counts): the
   * "last write activity" signal for the staging lease. Staging trees
   * are delta-sized, so the walk is a cheap metadata pass; gc is the
   * only caller. IO errors during the walk mean entries CHANGING under
   * us — and the likeliest changer is the live owner's parquet
   * task-commit renames (NoSuchFileException mid-walk), so the safe
   * reading of an error is "recent activity", keeping the staging
   * alive: a genuinely dead tree is quiet, walks cleanly, and ages out
   * on the next gc. (Reporting "no activity" here inverted the lease's
   * safe default: a walk error caused by the live owner's own writes
   * would have handed its in-flight staging to the reclaimer.)
   * `Files.walk` surfaces traversal-time IO failures — including the
   * mid-walk vanish this guards against — as UncheckedIOException
   * (a RuntimeException), so that type must be caught alongside the
   * direct IOException from the explicit getLastModifiedTime call.
   *
   * Only the VANISH class (NoSuchFileException, bare or wrapped) gets
   * the "activity = now" reading — it is the signature of the owner's
   * concurrent renames. A PERSISTENT error of any other class (bad
   * permissions, corrupt entry) must not renew the lease forever —
   * that would leak the staging unboundedly — so those fall back to
   * max(root dir mtime, newest mtime seen before the walk failed):
   * the partial deep reading protects a live owner whose concurrent
   * renames surface as a non-vanish class on non-POSIX filesystems,
   * while the tree still ages out on its real last-touch time; if
   * even the root stat fails, the partial max (possibly 0L) hands it
   * to the age check (its owner being dead or recycled is already
   * required for reclaim). */
  private def newestMtime(p: Path): Long = {
    def isVanish(e: Throwable): Boolean = e match {
      case _: java.nio.file.NoSuchFileException => true
      case u: java.io.UncheckedIOException =>
        u.getCause.isInstanceOf[java.nio.file.NoSuchFileException]
      case _ => false
    }
    // accumulate as we iterate: a mid-walk failure of the NON-vanish
    // class (e.g. AccessDeniedException surfaced by a live owner's
    // concurrent renames on a non-POSIX fs) must not discard the deep
    // mtimes already observed — the root dir's own mtime never moves on
    // deep writes, so falling back to it alone could hand a live
    // owner's >6h staging to the reclaimer
    var newestSeen = 0L
    try {
      val w = Files.walk(p)
      try {
        val it = w.iterator().asScala
        while (it.hasNext)
          newestSeen = math.max(newestSeen,
            Files.getLastModifiedTime(it.next()).toMillis)
        newestSeen
      } finally w.close()
    } catch {
      case e @ (_: java.io.IOException | _: java.io.UncheckedIOException) =>
        if (isVanish(e)) System.currentTimeMillis()
        else
          math.max(newestSeen,
            try Files.getLastModifiedTime(p).toMillis
            catch { case _: java.io.IOException => 0L })
    }
  }

  /** In-flight staging survives GC only while its owner is alive AND
   * the tree saw write activity within [[STAGE_MAX_AGE_MS]] — bare
   * liveness is not proof of ownership after PID recycling. */
  private def stageLive(p: Path): Boolean =
    ownerAlive(p.getFileName.toString) &&
      System.currentTimeMillis() - newestMtime(p) < STAGE_MAX_AGE_MS

  /** Drop superseded manifests, then every segment-PARTITION dir no
   * surviving manifest references (a refresh that replaces one bucket
   * of a segment must not leak the old bucket dir behind the segment's
   * still-referenced siblings), then any segment left with no
   * referenced partitions at all. In-flight `.stage_` dirs and temp
   * manifests survive while their owning PROCESS is alive — a crashed
   * owner's are reclaimed here. */
  def gc(store: Path, keepStamp: String): Unit = {
    manifestFiles(store)
      .filter(_.getFileName.toString != s"manifest_$keepStamp")
      .foreach(Files.deleteIfExists(_))
    // vanished-mid-race manifests contribute no references — their
    // segments are either the other gc's problem (it holds the newer
    // manifest set) or genuinely superseded
    val referenced: Set[String] =
      manifestFiles(store).flatMap(parseIfPresent)
        .flatMap(_.entries.map(_.rel)).toSet
    // a crashed writer's temp manifest is dead weight, and so is a
    // crashed healer's quarantine file (healUnservable moved the
    // unservable manifest out but died before resolving it — the
    // manifest path is absent either way, so the next serve rebuilds)
    listDir(store).foreach { p =>
      val n = p.getFileName.toString
      if ((n.startsWith(".manifest_tmp_") || n.startsWith(".heal_")) &&
          !stageLive(p))
        Files.deleteIfExists(p)
    }
    listDir(store.resolve("segs")).foreach { seg =>
      val name = seg.getFileName.toString
      if (name.startsWith(".stage_")) {
        if (!stageLive(seg)) Q.deleteRecursively(seg)
      } else {
        // a concurrent gc may delete this seg between the listing and
        // here — an empty child list then keeps `kept` empty and the
        // recursive delete below is a no-op on the vanished dir
        val kids = listDir(seg)
        val (dirs, files) = kids.partition(Files.isDirectory(_))
        val (kept, dead) =
          dirs.partition(d => referenced.contains(store.relativize(d).toString))
        dead.foreach(Q.deleteRecursively)
        if (kept.isEmpty) { // only loose files (_SUCCESS) remain
          files.foreach(Files.deleteIfExists(_))
          Q.deleteRecursively(seg)
        }
      }
    }
  }

  private val sweptLegacy =
    java.util.concurrent.ConcurrentHashMap.newKeySet[String]()

  /** One-time cleanup of artifacts published under SUPERSEDED layout
   * prefixes (ADVICE r9: the per-stamp dirs of the pre-manifest
   * protocol were swept only within their own prefix, so a prefix bump
   * leaked the old generation in tmp forever). Dead layouts cannot
   * reappear within a process, so each prefix sweeps ONCE per JVM —
   * repeat serve calls must not pay a full tmpdir listing (the same
   * hot-path argument as [[memoFrame]]). */
  def sweepLegacyPrefixes(prefixes: Seq[String]): Unit = {
    val todo = prefixes.filter(sweptLegacy.add)
    if (todo.isEmpty) return
    val tmp = Paths.get(System.getProperty("java.io.tmpdir"))
    listDir(tmp).foreach { p =>
      val n = p.getFileName.toString
      if (todo.exists(n.startsWith)) Q.deleteRecursively(p)
    }
  }

  /** Per-JVM memo for constructed serve DataFrames, keyed by (session,
   * store, stamp): a published artifact state is IMMUTABLE, but
   * `spark.read.parquet(paths: _*)` resolves its relation eagerly —
   * listing every referenced partition dir costs ~40–60 ms per call at
   * gate scale, and the LSH/graph consumers construct the serve frame
   * several times per entry. The memo returns the same (immutable,
   * plan-reusable) DataFrame for repeat calls; a corpus change moves
   * the stamp and naturally misses. The outer map holds the SESSION
   * weakly — a stopped, collected session releases every frame built
   * on it (an identity-hash key would both pin those frames forever
   * and risk serving a dead session's frame after hash reuse). Inner
   * entries are few (stamps seen per session × 2 artifacts).
   *
   * The VALUES are WeakReference-wrapped (ADVICE r11): a DataFrame
   * strongly references its SparkSession — i.e. the outer KEY — so a
   * strong value would re-create exactly the value→key pin the
   * WeakHashMap javadoc warns about, and no session (or frame) could
   * ever be reclaimed for the JVM's lifetime. With weak values a
   * GC-cleared frame simply rebuilds on the next call (a ~40–60 ms
   * relation re-resolve, not a refresh — the manifest is already
   * published); a stopped session whose frames are no longer
   * reachable collapses to weakly-reachable and its whole entry is
   * expunged (ManifestStoreSpec pins the reclaim). */
  /** Per-key cell: the lock granularity for [[memoFrame]]. Locking the
   * whole per-session map would serialize EVERY artifact's serve/build
   * on a session behind whichever build happens to be in flight (a
   * corpus refresh can run minutes); a holder per (store, stamp) blocks
   * only same-key callers — exactly the dedup the memo exists for. */
  private final class MemoCell {
    // @volatile: writes happen under cell.synchronized, but memoCensus
    // reads ref while holding only the outer frameMemo lock — volatile
    // keeps that cross-lock read current (the census is still a
    // point-in-time approximation; weak values can clear at any time)
    @volatile var ref: java.lang.ref.WeakReference[Any] = null
  }

  private val frameMemo = new java.util.WeakHashMap[
    AnyRef, java.util.concurrent.ConcurrentHashMap[
      (String, String), MemoCell]]()

  /** Sessions currently holding memo entries — the spec's reclaim
   * probe. Calling size() expunges stale (collected-key) entries. */
  private[graft] def memoSessionCount: Int =
    frameMemo.synchronized { frameMemo.size() }

  /** (sessions, cells, cells-with-live-value) — the session-tax
   * instrument's census (ScaleSmoke stage boundaries): shows whether
   * the memo is what a long session accumulates. Weak values mean
   * liveCells can be below cells at any time. */
  private[graft] def memoCensus: (Int, Int, Int) =
    frameMemo.synchronized {
      var cells = 0; var live = 0
      frameMemo.values().asScala.foreach { m =>
        cells += m.size()
        m.values().asScala.foreach { c =>
          if (c.ref != null && c.ref.get() != null) live += 1
        }
      }
      (frameMemo.size(), cells, live)
    }

  def memoFrame[T](session: AnyRef, store: Path, stamp: String)
                  (build: => T): T = {
    val perSession = frameMemo.synchronized {
      var m = frameMemo.get(session)
      if (m == null) {
        m = new java.util.concurrent.ConcurrentHashMap[
          (String, String), MemoCell]()
        frameMemo.put(session, m)
      }
      m
    }
    val cell = perSession.computeIfAbsent(
      (store.toString, stamp), _ => new MemoCell)
    // per-cell lock, not computeIfAbsent on the value: a present-but-
    // GC-cleared reference must rebuild, and only same-key callers wait
    cell.synchronized {
      Option(cell.ref).flatMap(r => Option(r.get())) match {
        case Some(v) => v.asInstanceOf[T]
        case None =>
          val v = build
          cell.ref = new java.lang.ref.WeakReference[Any](v)
          v
      }
    }
  }

  /** Manifest entries for freshly published bucket dirs WITH their row
   * counts, gathered in ONE delta-sized job (count(*) over parquet
   * reads row-group metadata, and the segment just written is
   * delta-sized by construction); bucket attribution comes from the
   * published dir name in the file path. Build-path only — serves
   * never call this. */
  def entriesWithRows(s: SparkSession, store: Path, kind: String,
                      kids: Seq[(Int, String)],
                      dirCol: String = "bucket"): Seq[Entry] = {
    import org.apache.spark.sql.functions._
    if (kids.isEmpty) return Seq.empty
    // anchored to the file's PARENT directory segment: the unanchored
    // pattern matched the first '<dirCol>_<digits>/' ANYWHERE in the
    // URI (a tmpdir containing such a segment mis-attributed every
    // file), and a no-match returned "" whose toInt threw a bare
    // NumberFormatException (r18 review finding)
    val counts = s.read
      .parquet(kids.map(k => store.resolve(k._2).toString): _*)
      .groupBy(regexp_extract(input_file_name(),
        "/" + java.util.regex.Pattern.quote(dirCol + "_") +
          "([0-9]+)/[^/]+$", 1).as("b"))
      .agg(count(lit(1)).as("n")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    require(!counts.contains(""),
      s"ManifestStore: could not attribute some files under " +
        s"${kids.map(_._2).mkString(", ")} to a ${dirCol}_<n> parent — " +
        "the published layout must keep data files directly inside " +
        "their bucket dir")
    val byBucket = counts.map { case (k, v) => k.toInt -> v }
    kids.map { case (b, rel) => Entry(kind, b, rel, byBucket.getOrElse(b, 0L)) }
  }

  /** Schema-pinned multi-root read of one `kind`'s referenced
   * partition dirs; a typed empty frame when none are referenced (an
   * empty corpus publishes a manifest with zero entries — the explicit
   * schema is what keeps that case typed). Shared by both indexes so a
   * protocol change to the read posture lands once.
   *
   * Root collapsing (VERDICT r11 item 2, the serve-tax fix): when a
   * manifest references EVERY bucket partition of a segment — the
   * steady state after a full build or a compaction — the read is
   * handed the one segment dir instead of NBUCKETS bucket-dir roots.
   * Each root costs a directory listing at relation resolve and a
   * per-root pass in every file-scan planning, and the LSH/graph
   * consumers scan these frames 2–3× per query (self-joins), so a
   * 32-root artifact paid ~32× the per-root overhead on every
   * execution; the collapsed read restores the r9 single-root scan
   * shape without giving up per-bucket manifest granularity. A
   * partially-referenced segment (a refresh carried some buckets and
   * replaced siblings) keeps per-dir roots — correctness first: the
   * collapse applies only when the segment's on-disk partition dirs
   * are exactly the referenced set. recursiveFileLookup makes the
   * nested layout explicit (no partition discovery — the data files
   * carry every served column; `_`-prefixed metadata files are
   * filtered by Spark either way). */
  def readEntries(s: SparkSession, store: Path, entries: Seq[Entry],
                  kind: String, schema: StructType): DataFrame = {
    val rels = entries.filter(_.kind == kind).map(_.rel)
    if (rels.isEmpty)
      return s.createDataFrame(s.sparkContext.emptyRDD[Row], schema)
    val paths = rels.groupBy(r => r.substring(0, r.lastIndexOf('/')))
      .toSeq.flatMap { case (parentRel, rs) =>
        val seg = store.resolve(parentRel)
        val onDisk: Set[String] = listDir(seg)
          .filter(p => Files.isDirectory(p) &&
            !p.getFileName.toString.startsWith("_") &&
            !p.getFileName.toString.startsWith("."))
          .map(p => store.relativize(p).toString).toSet
        if (onDisk.nonEmpty && onDisk == rs.toSet) Seq(seg.toString)
        else rs.map(r => store.resolve(r).toString)
      }.sorted
    s.read.schema(schema).option("recursiveFileLookup", "true")
      .parquet(paths: _*)
  }

  /** Total bytes under a store-relative entry set — the observability
   * hook ScaleSmoke and the specs use to pin "refresh writes ∝ delta":
   * bytes referenced by the new manifest but not the old one are
   * exactly what the refresh wrote. */
  def entryBytes(store: Path, entries: Seq[Entry]): Long =
    entries.map { e =>
      val p = store.resolve(e.rel)
      if (!Files.isDirectory(p)) 0L
      else {
        // an observability hook: a segment vanishing mid-walk (a
        // concurrent gc sweeping a superseded entry set) reads as
        // 0 bytes for that entry, never a crash (r18 second-pass
        // finding — the same skip-and-heal posture as listDir)
        try {
          val w = Files.walk(p)
          try w.iterator().asScala
            .filter(Files.isRegularFile(_)).map(Files.size).sum
          finally w.close()
        } catch {
          case _: java.nio.file.NoSuchFileException => 0L
          case ex: java.io.UncheckedIOException
              if ex.getCause.isInstanceOf[java.nio.file.NoSuchFileException] =>
            0L
        }
      }
    }.sum
}
