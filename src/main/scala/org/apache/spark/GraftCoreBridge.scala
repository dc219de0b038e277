package org.apache.spark

/** Bridge to package-private Spark core internals for the profiling
 * tools (same technique as sql.GraftSqlBridge): the session-tax
 * instrument (VERDICT r13 item 2) needs to watch the block manager's
 * on-disk footprint — shuffle and spill files live in the
 * DiskBlockManager's local dirs, which have no public accessor. */
object GraftCoreBridge {

  /** The running session's block-manager local dirs. */
  def localDirs: Seq[java.io.File] =
    SparkEnv.get.blockManager.diskBlockManager.localDirs.toSeq

  /** Total bytes currently on disk under the block manager — the
   * shuffle-file accumulation a long session carries until the
   * ContextCleaner reaps the dependency (which only happens on a
   * driver GC; spark.cleaner.periodicGC.interval defaults to 30min,
   * longer than most whole sessions). */
  def blockManagerDiskBytes(): Long = {
    def du(f: java.io.File): Long =
      if (f.isDirectory) {
        val kids = f.listFiles()
        if (kids == null) 0L else kids.map(du).sum
      } else f.length()
    localDirs.map(du).sum
  }
}
