package graft

/** Idempotent, concurrency-safe materialization of a derived ingest
  * artifact ("sidecar") under a memo path — the shared shape behind
  * the media lakes, the e11 PQ codes, the image tower / phash / afp
  * sidecars and the e4 LSH signature table.
  *
  * Contract: the caller's `path` carries BOTH staleness axes (the
  * source data's tag and the kernel version — see
  * `MediaLake.ensureSidecar`'s doc); this object guarantees the build
  * is atomic, exclusive and loud:
  *
  *   - EXCLUSIVE: a `path.lock` file taken with the filesystem's
  *     atomic create picks exactly one builder; concurrent callers
  *     wait for the winner's `_SUCCESS` instead of racing their own
  *     build in (the check-then-overwrite TOCTOU would let a loser
  *     delete a just-completed sidecar mid-scan).
  *   - ATOMIC: the build writes into a session-private staging dir
  *     which is RENAMED into place (atomic on one filesystem).
  *   - LOUD: every step that could leave a partial artifact —
  *     stale-dir cleanup, the rename, the final `_SUCCESS` check —
  *     throws on failure instead of returning a path whose parquet
  *     would read as silently truncated data. */
object Sidecar {

  private val lockWaitMs = 10 * 60 * 1000L // a corpus-wide build, not a row op

  /** Ensure `path` holds a completed artifact (marker `_SUCCESS`
    * inside), running `build(stagingDir)` if absent. Returns `path`.
    * `attempt` bounds the lost-the-lock-then-winner-vanished retry
    * (an unbounded retry plus a lock whose CREATE always fails —
    * e.g. an unwritable parent — was a stack overflow). */
  @annotation.tailrec
  def ensure(path: String, attempt: Int = 0)(build: String => Unit): String = {
    val done = new java.io.File(s"$path/_SUCCESS")
    if (done.exists()) return path
    val lock = new java.io.File(s"$path.lock")
    // the memo path's parent may not exist yet (e.g. a lake under a
    // fresh `$base/lake`); the lock must be creatable before any
    // build machinery runs
    val parent = lock.getParentFile
    if (parent != null) parent.mkdirs(): Unit
    val owner = lock.createNewFile() // IOException here = real fault, propagate
    if (!owner) {
      // another driver is building: wait for its _SUCCESS (or for a
      // crashed builder's lock to be diagnosed) rather than racing
      val deadline = System.currentTimeMillis() + lockWaitMs
      while (!done.exists() && lock.exists() &&
        System.currentTimeMillis() < deadline) Thread.sleep(200)
      if (done.exists()) return path
      if (lock.exists())
        throw new IllegalStateException(
          s"sidecar build lock held past ${lockWaitMs / 1000}s: $lock — " +
            "remove the stale lock if its builder is dead")
      if (attempt >= 3)
        throw new IllegalStateException(
          s"sidecar lock vanished ${attempt + 1}× without a completed " +
            s"build: $lock")
      ensure(path, attempt + 1)(build) // winner crashed pre-build: retry
    } else {
    try {
      if (done.exists()) return path // completed between check and lock
      val tmp = new java.io.File(
        s"$path.stage-${java.util.UUID.randomUUID().toString.take(8)}")
      build(tmp.getPath)
      val target = new java.io.File(path)
      if (target.exists()) {
        // only ever a crashed build's partial (we hold the lock and
        // _SUCCESS was absent under it) — clear it, loudly
        deleteRecursively(target)
        require(!target.exists(), s"sidecar stale-dir cleanup failed: $path")
      }
      require(tmp.renameTo(target), s"sidecar rename failed: $tmp → $path")
      require(done.exists(),
        s"sidecar incomplete after rename (no _SUCCESS): $path")
      path
    } finally { lock.delete(): Unit }
    }
  }

  private def deleteRecursively(f: java.io.File): Unit = {
    val kids = f.listFiles()
    if (kids != null) kids.foreach(deleteRecursively)
    if (!f.delete() && f.exists())
      throw new IllegalStateException(s"sidecar cleanup could not delete: $f")
  }
}
