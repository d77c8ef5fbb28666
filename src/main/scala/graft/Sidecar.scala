package graft

/** Idempotent, concurrency-safe materialization of a derived ingest
  * artifact ("sidecar") under a memo path — the shared shape behind
  * the e11 PQ codes, the image tower / phash / afp sidecars and the
  * e4 LSH signature table.
  *
  * Contract: the caller's `path` carries BOTH staleness axes (the
  * source data's tag and the kernel version — see
  * `MediaLake.ensureSidecar`'s doc); this object only guarantees the
  * build is atomic and idempotent. The build writes into a
  * session-private staging dir which is RENAMED into place: rename is
  * atomic on one filesystem, so two concurrent drivers sharing the
  * tmpdir can never overwrite a sidecar the other is mid-scan on —
  * exactly one rename wins and the loser discards its staging dir. */
object Sidecar {

  /** Ensure `path` holds a completed artifact (marker `_SUCCESS`
    * inside), running `build(stagingDir)` if absent. Returns `path`. */
  def ensure(path: String)(build: String => Unit): String = {
    val done = new java.io.File(s"$path/_SUCCESS")
    if (!done.exists()) {
      val tmp = new java.io.File(
        s"$path.stage-${java.util.UUID.randomUUID().toString.take(8)}")
      build(tmp.getPath)
      val target = new java.io.File(path)
      // A crashed earlier build can leave a _SUCCESS-less target dir;
      // clear it so the rename can land (a COMPLETE target means a
      // concurrent winner — keep theirs).
      if (!done.exists() && target.exists()) deleteRecursively(target)
      if (!tmp.renameTo(target)) deleteRecursively(tmp)
    }
    path
  }

  private def deleteRecursively(f: java.io.File): Unit = {
    val kids = f.listFiles()
    if (kids != null) kids.foreach(deleteRecursively)
    f.delete(): Unit
  }
}
