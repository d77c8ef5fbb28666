package graft

import org.scalatest.funsuite.AnyFunSuite

/** The staged-rename memo builder that every lake/sidecar build rides:
  * pins the build/memo/heal/concurrency/failure contracts, including
  * the two round-11 regressions (lock create under a missing parent
  * dir; a partial artifact must never be returned as complete). */
class SidecarSpec extends AnyFunSuite {

  private def tmpBase(): String =
    java.nio.file.Files.createTempDirectory("sidecar_spec_").toString

  private def writeArtifact(dir: String, tag: String): Unit = {
    val d = new java.io.File(dir)
    require(d.mkdirs() || d.isDirectory)
    java.nio.file.Files.writeString(d.toPath.resolve("data"), tag)
    java.nio.file.Files.createFile(d.toPath.resolve("_SUCCESS")): Unit
  }

  test("builds once, memo-hits after, and leaves no staging or lock litter") {
    val path = s"${tmpBase()}/art"
    var builds = 0
    Sidecar.ensure(path) { tmp => builds += 1; writeArtifact(tmp, "v1") }
    Sidecar.ensure(path) { tmp => builds += 1; writeArtifact(tmp, "v2") }
    assert(builds == 1)
    assert(java.nio.file.Files.readString(
      java.nio.file.Paths.get(path, "data")) == "v1")
    val parent = new java.io.File(path).getParentFile
    val litter = parent.listFiles().filterNot(_.getName == "art")
    assert(litter.isEmpty, litter.mkString(", "))
  }

  test("parent dir of the memo path need not pre-exist (round-11 regression)") {
    // the fixture lakes live at $base/lake with $base absent on first
    // build; the lock must be creatable (this used to IOException →
    // unbounded retry → StackOverflowError)
    val path = s"${tmpBase()}/a/b/lake"
    Sidecar.ensure(path) { tmp => writeArtifact(tmp, "x") }
    assert(new java.io.File(s"$path/_SUCCESS").exists())
  }

  test("a _SUCCESS-less partial target heals; a build that skips _SUCCESS throws") {
    val path = s"${tmpBase()}/art"
    val stale = new java.io.File(path)
    stale.mkdirs()
    java.nio.file.Files.writeString(stale.toPath.resolve("junk"), "old")
    Sidecar.ensure(path) { tmp => writeArtifact(tmp, "fresh") }
    assert(!new java.io.File(path, "junk").exists(), "stale content kept")
    assert(java.nio.file.Files.readString(
      java.nio.file.Paths.get(path, "data")) == "fresh")
    // a builder that produces no _SUCCESS must throw, not return the
    // path as complete (partial parquet would read as truncated data)
    val bad = s"${tmpBase()}/bad"
    val e = intercept[IllegalArgumentException](
      Sidecar.ensure(bad) { tmp => new java.io.File(tmp).mkdirs(): Unit })
    assert(e.getMessage.contains("_SUCCESS"), e.getMessage)
  }

  test("a build failure releases the lock so the next attempt can run") {
    val path = s"${tmpBase()}/art"
    intercept[RuntimeException](
      Sidecar.ensure(path)(_ => throw new RuntimeException("boom")))
    assert(!new java.io.File(s"$path.lock").exists(), "lock leaked")
    Sidecar.ensure(path) { tmp => writeArtifact(tmp, "ok") }
    assert(new java.io.File(s"$path/_SUCCESS").exists())
  }

  test("concurrent callers: exactly one builds, every caller sees the complete artifact") {
    val path = s"${tmpBase()}/art"
    val builds = new java.util.concurrent.atomic.AtomicInteger(0)
    val threads = (1 to 6).map { i =>
      new Thread(() => {
        Sidecar.ensure(path) { tmp =>
          builds.incrementAndGet()
          Thread.sleep(150) // widen the race window
          writeArtifact(tmp, s"builder$i")
        }: Unit
      })
    }
    threads.foreach(_.start())
    threads.foreach(_.join(30000))
    assert(builds.get() == 1, s"${builds.get()} builders won")
    assert(new java.io.File(s"$path/_SUCCESS").exists())
    assert(!new java.io.File(s"$path.lock").exists())
  }
}
