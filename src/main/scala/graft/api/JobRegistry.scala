package graft.api

import java.util.UUID
import java.util.concurrent.Executors

import scala.collection.concurrent.TrieMap

/** Async job registry for batch queries (SURVEY §2.7 / §3.3): the
  * reference returns 202 + a pollable job with status transitions and
  * result links (`queries.py:300-344`, `app/routes/jobs/job.py`). Jobs
  * run on a background executor; results persist to `resultDir` (the
  * reference writes batch results to S3 and serves a signed
  * `download_link`) so a completed job's payload survives the serving
  * process and is re-readable through `/job/{id}/download`. */
final class JobRegistry(
    resultDir: String = s"${sys.props("java.io.tmpdir")}/graft_jobs") {

  sealed trait Status { def name: String }
  case object Pending extends Status { val name = "pending" }
  case object Success extends Status { val name = "success" }
  case object Failed extends Status { val name = "failed" }

  final case class Job(id: String, status: Status, payload: Option[String],
                       message: Option[String])

  private val jobs = TrieMap.empty[String, Job]
  private val pool = Executors.newFixedThreadPool(2)

  /** Submit work; returns the job id immediately (202 semantics). */
  def submit(work: () => String): String = {
    val id = UUID.randomUUID().toString
    jobs.put(id, Job(id, Pending, None, None))
    pool.submit(new Runnable {
      override def run(): Unit =
        try {
          val result = work()
          // durable result first, then the status flip — a poller that
          // sees "success" can always fetch the file
          val dir = java.nio.file.Paths.get(resultDir)
          java.nio.file.Files.createDirectories(dir)
          java.nio.file.Files.writeString(dir.resolve(s"$id.json"), result)
          jobs.put(id, Job(id, Success, Some(result), None))
        } catch {
          case e: Throwable =>
            jobs.put(id, Job(id, Failed, None,
              Some(Option(e.getMessage).getOrElse(e.getClass.getName))))
        }
    })
    id
  }

  def get(id: String): Option[Job] = jobs.get(id)

  /** The persisted result, readable even when the in-memory record is
    * gone (process restart). */
  def result(id: String): Option[String] = {
    val p = java.nio.file.Paths.get(resultDir, s"$id.json")
    if (java.nio.file.Files.isReadable(p))
      Some(java.nio.file.Files.readString(p))
    else jobs.get(id).flatMap(_.payload)
  }

  def shutdown(): Unit = pool.shutdown()
}
