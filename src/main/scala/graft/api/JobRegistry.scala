package graft.api

import java.util.UUID
import java.util.concurrent.Executors

import scala.collection.concurrent.TrieMap

/** Async job registry for batch queries (SURVEY §2.7 / §3.3): the
  * reference returns 202 + a pollable job with status transitions and
  * result links (`queries.py:300-344`, `app/routes/jobs/job.py`). Jobs
  * run on a background executor; results are JSON payloads held until
  * collected (a production deployment writes them to the lake and
  * serves links instead).
  */
final class JobRegistry {

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

  def shutdown(): Unit = pool.shutdown()
}
