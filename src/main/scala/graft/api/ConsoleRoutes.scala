package graft.api

import org.apache.spark.sql.SparkSession
import graft.backend.QueueBackend
import graft.model._
import graft.worker.BatchTracker

/** A console request: HTTP shape without an HTTP dependency. */
final case class ConsoleRequest(
    method: String, // GET | POST | DELETE
    path: String,
    params: Map[String, String] = Map.empty)

/** Body + status (+ extra response headers, e.g. a 303 `Location` from
  * the HTML form handlers). 200 ok, 303 form-redirect, 404 unknown
  * route/entity, 400 bad input. */
final case class ConsoleResponse(status: Int, body: String,
    headers: Map[String, String] = Map.empty)

/** The console's route table (SURVEY.md §2 console surface) — goose's
  * web console re-expressed as a pure request→JSON layer over
  * [[ManagementApi]] (reference redis/console.clj:11-48 route tree;
  * page handlers under redis/console/pages/). Rendering (HTML/CSS) and
  * the HTTP server are intentionally out: this container has no HTTP
  * dependency, and any server (jetty/akka/zio) can mount `handle`
  * one-to-one. Route coverage, parameter shapes, and the
  * action-per-route contract (purge/prioritise/replay/delete) match the
  * reference table exactly.
  */
final class ConsoleRoutes(backend: QueueBackend, spark: SparkSession) {

  private val api = new ManagementApi(backend, spark)
  private val tracker = new BatchTracker(backend, spark)

  // ---------- tiny JSON writer (no deps; mirrors Verify.scala's escaper) ----------

  private def jstr(s: String): String = "\"" + s.flatMap {
    case '"' => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  } + "\""

  private def jval(v: Any): String = v match {
    case null | None => "null"
    case Some(x) => jval(x)
    case s: String => jstr(s)
    case b: Boolean => b.toString
    case n: Long => n.toString
    case n: Int => n.toString
    case n: Double => n.toString
    case m: Map[_, _] =>
      m.map { case (k, x) => s"${jstr(k.toString)}:${jval(x)}" }.mkString("{", ",", "}")
    case xs: Seq[_] => xs.map(jval).mkString("[", ",", "]")
    case other => jstr(other.toString)
  }

  private def jobJson(j: Job): Map[String, Any] = Map(
    "id" -> j.id, "execute_fn_sym" -> j.executeFnSym, "args" -> j.argsJson,
    "queue" -> j.queue, "priority" -> j.priority.toLong,
    "enqueued_at" -> j.enqueuedAt,
    "schedule_run_at" -> j.scheduleRunAt, "cron_run_at" -> j.cronRunAt,
    "batch_id" -> j.batchId,
    "retry_count" -> j.state.map(_.retryCount.toLong),
    "error" -> j.state.map(_.error))

  private def cronJson(e: CronEntry): Map[String, Any] = Map(
    "cron_name" -> e.cronName, "cron_schedule" -> e.cronSchedule,
    "timezone" -> e.timezone, "next_run_at" -> e.nextRunAt)

  private def ok(v: Any): ConsoleResponse = ConsoleResponse(200, jval(v))
  private def notFound: ConsoleResponse =
    ConsoleResponse(404, """{"error":"not found"}""")
  private def bad(msg: String): ConsoleResponse =
    ConsoleResponse(400, jval(Map("error" -> msg)))

  private def ids(params: Map[String, String]): Seq[String] =
    params.get("ids").map(_.split(',').map(_.trim).filter(_.nonEmpty).toSeq)
      .getOrElse(Nil)

  private def page(params: Map[String, String]): Int =
    params.get("page").map(_.toInt).getOrElse(0)

  /** Route and execute one console request (reference
    * redis/console.clj:11-48; bidi match ≈ this segment match). */
  def handle(req: ConsoleRequest): ConsoleResponse = {
    val segs = req.path.split('/').toList.filter(_.nonEmpty)
    val p = req.params
    try {
      (req.method, segs) match {
        // home (home/page: aggregate sizes)
        case ("GET", Nil) => ok(api.homeStats())

        // enqueued (pages/enqueued.clj)
        case ("GET", "enqueued" :: Nil) => ok(Map("queues" -> api.listQueues()))
        case ("GET", "enqueued" :: "queue" :: q :: Nil) =>
          val f = ConsoleFilters.validate(p, ConsoleFilters.EnqueuedTypes)
          if (f.isFilter)
            ok(Map("queue" -> q,
              "jobs" -> ConsoleFilters.enqueued(api, q, f).map(jobJson)))
          else if (f.isPlainPage)
            ok(Map("queue" -> q, "total" -> api.enqueuedSize(q),
              "jobs" -> api.enqueuedPage(q, page(p)).map(jobJson)))
          else // valid filter-type, invalid filter-value → empty list
            ok(Map("queue" -> q, "jobs" -> Nil))
        case ("DELETE", "enqueued" :: "queue" :: q :: Nil) =>
          api.enqueuedPurge(q); ok(Map("purged" -> q))
        case ("POST", "enqueued" :: "queue" :: q :: "jobs" :: Nil) =>
          ok(Map("prioritised" -> api.enqueuedPrioritise(q, ids(p)).toLong))
        case ("DELETE", "enqueued" :: "queue" :: q :: "jobs" :: Nil) =>
          ok(Map("deleted" -> api.enqueuedDelete(q, ids(p)).toLong))
        case ("GET", "enqueued" :: "queue" :: q :: "job" :: id :: Nil) =>
          api.enqueuedFindById(q, id).map(j => ok(jobJson(j))).getOrElse(notFound)
        case ("POST", "enqueued" :: "queue" :: q :: "job" :: id :: Nil) =>
          ok(Map("prioritised" -> api.enqueuedPrioritise(q, Seq(id)).toLong))
        case ("DELETE", "enqueued" :: "queue" :: q :: "job" :: id :: Nil) =>
          ok(Map("deleted" -> api.enqueuedDelete(q, Seq(id)).toLong))

        // scheduled (pages/scheduled.clj)
        case ("GET", "scheduled" :: Nil) =>
          val f = ConsoleFilters.validate(p, ConsoleFilters.ScheduledTypes)
          if (f.isFilter)
            ok(Map("jobs" -> ConsoleFilters.scheduled(api, f).map(jobJson)))
          else if (f.isPlainPage)
            ok(Map("total" -> api.scheduledSize(),
              "jobs" -> api.scheduledPage(page(p)).map(jobJson)))
          else ok(Map("jobs" -> Nil))
        case ("DELETE", "scheduled" :: Nil) =>
          api.scheduledPurge(); ok(Map("purged" -> "scheduled"))
        case ("POST", "scheduled" :: "jobs" :: Nil) =>
          ok(Map("prioritised" -> api.scheduledPrioritise(ids(p)).toLong))
        case ("DELETE", "scheduled" :: "jobs" :: Nil) =>
          ok(Map("deleted" -> api.scheduledDelete(ids(p)).toLong))
        case ("GET", "scheduled" :: "job" :: id :: Nil) =>
          api.scheduledFindById(id).map(j => ok(jobJson(j))).getOrElse(notFound)
        case ("POST", "scheduled" :: "job" :: id :: Nil) =>
          ok(Map("prioritised" -> api.scheduledPrioritise(Seq(id)).toLong))
        case ("DELETE", "scheduled" :: "job" :: id :: Nil) =>
          ok(Map("deleted" -> api.scheduledDelete(Seq(id)).toLong))

        // dead (pages/dead.clj)
        case ("GET", "dead" :: Nil) =>
          val f = ConsoleFilters.validate(p, ConsoleFilters.DeadTypes)
          if (f.isFilter)
            ok(Map("jobs" -> ConsoleFilters.dead(api, f).map(jobJson)))
          else if (f.isPlainPage)
            ok(Map("total" -> api.deadSize(),
              "jobs" -> api.deadPage(page(p)).map(jobJson)))
          else ok(Map("jobs" -> Nil))
        case ("DELETE", "dead" :: Nil) =>
          api.deadPurge(); ok(Map("purged" -> "dead"))
        case ("POST", "dead" :: "jobs" :: Nil) =>
          ok(Map("replayed" -> api.deadReplayIds(ids(p)).map(_.id)))
        case ("DELETE", "dead" :: "jobs" :: Nil) =>
          ok(Map("deleted" -> api.deadDelete(ids(p)).toLong))
        case ("GET", "dead" :: "job" :: id :: Nil) =>
          api.deadFindById(id).map(j => ok(jobJson(j))).getOrElse(notFound)
        case ("POST", "dead" :: "job" :: id :: Nil) =>
          ok(Map("replayed" -> api.deadReplayIds(Seq(id)).map(_.id)))
        case ("DELETE", "dead" :: "job" :: id :: Nil) =>
          ok(Map("deleted" -> api.deadDelete(Seq(id)).toLong))

        // batch (pages/batch.clj: GET by id param; DELETE /batch/job/:id)
        case ("GET", "batch" :: Nil) =>
          p.get("id").flatMap { id =>
            tracker.progressOf(id).map { prog =>
              ok(Map("id" -> id, "status" -> prog.status,
                "total" -> prog.total.toLong,
                "enqueued" -> prog.enqueuedCount.toLong,
                "success" -> prog.succeeded.size.toLong,
                "retrying" -> prog.retrying.size.toLong,
                "dead" -> prog.dead.size.toLong))
            }
          }.getOrElse(notFound)
        case ("DELETE", "batch" :: "job" :: id :: Nil) =>
          api.batchDelete(id); ok(Map("deleted" -> id))

        // cron (pages/cron.clj)
        case ("GET", "cron" :: Nil) => ok(api.cronList().map(cronJson))
        case ("DELETE", "cron" :: Nil) =>
          api.cronPurge(); ok(Map("purged" -> "cron"))
        case ("DELETE", "cron" :: "jobs" :: Nil) =>
          api.cronDelete(ids(p)); ok(Map("deleted" -> ids(p)))
        case ("GET", "cron" :: "job" :: name :: Nil) =>
          api.cronFind(name).map(e => ok(cronJson(e))).getOrElse(notFound)
        case ("DELETE", "cron" :: "job" :: name :: Nil) =>
          api.cronDelete(Seq(name)); ok(Map("deleted" -> Seq(name)))

        case _ => notFound
      }
    } catch {
      case e: NumberFormatException => bad(s"bad numeric param: ${e.getMessage}")
      case e: UnsupportedOperationException => bad(e.getMessage)
      case e: IllegalArgumentException => bad(e.getMessage)
    }
  }
}
