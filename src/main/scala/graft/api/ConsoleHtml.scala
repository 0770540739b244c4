package graft.api

import org.apache.spark.sql.SparkSession
import graft.backend.QueueBackend
import graft.model._
import graft.worker.BatchTracker

/** Server-rendered console pages — the HTML face of the same
  * [[ManagementApi]] data the JSON routes serve (reference
  * console.clj:63-110 `layout`/`html5` + the hiccup views under
  * brokers/redis/console/pages/: home, enqueued, scheduled, dead, cron,
  * batch). String templates, zero dependencies: the reference renders
  * hiccup behind ring/jetty; here the JDK http server (ConsoleServer)
  * mounts this under the `/console` prefix next to the JSON tree.
  *
  * Actions (purge/prioritise/replay/delete) are embedded as POST forms
  * with a hidden `_method` override — the reference's exact mechanism
  * (console.clj:247-252 `wrap-method-override`; the per-row forms in
  * pages/enqueued.clj:60, dead.clj:89, scheduled.clj:78, cron.clj:131).
  * A form POST delegates to the SAME [[ConsoleRoutes]] handler the JSON
  * tree uses (the path shapes coincide by construction), then 303s back
  * to the originating page. Every page is a driver-side bounded read (a
  * page of 10 jobs, the cron registry, one batch's progress) — console
  * traffic is human-scale, none of the data plane passes through here.
  */
final class ConsoleHtml(backend: QueueBackend, spark: SparkSession) {

  private val api = new ManagementApi(backend, spark)
  private val tracker = new BatchTracker(backend, spark)
  private val actions = new ConsoleRoutes(backend, spark)

  private def page(params: Map[String, String]): Int =
    params.get("page").map(_.toInt).getOrElse(0)

  /** Route one GET under the html tree ("" or "/", "enqueued",
    * "enqueued/queue/:q", "scheduled", "dead", "cron", "batch?id=").
    * None = unknown page (the server 404s). */
  def handle(req: ConsoleRequest): Option[ConsoleResponse] = {
    val segs = req.path.split('/').toList.filter(_.nonEmpty)
    val p = req.params
    if (req.method == "POST") return Some(action(segs, p))
    if (req.method != "GET") return None
    val body = segs match {
      case Nil => Some(homePage())
      case "enqueued" :: Nil => Some(enqueuedIndex())
      case "enqueued" :: "queue" :: q :: Nil => Some(queuePage(q, page(p), p))
      case "scheduled" :: Nil => Some(jobsPage("Scheduled", page(p), "scheduled", p))
      case "dead" :: Nil => Some(jobsPage("Dead", page(p), "dead", p))
      case "cron" :: Nil => Some(cronPage())
      case "batch" :: Nil => p.get("id").map(batchPage)
      case _ => None
    }
    body.map(b => ConsoleResponse(200, livePoll(b, segs, p)))
  }

  /** "Live poll" (reference CHANGELOG 0.5.3; console.clj:224-230 — its
    * JS poll button reloads the page every N seconds). Server-side
    * rendering of the same data path: `?poll=N` adds a
    * `<meta http-equiv=refresh>` so the browser re-requests the page —
    * every GET recomputes from the live backend, so each reload IS the
    * poll. Interval clamped to the reference slider's 2-10 s range; a
    * nav toggle turns it on/off preserving the page's other params. */
  private def livePoll(html: String, segs: List[String],
      p: Map[String, String]): String = {
    val poll = p.get("poll").flatMap(_.toIntOption).map(v => v.max(2).min(10))
    def enc(s: String) = java.net.URLEncoder.encode(s, "UTF-8").replace("+", "%20")
    val base = "/console/" + segs.map(enc).mkString("/")
    def qs(m: Map[String, String]) =
      if (m.isEmpty) ""
      else "?" + m.toSeq.sortBy(_._1)
        .map { case (k, v) => enc(k) + "=" + enc(v) }.mkString("&")
    val toggle = poll match {
      case Some(sec) =>
        s"""<a class="poll" href="${esc(base + qs(p - "poll"))}">Stop poll (${sec}s)</a>"""
      case None =>
        s"""<a class="poll" href="${esc(base + qs(p + ("poll" -> "2")))}">Live poll</a>"""
    }
    val withMeta = poll match {
      case Some(sec) => html.replaceFirst("<head>",
        s"""<head><meta http-equiv="refresh" content="$sec">""")
      case None => html
    }
    withMeta.replaceFirst("</nav>",
      java.util.regex.Matcher.quoteReplacement(s"$toggle</nav>"))
  }

  // ---------- actions ----------

  /** Execute a form POST: apply the `_method` override, delegate to the
    * JSON route table (identical path shapes), 303 back to the page the
    * form lives on. Non-200 handler outcomes render as an HTML error at
    * the handler's status so operator mistakes stay visible. */
  private def action(segs: List[String], p: Map[String, String]): ConsoleResponse = {
    val effective = p.get("_method").map(_.toUpperCase).getOrElse("POST")
    val resp = actions.handle(
      ConsoleRequest(effective, segs.mkString("/"), p - "_method"))
    if (resp.status == 200) ConsoleResponse(303, "", Map("Location" -> backOf(segs)))
    else ConsoleResponse(resp.status, layout("Error",
      s"""<h1>Action failed (${resp.status})</h1><pre>${esc(resp.body)}</pre>
         |<p><a href="${esc(backOf(segs))}">back</a></p>""".stripMargin))
  }

  /** The page a completed action returns to: the collection view the
    * form was rendered on (strip the `/job(s)` suffix; a deleted batch
    * has no page left, so batch actions land on home). */
  private def backOf(segs: List[String]): String = segs match {
    case "batch" :: _ => "/console/"
    case _ => "/console/" + segs.takeWhile(s => s != "job" && s != "jobs")
      .map(seg => java.net.URLEncoder.encode(seg, "UTF-8").replace("+", "%20"))
      .mkString("/")
  }

  // ---------- pages ----------

  private def homePage(): String = {
    val stats = api.homeStats()
    val tiles = Seq("enqueued", "scheduled", "dead", "cron").map { k =>
      val href = s"/console/$k"
      s"""<div class="tile"><a href="${esc(href)}">
         |<span class="n">${stats.getOrElse(k, 0L)}</span>
         |<span class="k">${esc(k)}</span></a></div>""".stripMargin
    }.mkString
    layout("Home",
      s"""<h1>graft console</h1><div class="tiles">$tiles</div>
         |<p class="muted">total jobs: ${stats.values.sum}</p>""".stripMargin)
  }

  private def enqueuedIndex(): String = {
    // ONE grouped scan for every queue's size — listQueues() + a count
    // per queue is N+1 Spark actions, measured p50 8.1 s vs 1.5 s
    // against a 1M-row backend (QuickProbe __console_load).
    val rows = api.queueGauges().toSeq.sortBy(_._1).map { case (q, size) =>
      s"""<tr><td><a href="/console/enqueued/queue/${esc(q)}">${esc(q)}</a></td>
         |<td class="num">$size</td></tr>""".stripMargin
    }.mkString
    layout("Enqueued",
      s"""<h1>Enqueued queues</h1>
         |<table><tr><th>queue</th><th>size</th></tr>$rows</table>""".stripMargin)
  }

  private def queuePage(q: String, pg: Int, p: Map[String, String]): String = {
    val f = ConsoleFilters.validate(p, ConsoleFilters.EnqueuedTypes)
    val jobs =
      if (f.isFilter) ConsoleFilters.enqueued(api, q, f)
      else if (f.isPlainPage) api.enqueuedPage(q, pg)
      else Nil
    layout(s"Enqueued — $q",
      s"""<h1>Queue <code>${esc(q)}</code></h1>
         |<p class="muted">${api.enqueuedSize(q)} jobs</p>
         |${filterForm(s"/console/enqueued/queue/${esc(q)}",
            ConsoleFilters.EnqueuedTypes, p)}
         |${btnForm(s"enqueued/queue/$q", "Purge queue", delete = true, danger = true)}
         |${jobTable(jobs, j =>
            btnForm(s"enqueued/queue/$q/job/${j.id}", "Prioritise") +
            btnForm(s"enqueued/queue/$q/job/${j.id}", "Delete", delete = true, danger = true))}
         |${if (f.isPlainPage) pager(s"/console/enqueued/queue/${esc(q)}", pg) else ""}""".stripMargin)
  }

  private def jobsPage(title: String, pg: Int, slug: String,
      p: Map[String, String]): String = {
    val allowed = if (slug == "scheduled") ConsoleFilters.ScheduledTypes
                  else ConsoleFilters.DeadTypes
    val f = ConsoleFilters.validate(p, allowed)
    val total = if (slug == "scheduled") api.scheduledSize() else api.deadSize()
    val jobs =
      if (f.isFilter) {
        if (slug == "scheduled") ConsoleFilters.scheduled(api, f)
        else ConsoleFilters.dead(api, f)
      }
      else if (f.isPlainPage) {
        if (slug == "scheduled") api.scheduledPage(pg) else api.deadPage(pg)
      }
      else Nil
    // Per-row verbs per collection, mirroring the reference pages:
    // scheduled.clj:78 prioritise/delete; dead.clj:89 replay/delete.
    val rowActions: Job => String = slug match {
      case "scheduled" => j =>
        btnForm(s"scheduled/job/${j.id}", "Prioritise") +
        btnForm(s"scheduled/job/${j.id}", "Delete", delete = true, danger = true)
      case "dead" => j =>
        btnForm(s"dead/job/${j.id}", "Replay") +
        btnForm(s"dead/job/${j.id}", "Delete", delete = true, danger = true)
      case _ => _ => ""
    }
    layout(title,
      s"""<h1>$title jobs</h1><p class="muted">$total total</p>
         |${filterForm(s"/console/$slug", allowed, p)}
         |${btnForm(slug, s"Purge all $slug", delete = true, danger = true)}
         |${jobTable(jobs, rowActions)}
         |${if (f.isPlainPage) pager(s"/console/$slug", pg) else ""}""".stripMargin)
  }

  /** The reference's per-page filter header (pages/enqueued.clj
    * filter-header, scheduled.clj, dead.clj): a GET form whose params
    * round-trip through [[ConsoleFilters.validate]] — the identical
    * validation the JSON route applies. */
  private def filterForm(actionUrl: String, allowed: Set[String],
      p: Map[String, String]): String = {
    val cur = p.getOrElse("filter-type", "")
    val opts = allowed.toSeq.sorted.map { t =>
      val sel = if (t == cur) " selected" else ""
      s"""<option value="${esc(t)}"$sel>${esc(t)}</option>"""
    }.mkString
    s"""<form class="filter" method="get" action="$actionUrl">
       |<select name="filter-type">$opts</select>
       |<input type="text" name="filter-value" placeholder="value"
       | value="${esc(p.getOrElse("filter-value", ""))}">
       |<input type="number" name="limit" min="0" size="4"
       | value="${esc(p.getOrElse("limit", ConsoleFilters.DefaultLimit.toString))}">
       |<button type="submit">Filter</button>
       |<a href="$actionUrl">clear</a></form>""".stripMargin
  }

  private def cronPage(): String = {
    val rows = api.cronList().map { e =>
      s"""<tr><td>${esc(e.cronName)}</td><td><code>${esc(e.cronSchedule)}</code></td>
         |<td>${esc(e.timezone)}</td><td>${ts(e.nextRunAt)}</td>
         |<td>${btnForm(s"cron/job/${e.cronName}", "Delete", delete = true, danger = true)}</td></tr>""".stripMargin
    }.mkString
    layout("Cron",
      s"""<h1>Cron schedules</h1>
         |${btnForm("cron", "Purge all cron", delete = true, danger = true)}
         |<table><tr><th>name</th><th>schedule</th><th>timezone</th>
         |<th>next run</th><th>actions</th></tr>$rows</table>""".stripMargin)
  }

  private def batchPage(id: String): String =
    tracker.progressOf(id) match {
      case None => layout("Batch", s"<h1>Batch</h1><p>no batch ${esc(id)}</p>")
      case Some(prog) =>
        val rows = Seq(
          "status" -> esc(prog.status), "total" -> prog.total.toString,
          "enqueued" -> prog.enqueuedCount.toString,
          "success" -> prog.succeeded.size.toString,
          "retrying" -> prog.retrying.size.toString,
          "dead" -> prog.dead.size.toString)
          .map { case (k, v) => s"<tr><th>$k</th><td>$v</td></tr>" }.mkString
        layout(s"Batch $id",
          s"""<h1>Batch <code>${esc(id)}</code></h1><table>$rows</table>
             |${btnForm(s"batch/job/$id", "Delete batch", delete = true, danger = true)}""".stripMargin)
    }

  // ---------- rendering helpers ----------

  private def jobTable(jobs: Seq[Job], rowActions: Job => String = _ => ""): String = {
    val rows = jobs.map { j =>
      val when = j.scheduleRunAt.map(ts).getOrElse(ts(j.enqueuedAt))
      val err = j.state.map(s => esc(s.error)).getOrElse("")
      s"""<tr><td><code>${esc(j.id)}</code></td><td>${esc(j.executeFnSym)}</td>
         |<td><code>${esc(j.argsJson)}</code></td><td>${esc(j.queue)}</td>
         |<td>$when</td><td>${j.state.map(_.retryCount).getOrElse(0)}</td>
         |<td class="err">$err</td><td class="acts">${rowActions(j)}</td></tr>""".stripMargin
    }.mkString
    s"""<table><tr><th>id</th><th>fn</th><th>args</th><th>queue</th>
       |<th>at</th><th>retries</th><th>error</th><th>actions</th></tr>$rows</table>""".stripMargin
  }

  /** One action as a self-contained POST form (reference embeds a form
    * per verb the same way, with `_method` carrying the override —
    * console.clj:97-105). `path` is the route-relative action path; its
    * segments are URL-encoded here so ids containing '/'/'?'/'#' cannot
    * escape the route shape. */
  private def btnForm(path: String, label: String,
      delete: Boolean = false, danger: Boolean = false): String = {
    val encPath = path.split('/').map(seg =>
      java.net.URLEncoder.encode(seg, "UTF-8").replace("+", "%20")).mkString("/")
    val hidden =
      if (delete) """<input type="hidden" name="_method" value="delete">""" else ""
    val cls = if (danger) " class=\"danger\"" else ""
    s"""<form class="act" method="post" action="/console/${esc(encPath)}">$hidden
       |<button$cls type="submit">${esc(label)}</button></form>""".stripMargin
  }

  private def pager(base: String, pg: Int): String = {
    val prev = if (pg > 0) s"""<a href="$base?page=${pg - 1}">&laquo; prev</a>""" else ""
    s"""<div class="pager">$prev <span>page $pg</span>
       |<a href="$base?page=${pg + 1}">next &raquo;</a></div>""".stripMargin
  }

  private def ts(ms: Long): String =
    java.time.Instant.ofEpochMilli(ms).toString

  /** HTML-escape untrusted strings (job args/errors/queue names). */
  private def esc(s: String): String = s.flatMap {
    case '&' => "&amp;"
    case '<' => "&lt;"
    case '>' => "&gt;"
    case '"' => "&quot;"
    case '\'' => "&#39;"
    case c => c.toString
  }

  private def layout(title: String, body: String): String = {
    val nav = Seq("" -> "Home", "enqueued" -> "Enqueued",
      "scheduled" -> "Scheduled", "dead" -> "Dead", "cron" -> "Cron")
      .map { case (slug, label) =>
        s"""<a href="/console/$slug">$label</a>"""
      }.mkString(" ")
    s"""<!DOCTYPE html>
       |<html lang="en"><head><meta charset="utf-8">
       |<title>${esc(title)} · graft</title>
       |<style>
       |body{font-family:system-ui,sans-serif;margin:2rem;color:#222}
       |nav{margin-bottom:1.5rem}nav a{margin-right:1rem;text-decoration:none}
       |table{border-collapse:collapse;width:100%}
       |th,td{border:1px solid #ddd;padding:.4rem .6rem;text-align:left;font-size:.9rem}
       |th{background:#f5f5f5}.num{text-align:right}
       |.tiles{display:flex;gap:1rem}.tile a{display:block;padding:1rem 1.5rem;
       |border:1px solid #ddd;border-radius:6px;text-decoration:none;color:inherit}
       |.tile .n{display:block;font-size:1.6rem;font-weight:600}
       |.muted{color:#777}.err{color:#a00;max-width:24rem;overflow-wrap:anywhere}
       |.pager{margin-top:1rem}code{background:#f5f5f5;padding:0 .2rem}
       |form.act{display:inline-block;margin:0 .2rem 0 0}
       |form.filter{margin:.5rem 0}form.filter input,form.filter select{
       |font-size:.85rem;padding:.15rem .3rem}form.filter a{margin-left:.5rem}
       |form.act button{font-size:.8rem;padding:.15rem .5rem;cursor:pointer}
       |form.act button.danger{color:#a00;border-color:#a00}
       |.acts{white-space:nowrap}
       |</style></head>
       |<body><nav>$nav</nav>$body</body></html>""".stripMargin
  }
}
