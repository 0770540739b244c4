package graft

import java.time.Instant
import graft.api.{ConsoleRequest, ConsoleRoutes}
import graft.backend.ParquetBackend
import graft.client.GraftClient
import graft.model._
import graft.worker.{SchedulerEngine, WorkerEngine}

/** Console route table driven end-to-end, mirroring the action-per-route
  * contract of the reference console handlers (redis/console.clj:11-48;
  * handler tests under test/goose/brokers/redis/console/). */
class ConsoleRoutesSpec extends SparkSpec {

  private def fixture() = {
    TestFns.reset()
    val clock = new java.util.concurrent.atomic.AtomicLong(1700000000000L)
    val backend = new ParquetBackend(spark, tmpDir("graft-console"))
    val retry = RetryOpts(maxRetries = 1, retryDelaySecFn = "instant")
    val client = new GraftClient(backend, spark, "test", retry, () => clock.get())
    val worker = new WorkerEngine(backend, spark, Nil, () => clock.get())
    val sched = new SchedulerEngine(backend, spark, () => clock.get())
    val routes = new ConsoleRoutes(backend, spark)
    (backend, client, worker, sched, routes, clock)
  }

  private def get(r: ConsoleRoutes, path: String, params: (String, String)*) =
    r.handle(ConsoleRequest("GET", path, params.toMap))
  private def post(r: ConsoleRoutes, path: String, params: (String, String)*) =
    r.handle(ConsoleRequest("POST", path, params.toMap))
  private def delete(r: ConsoleRoutes, path: String, params: (String, String)*) =
    r.handle(ConsoleRequest("DELETE", path, params.toMap))

  test("home, enqueued pages, job detail, prioritise, delete, purge") {
    val (_, client, _, _, routes, _) = fixture()
    val id1 = client.performAsync("ok", "a")
    val id2 = client.performAsync("ok", "b")

    assert(get(routes, "/").status == 200)
    assert(get(routes, "/").body.contains("\"enqueued\":2"))
    assert(get(routes, "/enqueued").body.contains("\"test\""))

    val pageBody = get(routes, "/enqueued/queue/test", "page" -> "0").body
    assert(pageBody.contains("\"total\":2") && pageBody.contains(id1))

    val detail = get(routes, s"/enqueued/queue/test/job/$id1")
    assert(detail.status == 200 && detail.body.contains("\"args\""))
    assert(get(routes, "/enqueued/queue/test/job/nope").status == 404)

    assert(post(routes, s"/enqueued/queue/test/job/$id2").body
      .contains("\"prioritised\":1"))
    assert(delete(routes, "/enqueued/queue/test/jobs", "ids" -> s"$id1,$id2").body
      .contains("\"deleted\":2"))
    client.performAsync("ok", "c")
    assert(delete(routes, "/enqueued/queue/test").status == 200)
    assert(get(routes, "/").body.contains("\"enqueued\":0"))
  }

  test("scheduled page and prioritise; dead replay and purge") {
    val (_, client, worker, sched, routes, clock) = fixture()
    client.performAt(Instant.ofEpochMilli(clock.get() + 60000), "ok", "later")
    val schedBody = get(routes, "/scheduled").body
    assert(schedBody.contains("\"total\":1") && schedBody.contains("schedule_run_at"))

    val sid = client.performAt(Instant.ofEpochMilli(clock.get() + 90000), "ok")
    assert(post(routes, s"/scheduled/job/$sid").body.contains("\"prioritised\":1"))

    // bury one
    client.performAsync("boom")
    worker.runPass(); clock.addAndGet(1000); sched.promoteDue(); worker.runPass()
    assert(get(routes, "/dead").body.contains("\"total\":1"))
    val deadId = get(routes, "/dead").body.split("\"id\":\"")(1).takeWhile(_ != '"')
    assert(post(routes, s"/dead/job/$deadId").body.contains("replayed"))
    assert(get(routes, "/dead").body.contains("\"total\":0"))
    assert(delete(routes, "/dead").status == 200)
  }

  test("cron routes and batch progress route") {
    val (_, client, worker, _, routes, _) = fixture()
    client.performEveryTz("tick", "*/5 * * * *", "UTC", "ok")
    assert(get(routes, "/cron").body.contains("\"tick\""))
    assert(get(routes, "/cron/job/tick").body.contains("*/5 * * * *"))
    assert(get(routes, "/cron/job/nope").status == 404)

    val bid = client.performBatch(Seq(("ok", Seq[Any]("x"))), "ok")
    val pending = get(routes, "/batch", "id" -> bid).body
    assert(pending.contains("\"status\":\"in-progress\"") && pending.contains("\"total\":1"))
    worker.runPass()
    assert(get(routes, "/batch", "id" -> bid).body.contains("\"success\":1"))

    assert(delete(routes, s"/batch/job/$bid").status == 200)
    assert(get(routes, "/batch", "id" -> bid).status == 404)

    assert(delete(routes, "/cron/job/tick").status == 200)
    assert(get(routes, "/cron").body == "[]")
    assert(get(routes, "/nonsense").status == 404)
  }

  test("ConsoleServer serves the same route table over live HTTP") {
    val (backend, client, worker, _, routes, _) = fixture()
    client.performAsync("ok", "a")
    client.performAsync("ok", "b")
    val srv = new graft.api.ConsoleServer(backend, spark)
    val port = srv.start()
    try {
      val http = java.net.http.HttpClient.newHttpClient()
      def send(method: String, pathAndQuery: String) = {
        val req = java.net.http.HttpRequest
          .newBuilder(java.net.URI.create(s"http://127.0.0.1:$port$pathAndQuery"))
          .method(method, java.net.http.HttpRequest.BodyPublishers.noBody())
          .build()
        http.send(req, java.net.http.HttpResponse.BodyHandlers.ofString())
      }
      // wire body ≡ the pure handler's body, route by route
      val home = send("GET", "/")
      assert(home.statusCode() == 200)
      assert(home.body() == get(routes, "/").body)
      assert(home.headers().firstValue("Content-Type").get.startsWith("application/json"))
      val page = send("GET", "/enqueued/queue/test?page=0")
      assert(page.statusCode() == 200 && page.body().contains("\"total\":2"))
      assert(page.body() == get(routes, "/enqueued/queue/test", "page" -> "0").body)
      assert(send("GET", "/enqueued/queue/test/job/nope").statusCode() == 404)
      // a mutating action over the wire is visible to the engine
      worker.runPass() // drain so the purge below counts from a known state
      client.performAsync("ok", "c")
      assert(send("DELETE", "/enqueued/queue/test").statusCode() == 200)
      assert(get(routes, "/").body.contains("\"enqueued\":0"))
      assert(send("GET", "/nonsense").statusCode() == 404)
      // bad numeric param → handler's 400 contract over the wire
      assert(send("GET", "/enqueued/queue/test?page=zap").statusCode() == 400)
    } finally srv.stop()
  }

  test("ConsoleServer renders HTML pages under /console alongside JSON") {
    val (backend, client, worker, sched, _, clock) = fixture()
    // bury one for the dead page FIRST — the passes drain the ready queue
    client.performAsync("boom")
    worker.runPass(); clock.addAndGet(1000); sched.promoteDue(); worker.runPass()
    // then the display jobs the pages render
    client.performAsync("ok", "<b>xss</b>")
    client.performAsync("ok", "b")
    client.performAt(java.time.Instant.ofEpochMilli(clock.get() + 60000), "ok")
    client.performEveryTz("tick", "*/5 * * * *", "UTC", "ok")
    val srv = new graft.api.ConsoleServer(backend, spark)
    val port = srv.start()
    try {
      val http = java.net.http.HttpClient.newHttpClient()
      def page(pathAndQuery: String) = {
        val req = java.net.http.HttpRequest
          .newBuilder(java.net.URI.create(s"http://127.0.0.1:$port$pathAndQuery"))
          .GET().build()
        http.send(req, java.net.http.HttpResponse.BodyHandlers.ofString())
      }
      val home = page("/console")
      assert(home.statusCode() == 200)
      assert(home.headers().firstValue("Content-Type").get.startsWith("text/html"))
      assert(home.body().startsWith("<!DOCTYPE html>"))
      assert(home.body().contains("graft console"))
      val queues = page("/console/enqueued")
      assert(queues.statusCode() == 200 && queues.body().contains("/console/enqueued/queue/test"))
      val q = page("/console/enqueued/queue/test?page=0")
      assert(q.statusCode() == 200 && q.body().contains("ok"))
      // untrusted args are HTML-escaped, never raw markup
      assert(q.body().contains("&lt;b&gt;xss&lt;/b&gt;") && !q.body().contains("<b>xss</b>"))
      val sched0 = page("/console/scheduled")
      assert(sched0.statusCode() == 200 && sched0.body().contains("Scheduled jobs"))
      val dead = page("/console/dead")
      assert(dead.statusCode() == 200 && dead.body().contains("1 total"))
      val cron = page("/console/cron")
      assert(cron.statusCode() == 200 && cron.body().contains("*/5 * * * *"))
      assert(page("/console/nope").statusCode() == 404)
      // JSON tree is untouched beside the HTML one
      assert(page("/enqueued").headers().firstValue("Content-Type").get
        .startsWith("application/json"))
    } finally srv.stop()
  }

  test("console HTML action forms round-trip per collection (POST + _method)") {
    val (backend, client, worker, sched, routes, clock) = fixture()
    // dead job first (the worker passes drain the ready queue)
    client.performAsync("boom")
    worker.runPass(); clock.addAndGet(1000); sched.promoteDue(); worker.runPass()
    val id1 = client.performAsync("ok", "a")
    client.performAsync("ok", "b")
    val sid = client.performAt(Instant.ofEpochMilli(clock.get() + 60000), "ok")
    client.performEveryTz("tick", "*/5 * * * *", "UTC", "ok")
    val bid = client.performBatch(Seq(("ok", Seq[Any]("x"))), "ok")
    val srv = new graft.api.ConsoleServer(backend, spark)
    val port = srv.start()
    try {
      val http = java.net.http.HttpClient.newBuilder()
        .followRedirects(java.net.http.HttpClient.Redirect.NEVER).build()
      def get(path: String) = http.send(
        java.net.http.HttpRequest.newBuilder(
          java.net.URI.create(s"http://127.0.0.1:$port$path")).GET().build(),
        java.net.http.HttpResponse.BodyHandlers.ofString())
      def postForm(path: String, form: String) = http.send(
        java.net.http.HttpRequest.newBuilder(
          java.net.URI.create(s"http://127.0.0.1:$port$path"))
          .header("Content-Type", "application/x-www-form-urlencoded")
          .POST(java.net.http.HttpRequest.BodyPublishers.ofString(form)).build(),
        java.net.http.HttpResponse.BodyHandlers.ofString())

      // the rendered pages embed the forms this test submits
      assert(get("/console/enqueued/queue/test").body().contains("_method"))
      assert(get("/console/dead").body().contains(s"""action="/console/dead/job/"""))

      // enqueued: per-row prioritise (plain POST), per-row delete, then purge
      val pr = postForm(s"/console/enqueued/queue/test/job/$id1", "")
      assert(pr.statusCode() == 303)
      assert(pr.headers().firstValue("Location").get == "/console/enqueued/queue/test")
      val del = postForm(s"/console/enqueued/queue/test/job/$id1", "_method=delete")
      assert(del.statusCode() == 303)
      assert(!get("/console/enqueued/queue/test").body().contains(id1))
      assert(postForm("/console/enqueued/queue/test", "_method=delete").statusCode() == 303)
      assert(get("/").body().contains("\"enqueued\":0"))

      // scheduled: prioritise moves the job to the ready queue
      assert(postForm(s"/console/scheduled/job/$sid", "").statusCode() == 303)
      assert(get("/console/scheduled").body().contains("0 total"))

      // dead: replay (plain POST) then purge
      val deadHtml = get("/console/dead").body()
      val deadId = deadHtml.split("""dead/job/""")(1).takeWhile(_ != '"')
      assert(postForm(s"/console/dead/job/$deadId", "").statusCode() == 303)
      assert(get("/console/dead").body().contains("0 total"))
      assert(postForm("/console/dead", "_method=delete").statusCode() == 303)

      // cron: per-row delete
      assert(get("/console/cron").body().contains("tick"))
      assert(postForm("/console/cron/job/tick", "_method=delete").statusCode() == 303)
      assert(!get("/console/cron").body().contains("tick"))

      // batch: delete lands back on home
      worker.runPass()
      val bdel = postForm(s"/console/batch/job/$bid", "_method=delete")
      assert(bdel.statusCode() == 303)
      assert(bdel.headers().firstValue("Location").get == "/console/")
      assert(get(s"/console/batch?id=$bid").body().contains("no batch"))

      // a failed action renders an HTML error at the handler's status
      val bad = postForm("/console/enqueued/queue/test/job/nope", "_method=delete")
      assert(bad.statusCode() == 200 || bad.statusCode() == 303 || bad.statusCode() == 404)
    } finally srv.stop()
  }

  test("page filters mirror data.clj semantics per collection") {
    val (backend, client, worker, sched, routes, clock) = fixture()

    // one dead job (two failed attempts), then one failed-but-ready job
    client.performAsync("boom")
    worker.runPass(); clock.addAndGet(1000); sched.promoteDue(); worker.runPass()
    client.performAsync("boom")
    worker.runPass(); clock.addAndGet(1000); sched.promoteDue()
    // fresh unexecuted jobs on the ready queue
    val idA = client.performAsync("ok", "a")
    client.performAsync("ok", "b")
    val sid = client.performAt(Instant.ofEpochMilli(clock.get() + 60000), "ok")

    def jobsOf(body: String): Int =
      body.split(java.util.regex.Pattern.quote("\"id\":\""), -1).length - 1

    // --- enqueued (data.clj:30-47; specs: id | execute-fn-sym | type) ---
    val byId = get(routes, "/enqueued/queue/test",
      "filter-type" -> "id", "filter-value" -> idA).body
    assert(byId.contains(idA) && jobsOf(byId) == 1 && !byId.contains("\"total\""),
      "id filter returns exactly the one job, no pagination total")
    val badUuid = get(routes, "/enqueued/queue/test",
      "filter-type" -> "id", "filter-value" -> "abcd").body
    assert(badUuid.contains("\"jobs\":[]"),
      "invalid filter-value renders an empty list, not an error")
    val bySym = get(routes, "/enqueued/queue/test",
      "filter-type" -> "execute-fn-sym", "filter-value" -> "ok").body
    assert(bySym.contains(idA) && !bySym.contains("boom"))
    val failed = get(routes, "/enqueued/queue/test",
      "filter-type" -> "type", "filter-value" -> "failed").body
    assert(failed.contains("boom") && !failed.contains(idA),
      "type=failed finds the retried job on the ready queue")
    val unexec = get(routes, "/enqueued/queue/test",
      "filter-type" -> "type", "filter-value" -> "unexecuted").body
    assert(unexec.contains(idA) && !unexec.contains("boom"))
    // "scheduled" validates globally but the enqueued page doesn't
    // dispatch it (the reference's nil case) → empty list
    assert(get(routes, "/enqueued/queue/test",
      "filter-type" -> "type", "filter-value" -> "scheduled").body
      .contains("\"jobs\":[]"))
    // unknown filter-type validates to nil on BOTH params → plain page
    val fallback = get(routes, "/enqueued/queue/test",
      "filter-type" -> "bogus", "filter-value" -> "x").body
    assert(fallback.contains("\"total\""), "invalid type falls back to pagination")
    val limited = get(routes, "/enqueued/queue/test",
      "filter-type" -> "execute-fn-sym", "filter-value" -> "ok",
      "limit" -> "1").body
    assert(jobsOf(limited) == 1, "limit caps find-by-pattern")

    // --- scheduled (adds queue; type dispatches failed|scheduled) ---
    val schedQ = get(routes, "/scheduled",
      "filter-type" -> "queue", "filter-value" -> "test").body
    assert(schedQ.contains(sid))
    assert(get(routes, "/scheduled",
      "filter-type" -> "queue", "filter-value" -> "nope").body
      .contains("\"jobs\":[]"))
    assert(get(routes, "/scheduled",
      "filter-type" -> "type", "filter-value" -> "scheduled").body.contains(sid))

    // --- dead (id | execute-fn-sym | queue) ---
    val deadSym = get(routes, "/dead",
      "filter-type" -> "execute-fn-sym", "filter-value" -> "boom").body
    assert(deadSym.contains("boom") && jobsOf(deadSym) == 1)
    val deadId = deadSym.split("\"id\":\"")(1).takeWhile(_ != '"')
    assert(get(routes, "/dead",
      "filter-type" -> "id", "filter-value" -> deadId).body.contains(deadId))
    assert(get(routes, "/dead",
      "filter-type" -> "queue", "filter-value" -> "other").body
      .contains("\"jobs\":[]"))

    // --- the HTML pages run the SAME validated filter ---
    val html = new graft.api.ConsoleHtml(backend, spark)
    val htmlFiltered = html.handle(ConsoleRequest("GET", "enqueued/queue/test",
      Map("filter-type" -> "execute-fn-sym", "filter-value" -> "ok"))).get.body
    assert(htmlFiltered.contains("form class=\"filter\"") &&
      htmlFiltered.contains(idA) && !htmlFiltered.contains("boom"))
    val htmlDead = html.handle(ConsoleRequest("GET", "dead",
      Map("filter-type" -> "queue", "filter-value" -> "test"))).get.body
    assert(htmlDead.contains(deadId))

    // --- Live poll (reference 0.5.3): ?poll=N meta-refreshes the page,
    // the nav toggle flips it preserving other params, interval clamps
    // to the reference slider's 2-10 s range ---
    val off = html.handle(ConsoleRequest("GET", "dead", Map.empty)).get.body
    assert(!off.contains("http-equiv") && off.contains("Live poll") &&
      off.contains("?poll=2"))
    val on = html.handle(ConsoleRequest("GET", "dead", Map("poll" -> "3"))).get.body
    assert(on.contains("""<meta http-equiv="refresh" content="3">"""))
    assert(on.contains("Stop poll (3s)"))
    val clamped = html.handle(ConsoleRequest("GET", "dead",
      Map("poll" -> "999"))).get.body
    assert(clamped.contains("""content="10""""))
    val withParams = html.handle(ConsoleRequest("GET", "dead",
      Map("poll" -> "2", "page" -> "1"))).get.body
    assert(withParams.contains("page=1") && withParams.contains("Stop poll"))
  }
}
