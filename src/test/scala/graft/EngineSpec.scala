package graft

import java.time.Instant
import java.util.concurrent.atomic.{AtomicInteger, AtomicReference}
import graft.api.ManagementApi
import graft.backend.ParquetBackend
import graft.client.GraftClient
import graft.model._
import graft.worker.{BatchTracker, SchedulerEngine, WorkerEngine}

/** Test job functions — registered process-wide, the analog of goose's
  * resolvable test vars (test/goose/test_utils.clj). Counters let specs
  * assert execution counts like the reference integration tests
  * (redis/integration_test.clj:171-188). */
object TestFns {
  val calls = new AtomicInteger(0)
  val lastArgs = new AtomicReference[Seq[Any]](Nil)
  val failuresRemaining = new AtomicInteger(0)

  def reset(): Unit = { calls.set(0); lastArgs.set(Nil); failuresRemaining.set(0) }

  JobRegistry.register("ok", args => { calls.incrementAndGet(); lastArgs.set(args); "done" })
  JobRegistry.register("boom", _ => { calls.incrementAndGet(); throw new RuntimeException("boom") })
  JobRegistry.register("flaky", _ => {
    calls.incrementAndGet()
    if (failuresRemaining.getAndDecrement() > 0) throw new RuntimeException("flaky")
    "recovered"
  })
  JobRegistry.registerBackoff("instant", _ => 0) // due immediately
}

/** End-to-end engine lifecycle specs, mirroring the reference integration
  * suite (redis/integration_test.clj) on the parquet-log backend. */
class EngineSpec extends SparkSpec {

  private def fixture(now0: Long = 1700000000000L) = {
    TestFns.reset()
    val clock = new java.util.concurrent.atomic.AtomicLong(now0)
    val nowFn = () => clock.get()
    val backend = new ParquetBackend(spark, tmpDir("graft-engine"))
    val retry = RetryOpts(maxRetries = 1, retryDelaySecFn = "instant")
    val client = new GraftClient(backend, spark, "test", retry, nowFn)
    val worker = new WorkerEngine(backend, spark, Nil, nowFn)
    val sched = new SchedulerEngine(backend, spark, nowFn)
    val api = new ManagementApi(backend, spark)
    (backend, client, worker, sched, api, clock)
  }

  test("perform-async → execute → completion (integration_test async)") {
    val (backend, client, worker, _, api, _) = fixture()
    val id = client.performAsync("ok", "foobar", 42L)
    assert(api.enqueuedSize("test") == 1)

    val stats = worker.runPass()
    assert(stats == worker.PassStats(1, 1, 0, 0))
    assert(TestFns.calls.get() == 1)
    assert(TestFns.lastArgs.get() == Seq("foobar", 42L))
    assert(api.enqueuedSize("test") == 0) // consumed
    val comp = backend.completions.collect()
    assert(comp.length == 1 && comp.head.jobId == id &&
      comp.head.terminalState == "success" && comp.head.attempt == 0)
  }

  test("failure → retry scheduled → promoted → recovers (integration_test retry)") {
    val (backend, client, worker, sched, api, clock) = fixture()
    TestFns.failuresRemaining.set(1)
    client.performAsync("flaky")

    assert(worker.runPass().retried == 1)
    assert(api.enqueuedSize("test") == 0)
    assert(api.scheduledSize() == 1)
    val st = api.scheduledPage(0).head.state.get
    assert(st.retryCount == 0 && st.error.contains("flaky"))

    clock.addAndGet(1000) // backoff "instant" = 0 sec → due
    assert(sched.promoteDue() == 1)
    assert(api.scheduledSize() == 0)
    assert(api.enqueuedSize("test") == 1)
    assert(api.enqueuedPage("test", 0).head.priority == 1) // front of queue

    assert(worker.runPass().succeeded == 1)
    assert(TestFns.calls.get() == 2) // executed exactly twice
    assert(api.enqueuedSize("test") == 0)
  }

  test("retries exhausted → death (integration_test death, execution-count)") {
    val (backend, client, worker, sched, api, clock) = fixture()
    client.performAsync("boom")

    assert(worker.runPass().retried == 1) // attempt 0 fails, 1 retry allowed
    clock.addAndGet(1000)
    sched.promoteDue()
    val stats2 = worker.runPass()
    assert(stats2.died == 1)
    assert(TestFns.calls.get() == 2) // maxRetries=1 ⇒ exactly 2 executions
    assert(api.deadSize() == 1)
    val dead = api.deadPage(0).head
    assert(dead.state.get.retryCount == 1 && dead.state.get.diedAt.isDefined)
  }

  test("skip-dead-queue drops the corpse (retry.clj skip-dead-queue)") {
    val (backend, _, worker, sched, api, clock) = fixture()
    val retry = RetryOpts(maxRetries = 0, skipDeadQueue = true)
    val client2 = new GraftClient(backend, spark, "test", retry, () => clock.get())
    client2.performAsync("boom")
    val stats = worker.runPass()
    assert(stats.died == 1)
    assert(api.deadSize() == 0)
  }

  test("per-call opts: two queues with distinct retry policies from one client (client.clj:30-58)") {
    import graft.client.ClientOpts
    val (backend, client, worker, sched, api, clock) = fixture()
    // default queue "test" with default retry (maxRetries=1); second queue
    // "bulk" with no retries at all — the failure must die immediately
    client.performAsync("ok", "hello")
    client.performAsync(
      ClientOpts(queue = Some("bulk"),
        retryOpts = Some(RetryOpts(maxRetries = 0, retryDelaySecFn = "instant"))),
      "boom")
    assert(api.enqueuedSize("test") == 1 && api.enqueuedSize("bulk") == 1)
    val r = worker.runPass()
    assert(r.succeeded == 1 && r.died == 1, "maxRetries=0 override must bury on first failure")
    assert(api.deadSize() == 1)
    assert(backend.deadJobs.collect().head.queue == "bulk")

    // the default-retry queue still retries: enqueue a failer with defaults
    client.performAsync("boom")
    assert(worker.runPass().retried == 1)
    clock.addAndGet(1000)
    sched.promoteDue()
    assert(worker.runPass().died == 1)
  }

  test("queue-scoped workers consume only their queue (worker.clj:27,43 fleet shape)") {
    import graft.client.ClientOpts
    val (backend, client, _, _, api, clock) = fixture()
    client.performAsync("ok", "for-default")
    client.performAsync(ClientOpts.queue("bulk"), "ok", "for-bulk")

    val wDefault = new WorkerEngine(backend, spark, Nil, () => clock.get(), queue = Some("test"))
    val wBulk = new WorkerEngine(backend, spark, Nil, () => clock.get(), queue = Some("bulk"))

    assert(wDefault.runPass().executed == 1)
    assert(api.enqueuedSize("bulk") == 1, "scoped worker must not touch the other queue")
    assert(api.enqueuedSize("test") == 0)
    assert(wBulk.runPass().executed == 1)
    assert(api.enqueuedSize("bulk") == 0)
    assert(wDefault.runPass().executed == 0) // nothing left in scope
  }

  test("perform-at past-due goes straight to front (scheduler.clj:12-20)") {
    val (_, client, worker, _, api, clock) = fixture()
    client.performAt(Instant.ofEpochMilli(clock.get() - 5000), "ok")
    assert(api.enqueuedSize("test") == 1)
    assert(api.enqueuedPage("test", 0).head.priority == 1)
    assert(api.scheduledSize() == 0)
  }

  test("perform-in-sec future stays scheduled until due") {
    val (_, client, worker, sched, api, clock) = fixture()
    client.performInSec(60, "ok")
    assert(api.scheduledSize() == 1)
    assert(sched.promoteDue() == 0) // not due yet
    clock.addAndGet(61000)
    assert(sched.promoteDue() == 1)
    assert(worker.runPass().succeeded == 1)
  }

  test("custom retry queue routes the retry (integration_test :106-154)") {
    val (backend, _, worker, sched, api, clock) = fixture()
    val retry = RetryOpts(maxRetries = 1, retryDelaySecFn = "instant",
      retryQueue = Some("retry-q"))
    val client2 = new GraftClient(backend, spark, "test", retry, () => clock.get())
    TestFns.failuresRemaining.set(1)
    client2.performAsync("flaky")
    worker.runPass()
    clock.addAndGet(1000)
    sched.promoteDue()
    assert(api.enqueuedSize("retry-q") == 1)
    assert(api.enqueuedSize("test") == 0)
    assert(worker.runPass().succeeded == 1)
  }

  test("middleware compose around execution (worker.clj:46-55)") {
    val (backend, client, _, _, _, clock) = fixture()
    val order = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    MiddlewareProbe.order = order
    val worker2 = new WorkerEngine(backend, spark,
      Seq(MiddlewareProbe.outer, MiddlewareProbe.inner), () => clock.get())
    client.performAsync("ok")
    worker2.runPass()
    assert(order.toArray.toSeq == Seq("outer-pre", "inner-pre", "inner-post", "outer-post"))
  }

  test("cron: fireCron enforces the driver-side registry bound loudly") {
    val (backend, client, _, _, _, clock) = fixture(
      Instant.parse("2024-01-01T00:00:30Z").toEpochMilli)
    (1 to 3).foreach(i =>
      client.performEveryTz(s"tick-$i", "* * * * *", "UTC", "ok"))
    clock.set(Instant.parse("2024-01-01T00:02:10Z").toEpochMilli)
    val capped = new SchedulerEngine(backend, spark, () => clock.get(),
      maxCronEntries = 2)
    val e = intercept[IllegalStateException](capped.fireCron())
    assert(e.getMessage.contains("registry bound"))
    // under the default envelope the same registry fires fine
    val ok = new SchedulerEngine(backend, spark, () => clock.get())
    assert(ok.fireCron() == 3)
  }

  test("cron: register, fire when due, advance next-run (cron integration)") {
    val (backend, client, worker, sched, api, clock) = fixture(
      Instant.parse("2024-01-01T00:00:30Z").toEpochMilli)
    client.performEveryTz("tick", "*/3 * * * *", "UTC", "ok", "from-cron")
    assert(api.cronList().map(_.cronName) == Seq("tick"))
    assert(sched.fireCron() == 0) // next fire 00:03, not due

    clock.set(Instant.parse("2024-01-01T00:03:10Z").toEpochMilli)
    assert(sched.fireCron() == 1)
    assert(sched.fireCron() == 0) // advanced, not due again
    assert(api.enqueuedSize("test") == 1)
    assert(worker.runPass().succeeded == 1)
    assert(TestFns.lastArgs.get() == Seq("from-cron"))
    val entry = api.cronFind("tick").get
    assert(entry.nextRunAt == Instant.parse("2024-01-01T00:06:00Z").toEpochMilli)
    // the materialized job carried cron-run-at = the honored fire time
    val comp = backend.completions.collect().head
    val ready = backend.readyJobs.count() // consumed
    assert(ready == 0)
  }

  test("cron: a crash-replayed fire collapses via deterministic job ids") {
    val (backend, client, worker, sched, api, clock) = fixture(
      Instant.parse("2024-01-01T00:00:30Z").toEpochMilli)
    client.performEveryTz("tick", "*/3 * * * *", "UTC", "ok")
    clock.set(Instant.parse("2024-01-01T00:03:10Z").toEpochMilli)
    assert(sched.fireCron() == 1)
    // crash window: the enqueue landed but the next-run advance did not —
    // restore the pre-advance registry row and fire again (this also
    // models a second accidental maintenance runner racing the same
    // tick). The replay instantiates the SAME name@fire-time job id, so
    // the visibility fold's latest-(id, attempt) rank keeps exactly one.
    val advanced = api.cronFind("tick").get
    backend.upsertCron(Seq(advanced.copy(
      nextRunAt = Instant.parse("2024-01-01T00:03:00Z").toEpochMilli)))
    assert(sched.fireCron() == 1, "the replayed tick re-fires (it IS due again)")
    assert(backend.readyJobs.count() == 1,
      "replayed fire is the same job id — one visible job, not two")
    assert(worker.runPass().succeeded == 1)
    assert(worker.runPass().succeeded == 0, "nothing left to double-execute")
  }

  test("cron registration is idempotent by name (redis/cron.clj:38-50)") {
    val (_, client, _, _, api, _) = fixture()
    client.performEveryTz("job-a", "0 * * * *", "UTC", "ok")
    client.performEveryTz("job-a", "30 * * * *", "UTC", "ok")
    val entries = api.cronList()
    assert(entries.length == 1 && entries.head.cronSchedule == "30 * * * *")
    api.cronDelete(Seq("job-a"))
    assert(api.cronList().isEmpty)
  }
}

object MiddlewareProbe {
  @volatile var order: java.util.concurrent.ConcurrentLinkedQueue[String] = _
  val outer: graft.worker.WorkerCore.Middleware = next => job => {
    order.add("outer-pre"); val r = next(job); order.add("outer-post"); r
  }
  val inner: graft.worker.WorkerCore.Middleware = next => job => {
    order.add("inner-pre"); val r = next(job); order.add("inner-post"); r
  }
}
