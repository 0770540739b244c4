package graft

import graft.api.ManagementApi
import graft.backend.ParquetBackend
import graft.client.GraftClient
import graft.metrics.{InMemoryMetrics, Metrics}
import graft.model._
import graft.worker.GraftWorker

/** Composite-worker spec (D15/D14 + metrics A4-A6): the full process —
  * streaming consumer + maintenance tick — driving async jobs, retries,
  * cron and batches to completion, then stopping gracefully. */
class GraftWorkerSpec extends SparkSpec {

  test("composite worker drains async + retry + batch and publishes metrics") {
    TestFns.reset()
    JobRegistry.register("callback", _ => "cb")
    val root = tmpDir("graft-composite")
    val backend = new ParquetBackend(spark, root)
    val sink = new InMemoryMetrics
    val retry = RetryOpts(maxRetries = 1, retryDelaySecFn = "instant")
    val client = new GraftClient(backend, spark, "test", retry)
    val api = new ManagementApi(backend, spark)

    client.performAsync("ok", "a")
    TestFns.failuresRemaining.set(1)
    client.performAsync("flaky")
    client.performBatch(Seq(("ok", Seq[Any]("b1")), ("ok", Seq[Any]("b2"))), "callback")

    val worker = new GraftWorker(backend, spark, root,
      metrics = sink, maintenanceIntervalMs = 100).start()
    try {
      assert(worker.awaitDrained(120000), "worker did not drain")
    } finally worker.stop()

    // async + flaky(×2) + 2 batch jobs + 1 batch callback = 6 executions
    assert(TestFns.calls.get() >= 5)
    assert(api.enqueuedSize("test") == 0)
    assert(api.deadSize() == 0)
    // batch reached terminal success exactly once
    val statuses = backend.batchStatusEvents.collect()
    assert(statuses.map(_.status).toSeq == Seq(BatchStatus.Success))
    // metrics flowed: successes counted per queue, gauges published
    assert(sink.counter(Metrics.SuccessCount + ",queue=test") >= 4)
    assert(sink.counter(Metrics.FailureCount + ",queue=test") == 1)
    assert(sink.counter(Metrics.RecoveredCount + ",queue=test") == 1)
    assert(sink.gauges.containsKey("total_enqueued.size"))
    // heartbeats registered (D9); process alive within TTL, then the
    // stopped worker shows up via the anti-join probe (F9/D10 detection)
    val now = System.currentTimeMillis()
    assert(api.globalWorkersCount(now) == 1)
    assert(api.aliveProcesses(now).map(_.processId) == Seq(worker.processId))
    assert(api.deadProcesses(now + 120000) == Seq(worker.processId))
  }

  test("latency source selection mirrors job.clj:45-61") {
    val base = Job("fn", Nil, "q", RetryOpts())
    val now = base.enqueuedAt + 500
    assert(Metrics.latencyOf(base, now) == (Metrics.ExecutionLatency, 500L))
    val sched = base.copy(scheduleRunAt = Some(base.enqueuedAt + 100))
    assert(Metrics.latencyOf(sched, now) == (Metrics.ScheduleLatency, 400L))
    val cron = base.copy(cronRunAt = Some(base.enqueuedAt + 200))
    assert(Metrics.latencyOf(cron, now) == (Metrics.CronLatency, 300L))
    val retried = sched.copy(state = Some(FailureState("e", 0, 1, None,
      retryAt = Some(base.enqueuedAt + 300), None)))
    assert(Metrics.latencyOf(retried, now) == (Metrics.RetryLatency, 200L))
  }
}
