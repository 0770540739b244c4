package graft

import java.util.concurrent.atomic.AtomicReference
import graft.api.ManagementApi
import graft.backend.ParquetBackend
import graft.client.GraftClient
import graft.model._
import graft.worker.{BatchTracker, SchedulerEngine, WorkerEngine}

/** Batch lifecycle specs — the five paths of the reference integration
  * suite (redis/integration_test.clj:190-286) plus exactly-once callback
  * (ADR batch-jobs.md "race condition"). */
class BatchSpec extends SparkSpec {

  object CB {
    val received = new AtomicReference[Seq[Any]](null)
    JobRegistry.register("callback", args => { received.set(args); "cb-done" })
  }

  private def fixture() = {
    TestFns.reset()
    CB.received.set(null)
    val clock = new java.util.concurrent.atomic.AtomicLong(1700000000000L)
    val nowFn = () => clock.get()
    val backend = new ParquetBackend(spark, tmpDir("graft-batch"))
    val retry = RetryOpts(maxRetries = 1, retryDelaySecFn = "instant")
    val client = new GraftClient(backend, spark, "test", retry, nowFn)
    val worker = new WorkerEngine(backend, spark, Nil, nowFn)
    val sched = new SchedulerEngine(backend, spark, nowFn)
    val tracker = new BatchTracker(backend, spark)
    val api = new ManagementApi(backend, spark)
    (backend, client, worker, sched, tracker, api, clock)
  }

  test("all-success batch → single success callback (integration :220-239)") {
    val (backend, client, worker, _, tracker, _, _) = fixture()
    val bid = client.performBatch(
      (1 to 5).map(i => ("ok", Seq[Any](s"job-$i"))), "callback")
    assert(worker.runPass().succeeded == 5)

    val terminals = tracker.trackPass()
    assert(terminals.map(t => (t.batchId, t.status)) == Seq((bid, BatchStatus.Success)))
    // exactly-once: a second pass emits nothing
    assert(tracker.trackPass().isEmpty)

    // the callback was enqueued at the front and runs as a normal job
    assert(worker.runPass().succeeded == 1)
    assert(CB.received.get() == Seq(bid, BatchStatus.Success))
  }

  test("fail-then-pass stays in-progress across the retry (integration :241-251)") {
    val (backend, client, worker, sched, tracker, _, clock) = fixture()
    TestFns.failuresRemaining.set(1)
    val bid = client.performBatch(Seq(("flaky", Seq[Any]()), ("ok", Seq[Any]())), "callback")
    worker.runPass() // flaky fails → retrying; ok succeeds

    assert(tracker.trackPass().isEmpty) // retrying ⇒ still in-progress
    assert(tracker.progressOf(bid).get.status == BatchStatus.InProgress)

    clock.addAndGet(1000)
    sched.promoteDue()
    worker.runPass() // flaky recovers
    val terminals = tracker.trackPass()
    assert(terminals.map(_.status) == Seq(BatchStatus.Success))
  }

  test("all jobs die → dead batch callback (integration :253-265)") {
    val (backend, client, worker, sched, tracker, _, clock) = fixture()
    val bid = client.performBatch(Seq(("boom", Seq[Any]()), ("boom", Seq[Any]())), "callback")
    worker.runPass()
    clock.addAndGet(1000)
    sched.promoteDue()
    worker.runPass() // retries exhausted → dead
    val terminals = tracker.trackPass()
    assert(terminals.map(_.status) == Seq(BatchStatus.Dead))
    worker.runPass()
    assert(CB.received.get() == Seq(bid, BatchStatus.Dead))
  }

  test("mixed outcome → partial-success (integration :267-286)") {
    val (backend, client, worker, sched, tracker, _, clock) = fixture()
    val bid = client.performBatch(Seq(("boom", Seq[Any]()), ("ok", Seq[Any]())), "callback")
    worker.runPass()
    clock.addAndGet(1000)
    sched.promoteDue()
    worker.runPass()
    assert(tracker.trackPass().map(_.status) == Seq(BatchStatus.PartialSuccess))
  }

  test("immediate death with maxRetries=0 (integration :253-258)") {
    val (backend, _, worker, _, tracker, _, clock) = fixture()
    val retry = RetryOpts(maxRetries = 0)
    val client2 = new GraftClient(backend, spark, "test", retry, () => clock.get())
    val bid = client2.performBatch(Seq(("boom", Seq[Any]())), "callback")
    assert(worker.runPass().died == 1)
    assert(tracker.trackPass().map(_.status) == Seq(BatchStatus.Dead))
  }

  test("batch progress counters derive from events (redis/batch.clj:45-60)") {
    val (backend, client, worker, _, tracker, _, _) = fixture()
    TestFns.failuresRemaining.set(1)
    val bid = client.performBatch(
      Seq(("flaky", Seq[Any]()), ("ok", Seq[Any]()), ("ok", Seq[Any]())), "callback")
    worker.runPass()
    val p = tracker.progressOf(bid).get
    assert(p.total == 3 && p.succeeded.size == 2 && p.retrying.size == 1 &&
      p.dead.isEmpty && p.enqueuedCount == 0)
  }

  // ---- the streaming fold kernel, driven directly via TestGroupState ----

  private def comp(jobId: String, at: Long): graft.worker.TrackerEvent =
    graft.worker.TrackerEvent("b1", isMeta = false,
      graft.worker.BatchProgress.TotalUnknown, jobId, "success", at)
  private def meta(total: Int): graft.worker.TrackerEvent =
    graft.worker.TrackerEvent("b1", isMeta = true, total, "", "", 100L)
  private def groupState(prev: Option[graft.worker.BatchProgress]) =
    org.apache.spark.sql.streaming.TestGroupState.create[graft.worker.BatchProgress](
      org.apache.spark.api.java.Optional.fromNullable(prev.orNull),
      org.apache.spark.sql.streaming.GroupStateTimeout.NoTimeout,
      1L, org.apache.spark.api.java.Optional.empty[Long](), hasTimedOut = false)

  test("tracker fold: terminal at-stamp survives a meta-after-completions epoch split") {
    // epoch 1: completions only (meta not yet delivered — batches-log
    // rewrite re-delivery or plain scheduling skew). No terminal yet.
    val s1 = groupState(None)
    val out1 = graft.worker.BatchTracker.fold(
      "b1", Iterator(comp("j1", 5000L), comp("j2", 7000L)), s1).toSeq
    assert(out1.isEmpty && s1.exists)
    assert(s1.get.lastAt == 7000L, "max finishedAt persists in state")
    // epoch 2: the meta alone closes the batch. The old fold stamped the
    // terminal with THIS epoch's local max (0) — making the linger
    // vacuum (`at + lingerSec <= now`) reclaim the batch instantly
    // (r11 review find). The stamp must be the persisted 7000.
    val s2 = groupState(Some(s1.get))
    val out2 = graft.worker.BatchTracker.fold("b1", Iterator(meta(2)), s2).toSeq
    assert(out2.map(t => (t.status, t.at)) == Seq((BatchStatus.Success, 7000L)))
  }

  test("tracker fold: a terminal emitted slot is removed from state, not kept forever") {
    val s = groupState(None)
    val out = graft.worker.BatchTracker.fold(
      "b1", Iterator(meta(1), comp("j1", 5000L)), s).toSeq
    assert(out.map(_.status) == Seq(BatchStatus.Success))
    assert(s.isRemoved,
      "terminal + callback-emitted state must be dropped — NoTimeout would " +
        "otherwise retain every batch's member-id sets in the state store forever")
    // an active (non-terminal) batch keeps its slot
    val s2 = groupState(None)
    graft.worker.BatchTracker.fold("b1", Iterator(meta(2), comp("j1", 5000L)), s2)
    assert(s2.exists && !s2.isRemoved)
  }
}
