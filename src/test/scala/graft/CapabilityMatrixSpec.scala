package graft

import graft.api.ManagementApi
import graft.backend.{CommitLogBackend, InMemoryBackend, ParquetBackend, QueueBackend}
import graft.client.GraftClient
import graft.model._
import graft.worker.{BatchTracker, SchedulerEngine, WorkerEngine}

/** Cross-backend capability matrix — the goose pattern of running one
  * test suite against every broker implementing the protocol
  * (test/goose/capability.clj:17-46, test/goose/integration/
  * test_utils.clj:9-80). Each lifecycle scenario below runs against BOTH
  * the parquet-log backend and the in-memory backend; behavior must be
  * identical because the engine only sees the QueueBackend seam.
  */
class CapabilityMatrixSpec extends SparkSpec {

  private case class Ctx(
      backend: QueueBackend,
      client: GraftClient,
      worker: WorkerEngine,
      sched: SchedulerEngine,
      tracker: BatchTracker,
      api: ManagementApi,
      clock: java.util.concurrent.atomic.AtomicLong)

  private def backends: Seq[(String, () => QueueBackend)] = Seq(
    "parquet" -> (() => new ParquetBackend(spark, tmpDir("graft-cap"))),
    "commit-log" -> (() => new CommitLogBackend(spark, tmpDir("graft-cap-cl"))),
    "in-memory" -> (() => new InMemoryBackend(spark)))

  private def ctx(mk: () => QueueBackend): Ctx = {
    TestFns.reset()
    val clock = new java.util.concurrent.atomic.AtomicLong(1700000000000L)
    val nowFn = () => clock.get()
    val backend = mk()
    val retry = RetryOpts(maxRetries = 1, retryDelaySecFn = "instant")
    Ctx(backend,
      new GraftClient(backend, spark, "test", retry, nowFn),
      new WorkerEngine(backend, spark, Nil, nowFn),
      new SchedulerEngine(backend, spark, nowFn),
      new BatchTracker(backend, spark),
      new ManagementApi(backend, spark),
      clock)
  }

  test("runtime capability matrix (goose test/goose/capability.clj analog)") {
    val caps = backends.map { case (name, mk) => name -> mk().capabilities }.toMap
    assert(caps.values.forall(_.fullOperatorSurface)) // unlike RMQ, no gaps
    assert(!caps("parquet").snapshotIsolatedReads && caps("commit-log").snapshotIsolatedReads)
    assert(!caps("parquet").multiProcessWriters && caps("commit-log").multiProcessWriters)
    assert(caps("parquet").durable && caps("commit-log").durable && !caps("in-memory").durable)
    // broker-native delay (rmq x-delayed-message analog): commit-log only
    assert(caps("commit-log").brokerNativeDelay &&
      !caps("parquet").brokerNativeDelay && !caps("in-memory").brokerNativeDelay)
  }

  for ((name, mk) <- backends) {

    test(s"[$name] async execute + consume-once") {
      val c = ctx(mk)
      c.client.performAsync("ok", "x")
      assert(c.worker.runPass().succeeded == 1)
      assert(c.worker.runPass().executed == 0) // consumed
      assert(c.api.enqueuedSize("test") == 0)
    }

    test(s"[$name] retry then death with execution counts") {
      val c = ctx(mk)
      c.client.performAsync("boom")
      assert(c.worker.runPass().retried == 1)
      c.clock.addAndGet(1000)
      assert(c.sched.promoteDue() == 1)
      assert(c.worker.runPass().died == 1)
      assert(TestFns.calls.get() == 2)
      assert(c.api.deadSize() == 1)
    }

    test(s"[$name] dead replay + pop + purge") {
      val c = ctx(mk)
      c.client.performAsync("boom")
      c.worker.runPass()
      c.clock.addAndGet(1000)
      c.sched.promoteDue()
      c.worker.runPass()
      assert(c.api.deadSize() == 1)
      assert(c.api.deadReplayN(1).length == 1)
      assert(c.api.deadSize() == 0 && c.api.enqueuedSize("test") == 1)
      assert(c.worker.runPass().died == 1) // exhausted → dies again
      assert(c.api.deadPop().isDefined)
      assert(c.api.deadSize() == 0)
    }

    test(s"[$name] dead delete-older-than sweeps by died-at cutoff") {
      // reference broker.clj:59 / redis/api/dead_jobs.clj:52-54:
      // ZREMRANGEBYSCORE [-inf, epoch-ms] on the died-at score
      val c = ctx(mk)
      c.client.performAsync("boom") // dies at T0+1000
      c.worker.runPass()
      c.clock.addAndGet(1000)
      c.sched.promoteDue()
      c.worker.runPass()
      val firstDeath = c.clock.get()
      c.clock.addAndGet(100000)
      c.client.performAsync("boom") // dies at T0+102000
      c.worker.runPass()
      c.clock.addAndGet(1000)
      c.sched.promoteDue()
      c.worker.runPass()
      assert(c.api.deadSize() == 2)
      assert(c.api.deadDeleteOlderThan(firstDeath - 1) == 0,
        "cutoff before every death deletes nothing")
      assert(c.api.deadDeleteOlderThan(firstDeath) == 1,
        "the cutoff is inclusive (ZREMRANGEBYSCORE max = epoch-ms)")
      assert(c.api.deadSize() == 1, "the younger dead job survives")
      assert(c.api.deadDeleteOlderThan(c.clock.get()) == 1)
      assert(c.api.deadSize() == 0)
    }

    test(s"[$name] prioritise moves to front; delete and purge hide rows") {
      val c = ctx(mk)
      val a = c.client.performAsync("ok", "a")
      c.clock.addAndGet(1000)
      val b = c.client.performAsync("ok", "b")
      assert(c.api.enqueuedPrioritise("test", Seq(b)) == 1)
      assert(c.api.enqueuedPage("test", 0).head.id == b)
      assert(c.api.enqueuedDelete("test", Seq(a)) == 1)
      assert(c.api.enqueuedSize("test") == 1)
      c.api.enqueuedPurge("test")
      assert(c.api.enqueuedSize("test") == 0)
      c.client.performAsync("ok", "after-purge")
      assert(c.api.enqueuedSize("test") == 1)
    }

    test(s"[$name] batch lifecycle to partial-success with single callback") {
      val c = ctx(mk)
      JobRegistry.register("cap_cb", _ => "cb")
      c.client.performBatch(Seq(("boom", Seq[Any]()), ("ok", Seq[Any]())), "cap_cb")
      c.worker.runPass()
      c.clock.addAndGet(1000)
      c.sched.promoteDue()
      c.worker.runPass()
      val t = c.tracker.trackPass()
      assert(t.map(_.status) == Seq(BatchStatus.PartialSuccess))
      assert(c.tracker.trackPass().isEmpty)
      assert(c.worker.runPass().succeeded == 1) // the callback job
    }

    test(s"[$name] cron fire + advance + idempotent upsert") {
      val c = ctx(mk)
      c.clock.set(java.time.Instant.parse("2024-01-01T00:00:30Z").toEpochMilli)
      c.client.performEveryTz("cap-tick", "*/3 * * * *", "UTC", "ok")
      c.client.performEveryTz("cap-tick", "*/5 * * * *", "UTC", "ok")
      assert(c.api.cronList().map(_.cronSchedule) == Seq("*/5 * * * *"))
      c.clock.set(java.time.Instant.parse("2024-01-01T00:05:10Z").toEpochMilli)
      assert(c.sched.fireCron() == 1)
      assert(c.sched.fireCron() == 0)
      assert(c.worker.runPass().succeeded == 1)
    }

    test(s"[$name] queue declare: idempotent redeclare; mismatch is PRECONDITION_FAILED") {
      val c = ctx(mk)
      c.backend.declareQueue(QueueDecl.classic("orders", maxPriority = 9))
      c.backend.declareQueue(QueueDecl.classic("orders", maxPriority = 9)) // idempotent
      c.backend.declareQueue(QueueDecl.quorum("payments", replicationFactor = 3))
      val decls = c.backend.queueDecls.collect().map(d => d.queue -> d.queueType).toMap
      assert(decls == Map("orders" -> "classic", "payments" -> "quorum"))
      // redeclare with a different envelope throws (reference rmq/queue.clj:29-48)
      val ex = intercept[IllegalStateException] {
        c.backend.declareQueue(QueueDecl.classic("orders", maxPriority = 1))
      }
      assert(ex.getMessage.contains("PRECONDITION_FAILED"))
      // invalid envelopes rejected up front (rmq/queue.clj:19-28)
      intercept[IllegalArgumentException] {
        c.backend.declareQueue(QueueDecl("bad", "quorum", 5, 3, 0L))
      }
    }

    test(s"[$name] declared envelopes gate delivery: quorum clamps priority, rejects prioritise") {
      val c = ctx(mk)
      c.backend.declareQueue(QueueDecl.quorum("critical"))
      c.backend.declareQueue(QueueDecl.classic("normal"))
      import graft.client.ClientOpts
      // past-due perform-at would front-bump (priority=1); quorum ignores it
      c.client.performAt(ClientOpts.queue("critical"),
        java.time.Instant.ofEpochMilli(c.clock.get() - 1000), "ok")
      c.client.performAt(ClientOpts.queue("normal"),
        java.time.Instant.ofEpochMilli(c.clock.get() - 1000), "ok")
      val byQueue = c.backend.readyJobs.collect().map(j => j.queue -> j.priority).toMap
      assert(byQueue == Map("critical" -> 0, "normal" -> 1))
      // prioritise-execution is a classic-queue feature
      val id = c.client.performAsync(ClientOpts.queue("critical"), "ok")
      intercept[UnsupportedOperationException] {
        c.api.enqueuedPrioritise("critical", Seq(id))
      }
      assert(c.api.enqueuedPrioritise("normal",
        c.backend.readyJobs.filter(_.queue == "normal").collect().map(_.id).toSeq) == 1)
      // the SCHEDULED path honors the envelope at promotion too: a
      // quorum job due via the scheduler must not acquire the front
      // bump the direct past-due path already clamps (r11 review find)
      c.client.performAt(ClientOpts.queue("critical"),
        java.time.Instant.ofEpochMilli(c.clock.get() + 5000), "ok", "q-later")
      c.client.performAt(ClientOpts.queue("normal"),
        java.time.Instant.ofEpochMilli(c.clock.get() + 5000), "ok", "n-later")
      c.clock.addAndGet(6000)
      c.sched.promoteDue()
      val promoted = c.backend.readyJobs.collect()
        .filter(_.argsJson.contains("later")).map(j => j.queue -> j.priority).toMap
      assert(promoted == Map("critical" -> 0, "normal" -> 1),
        "promotion clamps to the declared envelope like direct enqueue does")
    }

    test(s"[$name] compaction preserves visible sets") {
      val c = ctx(mk)
      val a = c.client.performAsync("ok", "keep")
      val b = c.client.performAsync("ok", "drop")
      c.api.enqueuedDelete("test", Seq(b))
      c.backend.compact("ready")
      assert(c.api.enqueuedSize("test") == 1)
      assert(c.api.enqueuedFindById("test", a).isDefined)
    }

    // BufferingClient: the async-publisher-confirm envelope, spec-enforced
    // (reference rmq/publisher_confirms.clj:20-29 semantics — a job is
    // visible/durable only after the flush that carries it).
    test(s"[$name] buffered enqueue: size bound, staleness bound, ordered flush, drains on close") {
      TestFns.reset()
      val clock = new java.util.concurrent.atomic.AtomicLong(1700000000000L)
      val backend = mk()
      val retry = RetryOpts(maxRetries = 1, retryDelaySecFn = "instant")
      val client = new graft.client.BufferingClient(backend, spark, "test",
        retry, () => clock.get(), flushEvery = 5, flushIntervalMs = 200)
      // below both bounds: accepted but invisible (the confirm window)
      (1 to 4).foreach(i => client.performAsync("ok", i))
      assert(client.pending == 4)
      assert(backend.readyJobs.count() == 0)
      // size bound: 5th call lands the whole group in one append
      client.performAsync("ok", 5)
      assert(client.pending == 0)
      assert(backend.readyJobs.count() == 5)
      // flushes preserve call order (seq is assigned at accept time)
      val seqs = backend.readyJobs.collect().sortBy(_.seq).map(_.argsJson)
      assert(seqs.sameElements((1 to 5).map(i => s"[$i]")))
      // staleness bound: a call past flushIntervalMs flushes immediately
      client.performAsync("ok", 6)
      assert(client.pending == 1)
      clock.addAndGet(250)
      client.performAsync("ok", 7)
      assert(client.pending == 0)
      assert(backend.readyJobs.count() == 7)
      // close() drains the tail like an RMQ channel close
      client.performAsync("ok", 8)
      assert(client.pending == 1)
      client.close()
      assert(client.pending == 0)
      assert(backend.readyJobs.count() == 8)
      // flushed jobs are real jobs: worker consumes each exactly once
      val worker = new WorkerEngine(backend, spark, Nil, () => clock.get())
      assert(worker.runPass().succeeded == 8)
      assert(worker.runPass().succeeded == 0)
    }
  }

  test("buffered enqueue: a failed flush keeps the drained jobs (nothing silently lost)") {
    // the documented envelope is "a crash loses at most the UNFLUSHED
    // tail" — a transient append failure is not a crash: the drained
    // batch must return to the buffer and land on the next flush
    // (r11 review find: the old drain-then-append dropped it)
    TestFns.reset()
    val clock = new java.util.concurrent.atomic.AtomicLong(1700000000000L)
    val failOnce = new java.util.concurrent.atomic.AtomicBoolean(true)
    val backend = new ParquetBackend(spark, tmpDir("graft-buffail")) {
      override def enqueueRows(jobs: Seq[Job]): Unit = {
        if (failOnce.compareAndSet(true, false))
          throw new java.io.IOException("injected transient append failure")
        super.enqueueRows(jobs)
      }
    }
    val retry = RetryOpts(maxRetries = 1, retryDelaySecFn = "instant")
    val client = new graft.client.BufferingClient(backend, spark, "test",
      retry, () => clock.get(), flushEvery = 3, flushIntervalMs = 60000)
    (1 to 2).foreach(i => client.performAsync("ok", i))
    // the 3rd call trips the flush, which fails — surfaced to the caller
    intercept[java.io.IOException] { client.performAsync("ok", 3) }
    assert(client.pending == 3, "all drained jobs restored to the buffer")
    assert(backend.readyJobs.count() == 0)
    assert(client.flush() == 3, "the retry lands the whole restored batch")
    val seqs = backend.readyJobs.collect().sortBy(_.seq).map(_.argsJson)
    assert(seqs.sameElements((1 to 3).map(i => s"[$i]")), "FIFO preserved")
    val worker = new WorkerEngine(backend, spark, Nil, () => clock.get())
    assert(worker.runPass().succeeded == 3)
  }
}
