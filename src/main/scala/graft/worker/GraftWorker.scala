package graft.worker

import graft.model.ModelEncoders._
import java.util.concurrent.atomic.AtomicBoolean
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.Trigger
import graft.backend.QueueBackend
import graft.metrics.{Metrics, MetricsSink, NoopMetrics}

/** The composite worker process (SURVEY.md §2.5 D15) — goose starts N
  * consumer threads plus an internal pool running scheduler, cron,
  * orphan-checker, heartbeat and metrics (reference redis/worker.clj:
  * 57-88). Here that collapses to:
  *
  *  - ONE Structured Streaming query executing jobs (parallelism comes
  *    from partitions, not a thread pool),
  *  - one maintenance timer ticking scheduler-promotion, cron firing,
  *    batch tracking and metrics gauges,
  *  - no heartbeat/orphan machinery: Spark owns liveness, and the
  *    (id, attempt)-keyed completions log makes replay idempotent.
  *
  * `stop(graceful)` mirrors D14 (redis/worker.clj:22-44): stop intake,
  * let the in-flight micro-batch finish, then tear down.
  */
final class GraftWorker(
    backend: QueueBackend,
    spark: SparkSession,
    root: String,
    middlewares: Seq[WorkerCore.Middleware] = Nil,
    metrics: MetricsSink = NoopMetrics,
    trigger: Trigger = Trigger.ProcessingTime("1 second"),
    maintenanceIntervalMs: Long = 1000,
    /** Compaction policy: every `compactEveryTicks` maintenance ticks, IF
      * the log dirs have accumulated more than `compactMinFiles` parquet
      * files, fold ready/scheduled/dead to their visible rows. Without
      * this the anti-join sides (completions, tombstones) grow without
      * bound — goose gets the same GC for free from Redis key deletion. */
    compactEveryTicks: Int = 30,
    compactMinFiles: Int = 64,
    /** Flood bound for the policy-triggered "ready" fold: when only
      * completions pressure asks for it, the fold runs IF the visible
      * backlog (≈ the survivor rows the rewrite would re-deliver to every
      * streaming worker's file source) is at most this many rows — the
      * post-drain GC shape. A larger backlog gets the standalone
      * completions fold instead (see [[compactionPolicy]]). */
    compactMaxRedeliverRows: Long = 4096,
    /** Batch tracking mount. Default: a second streaming query
      * (BatchTracker.startStream) — per-key checkpointed state, no
      * per-tick rescan of completion history. false = the batch-mode
      * trackPass on each maintenance tick (the recovery mode, and the
      * only mode for backends without a file-backed root). */
    streamingTracker: Boolean = true,
    nowFn: () => Long = () => System.currentTimeMillis(),
    /** Queue scope (reference worker.clj:27,43): a fleet runs one scoped
      * worker per queue; None consumes everything. Maintenance duties
      * (scheduler, tracker, compaction) are coordinator work, not
      * consumer work — see [[coordinator]]. */
    queue: Option[String] = None,
    /** Whether THIS worker runs the global maintenance duties (scheduler
      * promotion, cron firing, batch tracking, linger vacuum, staging
      * sweep, compaction). Exactly ONE worker per root should: the
      * maintenance paths assume a single coordinator (BatchTracker's
      * skip-if-terminal check and compaction's fold are serialized by
      * in-process locks only — r11 review find: N fleet workers each
      * running them raced cron double-fires and concurrent folds).
      * Non-coordinators still consume, heartbeat, fold their latency
      * WAL, and publish gauges. Deterministic cron job ids
      * (SchedulerEngine.fireCron) additionally make an accidental
      * second coordinator's cron fires collapse in the visibility fold
      * — defense in depth, not a license to run two. */
    coordinator: Boolean = true,
    /** Claimed consumption (r14): N workers may CONTEND on one shared
      * queue — each micro-batch commits a claim and executes only
      * attempts it won (the BLMOVE analog; WorkerEngine/
      * CommitLogBackend.claimSlice). Leave off for the scoped topology;
      * costs one commit + one as-of read per micro-batch when on. */
    claimedConsumption: Boolean = false,
    /** How long once-referenced manifest garbage lingers after vacuum
      * first sees it unreferenced (CommitLogBackend.vacuum's retention —
      * the Delta-VACUUM-retention analog protecting OTHER processes'
      * in-flight read plans). Default is the production ten minutes;
      * the fleet reader-vs-vacuum soak (VERDICT r14 #3) shortens it to
      * seconds to drive the race deliberately. Must stay longer than
      * any co-reader's micro-batch plan life. */
    vacuumRetentionMs: Long = graft.backend.CommitLogBackend.VacuumRetentionMs,
    /** Invoked with the failure description when one of THIS worker's
      * streaming queries dies abruptly — i.e. terminates with an
      * exception while the worker is running, not during [[stop]]
      * (goose's shutdown listener fires only when the shutdown was not
      * `.isInitiatedByApplication`, reference shutdown_listener.clj:4-8).
      * Default logs, as the reference's sample handler does. */
    shutdownListener: String => Unit = GraftWorker.defaultShutdownListener) {

  private val sinkName = s"graft-worker-${java.util.UUID.randomUUID()}"
  graft.metrics.MetricsRegistry.register(sinkName, metrics)

  /** Serializes compaction (write side) against in-flight micro-batches
    * and maintenance reads (read side) — see WorkerEngine.gate. */
  private val gate = new java.util.concurrent.locks.ReentrantReadWriteLock()

  private val engine = new WorkerEngine(backend, spark,
    middlewares :+ Metrics.middleware(sinkName), nowFn, gate, queue,
    claimedConsumption)
  private val scheduler = new SchedulerEngine(backend, spark, nowFn)
  private val tracker = new BatchTracker(backend, spark)

  /** Number of compaction rounds run (policy-triggered or manual). */
  val compactionsRun = new java.util.concurrent.atomic.AtomicInteger(0)

  /** The compaction decision, per policy round (r13 — replaces the
    * aggregate file-count trigger after the fleet probe exposed its
    * pathology): file pressure is counted PER TABLE through the backend's
    * own storage (Hadoop FileSystem / manifest snapshot, never
    * java.io.File — an hdfs:// or s3a:// root would otherwise report 0
    * and the policy would silently never fire), and the expensive fold —
    * the "ready" rewrite, whose survivor file every streaming worker's
    * file source RE-INGESTS — only runs when either the enqueue side
    * itself built the pressure (tiny per-call files: the rewrite's
    * re-delivery is then pending work the streams must scan anyway) or
    * the re-delivery is provably small (pending backlog ≤
    * `compactMaxRedeliverRows` — the post-drain GC that shrinks ready and
    * completions to their survivor sets). Mid-drain, completions pressure
    * (one file per micro-batch per worker — the fastest grower) is
    * relieved by the standalone completions fold instead, which never
    * touches ready. The old SUM-of-tables trigger folded ready on
    * completions churn: a 2-worker 200k-job fleet drain ran 2.9× the
    * 1-worker wall, every fold re-delivering the full remainder to both
    * file sources (SCALING.md fleet rows). */
  private[graft] def compactionPolicy(): Unit = backend match {
    case ls: graft.backend.LogStructuredBackend =>
      def n(t: String) = ls.dataFileCount(t)
      val enqueuePressure = n("ready") + n("tombstones") + n("purges")
      val compsPressure = n("completions")
      val fullFold =
        enqueuePressure > compactMinFiles || (compsPressure > compactMinFiles && {
          // visible backlog ≈ the rows a ready rewrite would re-deliver
          // to every worker's stream; one bounded count per policy round
          val pending = withReadGateValue(backend.readyJobs.count())
          pending <= compactMaxRedeliverRows
        })
      if (fullFold) compactNow()
      else {
        var folded = false
        def light(t: String): Unit = {
          foldGated(backend.compact(t))
          folded = true
        }
        if (compsPressure > compactMinFiles) light("completions")
        // claims grow at the completions rate under shared-queue claimed
        // consumption (one claim batch per micro-batch per worker) and
        // fold with the same light lane; zero files otherwise
        if (n("claims") > compactMinFiles) light("claims")
        if (n("scheduled") > compactMinFiles) light("scheduled")
        if (n("dead") > compactMinFiles) light("dead")
        if (n("cron") > compactMinFiles) light("cron")
        if (folded) vacuumGated()
      }
    case _ => // driver-local backends have no file pressure
  }

  /** D8 linger retention on the compaction cadence: terminal batches past
    * their lingerSec leave the metadata/status logs (goose: EXPIRE
    * linger-sec NX on the batch hash, redis/batch.clj:73-99). A fold, so
    * write-gated like compaction; returns the number vacuumed. */
  def vacuumLingered(): Int = {
    gate.writeLock().lock()
    try mgmt.vacuumBatches(nowFn())
    finally gate.writeLock().unlock()
  }

  private lazy val mgmt = new graft.api.ManagementApi(backend, spark)

  /** Whether FOLD (replace) work must exclude in-flight micro-batches.
    * Directory-swap backends (ParquetBackend) gate the whole fold: a
    * reader's plan lists live files the swap renames away. Manifest
    * backends are snapshot-isolated — a fold commits a new version while
    * readers keep theirs, and replaced files stay on disk until vacuum —
    * so only VACUUM (the destructive step) takes the write gate and the
    * fold itself never stalls this worker's stream. The coordinator IS a
    * consumer: with gated folds, a 1-worker fleet drain paid every fold
    * round as a full stream stall (measured ~24 s vs ~15 s for 2 workers
    * at the same total load, r13 fleet probe). */
  private val foldNeedsGate = !backend.capabilities.snapshotIsolatedReads

  private def foldGated[A](body: => A): A =
    if (foldNeedsGate) {
      gate.writeLock().lock()
      try body finally gate.writeLock().unlock()
    } else body

  /** Reclaim manifest garbage under the write gate: no micro-batch is in
    * flight, so no IN-PROCESS reader holds a snapshot older than the
    * last replace. CROSS-instance readers — other fleet workers' gates
    * are invisible here — are covered by vacuum's retention linger
    * instead (ADVICE r13): once-referenced garbage lingers
    * VacuumRetentionMs after first being seen unreferenced, far past
    * any in-flight micro-batch plan's life, so this coordinator can
    * never unlink a file out from under another process's read. */
  private def vacuumGated(): Unit = backend match {
    case cl: graft.backend.CommitLogBackend =>
      gate.writeLock().lock()
      try { cl.vacuum(vacuumRetentionMs); () } finally gate.writeLock().unlock()
    case _ =>
  }

  /** Fold every job log to its visible rows — safe to call while the
    * stream runs; the next micro-batch simply sees the folded
    * (equivalent) state. */
  def compactNow(): Unit = {
    foldGated {
      backend.compact("ready")
      backend.compact("scheduled")
      backend.compact("dead")
      backend.compact("cron") // keyed log grows one record per firing
    }
    // manifest backends retain replaced files for snapshot readers
    vacuumGated()
    compactionsRun.incrementAndGet()
  }

  /** Worker identity, goose's `queue:hostname:random12`
    * (reference redis/worker.clj:66-67). */
  val processId: String = {
    val host = try java.net.InetAddress.getLocalHost.getHostName catch { case _: Throwable => "local" }
    s"${queue.getOrElse("*")}:$host:${java.util.UUID.randomUUID().toString.take(12)}"
  }

  private val running = new AtomicBoolean(false)
  @volatile private var query: org.apache.spark.sql.streaming.StreamingQuery = _
  @volatile private var trackerQuery: org.apache.spark.sql.streaming.StreamingQuery = _
  @volatile private var maintenance: Thread = _

  private def withReadGate(body: => Unit): Unit = {
    gate.readLock().lock()
    try body finally gate.readLock().unlock()
  }

  private def withReadGateValue[A](body: => A): A = {
    gate.readLock().lock()
    try body finally gate.readLock().unlock()
  }

  @volatile private var termWatch: org.apache.spark.sql.streaming.StreamingQueryListener = _

  def start(): this.type = {
    require(running.compareAndSet(false, true), "worker already started")
    query = engine.startStream(root, trigger)
    if (streamingTracker && coordinator)
      trackerQuery = tracker.startStream(root, trigger, withReadGate _)
    // abrupt-death watch: only THIS worker's queries, only while running
    // (stop() flips `running` before stopping the queries, so an
    // application-initiated shutdown never fires the listener)
    val watched = Set(query.runId) ++ Option(trackerQuery).map(_.runId)
    termWatch = new org.apache.spark.sql.streaming.StreamingQueryListener {
      override def onQueryStarted(
          e: org.apache.spark.sql.streaming.StreamingQueryListener.QueryStartedEvent): Unit = ()
      override def onQueryProgress(
          e: org.apache.spark.sql.streaming.StreamingQueryListener.QueryProgressEvent): Unit = ()
      override def onQueryTerminated(
          e: org.apache.spark.sql.streaming.StreamingQueryListener.QueryTerminatedEvent): Unit =
        if (watched.contains(e.runId) && running.get())
          e.exception.foreach(shutdownListener)
    }
    spark.streams.addListener(termWatch)
    maintenance = new Thread(() => {
      var tick = 0L
      while (running.get()) {
        try {
          tick += 1
          gate.readLock().lock()
          try {
            backend.recordHeartbeat(
              graft.model.ProcessHeartbeat(processId, queue.getOrElse("*"), nowFn())) // D9
            // fold the per-call WAL tail to parquet so the file-source
            // consumer stream sees per-call enqueues (batch reads are
            // WAL-inclusive already)
            backend.drainLatencyPath()
            if (coordinator) {
              scheduler.tick()
              if (!streamingTracker) tracker.trackPass() // recovery/batch mode
            }
            Metrics.publishGauges(backend, spark, metrics)
          } finally gate.readLock().unlock()
          if (coordinator && compactEveryTicks > 0 && tick % compactEveryTicks == 0) {
            vacuumLingered()
            backend match {
              // reclaim crashed direct-append staging files; age gate
              // mirrors the abandoned-commit policy (dead claimant)
              case lsb: graft.backend.LogStructuredBackend =>
                lsb.sweepStaging(graft.backend.CommitLogBackend.AbandonedCommitMs)
              case _ =>
            }
            compactionPolicy()
          }
        } catch {
          case _: InterruptedException => // stopping
          case e: Throwable =>
            // After stop() the interrupt can surface as any wrapper
            // (InterruptedIOException from a parquet write, SparkException
            // chains) — only report errors from a live worker.
            if (running.get())
              System.err.println(s"[graft-worker] maintenance error: ${e.getMessage}")
        }
        try Thread.sleep(maintenanceIntervalMs)
        catch { case _: InterruptedException => }
      }
    }, "graft-maintenance")
    maintenance.setDaemon(true)
    maintenance.start()
    this
  }

  /** Graceful: drain available input and finish the in-flight micro-batch
    * before stopping (reference worker.clj graceful-shutdown-sec). */
  def stop(graceful: Boolean = true): Unit = {
    if (!running.compareAndSet(true, false)) return
    maintenance.interrupt()
    maintenance.join(5000)
    if (graceful) {
      query.processAllAvailable()
      // jobs the final micro-batch completed may close a batch: let the
      // tracker drain them (and its callback enqueues) before teardown
      if (trackerQuery != null) trackerQuery.processAllAvailable()
    }
    query.stop()
    if (trackerQuery != null) trackerQuery.stop()
    query.awaitTermination(10000)
    if (trackerQuery != null) trackerQuery.awaitTermination(10000)
    if (termWatch != null) { spark.streams.removeListener(termWatch); termWatch = null }
  }

  /** Block until the engine is fully drained (test/drain-mode helper).
    * The settled condition must be one no concurrent maintenance tick can
    * undo: no visible ready jobs, no due scheduled jobs, AND every batch
    * already recorded terminal (trackPass is idempotent past that point,
    * so no further callback can appear). */
  def awaitDrained(timeoutMs: Long = 60000): Boolean = {
    import org.apache.spark.sql.functions.{coalesce, col}
    val deadline = System.currentTimeMillis() + timeoutMs
    // NEVER hold the read gate across processAllAvailable(): the stream
    // thread itself takes the read side, and a queued compactor (writer)
    // would wedge all three threads.
    def withReadLock[A](body: => A): A = {
      gate.readLock().lock()
      try body finally gate.readLock().unlock()
    }
    while (System.currentTimeMillis() < deadline) {
      query.processAllAvailable()
      // a non-coordinator has no tracker mount at all — its fleet's
      // coordinator owns terminal derivation; this helper only drains
      // the local consumer + scheduler view
      if (streamingTracker && trackerQuery != null) {
        withReadLock { scheduler.tick() }
        trackerQuery.processAllAvailable() // terminals → callback enqueues
      } else {
        withReadLock {
          scheduler.tick()
          if (!streamingTracker && coordinator) tracker.trackPass()
        }
      }
      query.processAllAvailable()
      // a scoped worker only drains ITS queue; other queues' jobs belong
      // to other workers of the fleet
      def scopedReady = queue match {
        case Some(q) => backend.readyJobs.filter(col("queue") === q)
        case None => backend.readyJobs
      }
      // Each conjunct is guarded by the backend's O(1) emptiness probe
      // (r15): a provably-empty log satisfies its condition without a
      // Spark job — this poll loop otherwise cost ~4 empty actions per
      // 50 ms round on fixtures with no batches and no scheduler load.
      val settled = withReadLock {
        (!backend.maybeNonEmpty("ready") || scopedReady.isEmpty) &&
          (!backend.maybeNonEmpty("scheduled") || backend.scheduledJobs.filter(
            coalesce(col("state.retryAt"), col("scheduleRunAt")) <= nowFn()).isEmpty) &&
          ((!backend.maybeNonEmpty("batches") && !backend.maybeNonEmpty("batch_status")) || {
            val nBatches = backend.batches.select("id").distinct().count()
            val nTerminal = backend.batchStatusEvents
              .filter(e => graft.model.BatchStatus.terminal(e.status))
              .select("batchId").distinct().count()
            nTerminal == nBatches
          })
      }
      if (settled) return true
      Thread.sleep(50)
    }
    false
  }
}

object GraftWorker {
  /** Sample handler for abrupt stream death not initiated by the
    * application (reference shutdown_listener.clj:4-8). */
  def defaultShutdownListener(cause: String): Unit =
    System.err.println(s"[graft-worker] stream shut down due to error: $cause")
}
