package graft.worker

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import graft.backend.QueueBackend
import graft.model._
import graft.model.ModelEncoders._

/** One executed job with its decided next action — computed ON THE
  * EXECUTOR so retry/death handling is distributed (no driver loop). */
final case class ExecutionResult(
    job: Job, // state already updated for retry/death destinations
    action: String, // success | retry | dead
    attempt: Int,
    error: Option[String],
    startedAt: Long,
    finishedAt: Long)

object WorkerCore extends Serializable {
  type Middleware = (Job => Any) => (Job => Any)

  /** Execute one job and decide its fate — the composed semantics of
    * goose's middleware chain (redis/worker.clj:46-55), execute-job
    * (consumer.clj:5-7), retry (retry.clj:79-95) and bury
    * (redis/retry.clj:22-34). Pure except for the user fn + handlers.
    */
  def runJob(job: Job, middlewares: Seq[Middleware], now: () => Long): ExecutionResult = {
    val attempt = JobAttempt.of(job)
    val base: Job => Any =
      j => JobRegistry.resolve(j.executeFnSym)(ArgsSerializers.active.decode(j.argsJson))
    val chain = middlewares.foldRight(base)((mw, next) => mw(next))
    val startedAt = now()
    try {
      chain(job)
      ExecutionResult(job, "success", attempt, None, startedAt, now())
    } catch {
      case e: Throwable =>
        val t = now()
        val err = s"${e.getClass.getName}: ${e.getMessage}"
        // reference retry.clj:79-91 set-failed-state
        val fs = job.state match {
          case None => FailureState(err, 0, t, None, None, None)
          case Some(s) => s.copy(error = err, retryCount = s.retryCount + 1,
            lastRetriedAt = Some(t))
        }
        val opts = job.retryOpts
        if (fs.retryCount < opts.maxRetries) {
          // schedule retry with backoff (retry.clj:22-27,93-95)
          JobRegistry.resolveHandler(opts.errorHandler)(job, e)
          val delaySec = JobRegistry.resolveBackoff(opts.retryDelaySecFn)(fs.retryCount)
          val retryAt = t + delaySec * 1000L
          val updated = job.copy(state = Some(fs.copy(retryAt = Some(retryAt))))
          ExecutionResult(updated, "retry", attempt, Some(err), startedAt, t)
        } else {
          // bury (redis/retry.clj:22-34)
          JobRegistry.resolveHandler(opts.deathHandler)(job, e)
          val updated = job.copy(state = Some(fs.copy(diedAt = Some(t))))
          ExecutionResult(updated, "dead", attempt, Some(err), startedAt, t)
        }
    }
  }

  def toCompletion(r: ExecutionResult): CompletionEvent =
    CompletionEvent(
      jobId = r.job.id,
      attempt = r.attempt,
      batchId = r.job.batchId,
      queue = r.job.queue,
      terminalState = r.action match {
        case "success" => "success"
        case "retry" => "retrying"
        case "dead" => "dead"
      },
      wasRetried = r.job.retried,
      error = r.error,
      executionTimeMs = r.finishedAt - r.startedAt,
      finishedAt = r.finishedAt)
}

/** The worker — goose's consumer threads + retry/death dataflow
  * (SURVEY.md §2.5 D1-D4, D14-D15), re-expressed as one Spark pipeline:
  *
  *   ready (visible) → map(runJob) on executors
  *     → completions append            (S6: the LREM-equivalent commit)
  *     → retries → scheduled append    (D3)
  *     → deaths → dead append          (D4, honoring skipDeadQueue)
  *     → batch terminal transitions    (fed to BatchTracker)
  *
  * goose's three reliability subsystems (in-progress queues, heartbeats,
  * orphan checker — redis/consumer.clj:12-21, redis/heartbeat.clj,
  * redis/orphan_checker.clj) collapse into replayable passes: consumption
  * is keyed by (id, attempt) in the completions log, so a crashed pass
  * re-executes only unconsumed rows on restart — at-least-once execution
  * with idempotent commit, same guarantee goose provides.
  */
final class WorkerEngine(
    backend: QueueBackend,
    spark: SparkSession,
    middlewares: Seq[WorkerCore.Middleware] = Nil,
    nowFn: () => Long = () => System.currentTimeMillis(),
    /** Shared with the process's maintenance loop: passes hold the READ
      * side while they scan the live log dirs; compaction holds the WRITE
      * side while it swaps them (GraftWorker), so a micro-batch never
      * reads files mid-rename. Uncontended when no compactor runs. */
    gate: java.util.concurrent.locks.ReadWriteLock =
      new java.util.concurrent.locks.ReentrantReadWriteLock(),
    /** Queue scope — goose workers consume exactly ONE queue (reference
      * worker.clj:27,43: `:queue`, default-queue; fleet = one worker per
      * queue). None = consume everything (the single-process mode). The
      * filter is a Catalyst predicate on the ready scan, so a scoped
      * worker never reads other queues' row groups (min/max pruning). */
    queue: Option[String] = None,
    /** Claimed consumption (r14): when true, each pass commits a claim
      * batch and executes only attempts it won — the BLMOVE analog that
      * lets N workers CONTEND on one shared queue without systematic
      * double execution (backend.claimSlice; only manifest-log backends
      * arbitrate — elsewhere this flag is a no-op pass-through). The
      * scoped topology (one worker per queue) should leave it off: the
      * claim costs one commit + one as-of read per micro-batch. */
    claimedConsumption: Boolean = false) extends Serializable {

  import spark.implicits._

  /** This consumer's claim identity (per engine instance, like goose's
    * consumer tag). */
  private val claimantId = java.util.UUID.randomUUID().toString

  private def withClaims(jobs: Dataset[Job])(body: Dataset[Job] => PassStats): PassStats =
    if (!claimedConsumption) body(jobs)
    else {
      val won = backend.claimSlice(jobs, claimantId, nowFn(), WorkerEngine.ClaimLeaseMs)
      try body(won) finally { won.unpersist(); () }
    }

  final case class PassStats(executed: Long, succeeded: Long, retried: Long, died: Long)

  private def scoped(jobs: Dataset[Job]): Dataset[Job] = queue match {
    case Some(q) => jobs.filter(org.apache.spark.sql.functions.col("queue") === q)
    case None => jobs
  }

  /** Drain-and-execute every currently visible ready job of this
    * worker's scope (the batch-mode twin of the streaming query; also
    * the foreachBatch body). */
  def runPass(): PassStats =
    gated(withClaims(scoped(backend.readyJobs))(executeBatchInner))

  /** Plan CONSTRUCTION must happen inside the gate as well: building
    * `readyJobs`/`filterReadyVisible` lists the live log files, and a
    * compaction between listing and execution leaves the plan pointing at
    * renamed-away files. */
  private def gated[A](body: => A): A = {
    gate.readLock().lock()
    try body finally gate.readLock().unlock()
  }

  private[graft] def executeBatch(jobs: Dataset[Job]): PassStats =
    gated(executeBatchInner(jobs))

  private def executeBatchInner(jobs: Dataset[Job]): PassStats = {
    val mws = middlewares
    val now = nowFn
    // localCheckpoint (eager) cuts lineage to the live log directories:
    // the commits below append to paths this plan reads, which would
    // otherwise auto-refresh the cache and recompute an EMPTY result
    // (every executed row is consumed by its own completion record). It
    // also pins each job to exactly one execution within the pass.
    val results = jobs
      .map(j => WorkerCore.runJob(j, mws, now))
      .localCheckpoint(true)
    try {
      // One grouped aggregation for all counters (not one action each).
      val counts = results.groupByKey(_.action).count().collect().toMap
      val executed = counts.values.sum
      if (executed == 0) return PassStats(0, 0, 0, 0)

      val retried = counts.getOrElse("retry", 0L)
      val died = counts.getOrElse("dead", 0L)

      // Commit ORDER is the crash-safety contract: retry/death rows first
      // (concurrent — disjoint tables, reading only checkpointed results),
      // completions LAST as the commit point. A crash before the
      // completion append leaves the attempt unconsumed, so replay
      // re-executes it (at-least-once, like goose) and re-derives the same
      // outputs; duplicates that creates are collapsed by the (id,
      // attempt) dedupe in filterReadyVisible / the (id, seq) tombstones.
      // The REVERSE order would mark the attempt consumed with its retry
      // never scheduled — silent job loss.
      import scala.concurrent.{Await, Future}
      import scala.concurrent.duration.Duration
      import scala.concurrent.ExecutionContext.Implicits.global
      val outcomes =
        (if (retried > 0)
          Seq(Future(backend.schedule(results.filter(_.action == "retry").map(_.job))))
        else Nil) ++
          (if (died > 0)
            Seq(Future(backend.bury(results
              .filter(r => r.action == "dead" && !r.job.retryOpts.skipDeadQueue)
              .map(_.job))))
          else Nil)
      outcomes.foreach(Await.result(_, Duration.Inf))
      backend.recordCompletions(results.map(r => WorkerCore.toCompletion(r)))

      PassStats(executed, counts.getOrElse("success", 0L), retried, died)
    } finally results.unpersist()
  }

  /** Streaming worker (D15/S5): Structured Streaming file source over the
    * append-only ready log; each micro-batch filters to still-visible rows
    * and commits through the same idempotent path as runPass. Checkpointed
    * under the backend root — kill/restart resumes without re-execution.
    */
  def startStream(
      root: String,
      trigger: Trigger = Trigger.ProcessingTime("1 second"),
      /** Scoped workers default to distinct checkpoints: two queue-scoped
        * streams on one root must not share file-source offsets. */
      queryName: String = null,
      /** Intake bound per micro-batch (file granularity) — the RMQ
        * prefetch-count analog (reference rmq/channel.clj: QoS prefetch
        * caps in-flight deliveries per consumer). Bounds a micro-batch's
        * memory/latency footprint when a huge backlog appears at once;
        * None = drain everything available each trigger. */
      prefetchFiles: Option[Int] = None): StreamingQuery = {
    val qn = Option(queryName).getOrElse {
      val base = s"graft-worker${queue.fold("")("-" + _)}"
      // Shared-queue claimed consumers are MEANT to coexist on one queue
      // — each needs its own query name, file-source offsets and
      // checkpoint dir (two streams on one checkpoint corrupt offsets).
      // A restarted claimed worker gets a fresh identity and re-reads
      // the log cold; completions visibility + claims make that safe.
      if (claimedConsumption) s"$base-${claimantId.take(8)}" else base
    }
    val jobSchema = implicitly[org.apache.spark.sql.Encoder[Job]].schema
    // The file source requires the log dir to exist before the query
    // starts — created via Hadoop FS so hdfs://-style roots work too.
    val readyPath = new org.apache.hadoop.fs.Path(s"$root/ready")
    readyPath.getFileSystem(spark.sparkContext.hadoopConfiguration).mkdirs(readyPath)
    val reader = spark.readStream
      .schema(jobSchema)
      // a listed-but-vanished file can only mean a compaction fold
      // replaced the ready log between listing and read; the fold's
      // replacement (same visible jobs) arrives as a new file
      .option("ignoreMissingFiles", "true")
    prefetchFiles.foreach(n => reader.option("maxFilesPerTrigger", n))
    reader.parquet(s"$root/ready")
      .writeStream
      .queryName(qn)
      .trigger(trigger)
      .option("checkpointLocation", s"$root/checkpoints/$qn")
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], _: Long) =>
        // gate covers the visibility-plan construction too (file listing)
        gated {
          withClaims(scoped(backend.filterReadyVisible(batch.as[Job])))(executeBatchInner)
          ()
        }
      }
      .start()
  }
}

object WorkerEngine {
  /** How long a committed claim excludes other claimants before it is
    * presumed dead and the attempt becomes claimable again — goose's
    * orphan-checker window for the in-progress queue. Minutes-scale on
    * purpose: a live pass completes in milliseconds-to-seconds, and the
    * lease only matters when a claimant died between claim and
    * completion commit. */
  val ClaimLeaseMs: Long = 60000L
}
