package graft.model

import java.util.UUID

/** Core record types of the engine — the goose data model re-expressed as
  * Spark-friendly case classes (SURVEY.md §1.1; reference:
  * src/goose/job.clj:6-16, src/goose/retry.clj:34-66, src/goose/batch.clj:48-62,
  * src/goose/brokers/redis/cron.clj:13-21).
  *
  * All timestamps are epoch-millis longs (reference utils.clj:44-54) — exact,
  * timezone-free, and encodes to parquet INT64 with full fidelity. `Dataset[Job]`
  * gets a product encoder from these; nested options become nullable columns.
  */
final case class RetryOpts(
    maxRetries: Int = 27,
    retryDelaySecFn: String = "default", // registry key of Int => Int backoff
    retryQueue: Option[String] = None,
    errorHandler: String = "default",
    deathHandler: String = "default",
    skipDeadQueue: Boolean = false)

/** Failure state stamped on a job after >=1 failed execution
  * (reference retry.clj:79-91, redis/retry.clj:18,31). */
final case class FailureState(
    error: String,
    retryCount: Int,
    firstFailedAt: Long,
    lastRetriedAt: Option[Long],
    retryAt: Option[Long],
    diedAt: Option[Long])

/** The job envelope (reference job.clj:6-16). `argsJson` is the
  * dynamically-typed payload, serialized by the active [[ArgsSerializer]]
  * (JSON by default) — the engine
  * analog of goose's nippy blobs (utils.clj:13-33).
  *
  * `priority` replaces Redis list-front mutations: consume order is
  * (priority DESC, enqueuedAt ASC), so "move to front"
  * (commands.clj:145-164) is a priority bump — a pure-append operation
  * that scales on a distributed log where O(1) front-insert doesn't exist.
  */
final case class Job(
    id: String,
    executeFnSym: String,
    argsJson: String,
    queue: String,
    readyQueue: String,
    priority: Int,
    enqueuedAt: Long,
    scheduleRunAt: Option[Long],
    cronRunAt: Option[Long],
    batchId: Option[String],
    retryOpts: RetryOpts,
    state: Option[FailureState],
    seq: Long) {

  /** reference job.clj:18-19 */
  def retried: Boolean = state.isDefined

  /** reference job.clj:21-25: retried jobs route to the retry queue. */
  def readyOrRetryQueue: String =
    if (retried) retryOpts.retryQueue.getOrElse(queue) else queue
}

object Job {
  def apply(fnSym: String, args: Seq[Any], queue: String, retryOpts: RetryOpts): Job =
    Job(
      id = UUID.randomUUID().toString,
      executeFnSym = fnSym,
      argsJson = ArgsSerializers.active.encode(args),
      queue = queue,
      readyQueue = queue,
      priority = 0,
      enqueuedAt = System.currentTimeMillis(),
      scheduleRunAt = None,
      cronRunAt = None,
      batchId = None,
      retryOpts = retryOpts,
      state = None,
      seq = Job.nextSeq())

  /** Append version of a physical row: tombstones target (id, seq), so a
    * re-append of the same job id (prioritise, replay) is a NEW version
    * that an older tombstone cannot hide. Monotonic per writer JVM; log
    * ordering across writers is approximate, like any distributed log. */
  def nextSeq(): Long = System.nanoTime()
}

/** A job-description is a Job minus id/enqueuedAt (reference job.clj:27-37);
  * the cron template, materialized per firing via [[JobDescription.instantiate]]
  * (reference job.clj:39-43). */
final case class JobDescription(
    executeFnSym: String,
    argsJson: String,
    queue: String,
    readyQueue: String,
    priority: Int,
    retryOpts: RetryOpts) {

  def instantiate(cronRunAt: Option[Long] = None): Job =
    Job(
      id = UUID.randomUUID().toString,
      executeFnSym = executeFnSym,
      argsJson = argsJson,
      queue = queue,
      readyQueue = readyQueue,
      priority = priority,
      enqueuedAt = System.currentTimeMillis(),
      scheduleRunAt = None,
      cronRunAt = cronRunAt,
      batchId = None,
      retryOpts = retryOpts,
      state = None,
      seq = Job.nextSeq())
}

/** Registered periodic job (reference redis/cron.clj:13-21). `nextRunAt`
  * is the materialized zset score (redis/cron.clj:29-33). */
final case class CronEntry(
    cronName: String,
    cronSchedule: String,
    timezone: String,
    description: JobDescription,
    nextRunAt: Long)

object BatchStatus {
  val InProgress = "in-progress"
  val Success = "success"
  val Dead = "dead"
  val PartialSuccess = "partial-success"
  val terminal: Set[String] = Set(Success, Dead, PartialSuccess)
}

/** Batch metadata (reference batch.clj:48-62). Runtime counters are
  * derived from the tracker state, not stored (redis/batch.clj:45-60). */
final case class BatchMeta(
    id: String,
    callbackFnSym: String,
    lingerSec: Int,
    queue: String,
    readyQueue: String,
    retryOpts: RetryOpts,
    total: Int,
    status: String,
    createdAt: Long)

/** One job-execution outcome — the event consumed by the batch tracker and
  * appended to the completions log. `terminalState` ∈ success|retrying|dead,
  * mirroring the SMOVE destinations of redis/batch.clj:107-115. */
final case class CompletionEvent(
    jobId: String,
    attempt: Int, // 0 = first run, n = n-th retry; keys consumption per try
    batchId: Option[String],
    queue: String,
    terminalState: String,
    wasRetried: Boolean,
    error: Option[String],
    executionTimeMs: Long,
    finishedAt: Long)

object JobAttempt {
  /** Which attempt a ready-row represents: goose stamps retryCount = n-1
    * on the n-th retry's failure state (retry.clj:79-91). */
  def of(job: Job): Int = job.state.map(_.retryCount + 1).getOrElse(0)
}

/** Worker process registration (reference redis/worker.clj:66-77,
  * redis/heartbeat.clj). Retained for the liveness query surface; actual
  * liveness/replay is owned by Spark checkpointing (SURVEY.md §4). */
final case class ProcessHeartbeat(
    processId: String,
    queue: String,
    lastHeartbeatAt: Long)
