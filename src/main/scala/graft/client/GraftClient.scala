package graft.client

import java.time.Instant
import java.util.UUID
import org.apache.spark.sql.SparkSession
import graft.backend.QueueBackend
import graft.cron.CronSchedule
import graft.model._

/** Client API — the engine's `goose.client` (reference client.clj).
  *
  * Validation mirrors specs.clj:97-143 (queue-name shape, arg
  * serializability) at the API boundary only — never per-row in the hot
  * path (goose measured 40% throughput cost of always-on instrumentation,
  * specs.clj:241-248).
  */
final class GraftClient(
    backend: QueueBackend,
    spark: SparkSession,
    defaultQueue: String = "default",
    defaultRetryOpts: RetryOpts = RetryOpts(),
    nowFn: () => Long = () => System.currentTimeMillis()) {

  import spark.implicits._

  private def validateQueue(q: String): Unit = {
    require(q.nonEmpty && q.length < 200, s"queue name must be 1..199 chars: '$q'")
    require(!q.startsWith("graft/"), s"queue name must be unprefixed: '$q'")
  }

  private def validated(fnSym: String, args: Seq[Any], queue: String): Job = {
    validateQueue(queue)
    require(fnSym.nonEmpty, "execute-fn-sym required")
    require(ArgsSerializers.active.roundTripConsistent(args),
      "args must serialize consistently (reference specs.clj:161-168)")
    Job(fnSym, args, queue, defaultRetryOpts).copy(enqueuedAt = nowFn())
  }

  /** Fire-and-forget enqueue (reference client.clj:60-80, S1). */
  def performAsync(fnSym: String, args: Any*): String = {
    val job = validated(fnSym, args, defaultQueue)
    backend.enqueue(Seq(job).toDS().coalesce(1))
    job.id
  }

  /** Absolute-time schedule (reference client.clj:82-106, S2). Past-due
    * jobs short-circuit to the FRONT of the ready queue
    * (redis/scheduler.clj:12-20) — here, priority=1. */
  def performAt(at: Instant, fnSym: String, args: Any*): String = {
    val job = validated(fnSym, args, defaultQueue)
    val runAt = at.toEpochMilli
    if (runAt <= nowFn()) {
      backend.enqueue(Seq(job.copy(priority = 1)).toDS().coalesce(1))
    } else {
      backend.schedule(Seq(job.copy(scheduleRunAt = Some(runAt))).toDS().coalesce(1))
    }
    job.id
  }

  /** Relative schedule (reference client.clj:108-129). */
  def performInSec(sec: Long, fnSym: String, args: Any*): String =
    performAt(Instant.ofEpochMilli(nowFn() + sec * 1000), fnSym, args: _*)

  /** Register/replace a cron entry — idempotent by name
    * (reference client.clj:131-167, redis/cron.clj:38-50, S3). */
  def performEvery(cronName: String, cronSchedule: String, fnSym: String, args: Any*): String =
    performEveryTz(cronName, cronSchedule, java.time.ZoneId.systemDefault().getId, fnSym, args: _*)

  def performEveryTz(cronName: String, cronSchedule: String, timezone: String,
      fnSym: String, args: Any*): String = {
    require(cronName.nonEmpty && cronName.length < 200, "cron name must be 1..199 chars")
    val sched = CronSchedule.parse(cronSchedule) // validates
    val zone = java.time.ZoneId.of(timezone)
    val job = validated(fnSym, args, defaultQueue)
    val desc = JobDescription(job.executeFnSym, job.argsJson, job.queue,
      job.readyQueue, job.priority, job.retryOpts)
    val next = sched.nextFire(Instant.ofEpochMilli(nowFn()), zone).toEpochMilli
    backend.upsertCron(Seq(CronEntry(cronName, cronSchedule, timezone, desc, next)))
    cronName
  }

  /** Atomic batch enqueue (reference client.clj:169-208, redis/batch.clj:21-32,
    * S4): N job rows stamped with batchId + 1 batch meta row. */
  def performBatch(
      jobs: Seq[(String, Seq[Any])],
      callbackFnSym: String,
      lingerSec: Int = 3600): String = {
    require(jobs.nonEmpty, "batch must contain at least one job")
    val batchId = UUID.randomUUID().toString
    val rows = jobs.map { case (fnSym, args) =>
      validated(fnSym, args, defaultQueue).copy(batchId = Some(batchId))
    }
    backend.putBatch(BatchMeta(batchId, callbackFnSym, lingerSec, defaultQueue,
      defaultQueue, defaultRetryOpts, rows.size, BatchStatus.InProgress, nowFn()))
    backend.enqueue(rows.toDS().coalesce(1))
    batchId
  }

  /** Bulk distributed enqueue: jobs built from an existing Dataset — the
    * path a 100 TB pipeline uses (no driver materialization). */
  def performAsyncDs(jobs: org.apache.spark.sql.Dataset[Job]): Unit =
    backend.enqueue(jobs)
}
