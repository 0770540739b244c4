package graft.worker

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import graft.backend.{BatchStatusEvent, QueueBackend}
import graft.model._

/** Progress state for one batch — goose's 4 job-id sets
  * (redis/batch.clj:14-19) kept as keyed state. Sets (not counts) so a
  * job moving retrying→success is an idempotent SMOVE (redis/batch.clj:
  * 101-134), and replayed events can't double-count. */
final case class BatchProgress(
    total: Int,
    succeeded: Set[String],
    retrying: Set[String],
    dead: Set[String],
    callbackEmitted: Boolean) {

  def enqueuedCount: Int = total - succeeded.size - retrying.size - dead.size

  def applyEvent(jobId: String, terminalState: String): BatchProgress = {
    val cleared = copy(
      succeeded = succeeded - jobId, retrying = retrying - jobId, dead = dead - jobId)
    terminalState match {
      case "success" => cleared.copy(succeeded = cleared.succeeded + jobId)
      case "retrying" => cleared.copy(retrying = cleared.retrying + jobId)
      case "dead" => cleared.copy(dead = cleared.dead + jobId)
      case other => throw new IllegalArgumentException(s"bad terminal state $other")
    }
  }

  /** reference batch.clj:40-46 */
  def status: String =
    if (enqueuedCount > 0 || retrying.nonEmpty) BatchStatus.InProgress
    else if (dead.isEmpty) BatchStatus.Success
    else if (succeeded.isEmpty) BatchStatus.Dead
    else BatchStatus.PartialSuccess
}

object BatchProgress {
  def empty(total: Int): BatchProgress =
    BatchProgress(total, Set.empty, Set.empty, Set.empty, callbackEmitted = false)
}

/** A batch reaching terminal status, to be turned into exactly one
  * callback job (reference batch.clj:64-66, redis/batch.clj:73-90). */
final case class BatchTerminal(batchId: String, status: String, at: Long)

/** Batch lifecycle tracking (SURVEY.md §2.5 D7/D8).
  *
  * goose needs an atomic SMOVE+4×SCARD Redis transaction so exactly ONE
  * finishing job observes the terminal count (ADR batch-jobs.md "race
  * condition"). Here the per-key serial state update of
  * `flatMapGroupsWithState` makes the race unrepresentable: all events of
  * one batch fold through one state slot, and the terminal transition
  * emits exactly once (`callbackEmitted` latch).
  */
object BatchTracker extends Serializable {
  /** The keyed fold behind flatMapGroupsWithState — in a standalone
    * object so the closure ships to executors without capturing the
    * tracker (which holds the SparkSession). */
  def fold(
      batchId: String,
      events: Iterator[CompletionEvent],
      state: GroupState[BatchProgress],
      totalOf: String => Int): Iterator[BatchTerminal] = {
    var progress = state.getOption.getOrElse(BatchProgress.empty(totalOf(batchId)))
    var emitted: List[BatchTerminal] = Nil
    var lastAt = 0L
    events.foreach { e =>
      progress = progress.applyEvent(e.jobId, e.terminalState)
      lastAt = math.max(lastAt, e.finishedAt)
      val st = progress.status
      if (BatchStatus.terminal(st) && !progress.callbackEmitted) {
        progress = progress.copy(callbackEmitted = true)
        emitted ::= BatchTerminal(batchId, st, lastAt)
      }
    }
    state.update(progress)
    emitted.iterator
  }
}

final class BatchTracker(backend: QueueBackend, spark: SparkSession) {
  import spark.implicits._

  /** Batch-mode tracking pass: fold all batch-stamped completion events
    * per batchId (distributed groupByKey — the fold runs on executors, one
    * group per batch, so 10^6 batches scale out horizontally) and commit
    * callbacks + status rows for NEWLY terminal batches. Idempotent:
    * batches already recorded terminal in batch_status are skipped.
    *
    * Synchronized: the skip-if-terminal check-then-commit is only atomic
    * within one tracker, so all in-process callers share the lock. Across
    * processes the engine assumes a single maintenance coordinator (the
    * same assumption goose makes for its scheduler thread); the streaming
    * path gets the guarantee from per-key state instead. */
  def trackPass(): Seq[BatchTerminal] = synchronized {
    val metas = backend.batches.select($"id".as("m_bid"), $"total", $"createdAt")
    val evs = backend.completions.filter($"batchId".isNotNull)
      .join(broadcast(metas), $"batchId" === $"m_bid")
      .select($"batchId".as[String], $"jobId".as[String],
        $"terminalState".as[String], $"finishedAt".as[Long], $"total".as[Int])

    val folded: Dataset[BatchTerminal] = evs
      .groupByKey(_._1)
      .mapGroups { (bid, it) =>
        val sorted = it.toArray.sortBy(_._4)
        if (sorted.isEmpty) BatchTerminal(bid, BatchStatus.InProgress, 0L)
        else {
          var p = BatchProgress.empty(sorted.head._5)
          sorted.foreach(e => p = p.applyEvent(e._2, e._3))
          BatchTerminal(bid, p.status, sorted.map(_._4).max)
        }
      }
      .filter(t => BatchStatus.terminal(t.status))

    val already = backend.batchStatusEvents
      .filter(e => BatchStatus.terminal(e.status))
      .select($"batchId".as("s_bid"))
    val fresh = folded
      .join(broadcast(already), $"batchId" === $"s_bid", "left_anti")
      .as[BatchTerminal]
      .collect().toSeq // bounded by #newly-terminal batches, not job volume

    if (fresh.nonEmpty) {
      val metaMap = backend.batches
        .join(broadcast(fresh.map(_.batchId).toDF("f_bid")), $"id" === $"f_bid", "left_semi")
        .as[BatchMeta].collect().map(m => m.id -> m).toMap
      commitTerminals(fresh, metaMap)
    }
    fresh
  }

  /** Streaming tracking: completion events keyed by batchId through
    * flatMapGroupsWithState; callback emission happens in foreachBatch on
    * the emitted terminals. `metas` is broadcast via closure (the batch
    * registry is small; at larger scale this becomes a state-store join).
    */
  def streamingTerminals(events: Dataset[CompletionEvent]): Dataset[BatchTerminal] = {
    val metas = backend.batches.collect().map(m => m.id -> m.total).toMap
    events
      .filter(_.batchId.isDefined)
      .groupByKey(_.batchId.get)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (bid: String, evs: Iterator[CompletionEvent], st: GroupState[BatchProgress]) =>
          BatchTracker.fold(bid, evs, st, metas.getOrElse(_, Int.MaxValue))
      }
  }

  /** Enqueue callback jobs (front of queue, redis/batch.clj:73-90) and
    * record terminal status rows. */
  def commitTerminals(terminals: Seq[BatchTerminal], metas: Map[String, BatchMeta]): Unit = {
    val callbackJobs = terminals.flatMap { t =>
      metas.get(t.batchId).map { meta =>
        Job(meta.callbackFnSym, Seq(t.batchId, t.status), meta.queue, meta.retryOpts)
          .copy(priority = 1)
      }
    }
    if (callbackJobs.nonEmpty) backend.enqueue(spark.createDataset(callbackJobs).coalesce(1))
    backend.recordBatchStatus(terminals.map(t => BatchStatusEvent(t.batchId, t.status, t.at)))
  }

  /** Current derived progress of one batch (redis/batch.clj:45-60: counts
    * are set cardinalities, computed not stored). */
  def progressOf(batchId: String): Option[BatchProgress] =
    backend.batches.filter($"id" === batchId).collect().headOption.map { meta =>
      var p = BatchProgress.empty(meta.total)
      backend.completions.filter($"batchId" === batchId)
        .orderBy($"finishedAt").collect()
        .foreach(e => p = p.applyEvent(e.jobId, e.terminalState))
      p
    }
}
