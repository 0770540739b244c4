package graft.client

import org.apache.spark.sql.SparkSession
import graft.backend.QueueBackend
import graft.model.{Job, RetryOpts}

/** Group-committing client decorator for the fire-and-forget path — the
  * engine's analog of goose's RMQ async publisher confirms (reference
  * rmq/publisher_confirms.clj:20-29: publish now, confirm later; goose
  * measured ~40× async-over-sync publish throughput, BASELINE.md).
  *
  * [[GraftClient.performAsync]] costs one durable one-file append per
  * call on the base client (the direct-parquet latency path, ~5-10 ms)
  * against the reference's 2 ms in-memory Redis LPUSH. This decorator
  * buffers validated jobs driver-side and lands the buffer as ONE
  * append when either bound trips:
  *
  *  - `flushEvery` jobs accumulate (size bound), or
  *  - `flushIntervalMs` elapsed since the last flush at the next call
  *    (staleness bound — checked on-call, so the envelope is
  *    deterministic and needs no timer thread; a quiet client holds its
  *    tail until [[flush]]/[[close]]).
  *
  * Durability envelope (spec-enforced, CapabilityMatrixSpec): a job is
  * visible to workers and durable only after the flush that carries it —
  * exactly the window an RMQ publisher accepts between `basicPublish`
  * and `waitForConfirms`. A crash loses AT MOST the unflushed tail
  * (bounded by `flushEvery`), never a flushed job, and never reorders:
  * flushes preserve enqueue order (one buffer, FIFO drain).
  *
  * Scheduled / cron / batch submissions stay sync — they are
  * control-plane calls whose callers read their effects immediately.
  */
final class BufferingClient(
    backend: QueueBackend,
    spark: SparkSession,
    defaultQueue: String = "default",
    defaultRetryOpts: RetryOpts = RetryOpts(),
    nowFn: () => Long = () => System.currentTimeMillis(),
    flushEvery: Int = 1000,
    flushIntervalMs: Long = 200L)
    extends GraftClient(backend, spark, defaultQueue, defaultRetryOpts, nowFn) {

  require(flushEvery > 0, s"flushEvery must be positive: $flushEvery")
  require(flushIntervalMs >= 0, s"flushIntervalMs must be >= 0: $flushIntervalMs")

  import spark.implicits._

  private val buf = scala.collection.mutable.ArrayBuffer.empty[Job]
  // Stamped when a flush COMPLETES (not when it starts): the append
  // itself can outlast flushIntervalMs, and stamping at drain time would
  // make the very next call trip the staleness bound with a 1-job
  // buffer — degenerating the group commit back into per-call writes.
  @volatile private var lastFlushAt = nowFn()
  private val flushLock = new Object

  override protected def submitReady(jobs: Seq[Job]): Unit = {
    val due = buf.synchronized {
      buf ++= jobs
      buf.size >= flushEvery || nowFn() - lastFlushAt >= flushIntervalMs
    }
    if (due) flush()
  }

  /** Land every buffered job in one append — the wait-for-confirms
    * barrier (reference rmq/commands.clj:54-56). Returns #jobs flushed.
    * Safe from any thread; flushes serialize (so order is preserved) and
    * a job is drained by exactly one flush. */
  def flush(): Int = flushLock.synchronized {
    val batch = buf.synchronized {
      val b = buf.toVector
      buf.clear()
      b
    }
    if (batch.nonEmpty) {
      try backend.enqueueRows(batch)
      catch {
        case t: Throwable =>
          // a failed append must NOT lose the drained jobs: their
          // performAsync calls already returned ids, and the documented
          // envelope is "a crash loses at most the UNFLUSHED tail" — an
          // exception is not a crash. Re-prepend (jobs buffered during
          // the failed attempt are strictly newer, so FIFO holds) and
          // surface the failure to the tripping caller; the next flush
          // retries the whole buffer.
          buf.synchronized { buf.prependAll(batch) }
          throw t
      }
    }
    lastFlushAt = nowFn()
    batch.size
  }

  /** Jobs accepted but not yet visible/durable (diagnostics + specs). */
  def pending: Int = buf.synchronized(buf.size)

  /** Flush the tail; call on shutdown like an RMQ channel close. */
  def close(): Unit = { flush(); () }
}
