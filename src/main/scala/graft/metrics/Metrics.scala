package graft.metrics

import graft.model.ModelEncoders._
import java.util.concurrent.ConcurrentHashMap
import java.util.concurrent.atomic.LongAdder
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQueryListener
import graft.backend.QueueBackend
import graft.model.Job

/** Metrics seam — the engine's `goose.metrics/Metrics` protocol
  * (reference metrics.clj:35-50: enabled?/gauge/increment/timing; a nil
  * implementation disables the whole subsystem). */
trait MetricsSink extends Serializable {
  def enabled: Boolean
  def gauge(key: String, value: Double, tags: Map[String, String] = Map.empty): Unit
  def increment(key: String, n: Long = 1, tags: Map[String, String] = Map.empty): Unit
  def timing(key: String, ms: Long, tags: Map[String, String] = Map.empty): Unit
}

object NoopMetrics extends MetricsSink {
  def enabled = false
  def gauge(key: String, value: Double, tags: Map[String, String]): Unit = ()
  def increment(key: String, n: Long, tags: Map[String, String]): Unit = ()
  def timing(key: String, ms: Long, tags: Map[String, String]): Unit = ()
}

/** In-process sink for tests and local runs (counters are LongAdders so
  * executor threads in local mode can hit them concurrently). */
final class InMemoryMetrics extends MetricsSink {
  val gauges = new ConcurrentHashMap[String, Double]()
  val counters = new ConcurrentHashMap[String, LongAdder]()
  val timings = new ConcurrentHashMap[String, LongAdder]()

  private def k(key: String, tags: Map[String, String]): String =
    if (tags.isEmpty) key
    else key + tags.toSeq.sorted.map { case (a, b) => s",$a=$b" }.mkString

  def enabled = true
  def gauge(key: String, value: Double, tags: Map[String, String]): Unit =
    gauges.put(k(key, tags), value)
  def increment(key: String, n: Long, tags: Map[String, String]): Unit =
    counters.computeIfAbsent(k(key, tags), _ => new LongAdder).add(n)
  def timing(key: String, ms: Long, tags: Map[String, String]): Unit =
    timings.computeIfAbsent(k(key, tags), _ => new LongAdder).add(ms)

  def counter(key: String): Long =
    Option(counters.get(key)).map(_.sum()).getOrElse(0L)
}

/** Process-wide sink registry. Task closures must not capture a sink
  * directly — Spark serializes closures even in local mode, so executors
  * would mutate a deserialized COPY. A closure captures only the sink's
  * registered name and resolves it in the executing JVM (on a cluster,
  * each executor registers its own forwarding sink at startup, the same
  * pattern as [[graft.model.JobRegistry]]). */
object MetricsRegistry {
  private val sinks = new ConcurrentHashMap[String, MetricsSink]()
  def register(name: String, sink: MetricsSink): Unit = sinks.put(name, sink)
  def resolve(name: String): MetricsSink =
    Option(sinks.get(name)).getOrElse(NoopMetrics)
}

object Metrics {
  // Metric names mirror goose's (reference metrics.clj:7-33).
  val ExecutionTime = "job.execution_time"
  val SuccessCount = "job.success_count"
  val FailureCount = "job.failure_count"
  val RecoveredCount = "job.recovered_count"
  val ExecutionLatency = "job.execution_latency"
  val ScheduleLatency = "scheduled_job.execution_latency"
  val CronLatency = "cron_job.execution_latency"
  val RetryLatency = "retry_job.execution_latency"

  /** A6 latency source selection (reference job.clj:45-61): the latency
    * bucket is chosen by the first defined of retry-at | schedule-run-at |
    * cron-run-at | enqueued-at. */
  def latencyOf(job: Job, now: Long): (String, Long) =
    job.state.flatMap(_.retryAt).map(t => (RetryLatency, now - t))
      .orElse(job.scheduleRunAt.map(t => (ScheduleLatency, now - t)))
      .orElse(job.cronRunAt.map(t => (CronLatency, now - t)))
      .getOrElse((ExecutionLatency, now - job.enqueuedAt))

  /** Middleware timing execution + counting outcomes — the engine's
    * wrap-metrics + wrap-latency (reference metrics.clj:59-86). Runs on
    * executors; captures only the sink NAME (see [[MetricsRegistry]]). */
  def middleware(sinkName: String): graft.worker.WorkerCore.Middleware = next => job => {
    val sink = MetricsRegistry.resolve(sinkName)
    if (!sink.enabled) next(job)
    else {
      val now = System.currentTimeMillis()
      val (latKey, lat) = latencyOf(job, now)
      sink.timing(latKey, math.max(lat, 0), Map("queue" -> job.queue))
      val t0 = System.nanoTime()
      try {
        val r = next(job)
        sink.increment(if (job.retried) RecoveredCount else SuccessCount,
          1, Map("queue" -> job.queue))
        r
      } catch {
        case e: Throwable =>
          sink.increment(FailureCount, 1, Map("queue" -> job.queue))
          throw e
      } finally {
        sink.timing(ExecutionTime, (System.nanoTime() - t0) / 1000000,
          Map("queue" -> job.queue))
      }
    }
  }

  /** A4 broker-level gauges in two grouped scans (reference
    * redis/metrics.clj:14-58 runs one LLEN per queue; here one groupBy
    * covers every queue). */
  def publishGauges(backend: QueueBackend, spark: SparkSession, sink: MetricsSink): Unit = {
    if (!sink.enabled) return
    import spark.implicits._
    // Provably-empty tables gauge 0 from metadata (r16, the r15
    // emptiness-probe discipline): this runs every maintenance tick
    // forever, and an IDLE worker with an enabled sink otherwise pays
    // five empty Spark jobs per second — goose's gauge pass is five
    // O(1) Redis size reads (reference redis/metrics.clj).
    val perQueue =
      if (!backend.maybeNonEmpty("ready")) Array.empty[(String, Long)]
      else backend.readyJobs.groupBy($"queue").agg(count(lit(1)).as("n"))
        .as[(String, Long)].collect()
    perQueue.foreach { case (q, n) => sink.gauge("enqueued.size", n.toDouble, Map("queue" -> q)) }
    sink.gauge("total_enqueued.size", perQueue.map(_._2).sum.toDouble)
    def sized(tbl: String)(ds: => org.apache.spark.sql.Dataset[_]): Double =
      if (!backend.maybeNonEmpty(tbl)) 0.0 else ds.count().toDouble
    sink.gauge("scheduled.size", sized("scheduled")(backend.scheduledJobs))
    sink.gauge("dead.size", sized("dead")(backend.deadJobs))
    sink.gauge("cron_entries.size", sized("cron")(backend.cronEntries))
    sink.gauge("batches.size", sized("batches")(backend.batches))
  }
}

/** Streaming observability: forwards micro-batch progress to the sink
  * (rows/sec and batch duration per query). */
final class GraftStreamingListener(sink: MetricsSink) extends StreamingQueryListener {
  override def onQueryStarted(e: StreamingQueryListener.QueryStartedEvent): Unit = ()
  override def onQueryTerminated(e: StreamingQueryListener.QueryTerminatedEvent): Unit = ()
  override def onQueryProgress(e: StreamingQueryListener.QueryProgressEvent): Unit = {
    val p = e.progress
    sink.gauge("stream.input_rows_per_sec",
      Option(p.inputRowsPerSecond).filterNot(_.isNaN).getOrElse(0.0),
      Map("query" -> p.name))
    sink.gauge("stream.batch_duration_ms",
      p.batchDuration.toDouble, Map("query" -> p.name))
  }
}
