package graft.metrics

import java.net.InetSocketAddress
import java.nio.ByteBuffer
import java.nio.channels.DatagramChannel
import java.nio.charset.StandardCharsets
import java.util.concurrent.ThreadLocalRandom

/** StatsD wire backend for [[MetricsSink]] — the specimen metrics
  * backend the reference ships (metrics/statsd.clj: clj-statsd over UDP
  * with `:prefix`, `:sample-rate` and constant `:tags` merged into every
  * metric's tags). Same contract here, with zero dependencies: StatsD's
  * plain text-over-UDP line protocol
  * (`<prefix><key>:<value>|<type>[|@<rate>][|#<k>:<v>,...]`, the
  * tag suffix being the dogstatsd extension clj-statsd emits) through a
  * JDK `DatagramChannel`.
  *
  * Operational shape matches the reference: datagrams are
  * fire-and-forget, so a down/absent aggregator costs a dropped packet,
  * never a blocked worker; `sampleRate < 1` drops that fraction of
  * sends client-side and stamps `|@rate` so the aggregator re-scales.
  * The channel is `@transient`: [[MetricsSink]] is Serializable (sinks
  * ride into executor closures) and each JVM opens its own socket on
  * first use.
  */
final class StatsdMetrics(
    host: String = "localhost",
    port: Int = 8125,
    prefix: String = "graft.",
    sampleRate: Double = 1.0,
    tags: Map[String, String] = Map.empty,
    override val enabled: Boolean = true) extends MetricsSink {

  require(sampleRate > 0.0 && sampleRate <= 1.0,
    s"sampleRate must be in (0, 1], got $sampleRate")

  @transient private lazy val channel = DatagramChannel.open()
  // not a lazy val: an InetSocketAddress caches an unresolved DNS lookup
  // forever, and DatagramChannel.send with an unresolved address throws
  // UnresolvedAddressException. Re-resolve when unresolved — but rate-
  // limited: a resolver outage makes each lookup BLOCK for its timeout,
  // and per-send blocking would break the never-a-blocked-worker
  // contract harder than the dropped metrics do. While unresolved,
  // sends are skipped (see [[send]]).
  private val ResolveRetryNanos = 10_000_000_000L // at most one DNS attempt per 10s
  @transient private var targetCache: InetSocketAddress = _
  @transient private var nextResolveAt: Long = 0L
  private def target: InetSocketAddress = {
    var t = targetCache
    if (t == null || t.isUnresolved) {
      val now = System.nanoTime()
      if (t == null || now - nextResolveAt >= 0) {
        t = new InetSocketAddress(host, port)
        targetCache = t
        nextResolveAt = now + ResolveRetryNanos
      }
    }
    t
  }

  override def gauge(key: String, value: Double, extra: Map[String, String]): Unit =
    // non-finite gauges are dropped, not formatted: NaN/Inf have no statsd
    // representation and a metrics call must never throw at a call site
    if (java.lang.Double.isFinite(value)) send(line(key, num(value), "g", extra))

  override def increment(key: String, n: Long, extra: Map[String, String]): Unit =
    send(line(key, n.toString, "c", extra))

  override def timing(key: String, ms: Long, extra: Map[String, String]): Unit =
    send(line(key, ms.toString, "ms", extra))

  def close(): Unit = channel.close()

  /** Whole-number gauges print without a trailing `.0` (statsd
    * aggregators parse both, but `jobs.count:3|g` is the canonical
    * form); never scientific notation. */
  private def num(v: Double): String =
    if (v.isWhole && math.abs(v) < 1e15) v.toLong.toString
    else BigDecimal(v).bigDecimal.toPlainString

  private def line(key: String, v: String, kind: String,
      extra: Map[String, String]): String = {
    val sb = new StringBuilder(prefix).append(key).append(':').append(v)
      .append('|').append(kind)
    if (sampleRate < 1.0) sb.append("|@").append(sampleRate)
    val all = tags ++ extra // per-call tags win, as statsd.clj's merge does
    if (all.nonEmpty)
      sb.append("|#").append(
        all.toSeq.sortBy(_._1).map { case (k, x) => s"$k:$x" }.mkString(","))
    sb.toString
  }

  private def send(s: String): Unit =
    if (enabled &&
        (sampleRate >= 1.0 ||
          ThreadLocalRandom.current().nextDouble() < sampleRate))
      // fire-and-forget, like UDP itself: an unreachable/unresolvable
      // aggregator, a closed channel — none of it may escape into a
      // worker's tick or an executor task. While the host is unresolved
      // the metric is dropped outright (no send attempt, no exception).
      try {
        val t = target
        if (!t.isUnresolved)
          channel.send(ByteBuffer.wrap(s.getBytes(StandardCharsets.UTF_8)), t)
      } catch { case scala.util.control.NonFatal(_) => () }
}
