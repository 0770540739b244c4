package graft

/** Process-wide stage wall-clock accumulator for probe diagnostics —
  * the shared-queue and claimed-consumption lanes print and reset it,
  * so a throughput move is ATTRIBUTED to a stage instead of guessed
  * (the same discipline as the producer-path profile, SCALING.md).
  * Cheap enough to stay on in production paths: two nanoTime reads and
  * one LongAdder add per stage invocation, no allocation after the
  * first hit of each label. */
object Prof {
  private val nanos = new java.util.concurrent.ConcurrentHashMap[
    String, java.util.concurrent.atomic.LongAdder]()
  private val hits = new java.util.concurrent.ConcurrentHashMap[
    String, java.util.concurrent.atomic.LongAdder]()

  @inline def stage[A](name: String)(body: => A): A = {
    val t0 = System.nanoTime()
    try body finally {
      nanos.computeIfAbsent(name, _ => new java.util.concurrent.atomic.LongAdder)
        .add(System.nanoTime() - t0)
      hits.computeIfAbsent(name, _ => new java.util.concurrent.atomic.LongAdder)
        .increment()
    }
  }

  /** (label -> (total seconds, invocation count)), optionally cleared. */
  def snapshot(reset: Boolean): Map[String, (Double, Long)] = {
    import scala.jdk.CollectionConverters._
    val out = nanos.asScala.map { case (k, v) =>
      k -> ((v.sum / 1e9, Option(hits.get(k)).map(_.sum).getOrElse(0L)))
    }.toMap
    if (reset) { nanos.clear(); hits.clear() }
    out
  }
}
