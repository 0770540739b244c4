package graft.model

import java.util.concurrent.ConcurrentHashMap
import scala.jdk.CollectionConverters._

/** The engine's analog of goose's resolvable fn symbols
  * (reference consumer.clj:5-7, utils.clj:72-80): `executeFnSym` is a key
  * into a process-wide function table.
  *
  * On a real cluster every executor JVM must see the same registrations;
  * the supported pattern is a user object extending [[JobFunctionSet]]
  * whose class name travels with the worker config and is reflectively
  * instantiated on first lookup (the JVM-classpath equivalent of goose's
  * `require-resolve`). Local mode shares one JVM, so plain `register`
  * works too.
  */
object JobRegistry {
  type JobFn = Seq[Any] => Any
  type BackoffFn = Int => Int // retryCount => delay seconds
  type ErrorHandler = (Job, Throwable) => Unit

  private val fns = new ConcurrentHashMap[String, JobFn]()
  private val backoffs = new ConcurrentHashMap[String, BackoffFn]()
  private val handlers = new ConcurrentHashMap[String, ErrorHandler]()
  private val loadedSets = ConcurrentHashMap.newKeySet[String]()

  /** Default backoff (reference retry.clj:22-27):
    * 20 + rand(20)·(n+1) + n⁴ seconds. */
  val defaultBackoff: BackoffFn = n =>
    20 + scala.util.Random.nextInt(20) * (n + 1) + n * n * n * n

  backoffs.put("default", defaultBackoff)
  handlers.put("default", (_, _) => ())

  def register(name: String, fn: JobFn): Unit = fns.put(name, fn)
  def registerBackoff(name: String, fn: BackoffFn): Unit = backoffs.put(name, fn)
  def registerHandler(name: String, h: ErrorHandler): Unit = handlers.put(name, h)

  def resolve(sym: String): JobFn = {
    val direct = fns.get(sym)
    if (direct != null) return direct
    // "com.acme.MyFunctions#frobnicate" → load the set, then look up.
    val hash = sym.indexOf('#')
    if (hash > 0) {
      val cls = sym.substring(0, hash)
      if (loadedSets.add(cls)) {
        val set = Class.forName(cls).getDeclaredConstructor().newInstance()
          .asInstanceOf[JobFunctionSet]
        set.functions.foreach { case (n, f) => fns.putIfAbsent(s"$cls#$n", f) }
      }
      val loaded = fns.get(sym)
      if (loaded != null) return loaded
    }
    throw new IllegalArgumentException(s"unresolvable job fn: $sym")
  }

  def resolveBackoff(name: String): BackoffFn =
    Option(backoffs.get(name)).getOrElse(defaultBackoff)

  def resolveHandler(name: String): ErrorHandler =
    Option(handlers.get(name)).getOrElse((_, _) => ())

  def registered: Set[String] = fns.keySet().asScala.toSet
}

/** User hook: a no-arg class exposing named job functions, loadable by
  * reflection on every executor (see [[JobRegistry.resolve]]). */
trait JobFunctionSet {
  def functions: Map[String, JobRegistry.JobFn]
}
