package graft.model

import java.util.concurrent.atomic.AtomicInteger
import org.scalatest.funsuite.AnyFunSuite

/** A function set loadable by reflection on any executor JVM — the
  * cluster-side registration path (consumer.clj:5-7's require-resolve). */
class RegistrySpecFnSet extends JobFunctionSet {
  def functions: Map[String, JobRegistry.JobFn] = Map(
    "greet" -> (args => s"hello ${args.headOption.getOrElse("world")}"),
    "count" -> (_ => RegistrySpecFnSet.hits.incrementAndGet()))
}

object RegistrySpecFnSet {
  val hits = new AtomicInteger(0)
}

class JobRegistrySpec extends AnyFunSuite {

  test("direct registration resolves") {
    JobRegistry.register("direct-fn", args => args.length)
    assert(JobRegistry.resolve("direct-fn")(Seq(1, 2)) == 2)
  }

  test("Class#fn syms load the set reflectively, once") {
    val sym = "graft.model.RegistrySpecFnSet#greet"
    assert(JobRegistry.resolve(sym)(Seq("graft")) == "hello graft")
    val sym2 = "graft.model.RegistrySpecFnSet#count"
    JobRegistry.resolve(sym2)(Nil)
    JobRegistry.resolve(sym2)(Nil)
    assert(RegistrySpecFnSet.hits.get() == 2) // invoked per call, loaded once
  }

  test("unresolvable syms throw") {
    intercept[IllegalArgumentException] { JobRegistry.resolve("nope") }
    intercept[Exception] { JobRegistry.resolve("no.such.Class#fn") }
  }

  test("default backoff follows the goose curve 20 + rand(20)(n+1) + n^4") {
    (0 to 5).foreach { n =>
      val d = JobRegistry.defaultBackoff(n)
      assert(d >= 20 + n * n * n * n)
      assert(d <= 20 + 19 * (n + 1) + n * n * n * n)
    }
  }
}
