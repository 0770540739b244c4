package graft

import org.apache.spark.sql.SparkSession
import graft.backend.ParquetBackend
import graft.model._
import graft.worker.{SchedulerEngine, WorkerEngine}

/** Scratch profiler for the job-pipeline bench. */
object BenchProfile {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    JobRegistry.register("bench_noop", _ => "ok")
    JobRegistry.register("bench_flaky", _ => throw new RuntimeException("bench"))
    JobRegistry.registerBackoff("bench_instant", _ => 0)

    def step[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"STEP $name: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    // tiny warmup
    spark.range(10).map(_ + 1).count()

    val n = 100000
    graft.Scratch.withDir("graft-prof") { root =>
    val backend = new ParquetBackend(spark, root)
    val clock = new java.util.concurrent.atomic.AtomicLong(1700000000000L)
    val worker = new WorkerEngine(backend, spark, Nil, () => clock.get())
    val sched = new SchedulerEngine(backend, spark, () => clock.get())
    val retry = RetryOpts(maxRetries = 1, retryDelaySecFn = "bench_instant")
    val jobs = spark.range(n).map { i =>
      Job(i.toString, if (i % 100 == 0) "bench_flaky" else "bench_noop",
        "[]", "bench", "bench", 0, 1700000000000L, None, None, None, retry, None, Job.nextSeq())
    }
    // full warm: run a throwaway round end-to-end first
    graft.Scratch.withDir("graft-warm") { r2 =>
      val b2 = new ParquetBackend(spark, r2)
      val w2 = new WorkerEngine(b2, spark, Nil, () => clock.get())
      b2.enqueue(jobs.limit(1000))
      w2.runPass()
    }
    step("enqueue-32part")(backend.enqueue(jobs))
    step("pass1")(println("  " + worker.runPass()))
    clock.addAndGet(1000)
    step("promote")(sched.promoteDue())
    step("pass2")(println("  " + worker.runPass()))
    step("pass3-empty")(println("  " + worker.runPass()))
    // variant B: single-file enqueue
    graft.Scratch.withDir("graft-b") { rB =>
      val bB = new ParquetBackend(spark, rB)
      val wB = new WorkerEngine(bB, spark, Nil, () => clock.get())
      step("enqueueB-1part")(bB.enqueue(jobs.coalesce(1)))
      step("passB1")(println("  " + wB.runPass()))
    }
    } // graft-prof scratch
    spark.stop()
  }
}
