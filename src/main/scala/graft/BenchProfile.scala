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

    if (args.contains("direct")) {
      graft.Scratch.withDir("graft-direct-prof") { root =>
        val enc = implicitly[org.apache.spark.sql.Encoder[Job]]
        val retry0 = RetryOpts()
        val j = Job("x", "bench_noop", "[]", "q", "q", 0, 1L, None, None, None, retry0, None, 1L)
        def t(name: String, reps: Int)(f: => Unit): Unit = {
          val t0 = System.nanoTime()
          (1 to reps).foreach(_ => f)
          println(f"DIRECT $name: ${(System.nanoTime() - t0) / 1e6 / reps}%.2f ms/op over $reps")
        }
        t("newHadoopConf", 50)(spark.sessionState.newHadoopConf())
        t("exprEncoder+serializer", 50) {
          val e = org.apache.spark.sql.catalyst.encoders.ExpressionEncoder(
            enc.asInstanceOf[org.apache.spark.sql.catalyst.encoders.AgnosticEncoder[Job]])
          e.createSerializer()(j)
        }
        t("full append 1 row", 50)(
          graft.backend.DirectParquetAppend.append(spark, enc, s"$root/t", Seq(j.copy(seq = Job.nextSeq()))))
        t("append again (warm)", 200)(
          graft.backend.DirectParquetAppend.append(spark, enc, s"$root/t", Seq(j.copy(seq = Job.nextSeq()))))

      }
      spark.stop()
      return
    }

    if (args.contains("enqueue")) {
      (1 to 3).foreach { i =>
        val (s, b) = Bench.benchEnqueue(spark)
        println(f"ENQUEUE[$i] percall=$s%.0f buffered=$b%.0f jobs/s")
      }
      spark.stop()
      return
    }

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
