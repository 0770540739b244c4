package graft

import org.apache.spark.sql.SparkSession

/** Ad-hoc single-query timing probe: `runMain graft.QuickProbe <sfDir> <name>...`
  * — fresh-JVM timings for isolating bench anomalies from cumulative
  * session state. Each query runs twice (cold, warm). */
object QuickProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.head
    val names = args.tail
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach {
      // pseudo-query: per-stage split of the direct-append latency path,
      // A/B'd across parquet codecs (the writer-build stage includes
      // compressor allocation; codec() reads the session conf)
      case "__enqueue_profile" =>
        Seq("snappy", "uncompressed").foreach { codecName =>
          spark.conf.set("spark.sql.parquet.compression.codec", codecName)
          graft.Scratch.withDir("probe-enqprof") { root =>
            graft.model.JobRegistry.register("bench_noop", _ => "ok")
            val client = new graft.client.GraftClient(
              new graft.backend.ParquetBackend(spark, root), spark, "bench")
            (1 to 16).foreach(i => client.performAsync("bench_noop", -i)) // warm
            val timer = new graft.backend.DirectParquetAppend.StageTimer
            graft.backend.DirectParquetAppend.profiler.set(timer)
            val n = 128
            val t0 = System.nanoTime()
            (1 to n).foreach(i => client.performAsync("bench_noop", i))
            val total = (System.nanoTime() - t0) / 1e6
            graft.backend.DirectParquetAppend.profiler.remove()
            val staged = timer.stages.map { case (k, v) => f"$k=${v / n}%.2fms" }
            val inAppend = timer.stages.values.sum
            println(f"PROBE enqueue_profile codec=$codecName n=$n total=${total / n}%.2fms/call " +
              f"append=${inAppend / n}%.2fms ${staged.mkString(" ")} " +
              f"outside_append=${(total - inAppend) / n}%.2fms")
          }
          spark.conf.set("spark.sql.parquet.compression.codec", "snappy")
        }
      // pseudo-query: the per-call enqueue micro-bench, standalone
      case "__enqueue" =>
        (1 to 2).foreach { pass =>
          val (syncRate, bufRate) = Bench.benchEnqueue(spark)
          println(f"PROBE enqueue pass$pass sync=$syncRate%.0f/s buffered=$bufRate%.0f/s")
        }
      case name =>
        (1 to 2).foreach { pass =>
          val t0 = System.nanoTime()
          SparkEntry.queries(name)(spark, sfDir).count()
          println(f"PROBE $name pass$pass ${(System.nanoTime() - t0) / 1e9}%.2f s")
        }
    }
    spark.stop()
  }
}
