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
