package graft.worker

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.Trigger

/** Cross-PROCESS fleet worker harness (VERDICT r13 #3).
  *
  * Every fleet result so far shared one JVM: separate
  * [[graft.backend.CommitLogBackend]] instances over one root, but the
  * same Spark session, the same process monitors, the same page cache
  * view. The manifest claim protocol's real target is separate
  * PROCESSES, where only the filesystem arbitrates — atomic rename for
  * commit claims, no shared in-memory locks, no shared block manager
  * (goose's analog: multi-worker integration tests against a genuinely
  * shared external Redis, redis/integration_test.clj:67-86). This main
  * is one such process: its own SparkSession, its own backend instance,
  * one queue-scoped [[GraftWorker]], drained to completion.
  *
  * Launched by FleetProcessSpec (CI: two-process exactly-once drain)
  * and by the ScaleProbe cross-process lane (the 200k book) via
  * ProcessBuilder with the parent's classpath and --add-opens set.
  *
  * args: root queue coordinator(bool) cpus(int)
  * Prints `FLEET_DRAINED_<queue>` and exits 0 on a full drain; exits 2
  * on drain timeout, nonzero on any failure.
  */
object FleetWorkerMain {

  /** Executions observed INSIDE this process — the exactly-once
    * evidence the parent parses (`FLEET_EXECUTED_<queue>=<n>`).
    * Completion ROWS cannot serve as that audit under aggressive
    * maintenance: the completions fold deliberately GCs events whose
    * job has left the ready log and whose batch is terminal/absent
    * (the q46-gated retention design), so a parent counting completion
    * rows after the drain is auditing a garbage-collected log (the r15
    * 4-JVM soak failed exactly this way: the LOCAL worker's books were
    * collected mid-drain while the children's survived by timing).
    * Counting body invocations measures what exactly-once is ABOUT —
    * executions — and is immune to retention. local[*] keeps executor
    * code in-process, so a plain AtomicLong sees every invocation. */
  val executed = new java.util.concurrent.atomic.AtomicLong()

  def main(args: Array[String]): Unit = {
    val root = args(0)
    val queue = args(1)
    val coordinator = args.length > 2 && args(2).toBoolean
    val cpus = if (args.length > 3) args(3) else "8"
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName(s"graft-fleet-$queue")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.model.JobRegistry.register("fleet_noop",
      _ => { executed.incrementAndGet(); "ok" })
    val backend = new graft.backend.CommitLogBackend(spark, root)
    val worker = new GraftWorker(backend, spark, root,
      trigger = Trigger.ProcessingTime("100 milliseconds"),
      maintenanceIntervalMs = 200,
      queue = Some(queue), coordinator = coordinator)
    val t0 = System.nanoTime()
    worker.start()
    val ok = try worker.awaitDrained(600000)
      finally worker.stop(graceful = true)
    val sec = (System.nanoTime() - t0) / 1e9
    spark.stop()
    if (!ok) { System.err.println(s"FLEET_TIMEOUT_$queue"); sys.exit(2) }
    // parsed by the ScaleProbe cross-process lane: drain seconds measured
    // INSIDE the child (excludes JVM+Spark cold start, which the lane
    // prices separately), plus the claim-race diagnostic counter
    println(f"FLEET_SECONDS_$queue=$sec%.3f")
    println(s"FLEET_CLAIMRETRIES_$queue=${backend.claimRetries.get}")
    println(s"FLEET_EXECUTED_$queue=${executed.get}")
    println(s"FLEET_DRAINED_$queue")
    sys.exit(0)
  }

  /** Build the child-process command for THIS environment: same JVM,
    * same classpath, same --add-opens (Spark 4 on JDK 17 needs them
    * outside spark-submit). Shared by the spec and the probe lane. */
  def command(root: String, queue: String, coordinator: Boolean,
      cpus: Int, maxHeap: String = "4g"): Seq[String] = {
    import scala.jdk.CollectionConverters._
    val javaBin = s"${System.getProperty("java.home")}/bin/java"
    val addOpens = java.lang.management.ManagementFactory.getRuntimeMXBean
      .getInputArguments.asScala.toSeq
      .sliding(2).collect { case Seq("--add-opens", v) => Seq("--add-opens", v) }
      .flatten.toSeq
    Seq(javaBin) ++ addOpens ++ Seq(
      s"-Xmx$maxHeap",
      "-cp", System.getProperty("java.class.path"),
      "graft.worker.FleetWorkerMain",
      root, queue, coordinator.toString, cpus.toString)
  }
}
