package graft

import graft.backend.CommitLogBackend
import graft.model._
import org.apache.spark.sql.functions._

/** Cross-PROCESS fleet drain (VERDICT r13 #3): until r14 every fleet
  * result shared one JVM — same Spark session, same process monitors.
  * Here a SECOND JVM (graft.worker.FleetWorkerMain, launched with this
  * JVM's classpath and --add-opens) drains its queue against the same
  * commit-log root while this JVM's coordinator worker drains the
  * other; only the filesystem arbitrates. Asserts exactly-once
  * completions across the process boundary: distinct success ids catch
  * losses, TOTAL success rows catch double executions (the r13-advice
  * audit), and the claim protocol's atomic-rename arbitration is
  * exercised with genuinely disjoint memory. */
class FleetProcessSpec extends SparkSpec {
  import spark.implicits._

  private def job(i: Long, q: String): Job = Job(
    id = s"$q-$i", executeFnSym = "fleet_noop", argsJson = "[]", queue = q,
    readyQueue = q, priority = 0, enqueuedAt = 1700000000000L,
    scheduleRunAt = None, cronRunAt = None, batchId = None,
    retryOpts = RetryOpts(), state = None, seq = Job.nextSeq())

  test("two-process fleet drain is exactly-once (shared root, filesystem-arbitrated)") {
    val root = tmpDir("graft-fleet2p")
    val perQueue = 2000
    JobRegistry.register("fleet_noop", _ => "ok")
    val b = new CommitLogBackend(spark, root)
    b.enqueue(((0 until perQueue).map(i => job(i.toLong, "fleetA")) ++
      (0 until perQueue).map(i => job(i.toLong, "fleetB"))).toDS().repartition(8))

    // child process: non-coordinator worker scoped to fleetB
    val cmd = graft.worker.FleetWorkerMain.command(
      root, "fleetB", coordinator = false, cpus = 4)
    val pb = new ProcessBuilder(cmd: _*)
    pb.redirectErrorStream(true)
    val child = pb.start()
    val childOut = new StringBuilder
    val pump = new Thread(() => {
      val r = new java.io.BufferedReader(
        new java.io.InputStreamReader(child.getInputStream))
      var line = r.readLine()
      while (line != null) { childOut.synchronized(childOut.append(line).append('\n')); line = r.readLine() }
    })
    pump.setDaemon(true)
    pump.start()

    // this process: coordinator worker scoped to fleetA (runs the
    // shared-root maintenance — compaction, vacuum with its retention
    // linger — against the child's live readers)
    val w = new graft.worker.GraftWorker(b, spark, root,
      trigger = org.apache.spark.sql.streaming.Trigger.ProcessingTime("100 milliseconds"),
      maintenanceIntervalMs = 200, queue = Some("fleetA"), coordinator = true)
    w.start()
    try {
      assert(w.awaitDrained(300000), "local fleetA drain timed out")
      assert(child.waitFor(300, java.util.concurrent.TimeUnit.SECONDS),
        "child process did not exit")
      val out = childOut.synchronized(childOut.toString)
      assert(child.exitValue() == 0, s"child failed (exit ${child.exitValue()}):\n$out")
      assert(out.contains("FLEET_DRAINED_fleetB"), s"child never drained:\n$out")
    } finally {
      w.stop(graceful = true)
      if (child.isAlive) child.destroyForcibly()
    }

    // exactly-once audit over the shared log, from a FRESH instance
    val audit = new CommitLogBackend(spark, root)
    val done = audit.completions.toDF()
      .filter(col("terminalState") === "success")
      .agg(countDistinct(col("jobId")).as("d"), count(lit(1)).as("t"))
      .head()
    assert(done.getLong(0) == 2L * perQueue,
      s"lost jobs across the process boundary: ${done.getLong(0)} of ${2 * perQueue}")
    assert(done.getLong(1) == 2L * perQueue,
      s"double execution across the process boundary: ${done.getLong(1)} success rows")
    assert(audit.readyJobs.isEmpty, "both queues fully consumed")
  }
}
