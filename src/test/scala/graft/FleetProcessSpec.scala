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

  test("4-JVM fleet survives AGGRESSIVE coordinator vacuum racing cross-process readers") {
    // VERDICT r14 #3: the retention linger (CommitLogBackend vacuum's
    // mark-then-sweep) is what protects OTHER processes' in-flight read
    // plans — plain spark.read.parquet over replaced files, no
    // missing-file tolerance — from the coordinator's compaction+vacuum.
    // Until now no test drove that race: here THREE child JVMs stream
    // their queues while this JVM's coordinator compacts on a hair
    // trigger (policy every 2 ticks, fold pressure at 4 files) and
    // vacuums with a SECONDS-scale linger, so replaced files are
    // genuinely unlinked while children hold plans over the shared
    // root. Pass = every queue drains, zero FileNotFoundException in
    // any child, books exactly-once on both distinct ids and total
    // rows (reference shape: goose's multi-worker integration tests
    // against one live shared broker, redis/integration_test.clj:67-86).
    val root = tmpDir("graft-fleet4p")
    val perQueue = 1200
    // Exactly-once here is audited by EXECUTION COUNTS, not completion
    // rows: under this test's hair-trigger maintenance the completions
    // fold legitimately GCs events whose job has left the ready log
    // (the q46-gated retention rule — see FleetWorkerMain.executed),
    // so completion-row counts measure retention timing, not
    // correctness. The local lane counts its own body invocations;
    // each child prints FLEET_EXECUTED_<q> from inside its JVM.
    val localExecuted = new java.util.concurrent.atomic.AtomicLong()
    JobRegistry.register("fleet_noop", _ => "ok")
    JobRegistry.register("fleet_count_local",
      _ => { localExecuted.incrementAndGet(); "ok" })
    val b = new CommitLogBackend(spark, root)
    val childQueues = Seq("fleetB", "fleetC", "fleetD")
    val queues = "fleetA" +: childQueues
    b.enqueue(queues.flatMap(q =>
      (0 until perQueue).map(i => job(i.toLong, q)
        .copy(executeFnSym = if (q == "fleetA") "fleet_count_local" else "fleet_noop")))
      .toDS().repartition(8))

    val children = childQueues.map { q =>
      val cmd = graft.worker.FleetWorkerMain.command(
        root, q, coordinator = false, cpus = 3, maxHeap = "3g")
      val pb = new ProcessBuilder(cmd: _*)
      pb.redirectErrorStream(true)
      val child = pb.start()
      val out = new StringBuilder
      val pump = new Thread(() => {
        val r = new java.io.BufferedReader(
          new java.io.InputStreamReader(child.getInputStream))
        var line = r.readLine()
        while (line != null) { out.synchronized(out.append(line).append('\n')); line = r.readLine() }
      })
      pump.setDaemon(true)
      pump.start()
      (q, child, out)
    }

    // the coordinator: every-400ms compaction policy over a 4-file
    // pressure bar, 2 s vacuum linger — aggressive enough that folds and
    // sweeps run CONTINUOUSLY against the children's live streams, long
    // enough to honor the linger's own contract (a micro-batch plan's
    // life is well under 2 s here)
    val w = new graft.worker.GraftWorker(b, spark, root,
      trigger = org.apache.spark.sql.streaming.Trigger.ProcessingTime("100 milliseconds"),
      maintenanceIntervalMs = 200, compactEveryTicks = 2, compactMinFiles = 4,
      queue = Some("fleetA"), coordinator = true, vacuumRetentionMs = 2000)
    w.start()
    try {
      assert(w.awaitDrained(300000), "local fleetA drain timed out")
      children.foreach { case (q, child, out) =>
        assert(child.waitFor(300, java.util.concurrent.TimeUnit.SECONDS),
          s"child $q did not exit:\n${out.synchronized(out.toString)}")
        val o = out.synchronized(out.toString)
        assert(child.exitValue() == 0, s"child $q failed (exit ${child.exitValue()}):\n$o")
        assert(o.contains(s"FLEET_DRAINED_$q"), s"child $q never drained:\n$o")
        // exactly-once, measured where it happens: every body invocation
        // in the child's JVM — catches losses (< perQueue) AND crash
        // replays / claim-race doubles (> perQueue)
        assert(o.contains(s"FLEET_EXECUTED_$q=$perQueue"),
          s"child $q execution count off (want $perQueue):\n$o")
        assert(!o.contains("FileNotFoundException"),
          s"child $q read a vacuumed file — the retention linger failed:\n$o")
      }
    } finally {
      w.stop(graceful = true)
      children.foreach { case (_, child, _) => if (child.isAlive) child.destroyForcibly() }
    }
    assert(localExecuted.get() == perQueue,
      s"local fleetA execution count off: ${localExecuted.get()} of $perQueue")

    val audit = new CommitLogBackend(spark, root)
    // whatever completions the retention rule kept must be double-free
    val done = audit.completions.toDF()
      .filter(col("terminalState") === "success")
      .agg(countDistinct(col("jobId")).as("d"), count(lit(1)).as("t"))
      .head()
    assert(done.getLong(0) == done.getLong(1),
      s"duplicate completion rows under aggressive vacuum: ${done.getLong(1)} rows over ${done.getLong(0)} ids")
    assert(audit.readyJobs.isEmpty, "all four queues fully consumed")
  }
}
