package graft.operators

import java.util.concurrent.atomic.AtomicLong
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.backend.ParquetBackend
import graft.model._
import graft.worker.{BatchTracker, SchedulerEngine, WorkerEngine}

/** End-to-end engine demonstrations through the driver's correctness gate:
  * each query seeds jobs FROM the events test table (deterministic ids =
  * event ids), runs the real engine (enqueue → worker pass → scheduler
  * promotion → batch tracking) against a scratch parquet-log backend, and
  * returns a DataFrame whose contents a DuckDB oracle over the same events
  * table can predict exactly.
  *
  * Seeding uses the distributed bulk path (a Dataset[Job] transform, no
  * driver materialization) — the same shape a 100 TB pipeline would use.
  */
object EngineE2E {

  // Deterministic job functions for the e2e runs.
  JobRegistry.register("e2e_noop", _ => "ok")
  JobRegistry.register("e2e_boom", _ => throw new RuntimeException("e2e failure"))
  JobRegistry.registerBackoff("e2e_instant", _ => 0)

  private val SeedCount = 100
  private val T0 = 1700000000000L

  /** events → Dataset[Job]: error events become failing jobs. */
  private def seedJobs(spark: SparkSession, sfDir: String): Dataset[Job] = {
    import spark.implicits._
    val retry = RetryOpts(maxRetries = 1, retryDelaySecFn = "e2e_instant")
    Tables.events(spark, sfDir)
      .orderBy("event_id").limit(SeedCount)
      .select($"event_id".as[Long], $"event_type".as[String])
      .map { case (eid, etype) =>
        Job(
          id = eid.toString,
          executeFnSym = if (etype == "error") "e2e_boom" else "e2e_noop",
          argsJson = "[]",
          queue = "e2e", readyQueue = "e2e", priority = 0,
          enqueuedAt = T0, scheduleRunAt = None, cronRunAt = None,
          batchId = None, retryOpts = retry, state = None, seq = Job.nextSeq())
      }
  }

  private def fixture(spark: SparkSession) = {
    val clock = new AtomicLong(T0)
    val root = java.nio.file.Files.createTempDirectory("graft-e2e").toString
    val backend = new ParquetBackend(spark, root)
    val worker = new WorkerEngine(backend, spark, Nil, () => clock.get())
    val sched = new SchedulerEngine(backend, spark, () => clock.get())
    (backend, worker, sched, clock)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // D1/S5/S6: enqueue → execute → completion log, one worker pass.
    "e2e_worker_pass" -> ((s, d) => {
      val (backend, worker, _, _) = fixture(s)
      backend.enqueue(seedJobs(s, d))
      worker.runPass()
      backend.completions.toDF()
        .select(col("jobId").cast("long").as("job_id"),
          col("terminalState").as("terminal_state"))
        .orderBy("job_id")
    }),

    // D3/D4/D5: failures retry with backoff, promotion re-runs them, and
    // exhausted retries bury — two passes with a promotion between.
    "e2e_retry_death" -> ((s, d) => {
      val (backend, worker, sched, clock) = fixture(s)
      backend.enqueue(seedJobs(s, d))
      worker.runPass() // errors → retrying
      clock.addAndGet(1000)
      sched.promoteDue() // retries back to the front of the queue
      worker.runPass() // errors again → dead
      backend.completions.toDF()
        .groupBy(col("terminalState").as("terminal_state"))
        .agg(count(lit(1)).as("n"))
        .orderBy("terminal_state")
    }),

    // S5/D15: the same pass through the STREAMING worker — a Structured
    // Streaming file-source query over the ready log, drained with
    // processAllAvailable; completions must equal the batch-mode pass.
    "e2e_streaming_worker" -> ((s, d) => {
      val (backend, worker, _, _) = fixture(s)
      val root = backend.root
      backend.enqueue(seedJobs(s, d))
      val q = worker.startStream(root,
        org.apache.spark.sql.streaming.Trigger.ProcessingTime("100 milliseconds"))
      try q.processAllAvailable() finally q.stop()
      backend.completions.toDF()
        .select(col("jobId").cast("long").as("job_id"),
          col("terminalState").as("terminal_state"))
        .orderBy("job_id")
    }),

    // D7/D8: batch over the seed jobs → tracker folds completions → one
    // terminal status (partial-success when some jobs died).
    "e2e_batch_status" -> ((s, d) => {
      import s.implicits._
      val (backend, worker, sched, clock) = fixture(s)
      val bid = "e2e-batch"
      val seed = seedJobs(s, d).map(_.copy(batchId = Some(bid)))
      backend.putBatch(BatchMeta(bid, "e2e_noop", 60, "e2e", "e2e",
        RetryOpts(maxRetries = 1, retryDelaySecFn = "e2e_instant"),
        SeedCount, BatchStatus.InProgress, T0))
      backend.enqueue(seed)
      worker.runPass()
      clock.addAndGet(1000)
      sched.promoteDue()
      worker.runPass()
      val tracker = new BatchTracker(backend, s)
      tracker.trackPass()
      backend.batchStatusEvents.toDF().select(col("status")).orderBy("status")
    })
  )

  val oracles: Map[String, String] = Map(
    "e2e_worker_pass" ->
      s"""SELECT event_id AS job_id,
         |  CASE WHEN event_type = 'error' THEN 'retrying' ELSE 'success' END AS terminal_state
         |FROM (SELECT * FROM events ORDER BY event_id LIMIT $SeedCount)
         |ORDER BY job_id""".stripMargin,
    "e2e_streaming_worker" ->
      s"""SELECT event_id AS job_id,
         |  CASE WHEN event_type = 'error' THEN 'retrying' ELSE 'success' END AS terminal_state
         |FROM (SELECT * FROM events ORDER BY event_id LIMIT $SeedCount)
         |ORDER BY job_id""".stripMargin,
    "e2e_retry_death" ->
      s"""WITH seed AS (SELECT * FROM events ORDER BY event_id LIMIT $SeedCount)
         |SELECT 'dead' AS terminal_state, COUNT(*) AS n FROM seed WHERE event_type = 'error'
         |UNION ALL
         |SELECT 'retrying', COUNT(*) FROM seed WHERE event_type = 'error'
         |UNION ALL
         |SELECT 'success', COUNT(*) FROM seed WHERE event_type <> 'error'
         |ORDER BY terminal_state""".stripMargin,
    "e2e_batch_status" ->
      s"""SELECT CASE
         |  WHEN (SELECT COUNT(*) FROM (SELECT * FROM events ORDER BY event_id LIMIT $SeedCount) WHERE event_type = 'error') = 0 THEN 'success'
         |  WHEN (SELECT COUNT(*) FROM (SELECT * FROM events ORDER BY event_id LIMIT $SeedCount) WHERE event_type <> 'error') = 0 THEN 'dead'
         |  ELSE 'partial-success' END AS status""".stripMargin
  )
}
