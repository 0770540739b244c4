package graft.api

import org.apache.spark.sql.SparkSession
import graft.backend.QueueBackend

/** SQL surface: registers the engine's live collections as temp views so
  * users query them with `spark.sql` — the console's data layer
  * (console/data.clj) exposed as plain SQL tables. Note: a parquet-backed
  * view snapshots the log's FILE LISTING at registration; re-run
  * registerViews (cheap) to pick up later appends. Also registers graft's
  * native SQL functions. */
object GraftSql {
  def registerViews(backend: QueueBackend, spark: SparkSession, prefix: String = "graft_"): Unit = {
    backend.readyJobs.createOrReplaceTempView(s"${prefix}enqueued")
    backend.scheduledJobs.createOrReplaceTempView(s"${prefix}scheduled")
    backend.deadJobs.createOrReplaceTempView(s"${prefix}dead")
    backend.completions.createOrReplaceTempView(s"${prefix}completions")
    backend.cronEntries.createOrReplaceTempView(s"${prefix}cron")
    backend.batches.createOrReplaceTempView(s"${prefix}batches")
    backend.batchStatusEvents.createOrReplaceTempView(s"${prefix}batch_status")
    backend.heartbeats.createOrReplaceTempView(s"${prefix}heartbeats")
    graft.functions.VectorFunctions.register(spark)
  }
}
