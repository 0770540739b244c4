package graft.backend

import java.util.UUID
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Dataset, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import graft.model._

/** Append-only parquet-log implementation of [[QueueBackend]].
  *
  * Layout under `root/`:
  * {{{
  *   ready/ scheduled/ dead/      Job rows, append-only
  *   completions/                 CompletionEvent rows
  *   tombstones/ purges/          visibility subtractions
  *   cron/v<N>/ + cron/_VERSION   snapshot registry (tiny table, MVCC)
  *   batches/ batch_status/       batch metadata + terminal transitions
  * }}}
  *
  * Visibility (the log-structured LREM/ZREM/DEL of commands.clj):
  *   ready    = log ∖ completions(id,attempt) ∖ tombstones ∖ purge-marked
  *   scheduled/dead = log ∖ tombstones
  * computed with left_anti joins that Catalyst plans as broadcast joins
  * while the subtraction side is small and shuffle joins beyond — both
  * scale-out clean. `compact` folds a log to its visible rows so the
  * subtraction side never grows unboundedly.
  *
  * Single-writer-per-table is assumed for snapshot flips (cron), same as
  * goose assumes a single Redis; appends are safe from any number of
  * writers since filenames are UUIDs.
  */
final class ParquetBackend(val spark: SparkSession, val root: String) extends QueueBackend {
  import spark.implicits._

  private val fs = new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def dir(tbl: String) = s"$root/$tbl"
  private def exists(tbl: String): Boolean = {
    val p = new Path(dir(tbl))
    fs.exists(p) && fs.listStatus(p).exists(_.getPath.getName.endsWith(".parquet"))
  }

  /** Appends to one table serialize through a PER-TABLE lock: concurrent
    * Hadoop FileOutputCommitter jobs on the SAME directory share its
    * `_temporary` staging dir, and one job's cleanup deletes the other's
    * files mid-write. Different tables have different staging dirs, so
    * they append concurrently (the worker commits completions/retries/
    * deaths in parallel). Cross-process writers on one table would need a
    * staging-dir committer; in-process, the lock is enough. */
  private val writeLocks = new java.util.concurrent.ConcurrentHashMap[String, Object]()
  private def append[T](tbl: String, ds: Dataset[T]): Unit = {
    val lock = writeLocks.computeIfAbsent(tbl, _ => new Object)
    lock.synchronized { ds.write.mode(SaveMode.Append).parquet(dir(tbl)) }
  }

  /** Small driver-side row sets (client API calls) write one file. */
  private def appendSmall[T](tbl: String, ds: Dataset[T]): Unit =
    append(tbl, ds.coalesce(1))

  private def readLog[T: org.apache.spark.sql.Encoder](tbl: String): Dataset[T] =
    if (exists(tbl)) spark.read.parquet(dir(tbl)).as[T]
    else spark.emptyDataset[T]

  // ---------- appends ----------
  // Bulk paths stay fully distributed (one parquet file per task);
  // driver-side Seq-based callers pre-coalesce their tiny row sets.

  override def enqueue(jobs: Dataset[Job]): Unit = append("ready", jobs)
  override def schedule(jobs: Dataset[Job]): Unit = append("scheduled", jobs)
  override def bury(jobs: Dataset[Job]): Unit = append("dead", jobs)
  override def recordCompletions(events: Dataset[CompletionEvent]): Unit =
    append("completions", events)

  override def tombstone(tbl: String, victims: Seq[(String, Long)], reason: String): Unit = {
    val now = System.currentTimeMillis()
    appendSmall("tombstones",
      victims.map { case (id, seq) => Tombstone(tbl, id, seq, reason, now) }.toDS())
  }

  override def tombstone(tbl: String, victims: Dataset[(String, Long)], reason: String): Unit = {
    val now = System.currentTimeMillis()
    append("tombstones",
      victims.map { case (id, seq) => Tombstone(tbl, id, seq, reason, now) })
  }

  override def purge(tbl: String, queue: String): Unit = {
    if (tbl == "ready") {
      // marker purge: O(1) write, like DEL — rows appended later survive.
      appendSmall("purges",
        Seq(PurgeMarker(tbl, queue, Job.nextSeq(), System.currentTimeMillis())).toDS())
    } else {
      // scheduled/dead hold future/terminal rows, so purge materializes
      // the victim versions — distributed end-to-end (admin op, but the
      // dead set after an incident can be huge; never collect it).
      val vis = if (tbl == "scheduled") scheduledJobs else deadJobs
      val victims = vis.filter(j => queue == "*" || j.queue == queue)
        .select($"id", $"seq").as[(String, Long)]
      tombstone(tbl, victims, "purge")
    }
  }

  // ---------- visible sets ----------

  private def tombstonesFor(tbl: String): Dataset[Tombstone] =
    readLog[Tombstone]("tombstones").filter($"tbl" === tbl)

  private def minusTombstones(jobs: Dataset[Job], tbl: String): Dataset[Job] =
    jobs.join(tombstonesFor(tbl).select($"id".as("t_id"), $"seq".as("t_seq")),
      col("id") === col("t_id") && col("seq") === col("t_seq"), "left_anti").as[Job]

  override def readyJobs: Dataset[Job] = filterReadyVisible(readLog[Job]("ready"))

  override def filterReadyVisible(slice: Dataset[Job]): Dataset[Job] = {
    val comps = readLog[CompletionEvent]("completions")
      .select($"jobId".as("c_id"), $"attempt".as("c_attempt"))
    val purges = readLog[PurgeMarker]("purges").filter($"tbl" === "ready")
      .groupBy($"queue".as("p_queue")).agg(max($"seqAt").as("p_seq"))
    slice
      .withColumn("rattempt", coalesce($"state.retryCount" + 1, lit(0)))
      .join(comps, $"id" === $"c_id" && $"rattempt" === $"c_attempt", "left_anti")
      .join(tombstonesFor("ready").select($"id".as("t_id"), $"seq".as("t_seq")),
        $"id" === $"t_id" && $"seq" === $"t_seq", "left_anti")
      .join(purges, $"queue" === $"p_queue", "left_outer")
      .filter($"p_seq".isNull || $"seq" > $"p_seq")
      // crash-replay can append the same logical row twice (e.g. a
      // promote that died between enqueue and tombstone re-promotes, or a
      // prioritise that died before tombstoning): one row per (id,
      // attempt), the LATEST version (max seq) winning so a re-appended
      // bump deterministically shadows its predecessor. AFTER the
      // subtractions — before them, the survivor could be a tombstoned
      // version.
      .withColumn("vrank", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy($"id", $"rattempt").orderBy($"seq".desc)))
      .filter($"vrank" === 1)
      .drop("rattempt", "p_queue", "p_seq", "vrank")
      .as[Job]
  }

  override def scheduledJobs: Dataset[Job] =
    minusTombstones(readLog[Job]("scheduled"), "scheduled")

  override def deadJobs: Dataset[Job] =
    minusTombstones(readLog[Job]("dead"), "dead")

  override def completions: Dataset[CompletionEvent] =
    readLog[CompletionEvent]("completions")

  // ---------- cron (tiny snapshot table with MVCC pointer) ----------

  private def cronVersionFile = new Path(s"$root/cron/_VERSION")

  private def cronVersion: Option[Long] = {
    if (!fs.exists(cronVersionFile)) None
    else {
      val in = fs.open(cronVersionFile)
      try Some(new String(in.readAllBytes()).trim.toLong)
      finally in.close()
    }
  }

  private def writeCronSnapshot(entries: Dataset[CronEntry]): Unit = {
    val next = cronVersion.getOrElse(0L) + 1
    entries.coalesce(1).write.mode(SaveMode.Overwrite).parquet(s"$root/cron/v$next")
    val out = fs.create(cronVersionFile, true)
    try out.write(next.toString.getBytes)
    finally out.close()
  }

  override def cronEntries: Dataset[CronEntry] = cronVersion match {
    case Some(v) => spark.read.parquet(s"$root/cron/v$v").as[CronEntry]
    case None => spark.emptyDataset[CronEntry]
  }

  /** Idempotent upsert keyed by cronName (reference redis/cron.clj:38-50:
    * registering an existing name replaces the entry). */
  override def upsertCron(entries: Seq[CronEntry]): Unit = {
    val names = entries.map(_.cronName).toSet
    val kept = cronEntries.collect().filterNot(e => names.contains(e.cronName))
    writeCronSnapshot((kept ++ entries).toSeq.toDS())
  }

  override def deleteCron(names: Seq[String]): Unit = {
    val drop = names.toSet
    val kept = cronEntries.collect().filterNot(e => drop.contains(e.cronName))
    writeCronSnapshot(kept.toSeq.toDS())
  }

  override def purgeCron(): Unit = writeCronSnapshot(spark.emptyDataset[CronEntry])

  // ---------- batches ----------

  override def putBatch(meta: BatchMeta): Unit = appendSmall("batches", Seq(meta).toDS())
  override def batches: Dataset[BatchMeta] = readLog[BatchMeta]("batches")

  override def recordBatchStatus(events: Seq[BatchStatusEvent]): Unit =
    appendSmall("batch_status", events.toDS())
  override def batchStatusEvents: Dataset[BatchStatusEvent] =
    readLog[BatchStatusEvent]("batch_status")

  override def deleteBatches(ids: Seq[String]): Unit = {
    if (ids.isEmpty) return
    val drop = ids.toSet
    rewriteLog("batches", batches.filter(m => !drop.contains(m.id)))
    rewriteLog("batch_status", batchStatusEvents.filter(e => !drop.contains(e.batchId)))
  }

  // ---------- worker registry ----------

  override def recordHeartbeat(hb: ProcessHeartbeat): Unit =
    appendSmall("heartbeats", Seq(hb).toDS())
  override def recordHeartbeats(hbs: Dataset[ProcessHeartbeat]): Unit =
    append("heartbeats", hbs)
  override def heartbeats: Dataset[ProcessHeartbeat] =
    readLog[ProcessHeartbeat]("heartbeats")

  // ---------- maintenance ----------

  /** Fold a log to its visible rows (the GC that keeps anti-join sides
    * bounded). Writes the survivors as a fresh log, then swaps dirs. */
  override def compact(tbl: String): Unit = {
    val visible: Dataset[Job] = tbl match {
      case "ready" => readyJobs
      case "scheduled" => scheduledJobs
      case "dead" => deadJobs
      case other => throw new IllegalArgumentException(s"cannot compact '$other'")
    }
    val tmp = s"$root/.compact-${UUID.randomUUID()}"
    visible.write.mode(SaveMode.Overwrite).parquet(tmp)
    val old = new Path(dir(tbl))
    val bak = new Path(s"$root/.old-${UUID.randomUUID()}")
    if (fs.exists(old)) fs.rename(old, bak)
    fs.rename(new Path(tmp), old)
    fs.delete(bak, true)
    // Drop tombstones for this table and, for ready, consumed markers of
    // rows that no longer exist in the folded log. Completions of NOT-YET-
    // TERMINAL batches are retained even when their job is gone from the
    // ready log — the batch tracker re-derives status from them, and
    // dropping a succeeded member's event would strand its batch
    // in-progress forever.
    if (tbl == "ready") {
      val survivors = spark.read.parquet(dir(tbl)).as[Job]
      val comps = readLog[CompletionEvent]("completions")
      val terminalB = readLog[BatchStatusEvent]("batch_status")
        .filter(e => BatchStatus.terminal(e.status)).select($"batchId".as("tb"))
      val liveBatches = readLog[BatchMeta]("batches").select($"id".as("lb"))
        .join(terminalB, $"lb" === $"tb", "left_anti")
      val keptComps = comps.join(
        survivors.select($"id".as("s_id")), $"jobId" === $"s_id", "left_semi")
        .union(comps.join(liveBatches, $"batchId" === $"lb", "left_semi"))
        .distinct()
        .as[CompletionEvent]
      rewriteLog("completions", keptComps)
    }
    val keptTombs = readLog[Tombstone]("tombstones").filter($"tbl" =!= tbl)
    rewriteLog("tombstones", keptTombs)
  }

  private def rewriteLog[T](tbl: String, rows: Dataset[T]): Unit = {
    val tmp = s"$root/.rw-${UUID.randomUUID()}"
    rows.write.mode(SaveMode.Overwrite).parquet(tmp)
    val old = new Path(dir(tbl))
    val bak = new Path(s"$root/.old-${UUID.randomUUID()}")
    if (fs.exists(old)) fs.rename(old, bak)
    fs.rename(new Path(tmp), old)
    fs.delete(bak, true)
  }
}
