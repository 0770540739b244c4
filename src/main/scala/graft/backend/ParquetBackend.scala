package graft.backend

import graft.model.ModelEncoders._
import java.util.UUID
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Dataset, Encoder, SaveMode, SparkSession}
import graft.model.Job

/** Directory-listing binding of [[LogStructuredBackend]]: each table is a
  * parquet directory, appends are parquet part-file writes, and
  * `replaceLog` is an atomic-enough directory swap (write tmp → rename).
  *
  * Layout under `root/`:
  * {{{
  *   ready/ scheduled/ dead/      Job rows, append-only
  *   completions/                 CompletionEvent rows
  *   tombstones/ purges/          visibility subtractions
  *   cron/                        snapshot registry (tiny table)
  *   batches/ batch_status/       batch metadata + terminal transitions
  * }}}
  *
  * Concurrency contract: appends are safe from any number of writers
  * (filenames are UUIDs); `replaceLog` (compaction, cron snapshot) must
  * be serialized against concurrent READERS by the caller — GraftWorker
  * does this with its read-write gate. [[CommitLogBackend]] removes that
  * caveat via manifest snapshots at the cost of a commit-log protocol.
  */
/* not final: fault-injection fixtures (q45_orphan_recovery) override a
 * single write to model a worker dying mid-commit */
class ParquetBackend(spark0: SparkSession, val root: String)
    extends LogStructuredBackend(spark0) {

  override def capabilities: BrokerCapabilities = BrokerCapabilities(
    fullOperatorSurface = true,
    snapshotIsolatedReads = false, // dir swap: callers gate compaction (GraftWorker)
    multiProcessWriters = false, // in-process locks (writeLocks/foldLock) ARE the write protocol; a second JVM shares none of them
    durable = true)

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

  override def dataFileCount(tbl: String): Int = {
    val p = new Path(dir(tbl))
    if (fs.exists(p)) fs.listStatus(p).count(_.getPath.getName.endsWith(".parquet"))
    else 0
  }

  /** [[readLog]] is WAL-inclusive, so the emptiness probe must be too. */
  override protected def latencyPathNonEmpty(tbl: String): Boolean =
    WalStore.hasRecords(root, tbl)

  /** File-name set + WAL content stamp. Appends land new UUID-named
    * files or advance the WAL stamp; folds swap in new file names (and
    * bump the WAL truncation generation) — so an unchanged fingerprint
    * implies unchanged visible content. */
  override def tableFingerprint(tbl: String): Option[Long] = {
    var h = 1125899906842597L // prime seed
    partFileNames(tbl).toSeq.sorted.foreach(n => h = h * 31 + n.hashCode)
    Some(h * 31 + WalStore.contentStamp(root, tbl))
  }

  override def sweepStaging(olderThanMs: Long): Int = {
    val direct = DirectParquetAppend.sweepStaging(fs, new Path(root), olderThanMs)
    // crashed appendLog/replaceLog leave hidden staging dirs behind
    // (.app- append stage, .rw- replacement, .old- backup) — invisible
    // to readers (leading dot), but disk until swept. Live ones are
    // seconds old; the sweep cutoff is minutes.
    val cutoff = System.currentTimeMillis() - olderThanMs
    var swept = 0
    val rootP = new Path(root)
    if (fs.exists(rootP)) fs.listStatus(rootP).foreach { st =>
      val n = st.getPath.getName
      // abandoned = the dir AND its newest entry AT ANY DEPTH are both
      // past the cutoff: a long replacement write keeps landing fresh
      // part files into .rw-, so an in-progress stage is never "old" no
      // matter how long the Spark job runs, and FileOutputCommitter task
      // output lands two levels down — see
      // [[DirectParquetAppend.newestMtime]] (r11 review finds)
      def quiesced: Boolean =
        (try DirectParquetAppend.newestMtime(fs, st.getPath)
         catch { case _: java.io.IOException => Long.MaxValue }) < cutoff
      if ((n.startsWith(".app-") || n.startsWith(".rw-") || n.startsWith(".old-")) &&
          st.getModificationTime < cutoff && quiesced && fs.delete(st.getPath, true))
        swept += 1
    }
    direct + swept
  }

  /** Serializes a reader's (parquet listing, WAL decode) snapshot
    * against a WAL→parquet fold, so a reader can never see a folded row
    * twice (listed file + still-in-WAL) or zero times (pre-fold listing
    * + post-fold WAL). Lock order everywhere: walFoldLock → table
    * writeLock → TableWal monitor.
    *
    * READ/WRITE split (r14 — the producer-path profile measured the
    * old per-table monitor convoying 4 concurrent per-call enqueues
    * BELOW single-producer aggregate, 50k → 25k/s, while the WAL
    * monitor alone sustains ~100k/s): folds, drains and replaces take
    * the EXCLUSIVE side; WAL-lane appends and readLog take the SHARED
    * side. Appends commute with each other (one atomic appendFramed
    * each, ordered by the TableWal monitor) and with readers (a read
    * sees a concurrent append's record or not — never half, never
    * twice); only a FOLD moving rows between the WAL and the parquet
    * dir can tear a reader's cut, and folds are exclusive. */
  private val walFoldLocks = new java.util.concurrent
    .ConcurrentHashMap[String, java.util.concurrent.locks.ReentrantReadWriteLock]()
  private def foldLock(tbl: String): java.util.concurrent.locks.ReentrantReadWriteLock =
    walFoldLocks.computeIfAbsent(tbl,
      _ => new java.util.concurrent.locks.ReentrantReadWriteLock())
  private def withFoldShared[A](tbl: String)(body: => A): A = {
    val l = foldLock(tbl).readLock(); l.lock()
    try body finally l.unlock()
  }
  private def withFoldExclusive[A](tbl: String)(body: => A): A = {
    val l = foldLock(tbl).writeLock(); l.lock()
    try body finally l.unlock()
  }

  /** What this thread's last [[foldSnapshot]] of a table saw: the
    * parquet part-file set (post-fold, WAL empty). replaceLog
    * consumes it to preserve appends that land AFTER the caller's
    * snapshot (ADVICE r9: a per-call enqueue between compact's read and
    * the dir swap was silently dropped). Armed ONLY by foldSnapshot —
    * never by the hot [[readLog]] — so a delete-intent replace
    * (purgeCron) with no snapshot is an exact replace, and a pooled
    * thread's earlier read can't leak a stale rescue (VERDICT r10).
    * Thread-local: compact runs its snapshot→replace sequence on one
    * thread. The snapshot's WAL count is always ZERO (foldSnapshot
    * folds the tail first), so the whole current WAL is the delta. */
  private case class LogMark(files: Set[String])
  private val snapshotMarks =
    ThreadLocal.withInitial[scala.collection.mutable.Map[String, LogMark]](
      () => scala.collection.mutable.Map.empty)

  override protected def discardFoldMarks(): Unit = snapshotMarks.get.clear()

  private def partFileNames(tbl: String): Set[String] = {
    val p = new Path(dir(tbl))
    if (fs.exists(p))
      fs.listStatus(p).iterator
        .map(_.getPath.getName).filter(_.endsWith(".parquet")).toSet
    else Set.empty
  }

  /** Current visible rows: the parquet log UNION the WAL tail (the
    * per-call latency path, [[WalStore]]) as a LocalRelation. The WAL
    * decode is driver-side and bounded: [[WalStore.MaxRecords]] forces a
    * fold, and compaction truncates. Holds the table writeLock across
    * (file listing, file-index pin, WAL decode) so the snapshot is one
    * consistent cut — an append can land before or after, never
    * between. The lock hold is short: appends stage their Spark write
    * OUTSIDE the lock and publish via renames (ADVICE r10 latency
    * note), so a read never waits on a write job. */
  override protected def readLog[T: Encoder](tbl: String): Dataset[T] =
    withFoldShared(tbl) {
      val lock = writeLocks.computeIfAbsent(tbl, _ => new Object)
      lock.synchronized {
        val enc = implicitly[Encoder[T]]
        val files = partFileNames(tbl)
        val base =
          if (files.nonEmpty) spark.read.parquet(dir(tbl)).as[T]
          else spark.emptyDataset[T]
        val tail = WalStore.rows(root, tbl, enc)
        if (tail.isEmpty) base
        else base.unionByName(spark.createDataset(tail))
      }
    }

  /** Compaction-intent snapshot: folds the WAL tail to a part file
    * FIRST (inside the locked section, so no append can interleave),
    * then lists and arms the delta mark with that post-fold file set
    * and a WAL count of ZERO. Consequence (VERDICT r10 #2): every fold
    * file a concurrent drain writes AFTER this point holds only
    * post-snapshot records, so replaceLog's file rescue can re-add it
    * whole without duplicating survivors or resurrecting rows this
    * snapshot saw and judged dead (the old mixed fold file carried the
    * pre-snapshot WAL prefix into the rescue). The extra part file
    * costs one driver-side write on a path that is about to run a full
    * compaction job — noise. */
  override protected def foldSnapshot[T: Encoder](tbl: String): Dataset[T] =
    withFoldExclusive(tbl) {
      val lock = writeLocks.computeIfAbsent(tbl, _ => new Object)
      lock.synchronized {
        val enc = implicitly[Encoder[T]]
        drainWal(tbl, enc) // reentrant under both locks — one fold impl
        val files = partFileNames(tbl)
        snapshotMarks.get.update(tbl, LogMark(files))
        if (files.nonEmpty) spark.read.parquet(dir(tbl)).as[T]
        else spark.emptyDataset[T]
      }
    }

  /** Stage the distributed write to a private tmp dir (no shared
    * `_temporary` with a concurrent append job on the same table), then
    * publish by renaming the part files in under the table lock. Two
    * wins over writing into the live dir under the lock: concurrent
    * appendLog jobs on ONE table no longer serialize on each other's
    * full Spark write, and [[readLog]]'s lock acquisition never waits
    * behind one (the r10 read-latency regression — the lock now guards
    * only renames). Part-file names embed the job's task UUIDs, so
    * cross-job collisions can't happen. */
  override protected def appendLog[T](tbl: String, ds: Dataset[T]): Unit = {
    val tmp = s"$root/.app-${UUID.randomUUID()}"
    ds.write.mode(SaveMode.Overwrite).parquet(tmp)
    val lock = writeLocks.computeIfAbsent(tbl, _ => new Object)
    lock.synchronized {
      val dst = new Path(dir(tbl))
      if (!fs.exists(dst)) fs.mkdirs(dst)
      fs.listStatus(new Path(tmp)).iterator
        .filter(_.getPath.getName.endsWith(".parquet"))
        .foreach { st =>
          // rename() reports failure as FALSE, not an exception — an
          // unchecked publish here would let fs.delete(tmp) below destroy
          // the unmoved part files and the append "succeed" with silent
          // row loss (r11 review find)
          if (!fs.rename(st.getPath, new Path(dst, st.getPath.getName)))
            throw new java.io.IOException(
              s"appendLog publish rename ${st.getPath} -> $dst failed")
        }
    }
    fs.delete(new Path(tmp), true)
  }

  /** Tables a STRUCTURED STREAMING consumer reads as a parquet FILE
    * source ([[graft.worker.WorkerEngine.startStream]] on `ready`,
    * [[graft.worker.BatchTracker.startStream]] on `batches` AND
    * `completions` — the worker's small-commit lane lands bounded
    * completion batches through this path, and a WAL-resident
    * completion row would be invisible to the streaming tracker until
    * an unrelated fold). A WAL row is invisible to a running stream
    * until some fold happens, so their MULTI-row appends materialize a
    * parquet file; `ready`'s single-row per-call appends ride the WAL
    * with fold-tick visibility (see the hybrid note below). */
  private val StreamedTables = Set("ready", "batches", "completions")

  /** Driver-held small appends. Two lanes:
    *
    *  - [[StreamedTables]] multi-row appends → one direct parquet file
    *    ([[DirectParquetAppend]], ~5-9 ms): performBatch's atomic-N+1
    *    contract and putBatch updates keep the one-file visibility
    *    token; the writer-construction cost is amortized across the
    *    rows of the batch.
    *  - every other table (scheduled jobs, tombstones, cron upserts,
    *    heartbeats, queue decls, batch status) → the [[WalStore]] WAL:
    *    one buffered file write (~tens of µs, Redis-AOF durability
    *    class). These tables are only ever read through [[readLog]]
    *    (WAL-inclusive), so visibility is immediate; the heartbeat
    *    tick alone stops costing one parquet file per second per
    *    worker. Past [[WalStore.MaxRecords]] the append folds first,
    *    so the per-read decode stays bounded even with no worker
    *    running compaction.
    *
    * The table lock serializes against a concurrent [[replaceLog]] dir
    * swap. */
  override protected def appendSmallRows[T: Encoder](tbl: String, rows: Seq[T]): Unit =
    if (rows.nonEmpty) {
      val enc = implicitly[Encoder[T]]
      // Per-call READY hybrid (VERDICT r8 #5): a SINGLE-row ready append
      // rides the WAL (~tens of µs) instead of materializing a parquet
      // file (~5 ms writer construction — the measured per-call floor,
      // SCALING.md r8 profile). Visibility: batch-mode consumers read
      // WAL-inclusive [[readLog]] and see the row IMMEDIATELY; a running
      // streaming consumer sees it at the next fold — the maintenance
      // tick (1 s default, [[drainLatencyPath]]), the MaxRecords cap, or
      // any compaction — which is the reference's own delivery cadence
      // (its consumer BLMOVE-polls at 1 s, redis/consumer.clj:12-21).
      // MULTI-row appends keep the one-file path: performBatch's atomic
      // N+1 contract rides single-file visibility, and bulk appends are
      // already amortized. `graft.ready.percall=file` restores the
      // file-token behavior per session.
      val walReady = tbl == "ready" && rows.size == 1 &&
        !spark.conf.getOption("graft.ready.percall").contains("file")
      if (StreamedTables(tbl) && !walReady) {
        // FIFO vs the WAL lane (ADVICE r9): an earlier per-call enqueue
        // may still be WAL-resident (stream-visible only at the next
        // fold) — materialize it BEFORE this direct file lands, or a
        // streaming consumer would execute the later batch first. The
        // WAL holds at most a fold-tick's worth of rows, so the drain is
        // one small part-file write on the rare mixed-lane interleave.
        // The fold lock spans BOTH the drain and the direct append
        // (monitors are reentrant — drainWal retakes it), so a per-call
        // WAL append can't slip between the check and the file landing
        // and become stream-visible after it (ADVICE r10).
        withFoldExclusive(tbl) {
          if (WalStore.hasRecords(root, tbl)) drainWal(tbl, enc)
          val lock = writeLocks.computeIfAbsent(tbl, _ => new Object)
          lock.synchronized {
            DirectParquetAppend.append(spark, enc, dir(tbl), rows)
          }
        }
      } else {
        // WAL lane on the SHARED side of the fold lock (r14): a fold or
        // the mixed-lane direct append holds the EXCLUSIVE side, so
        // "landed before the batch" still implies "stream-visible
        // before the batch" — but N concurrent per-call producers now
        // commute, serializing only on the TableWal monitor's one
        // buffered channel write (~100k/s ceiling) instead of convoying
        // on a per-table monitor (measured 50k → 25k/s aggregate from
        // 1 → 4 producers before this split). FRAMING (serialize + CRC)
        // happens before any lock (r13); the fsync conf and the
        // record-cap check are hoisted outside too — the cap pre-check
        // races only other appends, so the cap is a soft bound
        // overshootable by the number of in-flight producers, and the
        // next append drains.
        val frames = WalStore.frame(enc, rows)
        val fsync = spark.conf.getOption("graft.wal.fsync").contains("true")
        if (WalStore.recordCount(root, tbl, enc) + rows.size > WalStore.MaxRecords)
          withFoldExclusive(tbl) {
            if (WalStore.recordCount(root, tbl, enc) + rows.size > WalStore.MaxRecords)
              drainWal(tbl, enc)
          }
        withFoldShared(tbl) {
          WalStore.appendFrames(root, tbl, enc, frames, rows.size, force = fsync)
        }
      }
    }

  /** Fold the WAL tail into one parquet part file and truncate it —
    * called from the worker's maintenance tick (streaming visibility)
    * and from the record-count cap. Atomic vs readers via the fold
    * lock; atomic vs per-call appends via the TableWal monitor held
    * across decode→write→truncate. */
  private def drainWal[T](tbl: String, enc: Encoder[T]): Unit =
    withFoldExclusive(tbl) {
      if (WalStore.hasRecords(root, tbl)) {
        val lock = writeLocks.computeIfAbsent(tbl, _ => new Object)
        lock.synchronized {
          val wal = WalStore.forTable(root, tbl, enc)
          wal.locked {
            val rows = WalStore.rows(root, tbl, enc)
            if (rows.nonEmpty)
              DirectParquetAppend.append(spark, enc, dir(tbl), rows)
            wal.truncate()
          }
        }
      }
    }

  /** Fold the job-table WALs on the maintenance cadence. For `ready`
    * this IS the streaming-visibility tick of the per-call hybrid (the
    * fold materializes the parquet file a running stream lists); for
    * every other table it is bookkeeping — their readers are
    * WAL-inclusive [[readLog]] — that keeps the driver-side decode
    * short and lets compaction see an honest file count. */
  override def drainLatencyPath(): Unit = {
    import spark.implicits._
    drainWal("ready", implicitly[Encoder[Job]])
    drainWal("scheduled", implicitly[Encoder[Job]])
  }

  /** Write the replacement as a fresh directory, then swap via renames.
    * The replacement rows were computed from a [[foldSnapshot]] (and
    * are materialized by the caller before this runs) — but appends KEEP
    * LANDING between that snapshot and this swap, so the swap preserves
    * the delta the caller never saw (ADVICE r9 job-loss window):
    *
    *  - part files in the old dir that were NOT in the snapshot's file
    *    listing are renamed into the replacement instead of dying with
    *    the backup. foldSnapshot emptied the WAL inside its locked
    *    section, so every such file — direct multi-row append or
    *    concurrent WAL fold — holds ONLY post-snapshot rows; the
    *    rescue can never duplicate a survivor or resurrect a row the
    *    snapshot saw and judged dead (VERDICT r10 #2: the old mark let
    *    a mid-compaction fold file carry the seen WAL prefix through);
    *  - the ENTIRE current WAL is post-snapshot for the same reason
    *    (count was zero at the mark; a generation bump just means some
    *    of the delta was folded — rescued above), so it is re-appended
    *    after the truncate instead of vanishing with it.
    *
    * Preserving raw appends is always correct in a log-structured store:
    * compaction only drops rows it has SEEN and judged dead; a row it
    * never saw must survive to the next fold. With NO armed mark (no
    * foldSnapshot on this thread — delete-intent callers like
    * purgeCron) the replace is EXACT: no file rescue, WAL truncated.
    * All under the fold lock, so no reader assembles a half-folded
    * snapshot. */
  override protected def replaceLog[T](tbl: String, rows: Dataset[T]): Unit = {
    val tmp = s"$root/.rw-${UUID.randomUUID()}"
    rows.write.mode(SaveMode.Overwrite).parquet(tmp)
    val mark = snapshotMarks.get.get(tbl)
    withFoldExclusive(tbl) {
      val lock = writeLocks.computeIfAbsent(tbl, _ => new Object)
      lock.synchronized {
        val enc = rows.encoder
        val old = new Path(dir(tbl))
        val bak = new Path(s"$root/.old-${UUID.randomUUID()}")
        // every rename in the swap is CHECKED: rename() reports failure
        // as false, and an unchecked false here is not benign — a failed
        // old->bak would make the tmp->old rename nest the replacement
        // INSIDE the live dir; a failed rescue rename would delete the
        // delta with the backup below (r11 review find)
        def renameOrThrow(src: Path, dst: Path): Unit =
          if (!fs.rename(src, dst))
            throw new java.io.IOException(s"replaceLog rename $src -> $dst failed")
        if (fs.exists(old)) {
          renameOrThrow(old, bak)
          // rename PRESERVES the live dir's mtime — a table quiet past
          // the sweep cutoff would make its backup instantly "old" and
          // a concurrent sweepStaging could delete it before the delta
          // rescue below reads it (r11 review find); stamp it fresh
          fs.setTimes(bak, System.currentTimeMillis(), -1)
        }
        renameOrThrow(new Path(tmp), old)
        mark.foreach { m =>
          if (fs.exists(bak))
            fs.listStatus(bak).iterator
              .filter { st =>
                val n = st.getPath.getName
                n.endsWith(".parquet") && !m.files.contains(n)
              }
              .foreach(st => renameOrThrow(st.getPath, new Path(old, st.getPath.getName)))
        }
        fs.delete(bak, true)
        val walDelta: Seq[T] =
          if (mark.isDefined) WalStore.rows(root, tbl, enc) else Nil
        WalStore.truncate(root, tbl, enc)
        if (walDelta.nonEmpty)
          WalStore.append(root, tbl, enc, walDelta, force = false)
        snapshotMarks.get.remove(tbl)
      }
    }
  }
}
