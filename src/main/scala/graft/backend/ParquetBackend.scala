package graft.backend

import java.util.UUID
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Dataset, Encoder, SaveMode, SparkSession}

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
    multiProcessWriters = false, // shared _temporary staging dir per table
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

  override def sweepStaging(olderThanMs: Long): Int =
    DirectParquetAppend.sweepStaging(fs, new Path(root), olderThanMs)

  override protected def readLog[T: Encoder](tbl: String): Dataset[T] =
    if (exists(tbl)) spark.read.parquet(dir(tbl)).as[T]
    else spark.emptyDataset[T]

  override protected def appendLog[T](tbl: String, ds: Dataset[T]): Unit = {
    val lock = writeLocks.computeIfAbsent(tbl, _ => new Object)
    lock.synchronized { ds.write.mode(SaveMode.Append).parquet(dir(tbl)) }
  }

  /** Driver-held small appends skip the Spark job entirely: one
    * parquet-hadoop file write through Spark's own ParquetWriteSupport,
    * staged invisible and renamed in ([[DirectParquetAppend]]) — ~2 ms
    * against the distributed path's ~100 ms commit protocol. The lock
    * serializes against a concurrent [[replaceLog]] dir swap (a rename
    * into a directory mid-swap would land the file in the retired
    * generation and lose it). */
  override protected def appendSmallRows[T: Encoder](tbl: String, rows: Seq[T]): Unit =
    if (rows.nonEmpty) {
      val lock = writeLocks.computeIfAbsent(tbl, _ => new Object)
      lock.synchronized {
        DirectParquetAppend.append(spark, implicitly[Encoder[T]], dir(tbl), rows)
      }
    }

  /** Write the replacement as a fresh directory, then swap via renames. */
  override protected def replaceLog[T](tbl: String, rows: Dataset[T]): Unit = {
    val lock = writeLocks.computeIfAbsent(tbl, _ => new Object)
    lock.synchronized {
      val tmp = s"$root/.rw-${UUID.randomUUID()}"
      rows.write.mode(SaveMode.Overwrite).parquet(tmp)
      val old = new Path(dir(tbl))
      val bak = new Path(s"$root/.old-${UUID.randomUUID()}")
      if (fs.exists(old)) fs.rename(old, bak)
      fs.rename(new Path(tmp), old)
      fs.delete(bak, true)
    }
  }
}
