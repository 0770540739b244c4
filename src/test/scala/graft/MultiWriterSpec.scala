package graft

import java.util.concurrent.atomic.AtomicLong
import graft.backend.ParquetBackend
import graft.model._

/** Cluster-correctness of the versioning substrate: mutations stamped by
  * DIFFERENT writer JVMs (skewed clocks, like two clients in goose's
  * multi-client reality, reference redis/api/enqueued_jobs.clj:29-40)
  * must still resolve latest-wins under the backend's max-seq dedupe. */
class MultiWriterSpec extends SparkSpec {
  import spark.implicits._

  private def job(id: String, priority: Int, seq: Long): Job = Job(
    id = id, executeFnSym = "noop", argsJson = "[]", queue = "q",
    readyQueue = "q", priority = priority, enqueuedAt = 1700000000000L,
    scheduleRunAt = None, cronRunAt = None, batchId = None,
    retryOpts = RetryOpts(), state = None, seq = seq)

  test("a prioritise re-appended by writer B shadows writer A's original row") {
    val backend = new ParquetBackend(spark, tmpDir("graft-mw"))
    val wall = new AtomicLong(1700000000000L)
    val writerA = new SeqGen(writerId = 10, clock = () => wall.get())
    val writerB = new SeqGen(writerId = 20, clock = () => wall.get() - 2) // 2ms behind

    val original = job("j1", priority = 0, seq = writerA.next())
    backend.enqueue(Seq(original).toDS())

    wall.addAndGet(5)
    // Writer B bumps priority; simulate the worst case — crash before the
    // tombstone lands, so BOTH versions are live and only max-seq decides.
    backend.enqueue(Seq(job("j1", priority = 1, seq = writerB.next())).toDS())

    val visible = backend.readyJobs.collect()
    assert(visible.length == 1, "duplicate versions must collapse to one row")
    assert(visible.head.priority == 1,
      "the LATER mutation (writer B) must win despite B's skewed clock")
  }

  test("writer B's tombstone hides writer A's exact row version") {
    val backend = new ParquetBackend(spark, tmpDir("graft-mw"))
    val writerA = new SeqGen(writerId = 11)
    val a = job("j2", priority = 0, seq = writerA.next())
    backend.enqueue(Seq(a).toDS())
    // tombstones key on (id, seq) — writer identity is irrelevant, any
    // process that OBSERVED the row can delete it
    backend.tombstone("ready", Seq((a.id, a.seq)), "delete")
    assert(backend.readyJobs.count() == 0)
  }

  test("interleaved cron upserts of different names from two writers both survive") {
    // the old read-modify-overwrite snapshot lost one of these; the keyed
    // log (latest-wins per cronName) keeps both
    val backend = new ParquetBackend(spark, tmpDir("graft-mw"))
    val desc = JobDescription("noop", "[]", "q", "q", 0, RetryOpts())
    val a = new Thread(() =>
      backend.upsertCron(Seq(CronEntry("cron-a", "* * * * *", "UTC", desc, 1000L))))
    val b = new Thread(() =>
      backend.upsertCron(Seq(CronEntry("cron-b", "*/5 * * * *", "UTC", desc, 2000L))))
    a.start(); b.start(); a.join(); b.join()
    val names = backend.cronEntries.collect().map(_.cronName).sorted
    assert(names.toSeq == Seq("cron-a", "cron-b"))

    // same-name re-upsert replaces (goose HSET semantics), delete hides
    backend.upsertCron(Seq(CronEntry("cron-a", "0 * * * *", "UTC", desc, 3000L)))
    val cronA = backend.cronEntries.filter($"cronName" === "cron-a").collect()
    assert(cronA.length == 1 && cronA.head.cronSchedule == "0 * * * *")
    backend.deleteCron(Seq("cron-b"))
    assert(backend.cronEntries.collect().map(_.cronName).toSeq == Seq("cron-a"))

    // compaction folds the log without changing the view
    backend.compact("cron")
    val after = backend.cronEntries.collect()
    assert(after.length == 1 && after.head.cronSchedule == "0 * * * *")
  }

  test("distributed (Dataset) tombstone path hides victims without a driver collect") {
    val backend = new ParquetBackend(spark, tmpDir("graft-mw"))
    val rows = (1 to 500).map(i => job(s"j$i", 0, Job.nextSeq()))
    backend.enqueue(rows.toDS())
    val victims = backend.readyJobs
      .filter($"id".isin((1 to 250).map(i => s"j$i"): _*))
      .select($"id", $"seq").as[(String, Long)]
    backend.tombstone("ready", victims, "bulk-delete")
    assert(backend.readyJobs.count() == 250)
  }
}
