package graft

import java.nio.file.{Files, Paths}
import graft.backend.WalStore
import org.scalatest.funsuite.AnyFunSuite

/** WAL channel lifecycle under asynchronous close (VERDICT r15 #1).
  *
  * FileChannel is an InterruptibleChannel: interrupting a thread blocked
  * in a channel op closes the channel FOR EVERY HOLDER. GraftWorker.stop
  * interrupts its maintenance thread (and Spark's query.stop interrupts
  * the stream thread) — either can land mid-WAL-I/O and, before the r16
  * heal, bricked the TableWal for the rest of the JVM: the driver's r15
  * verify caught it as a ClosedChannelException flake in
  * GraftWorkerSpec via ManagementApi.enqueuedSize → readLog → readAll.
  *
  * Contract pinned here: a WAL channel closed OUT FROM UNDER the store
  * (interrupt) heals transparently — reads, appends and folds keep
  * working with no records lost — while a DELIBERATE close (scratch
  * teardown via closeUnder) degrades stale holders to the post-teardown
  * view (empty reads, failed appends) instead of resurrecting the file
  * inside a directory being deleted. No test here needs Spark.
  */
class WalChannelRaceSpec extends AnyFunSuite {

  private val Enc = org.apache.spark.sql.Encoders.product[(Long, String)]

  private def freshRoot(): String =
    Files.createTempDirectory("graft-walrace").toString

  private def append(root: String, rows: (Long, String)*): Unit =
    WalStore.append(root, "t", Enc, rows, force = false)

  private def liveRows(root: String): Seq[(Long, String)] =
    WalStore.rows(root, "t", Enc)

  test("an interrupt-closed channel heals: reads, appends and folds keep working") {
    val root = freshRoot()
    try {
      append(root, (1L, "a"), (2L, "b"))
      val wal = WalStore.forTable(root, "t", Enc)

      // the exact state an interrupt mid-I/O leaves: channel closed,
      // writer still registered, closedForever NOT set
      wal.simulateAsyncClose()
      assert(liveRows(root).map(_._1) == Seq(1L, 2L),
        "readAll must reopen and decode every committed record")

      wal.simulateAsyncClose()
      append(root, (3L, "c")) // append path heals too
      assert(liveRows(root).map(_._1) == Seq(1L, 2L, 3L))
      assert(WalStore.recordCount(root, "t", Enc) == 3)

      wal.simulateAsyncClose()
      wal.truncate() // the fold's truncate heals as well
      assert(WalStore.recordCount(root, "t", Enc) == 0)
      assert(liveRows(root).isEmpty)
    } finally Scratch.delete(root)
  }

  test("a heal after an async close moves the content stamp (fingerprint honesty)") {
    val root = freshRoot()
    try {
      append(root, (1L, "a"))
      val before = WalStore.contentStamp(root, "t")
      WalStore.forTable(root, "t", Enc).simulateAsyncClose()
      liveRows(root) // triggers the reopen (gen bump)
      assert(WalStore.contentStamp(root, "t") != before,
        "a reopen may have truncated a torn tail; the stamp must not alias")
    } finally Scratch.delete(root)
  }

  test("a pending interrupt is parked across the op and re-asserted after") {
    val root = freshRoot()
    try {
      append(root, (1L, "a"))
      Thread.currentThread().interrupt()
      try {
        // with the interrupt pending, the first blocking channel op
        // would close the channel and throw ClosedByInterruptException;
        // the store parks the status instead
        assert(liveRows(root).map(_._1) == Seq(1L))
        append(root, (2L, "b"))
        assert(liveRows(root).size == 2)
        assert(Thread.currentThread().isInterrupted,
          "the interrupt signal must be deferred, not swallowed")
      } finally Thread.interrupted() // clear for the rest of the suite
    } finally Scratch.delete(root)
  }

  test("interrupt hammer: producers interrupted mid-append never brick the WAL") {
    val root = freshRoot()
    try {
      val rounds = 30
      var committed = 0L
      for (r <- 0 until rounds) {
        val ok = new java.util.concurrent.atomic.AtomicLong(0)
        val t = new Thread(() => {
          var i = 0
          while (i < 400 && !Thread.currentThread().isInterrupted) {
            try { append(root, (i.toLong, s"r$r-$i")); ok.incrementAndGet() }
            catch { case _: java.io.IOException => () } // failed batch: rolled back
            i += 1
          }
        })
        t.start()
        Thread.sleep(r % 4) // land the interrupt at varied points
        t.interrupt()
        t.join(10000)
        assert(!t.isAlive, "producer must exit after the interrupt")
        committed += ok.get()
        // the WAL must still be fully usable and exactly consistent:
        // every append that returned success is decodable, none doubled
        assert(liveRows(root).size.toLong == committed,
          s"round $r: decoded=${liveRows(root).size} committed=$committed")
        if (WalStore.recordCount(root, "t", Enc) > WalStore.MaxRecords - 500) {
          WalStore.forTable(root, "t", Enc).truncate()
          committed = 0
        }
      }
    } finally Scratch.delete(root)
  }

  test("closeUnder racing concurrent readers never throws; stale holders degrade") {
    val root = freshRoot()
    try {
      append(root, (1L, "a"), (2L, "b"))
      val stale = WalStore.forTable(root, "t", Enc)
      val errors = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
      val stop = new java.util.concurrent.atomic.AtomicBoolean(false)
      val readers = (0 until 4).map { _ =>
        new Thread(() => {
          while (!stop.get()) {
            try {
              stale.readAll()
              WalStore.hasRecords(root, "t")
              WalStore.contentStamp(root, "t")
            } catch { case t: Throwable => errors.add(t); stop.set(true) }
          }
        })
      }
      readers.foreach(_.start())
      Thread.sleep(20)
      WalStore.closeUnder(root) // teardown racing the readers
      Thread.sleep(20)
      stop.set(true)
      readers.foreach(_.join(10000))
      assert(errors.isEmpty, s"reader threw: ${Option(errors.peek()).map(_.toString)}")
      // stale holder sees the post-teardown view
      assert(stale.readAll().isEmpty)
      assert(stale.size == 0)
      intercept[java.io.IOException] { // appends to a torn-down WAL fail loudly
        stale.appendFramed(java.nio.ByteBuffer.wrap(WalStore.frame(Enc, Seq((9L, "z")))),
          1, force = false)
      }
    } finally Scratch.delete(root)
  }

  test("a cross-process same-size rewrite moves the content stamp (VERDICT r15 #7)") {
    val root = freshRoot()
    try {
      append(root, (1L, "a"))
      WalStore.closeUnder(root) // drop the local writer: foreign-WAL branch
      val p = Paths.get(root, ".wal", "t.wal")
      val stampA = WalStore.contentStamp(root, "t")
      assert(stampA != 0L)
      // truncate-and-rewrite landing at the identical byte size
      val bytes = Files.readAllBytes(p)
      Files.write(p, bytes)
      Files.setLastModifiedTime(p,
        java.nio.file.attribute.FileTime.fromMillis(
          Files.getLastModifiedTime(p).toMillis + 5000))
      assert(Files.size(p) == bytes.length.toLong)
      assert(WalStore.contentStamp(root, "t") != stampA,
        "same-size rewrite must be visible to the cron gate's fingerprint")
    } finally Scratch.delete(root)
  }
}
