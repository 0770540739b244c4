package graft.model

import java.util.concurrent.atomic.AtomicLong
import org.scalatest.funsuite.AnyFunSuite

/** Cross-writer ordering of the version sequence — the property
  * `System.nanoTime` could NOT provide (arbitrary per-JVM origin meant a
  * writer-B mutation could stamp a SMALLER seq than writer A's original,
  * silently undoing prioritise/replay at cluster scale). */
class SeqGenSpec extends AnyFunSuite {

  test("a later mutation from a different writer always wins, despite clock skew") {
    // writer A: reference clock; writer B: skewed 2ms BEHIND (realistic
    // NTP-bounded skew — nanoTime origins differ by minutes to days)
    val wall = new AtomicLong(1700000000000L)
    val genA = new SeqGen(writerId = 3, clock = () => wall.get())
    val genB = new SeqGen(writerId = 200, clock = () => wall.get() - 2)

    val original = genA.next() // writer A appends the row at t0
    wall.addAndGet(5) // 5ms later (> skew), writer B prioritises
    val mutation = genB.next()
    assert(mutation > original,
      "writer B's re-append must shadow writer A's row under max-seq dedupe")
  }

  test("same millisecond, different writers: distinct and writer-ordered") {
    val gen1 = new SeqGen(writerId = 1, clock = () => 1700000000000L)
    val gen2 = new SeqGen(writerId = 2, clock = () => 1700000000000L)
    val s1 = gen1.next()
    val s2 = gen2.next()
    assert(s1 != s2)
    assert(SeqGen.writerOf(s1) == 1 && SeqGen.writerOf(s2) == 2)
    assert(SeqGen.epochMsOf(s1) == 1700000000000L)
  }

  test("strictly monotonic per writer under a frozen clock (counter bump)") {
    val gen = new SeqGen(writerId = 7, clock = () => 1700000000000L)
    val seqs = (1 to 10000).map(_ => gen.next())
    assert(seqs == seqs.sorted && seqs.distinct.size == seqs.size)
  }

  test("monotonic even when the clock steps backwards") {
    val wall = new AtomicLong(1700000000000L)
    val gen = new SeqGen(writerId = 5, clock = () => wall.get())
    val before = gen.next()
    wall.addAndGet(-50) // NTP step back
    val after = gen.next()
    assert(after > before)
  }

  test("strictly monotonic under concurrent stamping (32 threads)") {
    val gen = new SeqGen(writerId = 9)
    val all = java.util.Collections.synchronizedList(new java.util.ArrayList[Long]())
    val threads = (1 to 32).map { _ =>
      new Thread(() => (1 to 2000).foreach(_ => all.add(gen.next())))
    }
    threads.foreach(_.start()); threads.foreach(_.join())
    val seqs = { import scala.jdk.CollectionConverters._; all.asScala.toVector }
    assert(seqs.distinct.size == seqs.size, "no duplicate seqs under contention")
  }

  test("epoch prefix keeps seq positive well past 2100") {
    val gen = new SeqGen(writerId = 255, clock = () => 4200000000000L) // year 2103
    assert(gen.next() > 0)
  }
}
