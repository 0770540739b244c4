package graft.cron

import java.time.{Instant, ZoneId}
import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** Generative properties of the cron engine: for RANDOM schedules and
  * start instants, the computed next fire must (a) be strictly after the
  * start, (b) satisfy `matches` in the schedule's zone, (c) have no
  * earlier matching minute in between (tight-bound check on a sampled
  * window), and prev/next must be inverses around a fire point. The
  * example-based CronSpec pins DST and the OR-quirk; this covers the
  * field-arithmetic space those examples can't enumerate. */
class CronPropertySpec extends AnyFunSuite {

  private val fieldGen: Gen[(String, String, String, String, String)] = {
    def sub(lo: Int, hi: Int): Gen[String] = Gen.frequency(
      4 -> Gen.const("*"),
      2 -> Gen.chooseNum(lo, hi).map(_.toString),
      2 -> Gen.listOfN(3, Gen.chooseNum(lo, hi)).map(_.distinct.sorted.mkString(",")),
      1 -> (for {
        a <- Gen.chooseNum(lo, math.max(lo, hi - 1))
        b <- Gen.chooseNum(a, hi)
      } yield s"$a-$b"),
      1 -> Gen.chooseNum(2, 7).map(n => s"*/$n"))
    for {
      m <- sub(0, 59); h <- sub(0, 23); dom <- sub(1, 28)
      mon <- sub(1, 12); dow <- sub(0, 6)
    } yield (m, h, dom, mon, dow)
  }

  private val zoneGen: Gen[ZoneId] = Gen.oneOf(
    "UTC", "America/New_York", "Europe/Berlin", "Asia/Kolkata",
    "Australia/Sydney").map(ZoneId.of)

  // 2024 (leap year), any minute
  private val instantGen: Gen[Instant] =
    Gen.chooseNum(1704067200L, 1735689600L).map(s => Instant.ofEpochSecond(s / 60 * 60))

  test("nextFire is strictly-after, matching, and minute-tight (property)") {
    val prop = Prop.forAll(fieldGen, zoneGen, instantGen) { (f, zone, after) =>
      val (m, h, dom, mon, dow) = f
      val sched = CronSchedule.parse(s"$m $h $dom $mon $dow")
      val fire = sched.nextFire(after, zone)
      val zdt = fire.atZone(zone)
      val strictlyAfter = fire.isAfter(after)
      val matchesAtFire = sched.matches(zdt)
      // tightness: sample up to 60 candidate minutes in (after, fire) —
      // none may match (a full scan of a 5-year window is too slow)
      val minutesBetween =
        java.time.Duration.between(after, fire).toMinutes
      val step = math.max(1L, minutesBetween / 60)
      val noEarlier = (1L until minutesBetween by step).forall { k =>
        !sched.matches(after.plusSeconds(k * 60).atZone(zone)
          .truncatedTo(java.time.temporal.ChronoUnit.MINUTES))
      }
      strictlyAfter && matchesAtFire && noEarlier
    }
    val result = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(200), prop)
    assert(result.passed, result.status.toString)
  }

  test("prevFire at a fire point returns that fire point (property)") {
    // prevFire is inclusive of its starting minute (the scheduler stamps
    // cron-run-at with the fire being materialized) — so a fixpoint at
    // every nextFire result proves the two walks agree on what "a fire" is.
    val prop = Prop.forAll(fieldGen, zoneGen, instantGen) { (f, zone, after) =>
      val (m, h, dom, mon, dow) = f
      val sched = CronSchedule.parse(s"$m $h $dom $mon $dow")
      val fire = sched.nextFire(after, zone)
      sched.prevFire(fire, zone) == fire
    }
    val result = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(100), prop)
    assert(result.passed, result.status.toString)
  }
}
