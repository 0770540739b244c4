package graft.cron

import java.time.{Instant, ZoneId}
import org.scalatest.funsuite.AnyFunSuite

class CronSpec extends AnyFunSuite {
  private val utc = ZoneId.of("UTC")
  private def t(s: String): Instant = Instant.parse(s)

  test("every-3-minutes (the goose test schedule, factories.clj:20-23)") {
    val s = CronSchedule.parse("*/3 * * * *")
    assert(s.nextFire(t("2024-01-01T00:00:00Z"), utc) == t("2024-01-01T00:03:00Z"))
    assert(s.nextFire(t("2024-01-01T00:03:00Z"), utc) == t("2024-01-01T00:06:00Z"))
    assert(s.nextFire(t("2024-01-01T00:04:30Z"), utc) == t("2024-01-01T00:06:00Z"))
  }

  test("fixed daily time") {
    val s = CronSchedule.parse("30 9 * * *")
    assert(s.nextFire(t("2024-03-05T09:29:00Z"), utc) == t("2024-03-05T09:30:00Z"))
    assert(s.nextFire(t("2024-03-05T09:30:00Z"), utc) == t("2024-03-06T09:30:00Z"))
  }

  test("lists, ranges, steps, names") {
    val s = CronSchedule.parse("0 0 1,15 JAN-JUN/2 *")
    // months {1,3,5}, dom {1,15}
    assert(s.nextFire(t("2024-01-15T00:00:00Z"), utc) == t("2024-03-01T00:00:00Z"))
    val dow = CronSchedule.parse("0 12 * * MON-FRI")
    // 2024-01-06 is a Saturday
    assert(dow.nextFire(t("2024-01-06T00:00:00Z"), utc) == t("2024-01-08T12:00:00Z"))
  }

  test("dow 0 and 7 both mean Sunday") {
    val s0 = CronSchedule.parse("0 0 * * 0")
    val s7 = CronSchedule.parse("0 0 * * 7")
    val after = t("2024-01-03T00:00:00Z") // Wednesday
    assert(s0.nextFire(after, utc) == t("2024-01-07T00:00:00Z"))
    assert(s7.nextFire(after, utc) == s0.nextFire(after, utc))
  }

  test("dom/dow OR quirk when both restricted") {
    // "0 0 13 * FRI": fires on the 13th AND on every Friday.
    val s = CronSchedule.parse("0 0 13 * 5")
    // After Wed 2024-09-11: Friday the 13th
    assert(s.nextFire(t("2024-09-11T00:00:00Z"), utc) == t("2024-09-13T00:00:00Z"))
    // After Fri 2024-09-13: the very next Friday (20th), not Oct 13
    assert(s.nextFire(t("2024-09-13T00:00:00Z"), utc) == t("2024-09-20T00:00:00Z"))
  }

  test("DST spring-forward gap skips to a valid instant") {
    val ny = ZoneId.of("America/New_York")
    // 2024-03-10: 02:00-03:00 local does not exist in New York.
    val s = CronSchedule.parse("30 2 * * *")
    val next = s.nextFire(t("2024-03-10T00:00:00-05:00"), ny)
    // java.time resolves the gap by shifting forward; must not throw, must
    // be after the gap and on a subsequent 02:30 local or its resolution.
    assert(next.isAfter(t("2024-03-10T06:59:59Z")))
    val following = s.nextFire(next, ny)
    assert(following.atZone(ny).getHour == 2 && following.atZone(ny).getMinute == 30)
  }

  test("timezone-aware daily fire") {
    val tokyo = ZoneId.of("Asia/Tokyo")
    val s = CronSchedule.parse("0 9 * * *")
    // 2024-01-01T23:00Z = Jan 2, 08:00 JST → next 09:00 JST = Jan 2 00:00Z
    assert(s.nextFire(t("2024-01-01T23:00:00Z"), tokyo) == t("2024-01-02T00:00:00Z"))
  }

  test("prevFire is the inverse walk") {
    val s = CronSchedule.parse("*/15 * * * *")
    assert(s.prevFire(t("2024-01-01T00:16:00Z"), utc) == t("2024-01-01T00:15:00Z"))
    assert(s.prevFire(t("2024-01-01T00:15:00Z"), utc) == t("2024-01-01T00:15:00Z"))
  }

  test("leap day fires only in leap years") {
    val s = CronSchedule.parse("0 0 29 2 *")
    assert(s.nextFire(t("2023-03-01T00:00:00Z"), utc) == t("2024-02-29T00:00:00Z"))
    assert(s.nextFire(t("2024-02-29T00:00:00Z"), utc) == t("2028-02-29T00:00:00Z"))
  }

  test("impossible dates fail fast instead of spinning") {
    val s = CronSchedule.parse("0 0 31 4 *") // April 31st never exists
    intercept[IllegalStateException] { s.nextFire(t("2024-01-01T00:00:00Z"), utc) }
  }

  test("invalid schedules are rejected") {
    intercept[IllegalArgumentException] { CronSchedule.parse("* * * *") }
    intercept[IllegalArgumentException] { CronSchedule.parse("61 * * * *") }
    intercept[IllegalArgumentException] { CronSchedule.parse("* 25 * * *") }
  }
}
