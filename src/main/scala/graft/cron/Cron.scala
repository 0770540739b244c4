package graft.cron

import java.time.{Instant, ZoneId, ZonedDateTime}
import java.time.temporal.ChronoUnit

/** Minimal 5-field UNIX cron (minute hour day-of-month month day-of-week),
  * matching the subset goose accepts (reference cron/parsing.clj:11-15,
  * `CronType/UNIX`; schedules validated at registration,
  * specs.clj:103-105). Supported syntax per field: `*`, lists `a,b,c`,
  * ranges `a-b`, steps (star-slash-n and `a-b/n`), and month/day names
  * (JAN..DEC, SUN..SAT). Standard quirk preserved: when BOTH day-of-month
  * and day-of-week are restricted, a date matches if EITHER matches.
  *
  * Timezone-aware: next/prev fire times are computed in the entry's ZoneId
  * (reference redis/cron.clj:83-87 passes the entry's timezone), so DST
  * gaps/overlaps behave like system cron — a fire time falling inside a
  * DST gap is skipped forward, and ambiguous times fire once.
  */
final case class CronSchedule(
    minutes: Set[Int],
    hours: Set[Int],
    daysOfMonth: Set[Int],
    months: Set[Int],
    daysOfWeek: Set[Int],
    domStar: Boolean,
    dowStar: Boolean) {

  private def dateMatches(t: ZonedDateTime): Boolean = {
    if (!months.contains(t.getMonthValue)) return false
    val domOk = daysOfMonth.contains(t.getDayOfMonth)
    val dowOk = daysOfWeek.contains(t.getDayOfWeek.getValue % 7) // SUN=0
    if (domStar && dowStar) true
    else if (domStar) dowOk
    else if (dowStar) domOk
    else domOk || dowOk // the classic OR quirk
  }

  def matches(t: ZonedDateTime): Boolean =
    minutes.contains(t.getMinute) && hours.contains(t.getHour) && dateMatches(t)

  /** First fire time strictly after `after`, in `zone`. */
  def nextFire(after: Instant, zone: ZoneId): Instant = {
    var t = after.atZone(zone).truncatedTo(ChronoUnit.MINUTES).plusMinutes(1)
    val limit = t.plusYears(5)
    while (t.isBefore(limit)) {
      if (!months.contains(t.getMonthValue)) {
        t = t.plusMonths(1).withDayOfMonth(1).withHour(0).withMinute(0)
      } else if (!dateMatches(t)) {
        t = t.plusDays(1).withHour(0).withMinute(0)
      } else if (!hours.contains(t.getHour)) {
        t = t.plusHours(1).withMinute(0)
      } else if (!minutes.contains(t.getMinute)) {
        t = t.plusMinutes(1)
      } else {
        return t.toInstant
      }
    }
    throw new IllegalStateException("no cron fire within 5 years")
  }

  /** Last fire time at or before `before` (goose stamps `cron-run-at` with
    * the previous fire, redis/cron.clj:83-87). */
  def prevFire(before: Instant, zone: ZoneId): Instant = {
    var t = before.atZone(zone).truncatedTo(ChronoUnit.MINUTES)
    val limit = t.minusYears(5)
    while (t.isAfter(limit)) {
      if (!months.contains(t.getMonthValue)) {
        t = t.withDayOfMonth(1).withHour(0).withMinute(0).minusMinutes(1)
      } else if (!dateMatches(t)) {
        t = t.withHour(0).withMinute(0).minusMinutes(1)
      } else if (!hours.contains(t.getHour)) {
        t = t.withMinute(0).minusMinutes(1)
      } else if (!minutes.contains(t.getMinute)) {
        t = t.minusMinutes(1)
      } else {
        return t.toInstant
      }
    }
    throw new IllegalStateException("no cron fire within past 5 years")
  }
}

object CronSchedule {
  private val monthNames =
    Seq("JAN", "FEB", "MAR", "APR", "MAY", "JUN", "JUL", "AUG", "SEP", "OCT", "NOV", "DEC")
  private val dayNames = Seq("SUN", "MON", "TUE", "WED", "THU", "FRI", "SAT")

  def parse(expr: String): CronSchedule = {
    val fields = expr.trim.split("\\s+")
    require(fields.length == 5, s"cron needs 5 fields, got ${fields.length} in '$expr'")
    val mins = parseField(fields(0), 0, 59, Nil)
    val hrs = parseField(fields(1), 0, 23, Nil)
    val dom = parseField(fields(2), 1, 31, Nil)
    val mon = parseField(fields(3), 1, 12, monthNames)
    // dow: 0 and 7 are both Sunday
    val dowRaw = parseField(fields(4), 0, 7, dayNames)
    val dow = dowRaw.map(d => if (d == 7) 0 else d)
    CronSchedule(mins, hrs, dom, mon, dow,
      domStar = fields(2) == "*", dowStar = fields(4) == "*")
  }

  private def parseField(f: String, lo: Int, hi: Int, names: Seq[String]): Set[Int] = {
    def atom(s: String): Int = {
      val up = s.toUpperCase
      val idx = names.indexOf(up)
      if (idx >= 0) idx + (if (names == monthNames) 1 else 0)
      else {
        val v = s.toInt
        require(v >= lo && v <= hi, s"cron value $v out of [$lo,$hi]")
        v
      }
    }
    f.split(',').flatMap { part =>
      val (rangePart, step) = part.split('/') match {
        case Array(r) => (r, 1)
        case Array(r, st) => (r, st.toInt)
        case _ => throw new IllegalArgumentException(s"bad cron part '$part'")
      }
      require(step >= 1, s"bad cron step in '$part'")
      val (a, b) =
        if (rangePart == "*") (lo, hi)
        else rangePart.split('-') match {
          case Array(x) => val v = atom(x); if (step > 1) (v, hi) else (v, v)
          case Array(x, y) => (atom(x), atom(y))
          case _ => throw new IllegalArgumentException(s"bad cron range '$rangePart'")
        }
      require(a <= b, s"inverted cron range '$part'")
      (a to b by step)
    }.toSet
  }
}
