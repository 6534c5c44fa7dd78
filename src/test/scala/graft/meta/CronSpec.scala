package graft.meta

import java.time.Instant

import org.scalatest.funsuite.AnyFunSuite

/** 5-field cron semantics incl. the reference's shipped schedules
  * (hourly refresh `0 * * * *`, daily maintenance `0 2 * * *`). */
class CronSpec extends AnyFunSuite {

  private def next(spec: String, from: String): String =
    Cron.parse(spec).toOption.get.next(Instant.parse(from)).get.toString

  test("hourly refresh: 0 * * * *") {
    assert(next("0 * * * *", "2026-03-01T10:15:00Z") == "2026-03-01T11:00:00Z")
    assert(next("0 * * * *", "2026-03-01T10:00:00Z") == "2026-03-01T11:00:00Z")
  }

  test("daily maintenance: 0 2 * * *") {
    assert(next("0 2 * * *", "2026-03-01T01:00:00Z") == "2026-03-01T02:00:00Z")
    assert(next("0 2 * * *", "2026-03-01T02:00:00Z") == "2026-03-02T02:00:00Z")
  }

  test("steps, ranges and lists") {
    assert(next("*/15 * * * *", "2026-03-01T10:16:00Z") == "2026-03-01T10:30:00Z")
    assert(next("30 9-17 * * *", "2026-03-01T17:31:00Z") == "2026-03-02T09:30:00Z")
    assert(next("0 0 1,15 * *", "2026-03-02T00:00:00Z") == "2026-03-15T00:00:00Z")
  }

  test("day-of-week with 0 and 7 both meaning Sunday") {
    // 2026-03-01 is a Sunday.
    assert(next("0 12 * * 0", "2026-02-27T00:00:00Z") == "2026-03-01T12:00:00Z")
    assert(next("0 12 * * 7", "2026-02-27T00:00:00Z") == "2026-03-01T12:00:00Z")
    assert(next("0 12 * * 1", "2026-02-27T00:00:00Z") == "2026-03-02T12:00:00Z")
  }

  test("star-headed steps still restrict day matching (only the OR-combination is starBit-relaxed)") {
    // */2 dom = {1,3,5,...}: from Jan 1 the next fire is Jan 3, not Jan 2.
    assert(next("0 0 */2 * *", "2026-01-01T00:00:00Z") == "2026-01-03T00:00:00Z")
    // */2 dow = {0,2,4,6} (Sun/Tue/Thu/Sat). 2026-03-02 is a Monday →
    // next match is Tuesday Mar 3, not Monday.
    assert(next("0 3 * * */2", "2026-03-02T00:00:00Z") == "2026-03-03T03:00:00Z")
    // star-headed dom step does NOT enter the OR-rule: `0 0 */2 * 1`
    // requires BOTH an odd day and (dow unrestricted? no: dow=Monday) —
    // robfig: dom star-headed → AND → first odd-day Monday after Mar 3
    // 2026 is Mar 9 (Monday, odd).
    assert(next("0 0 */2 * 1", "2026-03-03T00:00:00Z") == "2026-03-09T00:00:00Z")
  }

  test("dom/dow OR rule when both restricted") {
    // Either the 10th OR a Monday. From Mar 3 2026 (Tue): Mon Mar 9 < Mar 10.
    assert(next("0 0 10 * 1", "2026-03-03T00:00:00Z") == "2026-03-09T00:00:00Z")
    assert(next("0 0 10 * 1", "2026-03-09T00:00:00Z") == "2026-03-10T00:00:00Z")
  }

  test("month rollover and leap day") {
    assert(next("0 0 29 2 *", "2025-03-01T00:00:00Z") == "2028-02-29T00:00:00Z")
    assert(next("0 0 31 * *", "2026-04-01T00:00:00Z") == "2026-05-31T00:00:00Z")
  }

  test("malformed specs rejected") {
    assert(Cron.parse("* * * *").isLeft)      // 4 fields
    assert(Cron.parse("61 * * * *").isLeft)   // out of range
    assert(Cron.parse("a * * * *").isLeft)
    assert(Cron.parse("*/0 * * * *").isLeft)
    assert(Cron.parse("5-1 * * * *").isLeft)  // inverted range
  }

  test("matches() agrees with next()") {
    val c = Cron.parse("*/5 9 * * 1-5").toOption.get
    val n = c.next(Instant.parse("2026-03-04T08:59:00Z")).get
    assert(c.matches(n))
    assert(n == Instant.parse("2026-03-04T09:00:00Z"))
  }
}
