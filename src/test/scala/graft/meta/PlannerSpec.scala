package graft.meta

import java.time.{Instant, LocalDate}

import org.scalatest.funsuite.AnyFunSuite

import Planner._

/** Ports of the reference chunk/clamp tests
  * (backend/internal/service_tasks_test.go:10-68) plus property checks on
  * the chunk laws (SURVEY.md §5 item 3; seeded sampling, no scalatestplus
  * bridge in the offline cache). */
class PlannerSpec extends AnyFunSuite {

  private val now = Instant.parse("2026-03-31T12:00:00Z")

  test("rangeWithinDelay clamps upper bound: Mar 1..31, delay 48h → Mar 1..29") {
    assert(rangeWithinDelay(LocalDate.of(2026, 3, 1), LocalDate.of(2026, 3, 31), now, 48) ==
      Some(DateRange(LocalDate.of(2026, 3, 1), LocalDate.of(2026, 3, 29))))
  }

  test("rangeWithinDelay empty when window entirely too recent") {
    assert(rangeWithinDelay(LocalDate.of(2026, 3, 30), LocalDate.of(2026, 3, 31), now, 48).isEmpty)
  }

  test("weekly chunk clamps to delay cutoff: Mar 29 → Mar 23..29") {
    val allowed = DateRange(LocalDate.of(2026, 3, 1), LocalDate.of(2026, 3, 29))
    assert(clampRange(chunkForDate(LocalDate.of(2026, 3, 29), ChunkWeek), allowed) ==
      Some(DateRange(LocalDate.of(2026, 3, 23), LocalDate.of(2026, 3, 29))))
  }

  test("monthly chunk clamps to delay cutoff: Mar 15 → Mar 1..29") {
    val allowed = DateRange(LocalDate.of(2026, 3, 1), LocalDate.of(2026, 3, 29))
    assert(clampRange(chunkForDate(LocalDate.of(2026, 3, 15), ChunkMonth), allowed) ==
      Some(DateRange(LocalDate.of(2026, 3, 1), LocalDate.of(2026, 3, 29))))
  }

  test("week chunks start Monday and span 7 days") {
    // 2026-03-29 is a Sunday → week is Mon 23 .. Sun 29
    assert(chunkForDate(LocalDate.of(2026, 3, 29), ChunkWeek) ==
      DateRange(LocalDate.of(2026, 3, 23), LocalDate.of(2026, 3, 29)))
    // A Monday starts its own week
    assert(chunkForDate(LocalDate.of(2026, 3, 23), ChunkWeek) ==
      DateRange(LocalDate.of(2026, 3, 23), LocalDate.of(2026, 3, 29)))
  }

  test("month chunk is first-of-month .. last-of-month (leap year aware)") {
    assert(chunkForDate(LocalDate.of(2024, 2, 10), ChunkMonth) ==
      DateRange(LocalDate.of(2024, 2, 1), LocalDate.of(2024, 2, 29)))
  }

  test("normalizeChunkBy: blank/day/week/month, else error (service_tasks.go:440-450)") {
    assert(normalizeChunkBy("") == Right(ChunkDay))
    assert(normalizeChunkBy(" Day ") == Right(ChunkDay))
    assert(normalizeChunkBy("WEEK") == Right(ChunkWeek))
    assert(normalizeChunkBy("month") == Right(ChunkMonth))
    assert(normalizeChunkBy("quarter").isLeft)
  }

  test("planChunks dedups overlapping chunks, keeps first-seen order") {
    val eff = DateRange(LocalDate.of(2026, 3, 1), LocalDate.of(2026, 3, 29))
    val dates = Seq(LocalDate.of(2026, 3, 24), LocalDate.of(2026, 3, 25),
      LocalDate.of(2026, 3, 10))
    assert(planChunks(dates, eff, ChunkWeek) == Seq(
      DateRange(LocalDate.of(2026, 3, 23), LocalDate.of(2026, 3, 29)),
      DateRange(LocalDate.of(2026, 3, 9), LocalDate.of(2026, 3, 15))))
  }

  private val rnd = new scala.util.Random(42)
  private def randDate(): LocalDate = LocalDate.ofEpochDay(rnd.nextLong(40000L))
  private val kinds = Seq(ChunkDay, ChunkWeek, ChunkMonth)

  test("property: every date lies inside its own chunk") {
    for (_ <- 1 to 500; cb <- kinds) {
      val d = randDate()
      val c = chunkForDate(d, cb)
      assert(!d.isBefore(c.from) && !d.isAfter(c.to), s"$d not in $c ($cb)")
    }
  }

  test("property: chunks of the same kind never overlap unless identical") {
    for (_ <- 1 to 500; cb <- kinds) {
      val (a, b) = (randDate(), randDate())
      val (ca, cb2) = (chunkForDate(a, cb), chunkForDate(b, cb))
      val overlap = !ca.to.isBefore(cb2.from) && !cb2.to.isBefore(ca.from)
      assert(!overlap || ca == cb2, s"$ca overlaps $cb2 ($cb)")
    }
  }

  test("property: planChunks output is within the effective range and duplicate-free") {
    for (_ <- 1 to 100; cb <- kinds) {
      val ds = Seq.fill(20)(randDate())
      val eff = DateRange(LocalDate.ofEpochDay(0), LocalDate.ofEpochDay(40000))
      val out = planChunks(ds, eff, cb)
      assert(out.distinct == out)
      out.foreach { c =>
        assert(!c.from.isBefore(eff.from) && !c.to.isAfter(eff.to) && !c.from.isAfter(c.to))
      }
    }
  }
}
