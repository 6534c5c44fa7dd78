package graft.meta

import java.time.Instant
import java.time.temporal.ChronoUnit

import org.scalatest.funsuite.AnyFunSuite

/** Ports of the reference needs_optimize tests
  * (backend/internal/service_iceberg_test.go:10-99). Thresholds use the
  * reference's unit-test scale (threshold 256 *bytes* there — the rule is
  * scale-free). */
class SmallFilesSpec extends AnyFunSuite {

  private val now = Instant.parse("2026-03-31T12:00:00Z")
  private def oldPartition: Map[String, String] = {
    val d = now.minus(7, ChronoUnit.DAYS).atZone(java.time.ZoneOffset.UTC).toLocalDate
    Map("year" -> f"${d.getYear}%04d", "month" -> f"${d.getMonthValue}%02d",
      "day" -> f"${d.getDayOfMonth}%02d")
  }
  private def cfg(minCount: Int, sharePct: Int, delayH: Int = 24) =
    SmallFiles.Config(thresholdBytes = 256, minCount = minCount,
      minSharePercent = sharePct, delayHours = delayH)

  test("requires more than one small file") {
    assert(!SmallFiles.needsOptimize(Seq(32, 300, 320), oldPartition, cfg(2, 25), now))
  }

  test("ignores a couple of small files among many large ones") {
    assert(!SmallFiles.needsOptimize(Seq(32, 64, 300, 320, 340, 360, 380, 400),
      oldPartition, cfg(2, 30), now))
  }

  test("optimizes when thresholds are met exactly") {
    assert(SmallFiles.needsOptimize(Seq(32, 64, 300, 320, 340, 360, 380, 400),
      oldPartition, cfg(2, 25), now))
  }

  test("optimizes when many files are small") {
    assert(SmallFiles.needsOptimize(Seq(32, 64, 96, 128, 300, 320),
      oldPartition, cfg(2, 50), now))
  }

  test("freshness delay suppresses today's partition (service_iceberg_test.go:72-87)") {
    val d = now.atZone(java.time.ZoneOffset.UTC).toLocalDate
    val today = Map("year" -> f"${d.getYear}%04d", "month" -> f"${d.getMonthValue}%02d",
      "day" -> f"${d.getDayOfMonth}%02d")
    assert(!SmallFiles.needsOptimize(Seq(32, 64, 300, 320), today, cfg(2, 25, 48), now))
  }

  test("date-less partitions skip the delay check (service_iceberg_test.go:89-99)") {
    assert(SmallFiles.needsOptimize(Seq(32, 64, 300, 320),
      Map("tenant" -> "acme"), cfg(2, 25, 30 * 24), now))
  }

  test("cutoffDay truncates to UTC midnight: 2026-03-31T12:00Z − 48h → 2026-03-29") {
    assert(SmallFiles.cutoffDay(now, 48) == java.time.LocalDate.of(2026, 3, 29))
  }
}
