package graft.meta

import java.time.LocalDate

import org.scalatest.funsuite.AnyFunSuite

import Model._
import PartitionModel._

/** Ports of the reference's partition-logic tests
  * (backend/internal/iceberg_client_test.go, datetime_test.go). */
class PartitionModelSpec extends AnyFunSuite {

  test("day transform expands to year/month/day sharing the raw field name (iceberg_client_test.go:50-70)") {
    val spec = Seq(SpecField("goal_conversion_happened_at_day", "day", "goal.conversionHappenedAt"))
    val expanded = expandSpec(spec)
    assert(expanded == Right(Seq(
      PartitionField("year", "goal_conversion_happened_at_day", isHidden = true,
        Some(HiddenTransform("goal.conversionHappenedAt", "day"))),
      PartitionField("month", "goal_conversion_happened_at_day", isHidden = true,
        Some(HiddenTransform("goal.conversionHappenedAt", "day"))),
      PartitionField("day", "goal_conversion_happened_at_day", isHidden = true,
        Some(HiddenTransform("goal.conversionHappenedAt", "day"))))))
  }

  test("identity transform keeps the nested source column name (iceberg_client_test.go:72-89)") {
    val spec = Seq(SpecField("goal_conversion_happened_at", "identity", "goal.conversionHappenedAt"))
    assert(expandSpec(spec) == Right(Seq(
      PartitionField("goal.conversionHappenedAt", "goal_conversion_happened_at",
        isHidden = false, None))))
  }

  test("month transform expands to year/month; year to year") {
    val m = expandSpec(Seq(SpecField("d_month", "month", "d"))).toOption.get
    assert(m.map(_.name) == Seq("year", "month"))
    val y = expandSpec(Seq(SpecField("d_year", "year", "d"))).toOption.get
    assert(y.map(_.name) == Seq("year"))
  }

  test("bucket/truncate transforms are rejected (iceberg_client.go:469)") {
    assert(expandSpec(Seq(SpecField("k_bucket", "bucket[16]", "k"))).isLeft)
    assert(expandSpec(Seq(SpecField("s_trunc", "truncate[4]", "s"))).isLeft)
  }

  test("day value 20164 normalizes to 2025-03-17, zero-padded (iceberg_client_test.go:44-46)") {
    assert(normalizeDayValue(20164, "day") ==
      Map("year" -> "2025", "month" -> "03", "day" -> "17"))
  }

  test("partitionDate parses mixed zero-padding and rejects incomplete keys (types_iceberg.go:73-123)") {
    assert(partitionDate(Map("year" -> "2025", "month" -> "6", "day" -> "05")) ==
      Some(LocalDate.of(2025, 6, 5)))
    assert(partitionDate(Map("year" -> "2025", "month" -> "06")).isEmpty)
    assert(partitionDate(Map("tenant" -> "acme")).isEmpty)
    assert(partitionDate(Map("year" -> "2025", "month" -> "13", "day" -> "01")).isEmpty)
  }

  test("hidden filter literals: day → y-m-d, month → y-m-01, year → y-01-01 (service_browse_files.go:144-182)") {
    assert(hiddenFilterLiteral("day", "2025", "6", "5") == Right("2025-06-05"))
    assert(hiddenFilterLiteral("month", "2025", "6", "") == Right("2025-06-01"))
    assert(hiddenFilterLiteral("year", "2025", "", "") == Right("2025-01-01"))
    assert(hiddenFilterLiteral("bucket", "2025", "", "").isLeft)
  }

  test("resolveSelections: hidden day selection must be complete, unknown keys error (handler_browse_test.go)") {
    val spec = expandSpec(Seq(SpecField("at_day", "day", "at"))).toOption.get
    assert(resolveSelections(spec, Map("year" -> "2025", "month" -> "03", "day" -> "17")) ==
      Right(Seq("at_day" -> "2025-03-17")))
    assert(resolveSelections(spec, Map("year" -> "2025")).isLeft)
    assert(resolveSelections(spec, Map("bogus" -> "1")).isLeft)
  }

  test("resolveSelections: identity passes through; mixed spec resolves in spec order") {
    val spec = expandSpec(Seq(
      SpecField("tenant", "identity", "tenant"),
      SpecField("at_day", "day", "at"))).toOption.get
    assert(resolveSelections(spec,
      Map("tenant" -> "acme", "year" -> "2025", "month" -> "3", "day" -> "7")) ==
      Right(Seq("tenant" -> "acme", "at_day" -> "2025-03-07")))
    assert(resolveSelections(spec, Map("tenant" -> "acme")) ==
      Right(Seq("tenant" -> "acme")))
  }

  test("canonical partition string: sorted, null-rendered, unpartitioned (types_iceberg.go:62-71)") {
    assert(canonicalString(Map.empty) == "unpartitioned")
    assert(canonicalString(Map("b" -> "2", "a" -> "1")) == "{a=1, b=2}")
    assert(canonicalString(Map("k" -> null)) == "{k=null}")
  }

  test("F9 browse map renders in selection order (handler_browse_test.go:89-98)") {
    // The reference's exact case: businessUnitId sorts before
    // createdAt_day alphabetically, but createdAt_day was selected first.
    assert(renderOrdered(
      Map("businessUnitId" -> "2", "createdAt_day" -> "2024-12-24"),
      Seq("createdAt_day", "businessUnitId")) ==
      "{createdAt_day=2024-12-24, businessUnitId=2}")
    // Unselected keys trail alphabetically after the selected prefix.
    assert(renderOrdered(
      Map("day" -> "07", "month" -> "03", "year" -> "2025"),
      Seq("year")) == "{year=2025, day=07, month=03}")
    // Selected names absent from the values are skipped, not rendered.
    assert(renderOrdered(Map("a" -> "1"), Seq("zzz", "a")) == "{a=1}")
    assert(renderOrdered(Map("k" -> null), Seq.empty) == "{k=null}")
  }

  test("F9 browse tuple labels positional values (handler_browse_test.go:81-87)") {
    assert(renderTuple(Seq("2024-12-24", "2"), Seq("createdAt_day", "businessUnitId")) ==
      "{createdAt_day=2024-12-24, businessUnitId=2}")
    // Missing / blank field names fall back to field_<i> (go:283-286).
    assert(renderTuple(Seq("x", "y", "z"), Seq("a", "")) ==
      "{a=x, field_1=y, field_2=z}")
    assert(renderTuple(Seq(null), Seq("k")) == "{k=null}")
  }

  test("parseDateTime: date-only → UTC midnight, RFC3339, null (datetime_test.go:12-45)") {
    assert(parseDateTime("2026-01-01") ==
      Right(Some(java.time.Instant.parse("2026-01-01T00:00:00Z"))))
    assert(parseDateTime("2026-01-01T12:34:56Z") ==
      Right(Some(java.time.Instant.parse("2026-01-01T12:34:56Z"))))
    assert(parseDateTime("2026-01-01T12:34:56+02:00") ==
      Right(Some(java.time.Instant.parse("2026-01-01T10:34:56Z"))))
    assert(parseDateTime(null) == Right(None))
    assert(parseDateTime("") == Right(None))
    assert(parseDateTime("null") == Right(None))
    assert(parseDateTime("not-a-date").isLeft)
  }
}
