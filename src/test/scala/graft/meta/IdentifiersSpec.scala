package graft.meta

import org.scalatest.funsuite.AnyFunSuite

import Identifiers._

/** Ports of the reference's identifier/quoting/sanitation behavior
  * (iceberg_client.go:99-110, sql_helpers.go,
  * spark_application_template.go:424-459). */
class IdentifiersSpec extends AnyFunSuite {

  test("dotted logical name overrides the database") {
    assert(resolveTableIdentifier("db", "other.tbl", "default") == Seq("other", "tbl"))
    assert(resolveTableIdentifier("db", "a.b.c", "default") == Seq("a", "b", "c"))
  }

  test("empty database falls back to the default") {
    assert(resolveTableIdentifier("", "tbl", "default") == Seq("default", "tbl"))
    assert(resolveTableIdentifier("db", "tbl", "default") == Seq("db", "tbl"))
  }

  test("identifier and literal quoting double embedded quotes") {
    assert(quoteIdent("a\"b") == "\"a\"\"b\"")
    assert(quoteLiteral("it's") == "'it''s'")
    assert(qualifiedTableName("lakehouse", "main", "revenueevent$files") ==
      "\"lakehouse\".\"main\".\"revenueevent$files\"")
  }

  test("column path validation accepts dotted identifiers, rejects injection") {
    assert(isValidColumnPath("goal.conversionHappenedAt"))
    assert(isValidColumnPath("_col1"))
    assert(!isValidColumnPath("col`; drop"))
    assert(!isValidColumnPath("1col"))
    assert(!isValidColumnPath("a..b"))
    assert(!isValidColumnPath(""))
  }

  test("k8s name sanitation: lowercase, dash-collapse, trim, 63-char cap, fallback") {
    assert(sanitizeK8sName("My_Table  Name!") == "my-table-name")
    assert(sanitizeK8sName("---") == DefaultAppName)
    assert(sanitizeK8sName("") == DefaultAppName)
    val long = sanitizeK8sName("a" * 100)
    assert(long.length == 63)
  }

  test("app name assembly squeezes the table part to fit 63 chars") {
    assert(buildAppName("opt", "revenue_event", 42L) == "opt-revenue-event-42")
    val crowded = buildAppName("optimize", "x" * 100, 123456789L)
    assert(crowded.length <= 63)
    assert(crowded.startsWith("optimize-") && crowded.endsWith("-123456789"))
    // No room for the table part at all → prefix-suffix only.
    assert(buildAppName("p" * 60, "table", 1L) == "p" * 60 + "-1")
    // Oversized/unsanitized prefixes shrink too — never over 63 chars.
    val overflow = buildAppName("P" * 70, "table", 12345L)
    assert(overflow.length <= 63, overflow)
    assert(overflow.endsWith("-12345") && overflow.startsWith("ppp"))
  }
}
