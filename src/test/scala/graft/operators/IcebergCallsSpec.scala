package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** The live-runtime CALL builders must generate EXACTLY the statements
  * the reference's Spark maintenance job builds from its env contract
  * (reference backend/build/spark/maintenance.py:153-219) — asserted as
  * whole strings, the handler_browse_test.go:69-79 style, so the seam
  * is verified even though no Iceberg jar ships in this environment. */
class IcebergCallsSpec extends AnyFunSuite with SparkSpec {

  test("rewrite_data_files matches the reference statement (defaults)") {
    val got = IcebergCalls.rewriteDataFiles(
      table = "events", whereColumn = "createdAt",
      whereFrom = "2026-01-01", whereUntil = "2026-02-01")
    val want =
      """CALL lakehouse.system.rewrite_data_files(
        |  table => 'main.events',
        |  where => '`createdAt` >= "2026-01-01 00:00:00" AND `createdAt` < "2026-02-01 00:00:00"',
        |  strategy => 'binpack',
        |  options => map(
        |    'target-file-size-bytes', '536870912',
        |    'max-concurrent-file-group-rewrites', '5',
        |    'min-input-files', '2',
        |    'partial-progress.enabled', 'true',
        |    'partial-progress.max-commits', '10'
        |  )
        |)""".stripMargin
    assert(got == want)
  }

  test("rewrite_data_files: nested column path, custom sizing, quote escaping") {
    val got = IcebergCalls.rewriteDataFiles(
      table = "o'brien", whereColumn = "meta.created_at",
      whereFrom = "2025-12-31", whereUntil = "2026-01-01",
      catalog = "cat2", database = "db2", targetFileSizeBytes = 128L * 1024 * 1024,
      maxConcurrentFileGroupRewrites = 2, minInputFiles = 5,
      partialProgressEnabled = false, partialProgressMaxCommits = 3)
    // sql_literal doubles embedded quotes (maintenance.py:23-24);
    // identifier paths backtick per part (maintenance.py:98-108)
    assert(got.contains("table => 'db2.o''brien'"))
    assert(got.contains(
      """where => '`meta`.`created_at` >= "2025-12-31 00:00:00" AND `meta`.`created_at` < "2026-01-01 00:00:00"'"""))
    assert(got.contains("'target-file-size-bytes', '134217728'"))
    assert(got.contains("'max-concurrent-file-group-rewrites', '2'"))
    assert(got.contains("'min-input-files', '5'"))
    assert(got.contains("'partial-progress.enabled', 'false'"))
    assert(got.contains("'partial-progress.max-commits', '3'"))
    assert(got.startsWith("CALL cat2.system.rewrite_data_files("))
  }

  test("rewrite_data_files where-clause validation mirrors the reference") {
    // maintenance.py:100-105 identifier path
    assertThrows[IllegalArgumentException](IcebergCalls.rewriteDataFiles(
      "t", "bad-col", "2026-01-01", "2026-01-02"))
    assertThrows[IllegalArgumentException](IcebergCalls.rewriteDataFiles(
      "t", "a..b", "2026-01-01", "2026-01-02"))
    assertThrows[IllegalArgumentException](IcebergCalls.rewriteDataFiles(
      "t", "1col", "2026-01-01", "2026-01-02"))
    // maintenance.py:116-121 date shapes
    assertThrows[IllegalArgumentException](IcebergCalls.rewriteDataFiles(
      "t", "c", "2026-1-01", "2026-02-01"))
    assertThrows[IllegalArgumentException](IcebergCalls.rewriteDataFiles(
      "t", "c", "2026-01-01", "20260201"))
    // maintenance.py:126-130 from must be strictly earlier
    assertThrows[IllegalArgumentException](IcebergCalls.rewriteDataFiles(
      "t", "c", "2026-02-01", "2026-02-01"))
    assertThrows[IllegalArgumentException](IcebergCalls.rewriteDataFiles(
      "t", "c", "2026-02-02", "2026-02-01"))
  }

  test("expire_snapshots matches the reference statement") {
    val got = IcebergCalls.expireSnapshots("events", "2026-08-07T12:34:56.789123Z")
    val want =
      """CALL lakehouse.system.expire_snapshots(
        |  table => 'main.events',
        |  older_than => TIMESTAMP '2026-08-07 12:34:56.789',
        |  clean_expired_metadata => true
        |)""".stripMargin
    assert(got == want)
    assert(IcebergCalls.expireSnapshots("e", "2026-08-07T00:00:00Z",
      cleanExpiredMetadata = false).contains("clean_expired_metadata => false"))
  }

  test("older_than conversion mirrors older_than_timestamp (maintenance.py:137-152)") {
    // offset timestamps normalize to UTC; micros truncate to millis
    assert(IcebergCalls.expireSnapshots("e", "2026-08-07T02:00:00.123456+02:00")
      .contains("TIMESTAMP '2026-08-07 00:00:00.123'"))
    // zone-less is taken as UTC
    assert(IcebergCalls.removeOrphanFiles("e", "2026-08-07T01:02:03")
      .contains("TIMESTAMP '2026-08-07 01:02:03.000'"))
    // non-RFC3339 rejected with the reference's error
    val err = intercept[IllegalArgumentException](
      IcebergCalls.expireSnapshots("e", "last tuesday"))
    assert(err.getMessage.contains("RFC3339"))
  }

  test("remove_orphan_files matches the reference statement") {
    val got = IcebergCalls.removeOrphanFiles("events", "2026-08-07T12:00:00Z",
      catalog = "lh", database = "db")
    val want =
      """CALL lh.system.remove_orphan_files(
        |  table => 'db.events',
        |  older_than => TIMESTAMP '2026-08-07 12:00:00.000'
        |)""".stripMargin
    assert(got == want)
  }

  test("rollback_to_snapshot builds the Iceberg procedure call") {
    val got = IcebergCalls.rollbackToSnapshot("events", 42L)
    val want =
      """CALL lakehouse.system.rollback_to_snapshot(
        |  table => 'main.events',
        |  snapshot_id => 42
        |)""".stripMargin
    assert(got == want)
  }

  test("run() is gated: no Iceberg jar here, so every CALL degrades to Left") {
    assert(!graft.meta.IcebergRuntime.available)
    val r = IcebergCalls.run(spark,
      IcebergCalls.rollbackToSnapshot("events", 1L))
    assert(r.isLeft)
    assert(r.left.exists(_.contains("native maintenance")))
  }
}
