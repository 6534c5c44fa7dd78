package graft.operators

import java.time.{LocalDate, LocalDateTime, OffsetDateTime, ZoneOffset}
import java.time.format.DateTimeFormatter

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.meta.IcebergRuntime

/** Live Iceberg stored-procedure forwarding for M1–M4.
  *
  * The reference executes maintenance through Iceberg's `CALL
  * <catalog>.system.*` procedures from a Spark job (reference
  * backend/build/spark/maintenance.py:153-215); this repo's native
  * implementations ([[Maintenance]]) reproduce the semantics so they
  * are testable without an Iceberg runtime. This object is the other
  * half of the [[IcebergRuntime]] seam: it builds the SAME CALL
  * statements — argument names, defaults, quoting, validation — and
  * runs them via `spark.sql` when the runtime jar is present.
  *
  * Statement construction is deliberately a PURE function of its
  * parameters (the reference reads env vars; we take them as
  * arguments) so IcebergCallsSpec can string-assert the generated SQL
  * against the reference's expected output (the
  * handler_browse_test.go:69-79 assertion style) with no runtime
  * present. Execution is gated on [[IcebergRuntime.available]] and
  * always falls back to the native operators — which remain the
  * tested default in this environment, where no Iceberg jar ships.
  */
object IcebergCalls {

  /** `sql_literal` (maintenance.py:23-24): single-quote, double any
    * embedded quote. */
  private[operators] def sqlLiteral(v: String): String =
    "'" + v.replace("'", "''") + "'"

  /** `quote_identifier_path` (maintenance.py:98-108): dot-separated
    * identifier path, each part backtick-quoted. */
  private[operators] def quoteIdentifierPath(column: String): String = {
    val parts = column.split("\\.", -1)
    val ident = "[A-Za-z_][A-Za-z0-9_]*".r
    require(parts.nonEmpty && parts.forall(p => ident.matches(p)),
      s"where column must be a dot-separated identifier path, got: $column")
    parts.map(p => s"`$p`").mkString(".")
  }

  /** `build_where_clause` (maintenance.py:111-134): `[from, until)`
    * half-open day range on a (possibly nested) timestamp column, both
    * bounds validated as YYYY-MM-DD with from < until. */
  private[operators] def whereClause(column: String, from: String,
      until: String): String = {
    val day = "\\d{4}-\\d{2}-\\d{2}".r
    require(day.matches(from), s"where-from must be YYYY-MM-DD, got: $from")
    require(day.matches(until), s"where-until must be YYYY-MM-DD, got: $until")
    val (s, e) = (LocalDate.parse(from), LocalDate.parse(until))
    require(s.isBefore(e), s"where-from must be earlier than where-until (got $from and $until)")
    s"""${quoteIdentifierPath(column)} >= "$from 00:00:00" AND ${quoteIdentifierPath(column)} < "$until 00:00:00""""
  }

  /** `older_than_timestamp` (maintenance.py:137-152): RFC3339 in,
    * UTC `yyyy-MM-dd HH:mm:ss.SSS` out (micros truncated to millis);
    * a zone-less timestamp is taken as UTC. */
  private[operators] def olderThanTimestamp(rfc3339: String): String = {
    val utc =
      try OffsetDateTime.parse(rfc3339.replace("Z", "+00:00"))
        .atZoneSameInstant(ZoneOffset.UTC).toLocalDateTime
      catch { case _: java.time.format.DateTimeParseException =>
        try LocalDateTime.parse(rfc3339)
        catch { case _: java.time.format.DateTimeParseException =>
          throw new IllegalArgumentException(s"older-than must be RFC3339, got: $rfc3339")
        }
      }
    utc.format(DateTimeFormatter.ofPattern("yyyy-MM-dd HH:mm:ss.SSS"))
  }

  /** M1 — `build_rewrite_data_files_query` (maintenance.py:153-180):
    * binpack strategy with the reference's option map and defaults. */
  def rewriteDataFiles(table: String, whereColumn: String, whereFrom: String,
      whereUntil: String, catalog: String = "lakehouse",
      database: String = "main", targetFileSizeBytes: Long = 536870912L,
      maxConcurrentFileGroupRewrites: Int = 5, minInputFiles: Int = 2,
      partialProgressEnabled: Boolean = true,
      partialProgressMaxCommits: Int = 10): String = {
    val where = whereClause(whereColumn, whereFrom, whereUntil)
    s"""CALL $catalog.system.rewrite_data_files(
       |  table => ${sqlLiteral(s"$database.$table")},
       |  where => ${sqlLiteral(where)},
       |  strategy => 'binpack',
       |  options => map(
       |    'target-file-size-bytes', ${sqlLiteral(targetFileSizeBytes.toString)},
       |    'max-concurrent-file-group-rewrites', ${sqlLiteral(maxConcurrentFileGroupRewrites.toString)},
       |    'min-input-files', ${sqlLiteral(minInputFiles.toString)},
       |    'partial-progress.enabled', ${sqlLiteral(partialProgressEnabled.toString)},
       |    'partial-progress.max-commits', ${sqlLiteral(partialProgressMaxCommits.toString)}
       |  )
       |)""".stripMargin
  }

  /** M2 — `build_expire_snapshots_query` (maintenance.py:183-201). */
  def expireSnapshots(table: String, olderThanRfc3339: String,
      catalog: String = "lakehouse", database: String = "main",
      cleanExpiredMetadata: Boolean = true): String =
    s"""CALL $catalog.system.expire_snapshots(
       |  table => ${sqlLiteral(s"$database.$table")},
       |  older_than => TIMESTAMP ${sqlLiteral(olderThanTimestamp(olderThanRfc3339))},
       |  clean_expired_metadata => $cleanExpiredMetadata
       |)""".stripMargin

  /** M3 — `build_remove_orphan_files_query` (maintenance.py:204-219). */
  def removeOrphanFiles(table: String, olderThanRfc3339: String,
      catalog: String = "lakehouse", database: String = "main"): String =
    s"""CALL $catalog.system.remove_orphan_files(
       |  table => ${sqlLiteral(s"$database.$table")},
       |  older_than => TIMESTAMP ${sqlLiteral(olderThanTimestamp(olderThanRfc3339))}
       |)""".stripMargin

  /** M4 — rollback is not one of maintenance.py's batch procedures (the
    * reference rolls back through its Go catalog client,
    * iceberg_client.go area); the live-runtime equivalent is Iceberg's
    * own rollback procedure, same CALL shape. */
  def rollbackToSnapshot(table: String, snapshotId: Long,
      catalog: String = "lakehouse", database: String = "main"): String =
    s"""CALL $catalog.system.rollback_to_snapshot(
       |  table => ${sqlLiteral(s"$database.$table")},
       |  snapshot_id => $snapshotId
       |)""".stripMargin

  /** Run a built CALL against the live runtime. Left(reason) — and no
    * side effects — when the Iceberg jar is absent, which is how every
    * caller falls back to the native [[Maintenance]] path. */
  def run(spark: SparkSession, callSql: String): Either[String, DataFrame] =
    if (!IcebergRuntime.available)
      Left("iceberg-spark-runtime not on classpath; native maintenance in use")
    else
      try Right(spark.sql(callSql))
      catch { case e: Exception => Left(s"iceberg CALL failed: ${e.getMessage}") }
}
