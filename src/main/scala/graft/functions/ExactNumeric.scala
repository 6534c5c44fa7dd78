package graft.functions

import org.apache.spark.sql.Column

/** Cross-engine exact numeric forms. The rule every oracle depends on:
  * cast money doubles to DECIMAL(18,2) per value BEFORE aggregating,
  * so sums are exact and order-independent in both Spark and DuckDB,
  * and cast to double once at output. One definition — a precision
  * drift in a single copy would silently break hash parity everywhere.
  */
object ExactNumeric {
  def money(c: Column): Column = c.cast("decimal(18,2)")
}
