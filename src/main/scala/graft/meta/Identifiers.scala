package graft.meta

/** Identifier resolution, SQL quoting and name sanitation — the
  * reference's pure string helpers (SURVEY.md §2.8 F8/F10, §2.1 S3).
  */
object Identifiers {

  /** Resolve (database, logicalName) → identifier parts: a dotted
    * logical name overrides the database entirely; empty database falls
    * back to the default (reference iceberg_client.go:99-110). */
  def resolveTableIdentifier(database: String, logicalName: String,
      defaultDatabase: String): Seq[String] =
    if (logicalName.contains(".")) logicalName.split("\\.").toSeq
    else Seq(if (database.isEmpty) defaultDatabase else database, logicalName)

  /** `"ident"` with internal quote doubling (sql_helpers.go:5-7). */
  def quoteIdent(ident: String): String =
    "\"" + ident.replace("\"", "\"\"") + "\""

  /** `'literal'` with internal quote doubling (sql_helpers.go:9-11). */
  def quoteLiteral(literal: String): String =
    "'" + literal.replace("'", "''") + "'"

  def qualifiedTableName(catalog: String, schema: String, table: String): String =
    s"${quoteIdent(catalog)}.${quoteIdent(schema)}.${quoteIdent(table)}"

  /** Valid backtick-free column path: `[A-Za-z_][A-Za-z0-9_]*`
    * segments (reference maintenance.py:23-24 — rejects injection into
    * backtick-quoted Spark SQL). */
  private val pathSegment = "[A-Za-z_][A-Za-z0-9_]*".r

  def isValidColumnPath(path: String): Boolean =
    path.nonEmpty && path.split("\\.", -1).forall(s => pathSegment.matches(s))

  val K8sNameMaxLength = 63
  val DefaultAppName = "maintenance"

  /** RFC-1123-ish name sanitation: lowercase, non-alphanumeric runs →
    * one dash, trim dashes, ≤63 chars, non-empty fallback
    * (spark_application_template.go:424-459). */
  def sanitizeK8sName(name: String): String = {
    val b = new StringBuilder
    var lastDash = false
    // Locale.ROOT: a Turkish default locale maps 'I' to dotless ı,
    // which fails the a-z check and silently changes the app name
    // between differently-configured hosts.
    name.toLowerCase(java.util.Locale.ROOT).foreach { c =>
      if ((c >= 'a' && c <= 'z') || (c >= '0' && c <= '9')) {
        b.append(c); lastDash = false
      } else if (!lastDash) {
        b.append('-'); lastDash = true
      }
    }
    var result = b.result().stripPrefix("-").stripSuffix("-")
    if (result.isEmpty) return DefaultAppName
    if (result.length > K8sNameMaxLength)
      result = result.substring(0, K8sNameMaxLength)
        .stripPrefix("-").stripSuffix("-")
    if (result.isEmpty) DefaultAppName else result
  }

  /** prefix-table-taskid app name, table part squeezed to fit 63 chars
    * (service_maintenance_executor_spark.go:516-534). */
  def buildAppName(prefix: String, table: String, taskId: Long): String = {
    val tablePart0 = sanitizeK8sName(table)
    val suffix = taskId.toString
    // the prefix must obey RFC-1123 too, and an oversized prefix must
    // shrink — "<60-char-prefix>-<id>" would exceed the 63-char limit
    // and be rejected by the K8s API at submit time.
    val prefix0 = sanitizeK8sName(prefix)
    val prefixMax = K8sNameMaxLength - suffix.length - 1
    val prefixFit =
      if (prefix0.length > prefixMax)
        prefix0.substring(0, math.max(prefixMax, 1)).stripSuffix("-")
      else prefix0
    val maxTableLength = K8sNameMaxLength - prefixFit.length - suffix.length - 2
    if (maxTableLength <= 0) return s"$prefixFit-$suffix"
    val tablePart =
      if (tablePart0.length > maxTableLength)
        tablePart0.substring(0, maxTableLength).stripPrefix("-").stripSuffix("-")
      else tablePart0
    if (tablePart.isEmpty || tablePart == DefaultAppName) s"$prefixFit-$suffix"
    else s"$prefixFit-$tablePart-$suffix"
  }
}
