package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** PII redaction — the scrubbing pass a training-data pipeline runs
  * before shipping a corpus (emails, IPs, phone numbers, national-id
  * shapes → placeholder tokens).
  *
  * Patterns are deliberately written in the common subset of Java regex
  * (Spark, codegen'd `regexp_replace`) and RE2 (DuckDB, Go, Rust
  * engines): no lookaround, no backreferences — so the exact same
  * redaction is reproducible across engines, and the oracle can
  * hash-match the scrubbed text. Application order matters and is part
  * of the contract: EMAIL → ID → IPV4 → PHONE, most-specific first, so
  * the greedy phone pattern can't eat an id/ip that an earlier pass
  * already tokenized.
  *
  * Scale shape: a chain of `regexp_replace` Columns — scan-side,
  * whole-stage codegen, no shuffle, no UDF.
  */
object Redact {

  /** (name, pattern, replacement) in application order — source of
    * truth moved to [[graft.functions.PiiScrub]] (r17: the fused
    * codegen expression and the column chain must share one list). */
  val patterns: Seq[(String, String, String)] = graft.functions.PiiScrub.patterns

  /** All patterns applied in order. */
  def scrub(c: Column): Column =
    patterns.foldLeft(c) { case (acc, (_, re, tok)) => regexp_replace(acc, re, tok) }

  /** Per-pattern match counts, STAGED like the scrub itself: pattern i
    * is counted on the text with patterns 1..i-1 already replaced, so
    * each count is exactly the number of replacements that pattern's
    * pass performs — the greedy phone pattern doesn't also count the
    * id/ip shapes an earlier pass tokenizes. */
  def matchCounts(c: Column): Seq[(String, Column)] = {
    val (counts, _) = patterns.foldLeft((Seq.empty[(String, Column)], c)) {
      case ((acc, stage), (name, re, tok)) =>
        (acc :+ (name -> regexp_count(stage, lit(re))),
          regexp_replace(stage, re, tok))
    }
    counts
  }

  /** q65: redact a corpus with deterministically planted PII — the
    * corpus itself is synthetic word soup, so realistic PII is injected
    * from doc_id arithmetic (identically derivable by the oracle), then
    * scrubbed; rows that contained any PII come back with the scrubbed
    * text and per-pattern counts. Hash-matching the scrubbed text
    * proves replacement parity, not just count parity. */
  def q65PiiRedact(spark: SparkSession, d: String): DataFrame = {
    import spark.implicits._
    val planted = Tables.documents(spark, d)
      .withColumn("pii_text", concat(
        $"text",
        when($"doc_id" % 7 === 0,
          concat(lit(" contact user"), $"doc_id".cast("string"), lit("@example.com")))
          .otherwise(lit("")),
        when($"doc_id" % 11 === 0,
          concat(lit(" from 10."), ($"doc_id" % 200).cast("string"), lit(".0."),
            ($"doc_id" % 250).cast("string")))
          .otherwise(lit("")),
        when($"doc_id" % 13 === 0,
          concat(lit(" ssn "), lpad(($"doc_id" % 1000).cast("string"), 3, "0"),
            lit("-"), lpad(($"doc_id" % 100).cast("string"), 2, "0"), lit("-"),
            lpad(($"doc_id" % 10000).cast("string"), 4, "0")))
          .otherwise(lit("")),
        when($"doc_id" % 17 === 0,
          concat(lit(" call +1 (555) 0"), $"doc_id".cast("string")))
          .otherwise(lit(""))))
    // Optimization r17: one fused scrub+count expression per row — see
    // PiiScrubExpr. The previous staged column chain was copied whole
    // into the pushed-down filter, so every row paid the regex cascade
    // twice (plans/r17/q65_pii_redact_before.txt: the chain appears in
    // Filter (2) AND Project (4)).
    graft.functions.PiiScrub.register(spark)
    planted
      .withColumn("__pii", call_function(graft.functions.PiiScrub.name, $"pii_text"))
      .where($"__pii.n_email" + $"__pii.n_id" + $"__pii.n_ipv4" + $"__pii.n_phone" > 0)
      .select($"doc_id", $"source", $"__pii.redacted".as("redacted"),
        $"__pii.n_email".as("n_email"), $"__pii.n_id".as("n_id"),
        $"__pii.n_ipv4".as("n_ipv4"), $"__pii.n_phone".as("n_phone"))
      .orderBy($"doc_id")
  }

  val q65Sql: String = {
    val Seq(email, id, ip, phone) = patterns.map(_._2)
    // DuckDB regexp_replace needs the 'g' flag for replace-all (Spark
    // replaces all by default); patterns are the portable subset so the
    // semantics line up.
    s"""WITH planted AS (
       |  SELECT doc_id, source, text ||
       |    CASE WHEN doc_id % 7 = 0
       |         THEN ' contact user' || CAST(doc_id AS VARCHAR) || '@example.com'
       |         ELSE '' END ||
       |    CASE WHEN doc_id % 11 = 0
       |         THEN ' from 10.' || CAST(doc_id % 200 AS VARCHAR) || '.0.' ||
       |              CAST(doc_id % 250 AS VARCHAR)
       |         ELSE '' END ||
       |    CASE WHEN doc_id % 13 = 0
       |         THEN ' ssn ' || lpad(CAST(doc_id % 1000 AS VARCHAR), 3, '0') || '-' ||
       |              lpad(CAST(doc_id % 100 AS VARCHAR), 2, '0') || '-' ||
       |              lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
       |         ELSE '' END ||
       |    CASE WHEN doc_id % 17 = 0
       |         THEN ' call +1 (555) 0' || CAST(doc_id AS VARCHAR)
       |         ELSE '' END AS pii_text
       |  FROM documents
       |), staged AS (
       |  -- counts are staged exactly like the scrub: pattern i counted
       |  -- with patterns 1..i-1 already replaced
       |  SELECT doc_id, source,
       |         len(regexp_extract_all(pii_text, '$email')) AS n_email,
       |         regexp_replace(pii_text, '$email', '<EMAIL>', 'g') AS r1
       |  FROM planted
       |), s2 AS (
       |  SELECT doc_id, source, n_email,
       |         len(regexp_extract_all(r1, '$id')) AS n_id,
       |         regexp_replace(r1, '$id', '<ID>', 'g') AS r2
       |  FROM staged
       |), s3 AS (
       |  SELECT doc_id, source, n_email, n_id,
       |         len(regexp_extract_all(r2, '$ip')) AS n_ipv4,
       |         regexp_replace(r2, '$ip', '<IP>', 'g') AS r3
       |  FROM s2
       |)
       |SELECT doc_id, source,
       |       regexp_replace(r3, '$phone', '<PHONE>', 'g') AS redacted,
       |       n_email, n_id, n_ipv4,
       |       len(regexp_extract_all(r3, '$phone')) AS n_phone
       |FROM s3
       |WHERE n_email + n_id + n_ipv4 +
       |      len(regexp_extract_all(r3, '$phone')) > 0
       |ORDER BY doc_id""".stripMargin
  }

  /** Per-source PII incidence rollup — the governance dashboard over
    * [[q65PiiRedact]]'s per-document counts: how much PII each source
    * ships, of what class, and what fraction of its documents carry
    * any. The scrub chain stays scan-side; this adds one low-
    * cardinality groupBy on the source. A release gate reads this, not
    * 500 per-doc rows. */
  def piiRiskBySource(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    // r17: same fused single-pass counting as q65 (no redacted text
    // needed here, but the counts ARE the staged counts by contract).
    graft.functions.PiiScrub.register(spark)
    val counted = docs
      .withColumn("__pii", call_function(graft.functions.PiiScrub.name, $"text"))
      .select($"source",
        $"__pii.n_email".as("n_email"), $"__pii.n_id".as("n_id"),
        $"__pii.n_ipv4".as("n_ipv4"), $"__pii.n_phone".as("n_phone"))
    counted
      .withColumn("has_pii",
        when($"n_email" + $"n_id" + $"n_ipv4" + $"n_phone" > 0, 1L).otherwise(0L))
      .groupBy($"source")
      .agg(count(lit(1)).as("n_docs"),
        sum($"has_pii").as("docs_with_pii"),
        sum($"n_email").as("n_email"), sum($"n_id").as("n_id"),
        sum($"n_ipv4").as("n_ipv4"), sum($"n_phone").as("n_phone"))
      .withColumn("pii_share", $"docs_with_pii" / $"n_docs")
      .orderBy($"source")
  }

  /** q118: incidence over the q65 planted corpus (the raw corpus is
    * PII-free word soup, so the planted text is what a governance scan
    * would actually see). */
  def q118PiiRisk(spark: SparkSession, d: String): DataFrame = {
    import spark.implicits._
    val planted = Tables.documents(spark, d)
      .withColumn("text", concat(
        $"text",
        when($"doc_id" % 7 === 0,
          concat(lit(" contact user"), $"doc_id".cast("string"), lit("@example.com")))
          .otherwise(lit("")),
        when($"doc_id" % 11 === 0,
          concat(lit(" from 10."), ($"doc_id" % 200).cast("string"), lit(".0."),
            ($"doc_id" % 250).cast("string")))
          .otherwise(lit("")),
        when($"doc_id" % 13 === 0,
          concat(lit(" ssn "), lpad(($"doc_id" % 1000).cast("string"), 3, "0"),
            lit("-"), lpad(($"doc_id" % 100).cast("string"), 2, "0"), lit("-"),
            lpad(($"doc_id" % 10000).cast("string"), 4, "0")))
          .otherwise(lit("")),
        when($"doc_id" % 17 === 0,
          concat(lit(" call +1 (555) 0"), $"doc_id".cast("string")))
          .otherwise(lit(""))))
    piiRiskBySource(planted)
  }

  val q118Sql: String = {
    val Seq(email, id, ip, phone) = patterns.map(_._2)
    s"""WITH planted AS (
       |  SELECT doc_id, source, text ||
       |    CASE WHEN doc_id % 7 = 0
       |         THEN ' contact user' || CAST(doc_id AS VARCHAR) || '@example.com'
       |         ELSE '' END ||
       |    CASE WHEN doc_id % 11 = 0
       |         THEN ' from 10.' || CAST(doc_id % 200 AS VARCHAR) || '.0.' ||
       |              CAST(doc_id % 250 AS VARCHAR)
       |         ELSE '' END ||
       |    CASE WHEN doc_id % 13 = 0
       |         THEN ' ssn ' || lpad(CAST(doc_id % 1000 AS VARCHAR), 3, '0') || '-' ||
       |              lpad(CAST(doc_id % 100 AS VARCHAR), 2, '0') || '-' ||
       |              lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
       |         ELSE '' END ||
       |    CASE WHEN doc_id % 17 = 0
       |         THEN ' call +1 (555) 0' || CAST(doc_id AS VARCHAR)
       |         ELSE '' END AS pii_text
       |  FROM documents
       |), staged AS (
       |  SELECT doc_id, source,
       |         len(regexp_extract_all(pii_text, '$email')) AS n_email,
       |         regexp_replace(pii_text, '$email', '<EMAIL>', 'g') AS r1
       |  FROM planted
       |), s2 AS (
       |  SELECT doc_id, source, n_email,
       |         len(regexp_extract_all(r1, '$id')) AS n_id,
       |         regexp_replace(r1, '$id', '<ID>', 'g') AS r2
       |  FROM staged
       |), s3 AS (
       |  SELECT doc_id, source, n_email, n_id,
       |         len(regexp_extract_all(r2, '$ip')) AS n_ipv4,
       |         regexp_replace(r2, '$ip', '<IP>', 'g') AS r3
       |  FROM s2
       |), perdoc AS (
       |  SELECT doc_id, source, n_email, n_id, n_ipv4,
       |         len(regexp_extract_all(r3, '$phone')) AS n_phone
       |  FROM s3
       |)
       |SELECT source, count(*) AS n_docs,
       |       CAST(sum(CASE WHEN n_email + n_id + n_ipv4 + n_phone > 0
       |                     THEN 1 ELSE 0 END) AS BIGINT) AS docs_with_pii,
       |       CAST(sum(n_email) AS BIGINT) AS n_email,
       |       CAST(sum(n_id) AS BIGINT) AS n_id,
       |       CAST(sum(n_ipv4) AS BIGINT) AS n_ipv4,
       |       CAST(sum(n_phone) AS BIGINT) AS n_phone,
       |       CAST(sum(CASE WHEN n_email + n_id + n_ipv4 + n_phone > 0
       |                     THEN 1 ELSE 0 END) AS DOUBLE) / count(*) AS pii_share
       |FROM perdoc GROUP BY 1 ORDER BY source""".stripMargin
  }

  /** q131: K-ANONYMITY audit over quasi-identifiers — the metadata-
    * release side of governance (q65/q118 scan CONTENT; this scans the
    * ATTRIBUTE COMBINATIONS a published per-document metadata table
    * would expose). A document whose (lang, source, length-band) cell
    * holds fewer than k members is re-identifiable from those
    * attributes alone (Sweeney, "k-anonymity: a model for protecting
    * privacy"); the audit lists the under-k cells a release would have
    * to suppress or generalize.
    *
    * Scale: one partial-agg count at bounded cell cardinality
    * (langs × sources × bands), then a cell-level filter — corpus-sized
    * scan, control-plane-sized everything else. Pure integer output. */
  def kAnonymityAudit(docs: DataFrame, k: Long = 5,
      bandChars: Long = 512): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs
      .groupBy($"lang", $"source", ($"n_chars" / bandChars).cast("long").as("band"))
      .agg(count(lit(1)).as("n_docs"))
      .where($"n_docs" < k)
      .orderBy($"lang", $"source", $"band")
  }

  def q131KanonRisk(spark: SparkSession, d: String): DataFrame =
    kAnonymityAudit(Tables.documents(spark, d))

  val q131Sql: String =
    """SELECT lang, source, n_chars // 512 AS band, count(*) AS n_docs
      |FROM documents
      |GROUP BY 1, 2, 3 HAVING count(*) < 5
      |ORDER BY lang, source, band""".stripMargin
}
