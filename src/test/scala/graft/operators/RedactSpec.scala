package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** PII redaction: each pattern hits its shape, ordering protects
  * earlier tokens from the greedy phone pattern, clean text is
  * untouched. */
class RedactSpec extends SparkSpec {

  private def scrubOne(s: String): String = {
    import spark.implicits._
    Seq(s).toDF("t").select(Redact.scrub($"t").as("r")).collect().head.getString(0)
  }

  test("each pattern redacts its shape") {
    assert(scrubOne("mail me at a.user+tag@sub.example.org please") ==
      "mail me at <EMAIL> please")
    assert(scrubOne("host 192.168.0.1 down") == "host <IP> down")
    assert(scrubOne("ssn 123-45-6789 leaked") == "ssn <ID> leaked")
    assert(scrubOne("call +1 (555) 123-4567 now") == "call <PHONE> now")
    assert(scrubOne("dial 020 7946 0958 today") == "dial <PHONE> today")
  }

  test("application order: ids and ips are not eaten by the phone pattern") {
    assert(scrubOne("id 123-45-6789 then ip 10.20.30.40") ==
      "id <ID> then ip <IP>")
  }

  test("multiple occurrences all redact; clean text passes through") {
    assert(scrubOne("a@b.co and c@d.org") == "<EMAIL> and <EMAIL>")
    val clean = "key agg row scan slow fast table value"
    assert(scrubOne(clean) == clean)
  }

  test("match counts are staged: each pattern counts only its own replacements") {
    import spark.implicits._
    val df = Seq("a@b.co x 1.2.3.4 y 123-45-6789").toDF("t")
    val row = Redact.matchCounts($"t").foldLeft(df) {
      case (d, (n, c)) => d.withColumn(n, c)
    }.collect().head
    assert(row.getAs[Int]("email") == 1)
    assert(row.getAs[Int]("ipv4") == 1)
    assert(row.getAs[Int]("id") == 1)
    // the greedy phone pattern would match the raw id/ip shapes, but
    // staged counting sees them already tokenized
    assert(row.getAs[Int]("phone") == 0)
  }

  test("q65 finds every planted row and no clean rows (sf0.001)") {
    import spark.implicits._
    val out = Redact.q65PiiRedact(spark, sfDir).collect()
    val nDocs = graft.sources.Tables.documents(spark, sfDir).count()
    val expected = (0L until nDocs).count(id =>
      id % 7 == 0 || id % 11 == 0 || id % 13 == 0 || id % 17 == 0)
    assert(out.length == expected)
    out.foreach { r =>
      val red = r.getAs[String]("redacted")
      assert(!red.contains("@example.com") && !red.contains(" ssn 0"))
    }
  }

  test("pii risk rollup: totals reconcile with the per-doc report") {
    import spark.implicits._
    val risk = Redact.q118PiiRisk(spark, sfDir).collect()
      .map(r => r.getAs[String]("source") -> r).toMap
    val perDoc = Redact.q65PiiRedact(spark, sfDir).collect()
    // per-source docs_with_pii must equal the q65 row count by source
    val bySource = perDoc.groupBy(_.getAs[String]("source"))
      .view.mapValues(_.length.toLong).toMap
    bySource.foreach { case (s, n) =>
      assert(risk(s).getAs[Long]("docs_with_pii") == n, s)
    }
    // shares are ratios in (0, 1]; every source is present
    val nSources = graft.sources.Tables.documents(spark, sfDir)
      .select($"source").distinct().count()
    assert(risk.size.toLong == nSources)
    risk.values.foreach { r =>
      val share = r.getAs[Double]("pii_share")
      assert(share >= 0.0 && share <= 1.0)
      assert(r.getAs[Long]("docs_with_pii") <= r.getAs[Long]("n_docs"))
    }
  }
}
