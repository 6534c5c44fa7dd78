package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The fused pii_scrub expression (r17 optimization) must be
  * bit-identical to the staged column chain it replaced: same redacted
  * text, same per-pattern STAGED counts (pattern i counted on the text
  * with patterns 1..i-1 already replaced), same null behavior. */
class PiiScrubSpec extends SparkSpec {

  private val tricky = Seq(
    "plain clean text with no pii at all",
    "mail me at a.user+tag@sub.example.org please",
    "ssn 123-45-6789 then ip 10.20.30.40 then +1 (555) 123-4567",
    "two mails a@b.co c@d.org and two ips 1.2.3.4 5.6.7.8",
    "overlap trap 123-45-6789 123-45-6789",
    "digits 12345678901234567890 look phone-like",
    "", // empty string
    "edge@case.co", // match spans the whole string
    "10.0.0.1", // ip is the whole string
    "a@b.cc ssn 000-00-0000 10.1.1.1 +44 1234 567890 end")

  test("fused struct equals the staged column chain on adversarial text") {
    import spark.implicits._
    graft.functions.PiiScrub.register(spark)
    val df = (tricky.zipWithIndex.map { case (t, i) => (i.toLong, t) } :+
      ((999L, null.asInstanceOf[String]))).toDF("id", "t")
    val staged = Redact.matchCounts($"t").foldLeft(df) {
      case (acc, (name, c)) => acc.withColumn(s"s_$name", c)
    }.withColumn("s_redacted", Redact.scrub($"t"))
    val fused = staged
      .withColumn("__pii", call_function(graft.functions.PiiScrub.name, $"t"))
    val rows = fused.select($"id", $"t",
      $"s_redacted", $"__pii.redacted",
      $"s_email", $"__pii.n_email", $"s_id", $"__pii.n_id",
      $"s_ipv4", $"__pii.n_ipv4", $"s_phone", $"__pii.n_phone").collect()
    assert(rows.length == tricky.length + 1)
    rows.foreach { r =>
      assert(r.get(2) == r.get(3), s"redacted mismatch on '${r.get(1)}'")
      Seq((4, 5, "email"), (6, 7, "id"), (8, 9, "ipv4"), (10, 11, "phone"))
        .foreach { case (a, b, n) =>
          assert(r.get(a) == r.get(b), s"n_$n mismatch on '${r.get(1)}'")
        }
    }
  }

  test("q65 plan evaluates the scrub once: no regex in the Filter node") {
    val plan = Redact.q65PiiRedact(spark, "/root/testdata/sf0.001")
      .queryExecution.executedPlan.toString
    // the filter must reference the projected struct, not a pushed-down
    // copy of the regex cascade
    val filterLines = plan.linesIterator.filter(_.contains("Filter")).mkString("\n")
    assert(!filterLines.contains("regexp_replace"), filterLines)
  }
}
