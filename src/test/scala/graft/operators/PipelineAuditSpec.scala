package graft.operators

import graft.SparkSpec

/** Fate precedence on a hand corpus: the first dropping stage labels
  * the document, and only exact-surviving docs participate in the
  * near-dup stage. */
class PipelineAuditSpec extends SparkSpec {

  private def docsOf(rows: (Long, String)*) = {
    import spark.implicits._
    rows.map { case (id, t) => (id, t, "en", "web", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
  }

  test("each stage claims its document; precedence is quality > exact > near") {
    graft.util.PlanCache.clearAll()
    // 25+ unique tokens → passes quality (needs 20..1000 tokens)
    val base = (1 to 30).map(i => s"w$i").mkString(" ")
    val nearVariant = (1 to 30).map(i => if (i <= 28) s"w$i" else s"z$i").mkString(" ")
    val fates = PipelineAudit.docFates(docsOf(
      1L -> base,                 // kept (lowest id of the exact group)
      2L -> base,                 // exact_dup of 1
      3L -> nearVariant,          // near_dup: high Jaccard with 1, different key
      4L -> "too short",          // quality
      5L -> (1 to 30).map(i => s"q$i").mkString(" ") // kept, unrelated
    )).collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(fates == Map(1L -> "kept", 2L -> "exact_dup", 3L -> "near_dup",
      4L -> "quality", 5L -> "kept"))
    graft.util.PlanCache.clearAll()
  }

  test("a near-dup of a QUALITY-DROPPED doc is kept: dropped docs don't vote") {
    graft.util.PlanCache.clearAll()
    val long = (1 to 30).map(i => s"t$i").mkString(" ")
    // doc 1 fails quality (stop-heavy: > 30% stopwords)
    val stopHeavy = (1 to 30).map(i => if (i % 2 == 0) "the" else s"t$i").mkString(" ")
    val fates = PipelineAudit.docFates(docsOf(
      1L -> stopHeavy,
      2L -> long
    )).collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(fates(1L) == "quality")
    assert(fates(2L) == "kept") // even if it shared shingles with doc 1
    graft.util.PlanCache.clearAll()
  }
}
