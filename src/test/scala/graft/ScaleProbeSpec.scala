package graft

import org.apache.spark.sql.execution.SimpleMode

/** Plan hygiene at the 10× probe scale. `tools/gen_scale_probe.py`
  * builds a key-space-dense 10× replica of sf0.1 (see the script's
  * docstring for the perturbation scheme); this spec compiles the
  * slowest-15 probe queries against it and asserts none of their plans
  * degrade to a nested-loop/cartesian shape at the larger SF — the
  * failure mode a size-estimate flip could cause (a broadcast side
  * outgrowing the threshold must fall back to a HASHED join, never a
  * BroadcastNestedLoopJoin). Gated: canceled unless the probe dir
  * exists (CI has no sf1 dir; the scale-probe procedure in SCALE.md
  * regenerates it in one command).
  *
  * Runtime ratios (the other half of the probe) are measured by the
  * bench in SPARK_GRAFT_ONLY mode and recorded in SCALE.md — a spec
  * asserting wall-clock ratios would be noise-flaky, but plan shape is
  * deterministic.
  */
class ScaleProbeSpec extends SparkSpec {

  private val probeDir =
    sys.env.getOrElse("SPARK_GRAFT_SF1_DIR", "/tmp/graft_sf1")

  private val probeQueries = Seq(
    "q89_co_occurrence", "q120_sole_late_supplier", "q142_rewrite_advisory",
    "q104_familiarity", "q121_span_pairs", "q138_supplier_breadth",
    "q109_visual_clusters", "q108_frame_neardup", "q24_embedding_neardup",
    "q133_dedup_yield", "q78_fuzzy_names", "q83_similar_topk",
    "q21_ngram_jaccard", "q135_fingerprint_pairs", "q148_semantic_dedup",
  )

  test("10x probe: no heavy query degrades to a nested-loop or cartesian plan") {
    assume(new java.io.File(s"$probeDir/lineitem.parquet").exists(),
      s"probe dir $probeDir absent — run tools/gen_scale_probe.py")
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.joins.{BroadcastNestedLoopJoinExec, CartesianProductExec}
    import org.apache.spark.sql.execution.aggregate.BaseAggregateExec
    import org.apache.spark.sql.catalyst.optimizer.{BuildLeft, BuildRight}
    // A BNLJ whose BUILD side is a scalar (ungrouped aggregate, one
    // row) is the legitimate broadcast-totals pattern (q104/q150 join
    // a 1-row grand-total frame) — only a data-sized build side is a
    // degradation.
    def scalarBuild(p: SparkPlan): Boolean = p.collectFirst {
      case a: BaseAggregateExec if a.groupingExpressions.isEmpty => a
    }.isDefined
    probeQueries.foreach { name =>
      graft.util.PlanCache.clearAll()
      spark.sharedState.cacheManager.clearCache()
      val qe = SparkEntry.queries(name)(spark, probeDir).queryExecution
      val offenders = qe.sparkPlan.collect {
        case j: CartesianProductExec => j.nodeName
        case j: BroadcastNestedLoopJoinExec if !scalarBuild(j.buildSide match {
          case BuildRight => j.right
          case BuildLeft => j.left
        }) => j.nodeName
      }
      assert(offenders.isEmpty,
        s"$name degraded at 10x ($offenders):\n" +
          qe.explainString(SimpleMode).take(2000))
    }
  }
}
