package graft.util

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.sources.Tables

/** The host-drift-immune bench metrics ([[StableMetrics]], recorded
  * per-query in BENCH.json): deterministic at a fixed SF, and a
  * SYNTHETIC plan regression — an added exchange — must demonstrably
  * trip them. This is the triage rule's teeth: a seconds-only move
  * with unmoved tasks/shuffle_bytes and an unchanged plan digest is
  * machine noise; a real added shuffle cannot hide. */
class StableMetricsSpec extends SparkSpec {

  private def q = Tables.lineitem(spark, sfDir)
    .groupBy(col("l_returnflag"))
    .agg(sum(col("l_quantity")).as("qty"))

  test("task and shuffle-byte counts are deterministic run-over-run") {
    val (t1, s1, r1) = StableMetrics.measure(spark)(q.count())
    val (t2, s2, r2) = StableMetrics.measure(spark)(q.count())
    assert(r1 == r2)
    assert(t1 > 0 && s1 > 0, s"agg query measured no work (tasks=$t1, shuffle=$s1)")
    assert((t1, s1) == ((t2, s2)),
      s"stable metrics drifted on an identical plan: ($t1,$s1) vs ($t2,$s2)")
  }

  test("a synthetic regression — one added exchange — trips tasks AND shuffle_bytes") {
    val (t0, s0, _) = StableMetrics.measure(spark)(q.count())
    val regressed = Tables.lineitem(spark, sfDir)
      .repartition(64, col("l_orderkey")) // the injected exchange
      .groupBy(col("l_returnflag"))
      .agg(sum(col("l_quantity")).as("qty"))
    val (t1, s1, _) = StableMetrics.measure(spark)(regressed.count())
    assert(t1 > t0,
      s"added exchange did not move the task count ($t0 -> $t1)")
    assert(s1 > s0,
      s"added exchange did not move shuffle bytes ($s0 -> $s1)")
  }
}
