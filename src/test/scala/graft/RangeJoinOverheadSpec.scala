package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.plans.RangeJoinRewrite
import graft.sources.Tables

/** The rewrite runs in the fixed-point optimizer batch on EVERY query,
  * so its cost on plans it does NOT rewrite is a tax on the whole
  * engine. This spec MEASURES that tax instead of trusting the
  * tree-pattern pruning comment: median end-to-end optimization time
  * with the rule on vs off, for (a) a join-free aggregate and (b) a
  * 10-join chain with non-time conditions — the two common shapes where
  * the rule must be ~free — plus the absolute per-call cost of the rule
  * itself on the 10-join plan.
  *
  * Budgets are deliberately loose multiples (shared CI machines jitter)
  * but tight enough to catch the failure modes that matter: a rule that
  * re-walks the alias spine quadratically, loses its pattern pruning, or
  * fails to converge in the fixed-point batch shows up as 10–100×, not
  * 2×. The r12→r13 bench triage motivated this: an unmeasured optimizer
  * tax is indistinguishable from kernel regression in per-query timings.
  */
class RangeJoinOverheadSpec extends SparkSpec {

  /** Median wall time of `build`+optimize over `n` fresh constructions
    * (fresh DataFrame each time — QueryExecution caches optimizedPlan). */
  private def medianOptimizeNanos(n: Int)(build: => DataFrame): Long = {
    (1 to 3).foreach(_ => build.queryExecution.optimizedPlan) // warm
    val samples = (1 to n).map { _ =>
      val df = build
      val t0 = System.nanoTime()
      df.queryExecution.optimizedPlan
      System.nanoTime() - t0
    }.sorted
    samples((samples.size - 1) / 2)
  }

  private def withRule[T](on: Boolean)(body: => T): T = {
    spark.conf.set(RangeJoinRewrite.EnabledKey, on.toString)
    try body finally spark.conf.unset(RangeJoinRewrite.EnabledKey)
  }

  private def joinFree: DataFrame = {
    import spark.implicits._
    Tables.lineitem(spark, sfDir)
      .where($"l_quantity" > 10)
      .groupBy($"l_returnflag")
      .agg(sum($"l_quantity").as("q"), avg($"l_discount").as("d"))
  }

  private def tenJoins: DataFrame = {
    import spark.implicits._
    val base = Tables.lineitem(spark, sfDir)
      .select($"l_orderkey", $"l_partkey", $"l_suppkey", $"l_quantity")
    (1 to 10).foldLeft(base) { (acc, i) =>
      val next = Tables.lineitem(spark, sfDir)
        .select($"l_orderkey".as(s"ok$i"), $"l_quantity".as(s"q$i"))
      acc.join(next, acc("l_orderkey") === next(s"ok$i") &&
        acc("l_quantity") <= next(s"q$i")) // non-time inequality: scanned, never banded
    }
  }

  test("join-free plans pay ~nothing for the rule (tree-pattern pruning works)") {
    val n = 15
    val off = withRule(on = false)(medianOptimizeNanos(n)(joinFree))
    val on = withRule(on = true)(medianOptimizeNanos(n)(joinFree))
    // generous: pruning makes the true delta microseconds; 2× + 20 ms
    // slack only fails when the early-exit path is actually broken
    info(f"join-free optimize median: rule-on ${on / 1e6}%.2f ms, rule-off ${off / 1e6}%.2f ms")
    assert(on <= off * 2 + 20000000L,
      f"join-free optimize: rule-on ${on / 1e6}%.2f ms vs rule-off ${off / 1e6}%.2f ms")
  }

  test("a 10-join non-time plan stays within the optimize budget with the rule on") {
    val n = 9
    val off = withRule(on = false)(medianOptimizeNanos(n)(tenJoins))
    val on = withRule(on = true)(medianOptimizeNanos(n)(tenJoins))
    info(f"10-join optimize median: rule-on ${on / 1e6}%.2f ms, rule-off ${off / 1e6}%.2f ms")
    assert(on <= off * 2 + 50000000L,
      f"10-join optimize: rule-on ${on / 1e6}%.2f ms vs rule-off ${off / 1e6}%.2f ms")
  }

  test("the rule's own per-call cost on a 10-join plan is bounded") {
    val optimized = withRule(on = false)(tenJoins.queryExecution.optimizedPlan)
    (1 to 5).foreach(_ => RangeJoinRewrite(optimized)) // warm
    val samples = (1 to 15).map { _ =>
      val t0 = System.nanoTime()
      RangeJoinRewrite(optimized)
      System.nanoTime() - t0
    }.sorted
    val med = samples(7)
    info(f"rule apply median on 10-join plan: ${med / 1e6}%.3f ms")
    // 10 joins × candidate scan, no rewrite: must stay well under the
    // millisecond regime that would show up in per-query bench numbers
    // (the fixed-point batch calls this a handful of times per query)
    assert(med <= 5000000L, f"rule apply median ${med / 1e6}%.3f ms on a 10-join plan")
  }

  test("physical planning with the strategy active stays within budget on a 10-join plan") {
    // RangeJoinStrategy is consulted for every Join during planning;
    // its guarded probe (bandConf + tryRewrite) must be invisible on
    // plans it never rewrites
    def planPhysical(df: DataFrame): Unit = { df.queryExecution.executedPlan; () }
    def medianPlanNanos(n: Int)(build: => DataFrame): Long = {
      (1 to 3).foreach(_ => planPhysical(build))
      val samples = (1 to n).map { _ =>
        val df = build
        val t0 = System.nanoTime()
        planPhysical(df)
        System.nanoTime() - t0
      }.sorted
      samples((samples.size - 1) / 2)
    }
    val off = withRule(on = false)(medianPlanNanos(9)(tenJoins))
    val on = withRule(on = true)(medianPlanNanos(9)(tenJoins))
    info(f"10-join physical planning median: strategy-on ${on / 1e6}%.2f ms, off ${off / 1e6}%.2f ms")
    assert(on <= off * 2 + 50000000L,
      f"10-join planning: strategy-on ${on / 1e6}%.2f ms vs off ${off / 1e6}%.2f ms")
  }

  test("a firing rewrite (q151 shape) optimizes within an absolute budget") {
    val n = 9
    val med = medianOptimizeNanos(n)(
      graft.operators.IntervalJoin.q151RangeJoinAuto(spark, sfDir))
    // the rewrite itself (band synthesis + re-analysis of the new
    // operators) must not dominate query compile time
    info(f"q151 (firing) optimize median: ${med / 1e6}%.1f ms")
    assert(med <= 1500000000L, f"q151 optimize median ${med / 1e9}%.2f s")
  }
}
