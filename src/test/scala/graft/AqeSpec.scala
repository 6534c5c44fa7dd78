package graft

import org.apache.spark.sql.functions._

/** Adaptive-execution posture tests — the runtime-re-plan half of the
  * SCALE.md story, as assertions. Static plan shape (PlanHygieneSpec)
  * proves the compile-time posture; these prove the AQE knobs pinned in
  * [[Sessions.configs]] actually FIRE: a planted hot key gets its
  * shuffle partition split (skew-join handling), and an over-partitioned
  * small shuffle gets coalesced. Both mechanisms are what absorb, on a
  * real cluster, the key-skew and reducer-sizing drift that local-SF
  * tests can't otherwise exercise.
  */
class AqeSpec extends SparkSpec {

  test("Sessions pins the AQE posture in one place") {
    assert(Sessions.configs("spark.sql.adaptive.enabled") == "true")
    assert(Sessions.configs("spark.sql.adaptive.coalescePartitions.enabled") == "true")
    assert(Sessions.configs("spark.sql.adaptive.skewJoin.enabled") == "true")
  }

  /** Set session confs for the test body, restoring prior values after
    * (the spec session is shared across suites). */
  private def withConf(pairs: (String, String)*)(body: => Unit): Unit = {
    val saved = pairs.map { case (k, _) => k -> spark.conf.getOption(k) }
    pairs.foreach { case (k, v) => spark.conf.set(k, v) }
    try body
    finally saved.foreach { case (k, old) =>
      old.fold(spark.conf.unset(k))(spark.conf.set(k, _))
    }
  }

  private def executedPlan(df: org.apache.spark.sql.DataFrame): String = {
    df.collect() // AQE finalizes only on execution
    df.queryExecution.executedPlan.toString
  }

  test("planted hot key: AQE skew-join splits the oversized partition") {
    import spark.implicits._
    // 60k of 70k left rows share key 0 (~3 MB of padded rows in one
    // shuffle partition vs ~KBs in the others); thresholds lowered so
    // the local frame trips the same size test a 100 TB hot key would.
    // pad is per-row md5 (incompressible — a constant pad would LZ4
    // away to nothing in the shuffle files the skew test measures, and
    // anything foldable gets constant-folded out of the shuffle
    // entirely).
    val left = spark.range(70000)
      .select(when($"id" < 60000, 0L).otherwise($"id").as("k"),
        md5(concat_ws("-", $"id", lit("pad"))).as("pad"))
    val right = spark.range(20000)
      .select($"id".as("k"), $"id".cast("string").as("v"))
    withConf(
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "131072",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "65536",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2.0",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
    ) {
      // concat(pad, v) needs BOTH sides, so neither column can be
      // pre-aggregated or pruned below the join — the pad bytes must
      // ship through the left shuffle.
      val plan = executedPlan(
        left.join(right, "k").select(max(concat($"pad", $"v"))))
      assert(plan.contains("skew=true"), s"no skew-split join in:\n$plan")
    }
  }

  test("over-partitioned small shuffle: AQE coalesces the read") {
    import spark.implicits._
    val df = spark.range(10000).select(($"id" % 7).as("k"))
      .groupBy($"k").agg(count(lit(1)).as("n"))
    val plan = executedPlan(df)
    assert(plan.contains("AQEShuffleRead") && plan.contains("coalesced"),
      s"no coalesced shuffle read in:\n$plan")
  }

  test("the big-shuffle queries run under AdaptiveSparkPlan") {
    Seq(
      queries.Relational4.q89CoOccurrence(spark, sfDir),
      queries.Streams.q112Sessionize(spark, sfDir),
      queries.Streams.q33Sessions(spark, sfDir),
    ).foreach { df =>
      assert(executedPlan(df).contains("AdaptiveSparkPlan"),
        df.queryExecution.executedPlan.toString.take(400))
    }
  }
}
