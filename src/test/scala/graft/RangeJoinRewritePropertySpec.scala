package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.plans.RangeJoinRewrite

/** Randomized exactness hammer for the planner rewrite: across seeded
  * random datasets (boundary-colliding timestamps, NULLs, degenerate
  * and zero-width intervals) and band widths from 1 second to 30 days,
  * the rewritten join must return EXACTLY the naive join's rows — the
  * property that makes an auto-applied optimizer rule trustworthy. Band
  * widths far smaller and far larger than the interval width are both
  * exercised (multi-band explosion vs whole-dataset-in-one-band). */
class RangeJoinRewritePropertySpec extends SparkSpec {

  private def sortedRows(df: DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  private def withoutRule[T](build: => T): T = {
    spark.conf.set(RangeJoinRewrite.EnabledKey, "false")
    try build finally spark.conf.unset(RangeJoinRewrite.EnabledKey)
  }

  // timestamps on a coarse lattice (multiples of 1h within ~40 days) so
  // boundary collisions (p == lo, p == hi, lo == hi) are COMMON, not
  // astronomically rare — the cases banding must not miscount
  private def latticeTs(rnd: scala.util.Random): java.sql.Timestamp =
    new java.sql.Timestamp(1704067200000L + rnd.nextInt(40 * 24) * 3600000L)

  /** Round-trip through parquet: Seq.toDF builds a LocalRelation, which
    * ConvertToLocalRelation folds projections INTO — leaving no alias
    * spine for the width proof to read. Real queries scan files; so do
    * these. */
  private def viaParquet(df: DataFrame, tag: String): DataFrame = {
    val dir = java.nio.file.Files.createTempDirectory(s"rjprop-$tag").toString
    df.write.mode("overwrite").parquet(dir)
    spark.read.parquet(dir)
  }

  test("rewritten join == naive join over seeded random data and band widths") {
    import spark.implicits._
    val bandSeconds = Seq(1L, 3600L, 86400L, 30L * 86400L)
    var checked = 0
    for (seed <- 1 to 4) {
      val rnd = new scala.util.Random(seed)
      val widthHours = rnd.nextInt(72) // constant per dataset: provable
      val points = viaParquet(Seq.fill(120)((
        rnd.nextInt(6).toLong,
        if (rnd.nextInt(20) == 0) null else latticeTs(rnd)))
        .toDF("k", "ts"), s"pts$seed")
      val intervals = viaParquet(Seq.fill(40)((
        rnd.nextInt(6).toLong,
        if (rnd.nextInt(20) == 0) null else latticeTs(rnd)))
        .toDF("k", "lo"), s"ivl$seed")
        .select($"k", $"lo",
          ($"lo" + expr(s"INTERVAL $widthHours HOUR")).as("hi"))
      def strictHi = rnd.nextBoolean()
      val strict = strictHi
      def q = {
        val cond = points("k") === intervals("k") &&
          points("ts") >= intervals("lo") &&
          (if (strict) points("ts") < intervals("hi")
           else points("ts") <= intervals("hi"))
        points.join(intervals, cond)
      }
      val expected = withoutRule(sortedRows(q))
      for (band <- bandSeconds) {
        spark.conf.set(RangeJoinRewrite.BandSecondsKey, band.toString)
        try {
          val plan = q.queryExecution.optimizedPlan.toString
          assert(plan.contains("__graft_band"),
            s"seed=$seed band=$band: rule did not fire\n$plan")
          val got = sortedRows(q)
          assert(got == expected,
            s"seed=$seed band=$band strict=$strict width=${widthHours}h: " +
              s"${got.size} rows vs naive ${expected.size}")
          checked += 1
        } finally spark.conf.unset(RangeJoinRewrite.BandSecondsKey)
      }
      // at least one dataset must produce matches, or the test is vacuous
      if (seed == 1) assert(expected.nonEmpty)
    }
    assert(checked == 16)
  }

  test("DATE-typed bounds: rewritten join == naive join over seeded random data") {
    import spark.implicits._
    // dates on a ~60-day lattice so p == lo, p == hi, lo == hi boundary
    // collisions are common; widths 0..13 days (0 = the as-of shape)
    def latticeDate(rnd: scala.util.Random): java.sql.Date =
      java.sql.Date.valueOf(java.time.LocalDate.of(2024, 1, 1).plusDays(rnd.nextInt(60)))
    for (seed <- 21 to 23) {
      val rnd = new scala.util.Random(seed)
      val widthDays = rnd.nextInt(14)
      val points = viaParquet(Seq.fill(120)((
        rnd.nextInt(6).toLong,
        if (rnd.nextInt(20) == 0) null else latticeDate(rnd)))
        .toDF("k", "d"), s"dpts$seed")
      val intervals = viaParquet(Seq.fill(40)((
        rnd.nextInt(6).toLong,
        if (rnd.nextInt(20) == 0) null else latticeDate(rnd)))
        .toDF("k", "lo"), s"divl$seed")
        .select($"k", $"lo", date_add($"lo", widthDays).as("hi"))
      def q = points.join(intervals, points("k") === intervals("k") &&
        points("d") >= intervals("lo") && points("d") <= intervals("hi"))
      val expected = withoutRule(sortedRows(q))
      for (band <- Seq(43200L, 86400L, 5L * 86400L)) { // incl. sub-day bands
        spark.conf.set(RangeJoinRewrite.BandSecondsKey, band.toString)
        try {
          val plan = q.queryExecution.optimizedPlan.toString
          assert(plan.contains("__graft_band"),
            s"seed=$seed band=$band: DATE rule did not fire\n$plan")
          assert(sortedRows(q) == expected,
            s"seed=$seed band=$band width=${widthDays}d")
        } finally spark.conf.unset(RangeJoinRewrite.BandSecondsKey)
      }
      if (seed == 21) assert(expected.nonEmpty)
    }
  }

  test("LEFT OUTER point-preserved: rewritten join == naive join, null extension exact") {
    import spark.implicits._
    // lookback spelling (`p BETWEEN anchor - W AND anchor`) so the
    // PRESERVED side is the point side; random data makes both matched
    // multiplicities and unmatched null-extensions common
    for (seed <- 31 to 33) {
      val rnd = new scala.util.Random(seed)
      val widthHours = 1 + rnd.nextInt(72)
      val points = viaParquet(Seq.fill(100)((
        rnd.nextInt(8).toLong,
        if (rnd.nextInt(20) == 0) null else latticeTs(rnd)))
        .toDF("k", "ts"), s"lopts$seed")
      val anchors = viaParquet(Seq.fill(30)((
        rnd.nextInt(8).toLong, rnd.nextLong(),
        if (rnd.nextInt(20) == 0) null else latticeTs(rnd)))
        .toDF("k2", "id", "anchor"), s"loanc$seed")
      def q = points.join(anchors, points("k") === anchors("k2") &&
        points("ts") >= anchors("anchor") - expr(s"INTERVAL $widthHours HOUR") &&
        points("ts") <= anchors("anchor"), "left_outer")
      val expected = withoutRule(sortedRows(q))
      assert(q.queryExecution.optimizedPlan.toString.contains("__graft_band"),
        s"seed=$seed: left-outer rule did not fire")
      assert(sortedRows(q) == expected, s"seed=$seed width=${widthHours}h")
      if (seed == 31) {
        assert(expected.nonEmpty)
        assert(withoutRule(q.where($"id".isNull).count()) > 0,
          "no unmatched points — outer property vacuous")
      }
    }
  }

  test("SQL [NOT] EXISTS through the planner strategy == rule-off over seeded random data") {
    import spark.implicits._
    // The strategy path (subquery-born semi/anti joins) shares
    // tryRewrite with the rule, but its banding happens at PHYSICAL
    // planning — this pins the end-to-end result under random data,
    // including the NULL semantics NOT EXISTS inherits (a NULL ts never
    // matches, so its row always survives the anti join).
    for (seed <- 41 to 42) {
      val rnd = new scala.util.Random(seed)
      val widthHours = 1 + rnd.nextInt(72)
      viaParquet(Seq.fill(120)((
        rnd.nextInt(6).toLong, rnd.nextLong(),
        if (rnd.nextInt(20) == 0) null else latticeTs(rnd)))
        .toDF("k", "id", "ts"), s"sqlpts$seed")
        .createOrReplaceTempView("prop_points")
      viaParquet(Seq.fill(40)((
        rnd.nextInt(6).toLong,
        if (rnd.nextInt(20) == 0) null else latticeTs(rnd)))
        .toDF("k", "anchor"), s"sqlanc$seed")
        .createOrReplaceTempView("prop_anchors")
      for (neg <- Seq("NOT ", "")) {
        def q = spark.sql(
          s"""SELECT p.id FROM prop_points p
             |WHERE ${neg}EXISTS (
             |  SELECT 1 FROM prop_anchors a WHERE a.k = p.k
             |    AND p.ts >= a.anchor - INTERVAL $widthHours HOUR
             |    AND p.ts <= a.anchor)""".stripMargin)
        val expected = withoutRule(sortedRows(q))
        val phys = q.queryExecution.executedPlan.toString
        assert(phys.contains("__graft_band"),
          s"seed=$seed ${neg}EXISTS: strategy did not band\n$phys")
        assert(sortedRows(q) == expected,
          s"seed=$seed ${neg}EXISTS width=${widthHours}h")
        if (seed == 41) assert(expected.nonEmpty)
      }
    }
  }

  test("overlap rewrite == naive overlap over seeded random window sets") {
    import spark.implicits._
    for (seed <- 10 to 12) {
      val rnd = new scala.util.Random(seed)
      val wHours = 1 + rnd.nextInt(48)
      def windows(n: Int, tag: String) = viaParquet(Seq.fill(n)((
        rnd.nextInt(5).toLong, rnd.nextLong(),
        if (rnd.nextInt(25) == 0) null else latticeTs(rnd)))
        .toDF("k", s"id_$tag", "s"), s"win$seed$tag")
        .select(col("k").as(s"k_$tag"), col(s"id_$tag"),
          col("s").as(s"start_$tag"),
          (col("s") + expr(s"INTERVAL $wHours HOUR")).as(s"end_$tag"))
      val a = windows(60, "a")
      val b = windows(60, "b")
      def q = a.join(b, a("k_a") === b("k_b") &&
        a("start_a") <= b("end_b") && b("start_b") <= a("end_a"))
      val expected = withoutRule(sortedRows(q))
      spark.conf.set(RangeJoinRewrite.BandSecondsKey, "7200")
      try {
        assert(q.queryExecution.optimizedPlan.toString.contains("__graft_band"))
        assert(sortedRows(q) == expected, s"seed=$seed width=${wHours}h")
      } finally spark.conf.unset(RangeJoinRewrite.BandSecondsKey)
      if (seed == 10) assert(expected.nonEmpty)
    }
  }
}
