package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Banded point-in-interval join — `p JOIN i ON p.key = i.key AND
  * p.ts BETWEEN i.start AND i.end` (both ends inclusive), the join shape
  * of attribution windows, validity-interval lookups, and ad-impression
  * matching.
  *
  * Spark's optimizer sees the BETWEEN as a non-equi predicate; without
  * help it plans the pure-range form as BroadcastNestedLoopJoin and even
  * the keyed form degenerates when a hot key dominates. The banded
  * rewrite makes the time predicate an equi-key: time is quantized into
  * fixed-width bands, each interval is exploded onto every band it
  * covers, each point lands on exactly one band, and the join runs as an
  * ordinary shuffled equi-join on (key, band) with the exact BETWEEN as
  * a post-filter. A (point, interval) pair can only meet in the point's
  * own band, so the output needs NO dedup.
  *
  * Scale shape: one shuffle on (key, band); interval replication factor
  * is `len/band + 1` (pick `bandSeconds` near the typical interval
  * length → ~2 rows per interval); band cardinality grows with the time
  * span, so skew on a hot key is further split across its bands. This is
  * the same strategy as Databricks' range-join binning, re-expressed
  * with explode+equi-join on open Spark.
  */
object IntervalJoin {

  /** Inclusive point-in-interval join. Output = all point columns plus
    * every non-key interval column prefixed with `intervalPrefix`.
    * NULL keys/times never match (SQL comparison semantics); degenerate
    * intervals with `start > end` match nothing. */
  def pointInInterval(points: DataFrame, intervals: DataFrame, key: String,
      ts: String, start: String, end: String, bandSeconds: Long,
      intervalPrefix: String = "i_"): DataFrame = {
    require(bandSeconds > 0, "bandSeconds must be positive")
    val band = bandSeconds * 1000000L // microsecond epochs
    val iPayload = intervals.columns.filterNot(_ == key).toSeq
    val p = points
      .where(col(key).isNotNull && col(ts).isNotNull)
      .withColumn("__band", expr(s"unix_micros($ts) div ${band}L"))
    val i = intervals
      .where(col(key).isNotNull && col(start).isNotNull &&
        col(end).isNotNull && col(start) <= col(end))
      .select(col(key).as("__ikey"),
        expr(s"unix_micros($start) div ${band}L").as("__b0"),
        expr(s"unix_micros($end) div ${band}L").as("__b1"),
        struct(iPayload.map(col): _*).as("__ipay"))
      .withColumn("__band", explode(sequence(col("__b0"), col("__b1"))))
    p.join(i, p(key) === i("__ikey") && p("__band") === i("__band"))
      .where(col(ts).between(col(s"__ipay.$start"), col(s"__ipay.$end")))
      .select(points.columns.map(col).toSeq ++
        iPayload.map(c => col(s"__ipay.$c").as(s"$intervalPrefix$c")): _*)
  }

  /** Inclusive interval-overlap join: `l JOIN r ON l.key = r.key AND
    * l.start <= r.end AND r.start <= l.end` — session overlap, validity
    * ranges, genomic-style range intersection. Both sides must use the
    * same `start`/`end` column names; output = all left columns plus
    * every non-key right column prefixed with `rightPrefix`.
    *
    * Same banding as [[pointInInterval]], but a pair of intervals can
    * share MANY bands, so the join emits a pair only in its OWNER band —
    * the band holding the later of the two starts: overlap guarantees
    * `max(l.start, r.start) <= min(l.end, r.end)`, so the owner band is
    * covered by both intervals (exactly-once, no dedup shuffle). */
  def intervalOverlap(left: DataFrame, right: DataFrame, key: String,
      start: String, end: String, bandSeconds: Long,
      rightPrefix: String = "r_"): DataFrame = {
    require(bandSeconds > 0, "bandSeconds must be positive")
    val band = bandSeconds * 1000000L
    def prep(df: DataFrame, tag: String): DataFrame =
      df.where(col(key).isNotNull && col(start).isNotNull &&
          col(end).isNotNull && col(start) <= col(end))
        .select(col(key).as(s"__k$tag"),
          struct(df.columns.filterNot(_ == key).map(col).toSeq: _*).as(s"__p$tag"),
          expr(s"unix_micros($start) div ${band}L").as(s"__b0$tag"),
          expr(s"unix_micros($end) div ${band}L").as(s"__b1$tag"))
        .withColumn(s"__band$tag", explode(sequence(col(s"__b0$tag"), col(s"__b1$tag"))))
    val l = prep(left, "l")
    val r = prep(right, "r")
    val rPayload = right.columns.filterNot(_ == key).toSeq
    l.join(r, col("__kl") === col("__kr") && col("__bandl") === col("__bandr") &&
        col(s"__pl.$start") <= col(s"__pr.$end") &&
        col(s"__pr.$start") <= col(s"__pl.$end") &&
        col("__bandl") === greatest(col("__b0l"), col("__b0r")))
      .select(Seq(col("__kl").as(key)) ++
        left.columns.filterNot(_ == key).toSeq.map(c => col(s"__pl.$c").as(c)) ++
        rPayload.map(c => col(s"__pr.$c").as(s"$rightPrefix$c")): _*)
  }

  /** q63: windowed attribution with multiplicity — every (view,
    * purchase-within-3-days-after) pair per user, aggregated per user:
    * pair count, distinct views/purchases involved, attributed value.
    * Views are the intervals [ts, ts+3d] (band = the window length →
    * ≤2 exploded rows per view); purchases are the points. */
  def q63IntervalAttribution(spark: SparkSession, d: String): DataFrame = {
    import spark.implicits._
    val e = Tables.events(spark, d)
    val views = e.where($"event_type" === "view")
      .select($"user_id", $"event_id".as("view_id"), $"ts".as("w_start"),
        ($"ts" + expr("INTERVAL 3 DAY")).as("w_end"))
    val purchases = e.where($"event_type" === "purchase")
      .select($"event_id", $"user_id", $"ts", $"value")
    pointInInterval(purchases, views, key = "user_id", ts = "ts",
      start = "w_start", end = "w_end", bandSeconds = 3L * 86400L)
      .groupBy($"user_id")
      .agg(count(lit(1)).as("n_pairs"),
        countDistinct($"i_view_id").as("n_views"),
        countDistinct($"event_id").as("n_purchases"),
        sum($"value".cast("decimal(18,2)")).cast("double").as("attributed_value"))
      .orderBy($"user_id")
  }

  /** q68: overlapping browse windows — each view opens a 12-hour
    * window; per user, how many ordered pairs of windows overlap and
    * their total pairwise overlap (exact microseconds, so the oracle
    * hash-matches without float drift). Self-overlap-join through the
    * owner-band rewrite. */
  def q68OverlapPairs(spark: SparkSession, d: String): DataFrame = {
    import spark.implicits._
    val views = Tables.events(spark, d).where($"event_type" === "view")
      .select($"user_id", $"event_id", $"ts".as("w_start"),
        ($"ts" + expr("INTERVAL 12 HOUR")).as("w_end"))
    val a = views.select($"user_id", $"event_id".as("id_a"), $"w_start", $"w_end")
    val b = views.select($"user_id", $"event_id".as("id_b"), $"w_start", $"w_end")
    intervalOverlap(a, b, key = "user_id", start = "w_start", end = "w_end",
      bandSeconds = 12L * 3600L, rightPrefix = "b_")
      .where($"id_a" < $"b_id_b")
      .groupBy($"user_id")
      .agg(count(lit(1)).as("n_pairs"),
        sum(unix_micros(least($"w_end", $"b_w_end")) -
          unix_micros(greatest($"w_start", $"b_w_start"))).as("overlap_us"))
      .orderBy($"user_id")
  }

  val q68Sql: String =
    """WITH e AS (
      |  SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts, event_type
      |  FROM events
      |), v AS (
      |  SELECT user_id, event_id, ts AS w_start,
      |         ts + INTERVAL 12 HOUR AS w_end FROM e WHERE event_type = 'view'
      |)
      |SELECT a.user_id, count(*) AS n_pairs,
      |       CAST(sum(epoch_us(least(a.w_end, b.w_end)) -
      |           epoch_us(greatest(a.w_start, b.w_start))) AS BIGINT) AS overlap_us
      |FROM v a JOIN v b ON a.user_id = b.user_id AND a.event_id < b.event_id
      |   AND a.w_start <= b.w_end AND b.w_start <= a.w_end
      |GROUP BY a.user_id
      |ORDER BY a.user_id""".stripMargin

  /** q151: the SAME point-in-interval shape as q63 written the way a
    * user would — a plain `ON p.user_id = v.user_id AND p.ts BETWEEN
    * v.w_start AND v.w_end` join, NO library call — aggregated per view
    * instead of per user. The banding comes from the planner:
    * [[graft.plans.RangeJoinRewrite]] (registered via
    * spark.sql.extensions) rewrites the naive join into the banded
    * equi-join, so the scale-safe plan no longer depends on the caller
    * knowing [[pointInInterval]] exists. RangeJoinRewriteSpec pins both
    * the plan (band key present, no nested loop) and result equality
    * with the rule disabled. */
  def q151RangeJoinAuto(spark: SparkSession, d: String): DataFrame = {
    import spark.implicits._
    val e = Tables.events(spark, d)
    val views = e.where($"event_type" === "view")
      .select($"user_id", $"event_id".as("view_id"), $"ts".as("w_start"),
        ($"ts" + expr("INTERVAL 3 DAY")).as("w_end"))
    val purchases = e.where($"event_type" === "purchase")
      .select($"event_id", $"user_id", $"ts", $"value")
    purchases.join(views, purchases("user_id") === views("user_id") &&
        purchases("ts") >= views("w_start") && purchases("ts") <= views("w_end"))
      .groupBy($"view_id")
      .agg(count(lit(1)).as("n_purchases"),
        sum($"value".cast("decimal(18,2)")).cast("double").as("purch_value"))
      .orderBy($"view_id")
  }

  val q151Sql: String =
    """WITH e AS (
      |  SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts, event_type, value
      |  FROM events
      |), v AS (
      |  SELECT user_id, event_id AS view_id, ts AS w_start,
      |         ts + INTERVAL 3 DAY AS w_end FROM e WHERE event_type = 'view'
      |), p AS (
      |  SELECT event_id, user_id, ts, value FROM e WHERE event_type = 'purchase'
      |)
      |SELECT v.view_id, count(*) AS n_purchases,
      |       CAST(sum(CAST(p.value AS DECIMAL(18,2))) AS DOUBLE) AS purch_value
      |FROM p JOIN v ON p.user_id = v.user_id
      |   AND p.ts >= v.w_start AND p.ts <= v.w_end
      |GROUP BY v.view_id
      |ORDER BY v.view_id""".stripMargin

  /** q152: the overlap sibling of q151 — a NAIVE window self-overlap
    * join (`a.start <= b.end AND b.start <= a.end`, plain DataFrame
    * code, no library call), banded by the planner. The rewrite's
    * properness proof fires because the windows are constant-width
    * (`w_end = ts + 6h`); per user it reports the overlapping ordered
    * pair count and the LONGEST pairwise overlap (vs q68's 12-hour
    * windows and overlap SUM, which go through the library form). */
  def q152OverlapAuto(spark: SparkSession, d: String): DataFrame = {
    import spark.implicits._
    val v = Tables.events(spark, d).where($"event_type" === "view")
      .select($"user_id", $"event_id", $"ts".as("w_start"),
        ($"ts" + expr("INTERVAL 6 HOUR")).as("w_end"))
    val a = v.select($"user_id", $"event_id".as("id_a"), $"w_start", $"w_end")
    val b = v.select($"user_id".as("u_b"), $"event_id".as("id_b"),
      $"w_start".as("b_w_start"), $"w_end".as("b_w_end"))
    a.join(b, a("user_id") === b("u_b") &&
        a("w_start") <= b("b_w_end") && b("b_w_start") <= a("w_end") &&
        a("id_a") < b("id_b"))
      .groupBy($"user_id")
      .agg(count(lit(1)).as("n_pairs"),
        max(unix_micros(least($"w_end", $"b_w_end")) -
          unix_micros(greatest($"w_start", $"b_w_start"))).as("max_overlap_us"))
      .orderBy($"user_id")
  }

  val q152Sql: String =
    """WITH e AS (
      |  SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts, event_type
      |  FROM events
      |), v AS (
      |  SELECT user_id, event_id, ts AS w_start,
      |         ts + INTERVAL 6 HOUR AS w_end FROM e WHERE event_type = 'view'
      |)
      |SELECT a.user_id, count(*) AS n_pairs,
      |       CAST(max(epoch_us(least(a.w_end, b.w_end)) -
      |           epoch_us(greatest(a.w_start, b.w_start))) AS BIGINT) AS max_overlap_us
      |FROM v a JOIN v b ON a.user_id = b.user_id AND a.event_id < b.event_id
      |   AND a.w_start <= b.w_end AND b.w_start <= a.w_end
      |GROUP BY a.user_id
      |ORDER BY a.user_id""".stripMargin

  /** q153: the LEFT OUTER half of attribution — EVERY view, with the
    * purchases that followed it within 3 days, zero-purchase views kept
    * (n_purchases = 0, NULL value). Written naively in the LOOKBACK
    * spelling (`v.ts BETWEEN p.ts − 3d AND p.ts` — the view is the
    * point, the purchase carries the window), which makes the PRESERVED
    * side the point side: exactly the orientation
    * [[graft.plans.RangeJoinRewrite]] can band for an outer join (the
    * view row gains one band column, no replication, so unmatched views
    * null-extend exactly once). The width proof fires on the
    * `p.ts − INTERVAL 3 DAY` lookback form (constant negative shift of
    * the other bound). */
  def q153LeftOuterAuto(spark: SparkSession, d: String): DataFrame = {
    import spark.implicits._
    val e = Tables.events(spark, d)
    val views = e.where($"event_type" === "view")
      .select($"user_id", $"event_id".as("view_id"), $"ts".as("v_ts"))
    val purchases = e.where($"event_type" === "purchase")
      .select($"event_id".as("purchase_id"), $"user_id".as("p_user_id"),
        $"ts".as("p_ts"), $"value")
    views.join(purchases,
        views("user_id") === purchases("p_user_id") &&
          views("v_ts") >= purchases("p_ts") - expr("INTERVAL 3 DAY") &&
          views("v_ts") <= purchases("p_ts"),
        "left_outer")
      .groupBy($"view_id")
      .agg(count($"purchase_id").as("n_purchases"),
        sum($"value".cast("decimal(18,2)")).cast("double").as("purch_value"))
      .orderBy($"view_id")
  }

  val q153Sql: String =
    """WITH e AS (
      |  SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts, event_type, value
      |  FROM events
      |), v AS (
      |  SELECT user_id, event_id AS view_id, ts AS v_ts
      |  FROM e WHERE event_type = 'view'
      |), p AS (
      |  SELECT event_id AS purchase_id, user_id, ts AS p_ts, value
      |  FROM e WHERE event_type = 'purchase'
      |)
      |SELECT v.view_id, count(p.purchase_id) AS n_purchases,
      |       CAST(sum(CAST(p.value AS DECIMAL(18,2))) AS DOUBLE) AS purch_value
      |FROM v LEFT JOIN p ON p.user_id = v.user_id
      |   AND v.v_ts >= p.p_ts - INTERVAL 3 DAY AND v.v_ts <= p.p_ts
      |GROUP BY v.view_id
      |ORDER BY v.view_id""".stripMargin

  /** q154: day-granularity attribution over DATE-typed bounds — the
    * validity-table shape (`p_date BETWEEN v_date AND v_date + 7`) that
    * silently kept Spark's nested-loop plan while the rewrite was
    * timestamp-only. `date_add(v_date, 7)` proves the 7-day constant
    * width; days→micros is the monotone band map. */
  def q154DateRangeAuto(spark: SparkSession, d: String): DataFrame = {
    import spark.implicits._
    val e = Tables.events(spark, d)
    val views = e.where($"event_type" === "view")
      .select($"user_id", $"event_id".as("view_id"),
        to_date($"ts").as("v_date"),
        date_add(to_date($"ts"), 7).as("w_end_date"))
    val purchases = e.where($"event_type" === "purchase")
      .select($"event_id", $"user_id".as("p_user_id"),
        to_date($"ts").as("p_date"), $"value")
    purchases.join(views,
        purchases("p_user_id") === views("user_id") &&
          purchases("p_date") >= views("v_date") &&
          purchases("p_date") <= views("w_end_date"))
      .groupBy($"view_id")
      .agg(count(lit(1)).as("n_purchases"),
        sum($"value".cast("decimal(18,2)")).cast("double").as("purch_value"))
      .orderBy($"view_id")
  }

  val q154Sql: String =
    """WITH e AS (
      |  SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts, event_type, value
      |  FROM events
      |), v AS (
      |  SELECT user_id, event_id AS view_id, CAST(ts AS DATE) AS v_date,
      |         CAST(ts AS DATE) + 7 AS w_end_date FROM e WHERE event_type = 'view'
      |), p AS (
      |  SELECT event_id, user_id, CAST(ts AS DATE) AS p_date, value
      |  FROM e WHERE event_type = 'purchase'
      |)
      |SELECT v.view_id, count(*) AS n_purchases,
      |       CAST(sum(CAST(p.value AS DECIMAL(18,2))) AS DOUBLE) AS purch_value
      |FROM p JOIN v ON p.user_id = v.user_id
      |   AND p.p_date >= v.v_date AND p.p_date <= v.w_end_date
      |GROUP BY v.view_id
      |ORDER BY v.view_id""".stripMargin

  /** q155: UNCONVERTED views — views with NO purchase by the same user
    * within the 3 days after them, as a plain `left_anti` range join.
    * Same lookback spelling as q153 (views are the point side, on the
    * left — the only orientation where semi/anti can band: the banded
    * match SET equals the naive one, so "no match exists" is preserved
    * verbatim). This is the J1/J2 anti-join family
    * (service_refresh.go:82-88) with a time window instead of an
    * equality — the decontamination-window shape. */
  def q155AntiJoinAuto(spark: SparkSession, d: String): DataFrame = {
    import spark.implicits._
    val e = Tables.events(spark, d)
    val views = e.where($"event_type" === "view")
      .select($"user_id", $"event_id".as("view_id"), $"ts".as("v_ts"))
    val purchases = e.where($"event_type" === "purchase")
      .select($"user_id".as("p_user_id"), $"ts".as("p_ts"))
    views.join(purchases,
        views("user_id") === purchases("p_user_id") &&
          views("v_ts") >= purchases("p_ts") - expr("INTERVAL 3 DAY") &&
          views("v_ts") <= purchases("p_ts"),
        "left_anti")
      .select($"view_id", $"user_id", $"v_ts")
      .orderBy($"view_id")
  }

  val q155Sql: String =
    """WITH e AS (
      |  SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts, event_type
      |  FROM events
      |), v AS (
      |  SELECT user_id, event_id AS view_id, ts AS v_ts
      |  FROM e WHERE event_type = 'view'
      |), p AS (
      |  SELECT user_id, ts AS p_ts FROM e WHERE event_type = 'purchase'
      |)
      |SELECT v.view_id, v.user_id, v.v_ts
      |FROM v
      |WHERE NOT EXISTS (
      |  SELECT 1 FROM p WHERE p.user_id = v.user_id
      |    AND v.v_ts >= p.p_ts - INTERVAL 3 DAY AND v.v_ts <= p.p_ts)
      |ORDER BY v.view_id""".stripMargin

  val q63Sql: String =
    """WITH e AS (
      |  SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts, event_type, value
      |  FROM events
      |), v AS (
      |  SELECT user_id, event_id AS view_id, ts AS w_start,
      |         ts + INTERVAL 3 DAY AS w_end FROM e WHERE event_type = 'view'
      |), p AS (
      |  SELECT event_id, user_id, ts, value FROM e WHERE event_type = 'purchase'
      |)
      |SELECT p.user_id, count(*) AS n_pairs,
      |       count(DISTINCT v.view_id) AS n_views,
      |       count(DISTINCT p.event_id) AS n_purchases,
      |       CAST(sum(CAST(p.value AS DECIMAL(18,2))) AS DOUBLE) AS attributed_value
      |FROM p JOIN v ON p.user_id = v.user_id
      |   AND p.ts >= v.w_start AND p.ts <= v.w_end
      |GROUP BY p.user_id
      |ORDER BY p.user_id""".stripMargin
}
