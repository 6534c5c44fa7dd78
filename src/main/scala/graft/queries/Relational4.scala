package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.ExactNumeric.money
import graft.sources.Tables

/** Round-6 relational breadth: gaps-and-islands streaks, ranking-window
  * breadth (ntile / percent_rank / cume_dist), multi-grain time rollups,
  * array higher-order functions, and exact two-variable statistics.
  * Every query keeps the cross-engine exactness rules: integer or
  * DECIMAL-summed arithmetic everywhere, doubles only from identical
  * expression trees over exact inputs.
  */
object Relational4 extends org.apache.spark.internal.Logging {

  /** q79: activity streaks (gaps-and-islands) — per user, runs of
    * consecutive active days. The classic island key is
    * `day - row_number()` over the distinct active days: constant
    * within a run of consecutive days, distinct across runs. Output is
    * per-user streak stats (longest/count/total), integers only.
    *
    * Scale shape: distinct days and the window share one shuffle on
    * user_id (the window needs no second exchange — same key), then a
    * two-level groupBy collapses islands; per-user state is bounded by
    * active days, never raw events.
    */
  def q79Streaks(spark: SparkSession, d: String): DataFrame = {
    import spark.implicits._
    val days = Tables.events(spark, d)
      .select($"user_id", to_date($"ts").as("day")).distinct()
    val w = Window.partitionBy($"user_id").orderBy($"day")
    val islands = days
      .withColumn("grp", datediff($"day", lit("1970-01-01").cast("date"))
        - row_number().over(w))
      .groupBy($"user_id", $"grp")
      .agg(count(lit(1)).as("len"))
    islands.groupBy($"user_id")
      .agg(max($"len").as("longest_streak"),
        count(lit(1)).as("n_streaks"),
        sum($"len").as("active_days"))
      .orderBy($"user_id")
  }

  val q79Sql: String =
    """WITH days AS (
      |  SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events
      |), islands AS (
      |  SELECT user_id,
      |         datediff('day', DATE '1970-01-01', day)
      |           - row_number() OVER (PARTITION BY user_id ORDER BY day) AS grp
      |  FROM days
      |), runs AS (
      |  SELECT user_id, grp, count(*) AS len FROM islands GROUP BY 1, 2
      |)
      |SELECT user_id, max(len) AS longest_streak, count(*) AS n_streaks,
      |       CAST(sum(len) AS BIGINT) AS active_days
      |FROM runs GROUP BY user_id ORDER BY user_id""".stripMargin

  /** q80: ranking-window breadth — quartile (ntile), percent_rank and
    * cume_dist of every customer's balance within its market segment.
    * percent_rank = (rank-1)/(n-1) and cume_dist = rows≤current/n are
    * integer ratios evaluated as one double division in both engines —
    * bit-exact. Balances are cast to DECIMAL so ordering ties resolve
    * identically. One shuffle on the segment; per-group sort is the
    * whole cost.
    */
  def q80RankWindows(spark: SparkSession, d: String): DataFrame = {
    import spark.implicits._
    val w = Window.partitionBy($"c_mktsegment")
      .orderBy(money($"c_acctbal").asc, $"c_custkey".asc)
    Tables.customer(spark, d)
      .select($"c_custkey", $"c_mktsegment",
        money($"c_acctbal").as("bal"),
        ntile(4).over(w).as("quartile"),
        percent_rank().over(w).as("pct_rank"),
        cume_dist().over(w).as("cume"))
      .withColumn("bal", $"bal".cast("double"))
      .orderBy($"c_custkey")
  }

  val q80Sql: String =
    """SELECT c_custkey, c_mktsegment,
      |       CAST(CAST(c_acctbal AS DECIMAL(18,2)) AS DOUBLE) AS bal,
      |       ntile(4) OVER w AS quartile,
      |       percent_rank() OVER w AS pct_rank,
      |       cume_dist() OVER w AS cume
      |FROM customer
      |WINDOW w AS (PARTITION BY c_mktsegment
      |             ORDER BY CAST(c_acctbal AS DECIMAL(18,2)) ASC, c_custkey ASC)
      |ORDER BY c_custkey""".stripMargin

  /** q81: multi-grain time rollup — revenue by month, quarter and year
    * in one result (the admin dashboard's zoomable time axis). Each
    * grain is a date_trunc groupBy over DECIMAL-cast money; grains are
    * unioned with a literal tag. Spark computes the three grains as
    * three partial-agg passes over one scan (the month agg could feed
    * the coarser grains, but re-aggregating DECIMAL sums is exact
    * either way and keeps each branch trivially pushdown-friendly).
    */
  def q81TimeRollup(spark: SparkSession, d: String): DataFrame = {
    import spark.implicits._
    val o = Tables.orders(spark, d)
      .select($"o_orderdate", money($"o_totalprice").as("price"))
    def grain(g: String): DataFrame = o
      .groupBy(to_date(date_trunc(g, $"o_orderdate")).as("bucket"))
      .agg(sum($"price").as("rev"), count(lit(1)).as("n_orders"))
      .select(lit(g).as("grain"), $"bucket",
        $"rev".cast("double").as("revenue"), $"n_orders")
    grain("month").unionByName(grain("quarter")).unionByName(grain("year"))
      .orderBy($"grain", $"bucket")
  }

  val q81Sql: String =
    """WITH o AS (
      |  SELECT o_orderdate, CAST(o_totalprice AS DECIMAL(18,2)) AS price FROM orders
      |)
      |SELECT grain, bucket, revenue, n_orders FROM (
      |  SELECT 'month' AS grain, CAST(date_trunc('month', o_orderdate) AS DATE) AS bucket,
      |         CAST(sum(price) AS DOUBLE) AS revenue, count(*) AS n_orders
      |  FROM o GROUP BY 2
      |  UNION ALL
      |  SELECT 'quarter', CAST(date_trunc('quarter', o_orderdate) AS DATE),
      |         CAST(sum(price) AS DOUBLE), count(*)
      |  FROM o GROUP BY 2
      |  UNION ALL
      |  SELECT 'year', CAST(date_trunc('year', o_orderdate) AS DATE),
      |         CAST(sum(price) AS DOUBLE), count(*)
      |  FROM o GROUP BY 2
      |)
      |ORDER BY grain, bucket""".stripMargin

  /** q82: array higher-order functions over the embedding column —
    * per-vector component stats without ever exploding the array:
    * positive-component count (filter+size), max component and its
    * first index (array_max/array_position). All comparisons, no
    * arithmetic over floats → exact across engines (floats widen to
    * double losslessly at output). This is the codegen-friendly shape
    * for per-row vector feature extraction: one projection, no
    * shuffle, no UDF.
    */
  def q82ArrayStats(spark: SparkSession, d: String): DataFrame = {
    import spark.implicits._
    Tables.embeddings(spark, d)
      .select($"vec_id",
        size($"embedding").cast("long").as("dim"),
        size(filter($"embedding", x => x > 0f)).cast("long").as("n_pos"),
        array_max($"embedding").cast("double").as("max_val"),
        array_position($"embedding", array_max($"embedding")).as("argmax"))
      .orderBy($"vec_id")
  }

  val q82Sql: String =
    """SELECT vec_id,
      |       len(embedding) AS dim,
      |       len(list_filter(embedding, x -> x > 0)) AS n_pos,
      |       CAST(list_max(embedding) AS DOUBLE) AS max_val,
      |       CAST(list_position(embedding, list_max(embedding)) AS BIGINT) AS argmax
      |FROM embeddings ORDER BY vec_id""".stripMargin

  /** q88: per-group mode — the most frequent quantity per return flag
    * with a deterministic smallest-value tiebreak. Two-level
    * aggregation: count per (group, value) — partial-agg friendly, the
    * per-group value histogram is the only shuffled state — then a
    * bounded rank. The anti-pattern is collecting each group's values
    * into one task (collect_list / global sort); this shape never holds
    * more than the distinct-value histogram.
    */
  def q88Mode(spark: SparkSession, d: String): DataFrame = {
    import spark.implicits._
    val counts = Tables.lineitem(spark, d)
      .groupBy($"l_returnflag", money($"l_quantity").as("qty"))
      .agg(count(lit(1)).as("n"))
    val w = Window.partitionBy($"l_returnflag").orderBy($"n".desc, $"qty".asc)
    counts.withColumn("rnk", row_number().over(w))
      .where($"rnk" === 1)
      .select($"l_returnflag", $"qty".cast("double").as("mode_qty"), $"n")
      .orderBy($"l_returnflag")
  }

  val q88Sql: String =
    """WITH counts AS (
      |  SELECT l_returnflag, CAST(l_quantity AS DECIMAL(18,2)) AS qty, count(*) AS n
      |  FROM lineitem GROUP BY 1, 2
      |), ranked AS (
      |  SELECT l_returnflag, qty, n,
      |         row_number() OVER (PARTITION BY l_returnflag
      |                            ORDER BY n DESC, qty ASC) AS rnk
      |  FROM counts
      |)
      |SELECT l_returnflag, CAST(qty AS DOUBLE) AS mode_qty, n
      |FROM ranked WHERE rnk = 1 ORDER BY l_returnflag""".stripMargin

  /** q89: market-basket co-occurrence — the top part pairs bought
    * together in one order. Baskets self-join on the order key AFTER a
    * frequency prune (parts in ≥ minCount orders; same predicate on
    * both engines, so the oracle still matches exactly): the prune
    * bounds the quadratic per-basket blowup by basket size × frequent
    * items, the standard a-priori trick. Pair counts then rank with a
    * bounded top-k, ties broken on the pair.
    *
    * The registered form routes through [[coOccurrenceCapped]] with a
    * 64-item basket cap — the skew guard is ON in the harness plan, not
    * a spec-only sibling. The cap provably clears this data (largest
    * pruned basket: 11/13/17 at sf0.001/0.01/0.1), so the uncapped
    * oracle SQL still hash-matches exactly; a mega-basket in production
    * data degrades to top-support truncation instead of a C(n,2)
    * explosion.
    */
  def q89CoOccurrence(spark: SparkSession, d: String, minCount: Int = 3,
      topK: Int = 20): DataFrame = {
    import spark.implicits._
    val items = Tables.lineitem(spark, d)
      .select($"l_orderkey", $"l_partkey")
    coOccurrenceCapped(items, minCount, topK, maxBasketItems = 64)
  }

  /** Production co-occurrence with a SKEW GUARD: the a-priori prune
    * bounds pair blowup for normal baskets, but a single mega-basket
    * (one order holding 10k frequent items) still self-joins into a
    * 50M-pair row. Here each basket keeps at most `maxBasketItems`
    * items — the HIGHEST-support ones, so the dropped tail is the
    * least-frequent items whose pairs are least able to reach the
    * global top-k — making the per-basket pair cost ≤ C(cap, 2)
    * regardless of input skew. With a cap at or above the largest
    * basket this equals [[q89CoOccurrence]] exactly (spec-checked);
    * q89 itself stays the uncapped oracle query. Dropped volume is
    * surfaced through `logDropped(droppedItems, truncatedBaskets)` —
    * a one-row control-plane agg, so capping is never silent; pass
    * None to skip that extra pass when the caller only wants the lazy
    * result frame (the registered q89 does — its audit is the spec).
    *
    * The ranking's basket-key shuffle is the same key the pair join
    * shuffles on; the added cost is a per-basket sort, itself bounded
    * by the mega-basket this guard exists for. */
  def coOccurrenceCapped(items0: DataFrame, minCount: Int, topK: Int,
      maxBasketItems: Int,
      logDropped: Option[(Long, Long) => Unit] = None,
      supportByWindow: Option[Boolean] = None,
      hotKeyRowLimit: Long = 10000000L): DataFrame = {
    val spark = items0.sparkSession
    import spark.implicits._
    // NULL item keys dropped explicitly: the previous inner join-back
    // on l_partkey (and the oracle's JOIN USING) discarded them, but a
    // window PARTITION BY counts the NULL group — a NULL item would
    // earn support, pass the prune, and evict a real item at the
    // basket cap.
    // Optimization r17 (guide §2.4: two operations keyed the same way
    // share one exchange): hash-partition by the ITEM key up front, so
    // the (basket, item) distinct — whose ClusteredDistribution a
    // subset partitioning satisfies — and the support window both run
    // on this single exchange. The previous spelling paid a
    // hashpartitioning(l_orderkey, l_partkey) exchange for the distinct
    // and a second full-row hashpartitioning(l_partkey) exchange for
    // the window right after (4 exchanges total -> 3).
    val items = items0.toDF("l_orderkey", "l_partkey")
      .where($"l_partkey".isNotNull)
      .repartition($"l_partkey")
      .distinct()
    // Support via a COUNT WINDOW on the item key, not a groupBy +
    // join-back: the join-back form computed the distinct-items lineage
    // TWICE (once per join side — ReusedExchange does not fire here)
    // and paid the join exchange on top; the window is the same one
    // partkey shuffle the aggregation needed, applied in place. The
    // a-priori prune stays identical: rows whose item appears in fewer
    // than minCount baskets drop before the ranking window.
    //
    // SKEW BOUND (supportByWindow): the unbounded window buffers ALL
    // rows of one item key in a single task — fine while the hottest
    // item's basket count fits a task (millions of rows; it spills, not
    // breaks), but a planet-scale hot key serializes there where the
    // groupBy+join form pre-aggregates map-side. supportByWindow =
    // Some(false) selects that form: same rows out (CoOccurrenceSpec
    // pins it), one extra exchange, per-key state bounded at one
    // counter. The DEFAULT (None) enforces the posture itself: a cheap
    // key profile (JoinAdvisor's max_key_rows shape — the max over the
    // SAME support aggregate the groupBy branch joins with, LRU-cached
    // per input plan so bench reruns pay it once) picks the window form
    // only while the hottest item stays under `hotKeyRowLimit` baskets
    // (~10M: the point where one window task's buffered state stops
    // being a spill inconvenience and starts serializing the stage).
    // Two contract notes: (1) the profile is an EAGER one-row job at
    // DataFrame-construction time — the price of a data-dependent plan
    // decision; (2) like every PlanCache in the engine, the cached
    // verdict keys on the canonicalized input plan, NOT the data under
    // it — after regenerating data in place, PlanCache.clearAll() is
    // the documented reset (util/PlanCache.scala).
    val supportAgg =
      items.groupBy($"l_partkey").agg(count(lit(1)).as("support"))
    // Logged (ADVICE r12): the construction-time profile job and the
    // chosen form must be OBSERVABLE, not only documented — a stale
    // cached verdict after in-place data regeneration otherwise looks
    // identical to a fresh decision.
    val byWindow = supportByWindow.getOrElse {
      val hottest = maxItemKeyRows(items, supportAgg)
      val chosen = hottest <= hotKeyRowLimit
      logInfo(s"co-occurrence skew gate: hottest item key has $hottest " +
        s"baskets (limit $hotKeyRowLimit) -> " +
        (if (chosen) "window" else "groupBy+join") + " support form " +
        "(verdict LRU-cached per input plan; PlanCache.clearAll() resets)")
      chosen
    }
    val pruned =
      if (byWindow)
        items.withColumn("support",
            count(lit(1)).over(Window.partitionBy($"l_partkey")))
          .where($"support" >= minCount)
      else
        items.join(supportAgg.where($"support" >= minCount), Seq("l_partkey"))
    val ranked = pruned
      .withColumn("rk", row_number().over(
        Window.partitionBy($"l_orderkey")
          .orderBy($"support".desc, $"l_partkey".asc)))
    logDropped.foreach { log =>
      val dropped = ranked.where($"rk" > maxBasketItems)
        .agg(count(lit(1)).as("items"),
          countDistinct($"l_orderkey").as("baskets"))
        .collect().head
      log(dropped.getLong(0), dropped.getLong(1))
    }
    val kept = ranked.where($"rk" <= maxBasketItems)
      .select($"l_orderkey", $"l_partkey")
    // Pair generation is ROW-LOCAL: collect each (capped) basket into a
    // sorted array and emit its C(n,2) ordered pairs with nested
    // higher-order transforms. The previous self-join on l_orderkey
    // recomputed the whole distinct→support→window lineage for each
    // side (Spark's exchange reuse doesn't fire across the a/b alias
    // asymmetry — measured 12 exchanges); the basket groupBy keys on
    // the SAME column the ranking window partitioned by, so this adds
    // zero exchanges, and the cap bounds per-row pair fan-out.
    val baskets = kept.groupBy($"l_orderkey")
      .agg(sort_array(collect_list($"l_partkey")).as("ps"))
    val pairsCol = flatten(transform($"ps", (a, i) =>
      transform(slice($"ps", i + 2, greatest(size($"ps"), lit(1))),
        b => struct(a.as("part_a"), b.as("part_b")))))
    baskets.select(explode(pairsCol).as("p"))
      .select($"p.part_a", $"p.part_b")
      .groupBy($"part_a", $"part_b")
      .agg(count(lit(1)).as("n_together"))
      .orderBy($"n_together".desc, $"part_a".asc, $"part_b".asc)
      .limit(topK)
  }

  /** Hottest-item basket count of a cleaned items frame — the skew
    * gate's key profile. LRU-cached by canonicalized input plan: the
    * bench and Verify run q89 repeatedly over the same source. An empty
    * frame profiles to 0 (max over nothing is NULL). */
  private val keyProfileCache =
    new graft.util.PlanCache[org.apache.spark.sql.catalyst.plans.logical.LogicalPlan,
      java.lang.Long](maxEntries = 8, onEvict = _ => ())
  private def maxItemKeyRows(items: DataFrame, supportAgg: DataFrame): Long = {
    val spark = items.sparkSession
    import spark.implicits._
    keyProfileCache.getOrElseUpdate(items.queryExecution.analyzed.canonicalized) {
      logInfo("co-occurrence skew gate: running the eager one-row key-profile " +
        "job now (cache miss for this input plan)")
      val r = supportAgg.agg(max($"support")).collect().head
      java.lang.Long.valueOf(if (r.isNullAt(0)) 0L else r.getLong(0))
    }.longValue()
  }

  def q89Sql(minCount: Int, topK: Int): String =
    s"""WITH items AS (
       |  SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
       |), frequent AS (
       |  SELECT l_partkey FROM items GROUP BY 1 HAVING count(*) >= $minCount
       |), pruned AS (
       |  SELECT i.l_orderkey, i.l_partkey FROM items i JOIN frequent USING (l_partkey)
       |)
       |SELECT a.l_partkey AS part_a, b.l_partkey AS part_b, count(*) AS n_together
       |FROM pruned a JOIN pruned b
       |  ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
       |GROUP BY 1, 2
       |ORDER BY n_together DESC, part_a ASC, part_b ASC
       |LIMIT $topK""".stripMargin

  /** q90: SCD2 interval build — turn an event log into
    * validity-interval dimension rows: per (user, attribute stream),
    * each event's value is valid from its timestamp until the next
    * event (NULL = still current). One window pass per key, the
    * warehouse "slowly changing dimension type 2" load. Row-count
    * equals the event count — no state beyond the per-key sort.
    */
  def q90Scd2(spark: SparkSession, d: String): DataFrame = {
    import spark.implicits._
    val w = Window.partitionBy($"user_id").orderBy($"ts".asc, $"event_id".asc)
    Tables.events(spark, d)
      .where($"event_type" === "signup" || $"event_type" === "purchase")
      .select($"user_id", $"event_id", $"event_type", $"ts")
      .withColumn("valid_from", $"ts")
      .withColumn("valid_to", lead($"ts", 1).over(w))
      .withColumn("is_current", $"valid_to".isNull)
      .select($"user_id", $"event_id", $"event_type",
        $"valid_from", $"valid_to", $"is_current")
      .orderBy($"user_id", $"valid_from", $"event_id")
  }

  val q90Sql: String =
    """SELECT user_id, event_id, event_type,
      |       ts AS valid_from,
      |       lead(ts, 1) OVER w AS valid_to,
      |       (lead(ts, 1) OVER w IS NULL) AS is_current
      |FROM (SELECT user_id, event_id, event_type, CAST(ts AS TIMESTAMP) AS ts
      |      FROM events WHERE event_type IN ('signup', 'purchase'))
      |WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)
      |ORDER BY user_id, valid_from, event_id""".stripMargin

  /** q91: rolling 7-day distinct active users per day (the WAU curve).
    * COUNT(DISTINCT) over a sliding window isn't a window function in
    * any engine; the scalable exact form explodes each (user, day)
    * observation onto the ≤7 report days it contributes to — a bounded
    * ×7 expansion of the already-deduplicated user-day grid — then one
    * distinct-count per report day. Report days are clamped to the
    * observed range so the curve has no synthetic lead-in. Shuffle
    * volume is 7×|user-days|, never events; distinct state is per-day
    * user sets, the same cost the direct query would pay.
    */
  def q91RollingDau(spark: SparkSession, d: String): DataFrame = {
    import spark.implicits._
    val days = Tables.events(spark, d)
      .select($"user_id", to_date($"ts").as("day")).distinct()
    // one 1-row agg job at plan time, like the mixture-sampler's rate
    // map: the clamp bound is a scalar, not a per-row join
    Option(days.agg(max($"day")).head().getDate(0)) match {
      case None =>
        // empty events: degrade to an empty frame like the sibling queries
        days.select($"day".as("report_day"),
          lit(0L).as("wau"), lit(0L).as("active_user_days")).limit(0)
      case Some(maxDay) =>
        days
          .select($"user_id",
            explode(sequence($"day", least(date_add($"day", 6), lit(maxDay))))
              .as("report_day"))
          .groupBy($"report_day")
          .agg(countDistinct($"user_id").as("wau"),
            count(lit(1)).as("active_user_days"))
          .orderBy($"report_day")
    }
  }

  val q91Sql: String =
    """WITH days AS (
      |  SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events
      |), bounds AS (
      |  SELECT max(day) AS max_day FROM days
      |), contrib AS (
      |  SELECT d.user_id, g.report_day
      |  FROM days d, bounds b,
      |       unnest(generate_series(d.day, least(d.day + 6, b.max_day),
      |                              INTERVAL 1 DAY)) AS g(report_day)
      |)
      |SELECT CAST(report_day AS DATE) AS report_day,
      |       count(DISTINCT user_id) AS wau,
      |       count(*) AS active_user_days
      |FROM contrib GROUP BY 1 ORDER BY 1""".stripMargin

  /** q86: exact two-variable statistics — Pearson correlation and
    * sample stddev of (quantity, extendedprice) per return flag, in the
    * engineered-exact form. The inputs are scaled to integer CENTS
    * (DECIMAL(18,2) × 100 → exact), every power sum accumulates as a
    * scale-0 DECIMAL (order-independent, exact, and — the crux — its
    * CAST to DOUBLE is a SINGLE rounding in both engines; a scale-4
    * decimal would double-round in DuckDB, int128→double then /10⁴,
    * drifting an ulp from Spark's correctly-rounded BigDecimal path).
    * The final combination is one identical IEEE expression tree per
    * output: corr is scale-invariant, stddevs divide the cent scale
    * back out. Never the built-in corr()/stddev(), whose float
    * accumulation order differs per engine/partitioning.
    */
  def q86ExactCorr(spark: SparkSession, d: String): DataFrame = {
    import spark.implicits._
    val l = Tables.lineitem(spark, d).select($"l_returnflag",
      (money($"l_quantity") * 100).cast("long").as("x"),
      (money($"l_extendedprice") * 100).cast("long").as("y"))
    val big = (c: org.apache.spark.sql.Column) => c.cast("decimal(38,0)")
    val sums = l.groupBy($"l_returnflag").agg(
      count(lit(1)).as("n"),
      sum(big($"x")).as("sx"), sum(big($"y")).as("sy"),
      sum(big($"x" * $"x")).as("sxx"), sum(big($"y" * $"y")).as("syy"),
      sum(big($"x" * $"y")).as("sxy"))
    // double-domain combination; operand order mirrored in the SQL
    val n = $"n".cast("double"); val sx = $"sx".cast("double")
    val sy = $"sy".cast("double"); val sxx = $"sxx".cast("double")
    val syy = $"syy".cast("double"); val sxy = $"sxy".cast("double")
    sums.select($"l_returnflag", $"n",
        ((n * sxy - sx * sy)
          / (sqrt(n * sxx - sx * sx) * sqrt(n * syy - sy * sy))).as("corr_xy"),
        (sqrt((n * sxx - sx * sx) / (n * (n - lit(1.0)))) / lit(100.0)).as("stddev_x"),
        (sqrt((n * syy - sy * sy) / (n * (n - lit(1.0)))) / lit(100.0)).as("stddev_y"))
      .orderBy($"l_returnflag")
  }

  val q86Sql: String =
    """WITH s AS (
      |  SELECT l_returnflag, count(*) AS n,
      |         sum(CAST(x AS DECIMAL(38,0))) AS sx, sum(CAST(y AS DECIMAL(38,0))) AS sy,
      |         sum(CAST(x*x AS DECIMAL(38,0))) AS sxx, sum(CAST(y*y AS DECIMAL(38,0))) AS syy,
      |         sum(CAST(x*y AS DECIMAL(38,0))) AS sxy
      |  FROM (SELECT l_returnflag,
      |               CAST(CAST(l_quantity AS DECIMAL(18,2)) * 100 AS BIGINT) AS x,
      |               CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS y
      |        FROM lineitem)
      |  GROUP BY 1
      |)
      |SELECT l_returnflag, n,
      |       (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
      |         / (sqrt(CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
      |            * sqrt(CAST(n AS DOUBLE) * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))) AS corr_xy,
      |       sqrt((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
      |            / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0))) / 100.0 AS stddev_x,
      |       sqrt((CAST(n AS DOUBLE) * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))
      |            / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0))) / 100.0 AS stddev_y
      |FROM s ORDER BY l_returnflag""".stripMargin

  /** q120: TPC-H Q21-shaped blame attribution — suppliers who were the
    * SOLE late shipper in multi-supplier orders ("late" = shipped more
    * than 90 days after the order date; this schema carries no commit/
    * receipt dates). Exercises the EXISTS + NOT-EXISTS double
    * correlation: another supplier participated in the order, AND no
    * other supplier was late in it.
    *
    * Plan shape: the two correlations become a left_semi and a
    * left_anti join on l_orderkey with a supplier-inequality residual —
    * never a per-row subquery re-scan. All three joins shuffle on the
    * same order key; the final count is a low-cardinality supplier
    * aggregate with a bounded top-k. */
  def q120SoleLateSupplier(spark: SparkSession, d: String,
      topK: Int = 20): DataFrame = {
    import spark.implicits._
    // Optimization r17 (guide §2.4/§1.2): the original spelling ran the
    // EXISTS as a semi join against the distinct (order, supplier) pairs
    // and the NOT EXISTS as an anti join against a second copy of the
    // `late` lineage — three evaluations of the lineitem scan and two
    // inequality-residual join stages. Both quantifiers are per-ORDER
    // counting facts, so aggregate once per order instead:
    //   EXISTS other supplier on the order      <=> n_supp  >= 2
    //   NOT EXISTS other LATE supplier          <=> n_late  == 1
    // (l1 itself is a member of both sets, so the inequality-qualified
    // quantifiers reduce exactly to these counts; NULL suppkeys never
    // satisfy `<>` in the original, so they are filtered up front). The
    // sole late supplier of a qualifying order is then the single
    // max(l_suppkey) the aggregate already holds — no join back to the
    // pair set at all. Plan: 3 lineitem passes + SMJ semi + SMJ anti
    // -> 2 lineitem passes + one join of two order-grain aggregates.
    val l = Tables.lineitem(spark, d)
      .where($"l_suppkey".isNotNull)
      .select($"l_orderkey", $"l_suppkey", $"l_shipdate")
    val o = Tables.orders(spark, d)
      .select($"o_orderkey".as("l_orderkey"), $"o_orderdate")
    val late = l.join(o, "l_orderkey")
      .where(datediff($"l_shipdate", $"o_orderdate") > 90)
      .select($"l_orderkey", $"l_suppkey").distinct()
    val soleLate = late.groupBy($"l_orderkey")
      .agg(count(lit(1)).as("n_late"), max($"l_suppkey").as("l_suppkey"))
      .where($"n_late" === 1)
    val multiSupp = l.select($"l_orderkey", $"l_suppkey").distinct()
      .groupBy($"l_orderkey").agg(count(lit(1)).as("n_supp"))
      .where($"n_supp" >= 2)
    soleLate.join(multiSupp, "l_orderkey")
      .join(Tables.supplier(spark, d), $"l_suppkey" === $"s_suppkey")
      .groupBy($"s_suppkey", $"s_name")
      .agg(count(lit(1)).as("n_sole_late"))
      .orderBy($"n_sole_late".desc, $"s_suppkey".asc)
      .limit(topK)
  }

  val q120Sql: String =
    """WITH late AS (
      |  SELECT DISTINCT l.l_orderkey, l.l_suppkey
      |  FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
      |  WHERE date_diff('day', o.o_orderdate, l.l_shipdate) > 90
      |)
      |SELECT s.s_suppkey, s.s_name, count(*) AS n_sole_late
      |FROM late l1
      |JOIN supplier s ON s.s_suppkey = l1.l_suppkey
      |WHERE EXISTS (
      |  SELECT 1 FROM (SELECT DISTINCT l_orderkey, l_suppkey FROM lineitem) l2
      |  WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey)
      |AND NOT EXISTS (
      |  SELECT 1 FROM late l3
      |  WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey)
      |GROUP BY 1, 2
      |ORDER BY n_sole_late DESC, s_suppkey ASC
      |LIMIT 20""".stripMargin

  /** q132: TPC-H Q22 shape (global-market opportunity) adapted to this
    * schema — per nation, the idle high-balance customers: account
    * balance above the average POSITIVE balance, and no orders at all.
    * Exercises the Q22 trio: a corpus-wide scalar aggregate feeding a
    * per-row predicate, an anti-join against the fact table, and a
    * small-dim rollup.
    *
    * "Idle" = no orders SINCE the cutoff (every synthetic customer has
    * SOME order, so Q22's no-orders-ever form would be vacuously
    * empty; lapsed-since is the same anti-join with a pushed-down date
    * predicate on the fact side). Float discipline: balances become
    * integer CENTS and the above-average test is cross-multiplied
    * (`cents·n_pos > total_pos`) — the q38 exact-average trick, so no
    * engine ever divides. Scale: the scalar aggregate is one
    * partial-agg row cross-joined back (broadcast, no driver collect);
    * the anti-join shuffles on custkey; nation is a broadcast dim. */
  def q132IdleRich(spark: SparkSession, d: String,
      cutoff: String = "1999-01-01"): DataFrame = {
    import spark.implicits._
    val cust = Tables.customer(spark, d)
      .select($"c_custkey", $"c_nationkey",
        (money($"c_acctbal") * 100).cast("long").as("cents"))
    val thresh = cust.where($"cents" > 0)
      .agg(count(lit(1)).as("npos"), sum($"cents").as("totpos"))
    val recent = Tables.orders(spark, d)
      .where($"o_orderdate" >= lit(cutoff).cast("date"))
      .select($"o_custkey")
    val idle = cust.join(recent, $"c_custkey" === $"o_custkey", "left_anti")
    idle.crossJoin(broadcast(thresh))
      .where($"cents" * $"npos" > $"totpos")
      .join(broadcast(Tables.nation(spark, d).select($"n_nationkey", $"n_name")),
        $"c_nationkey" === $"n_nationkey")
      .groupBy($"n_name".as("nation"))
      .agg(count(lit(1)).as("n_custs"), sum($"cents").as("total_bal_cents"))
      .orderBy($"nation")
  }

  val q132Sql: String =
    """WITH cust AS (
      |  SELECT c_custkey, c_nationkey,
      |         CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
      |  FROM customer
      |), pos AS (
      |  SELECT count(*) AS npos, sum(cents) AS totpos FROM cust WHERE cents > 0
      |), idle AS (
      |  SELECT c.* FROM cust c
      |  WHERE NOT EXISTS (SELECT 1 FROM orders o
      |                    WHERE o.o_custkey = c.c_custkey
      |                    AND o.o_orderdate >= DATE '1999-01-01')
      |)
      |SELECT n.n_name AS nation, count(*) AS n_custs,
      |       CAST(sum(i.cents) AS BIGINT) AS total_bal_cents
      |FROM idle i CROSS JOIN pos p
      |JOIN nation n ON n.n_nationkey = i.c_nationkey
      |WHERE i.cents * p.npos > p.totpos
      |GROUP BY 1 ORDER BY nation""".stripMargin
}
