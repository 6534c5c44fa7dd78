package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Behavioral analytics over the event stream: weekly cohort retention
  * and step-ordered conversion funnels. The product-analytics queries a
  * lakehouse admin runs over its own event telemetry (and the shapes a
  * training-data pipeline reuses for user-level corpus slicing).
  *
  * All outputs are integer counts and dates — no float drift, fully
  * oracle-checkable.
  */
object Cohorts {

  /** q71: weekly cohort retention matrix. A user's cohort is the ISO
    * week (Monday-truncated) of their first event; each (cohort_week,
    * weeks_since) cell counts the distinct cohort users active that many
    * whole weeks later, plus their event volume.
    *
    * Scale shape: one groupBy(user_id) for first-seen (map-side partial
    * min), one shuffle join back on user_id (co-partitioned with the
    * agg's output; AQE broadcasts the first-seen side while it stays
    * small), one groupBy on the ~|cohorts|×|weeks| cell grid.
    * `weeks_since` is day-difference integer-div-7 on both engines —
    * never a week-truncation subtraction, which would count calendar
    * boundaries instead of elapsed weeks.
    */
  def q71CohortRetention(spark: SparkSession, d: String): DataFrame = {
    import spark.implicits._
    val ev = Tables.events(spark, d).select($"user_id", to_date($"ts").as("day"))
    val first = ev.groupBy($"user_id")
      .agg(min($"day").as("first_day"))
      .select($"user_id", to_date(date_trunc("week", $"first_day")).as("cohort_week"))
    ev.join(first, "user_id")
      .select($"user_id", $"cohort_week",
        (datediff($"day", $"cohort_week") / lit(7)).cast("int").as("weeks_since"))
      .groupBy($"cohort_week", $"weeks_since")
      .agg(
        countDistinct($"user_id").as("active_users"),
        count(lit(1)).as("n_events"))
      .orderBy($"cohort_week", $"weeks_since")
  }

  val q71Sql: String =
    """WITH ev AS (
      |  SELECT user_id, CAST(ts AS DATE) AS day FROM events
      |), first AS (
      |  SELECT user_id, date_trunc('week', min(day)) AS cohort_week
      |  FROM ev GROUP BY user_id
      |)
      |SELECT f.cohort_week, CAST(datediff('day', f.cohort_week, e.day) // 7 AS INT) AS weeks_since,
      |       count(DISTINCT e.user_id) AS active_users, count(*) AS n_events
      |FROM ev e JOIN first f USING (user_id)
      |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  /** q72: strict-order conversion funnel view → click → purchase. A
    * user converts at step n+1 only with an event of that type STRICTLY
    * after their earliest step-n conversion time (a click at the exact
    * same timestamp as the first view does not count). Output is one
    * row per step with the surviving user count.
    *
    * Scale shape: each step is a filtered groupBy(user_id) min — three
    * shuffles on the same key, each joined to the previous step's
    * (user_id, ts) table, which only ever shrinks; AQE broadcasts it
    * once it's small. The alternative single-window formulation needs
    * the whole per-user event history sorted in one pass — this form
    * keeps per-step state at one row per surviving user.
    */
  def q72Funnel(spark: SparkSession, d: String): DataFrame = {
    import spark.implicits._
    val ev = Tables.events(spark, d).select($"user_id", $"event_type", $"ts")
    def step(evType: String, prev: Option[DataFrame]): DataFrame = {
      val base = ev.where($"event_type" === evType)
      val gated = prev match {
        case None => base
        case Some(p) => base.join(p.select($"user_id", $"t".as("prev_t")), "user_id")
          .where($"ts" > $"prev_t")
      }
      gated.groupBy($"user_id").agg(min($"ts").as("t"))
    }
    val s1 = step("view", None)
    val s2 = step("click", Some(s1))
    val s3 = step("purchase", Some(s2))
    s1.agg(count(lit(1)).as("users")).select(lit("1_view").as("step"), $"users")
      .unionByName(s2.agg(count(lit(1)).as("users")).select(lit("2_click").as("step"), $"users"))
      .unionByName(s3.agg(count(lit(1)).as("users")).select(lit("3_purchase").as("step"), $"users"))
      .orderBy($"step")
  }

  val q72Sql: String =
    """WITH s1 AS (
      |  SELECT user_id, min(ts) AS t FROM events WHERE event_type = 'view' GROUP BY user_id
      |), s2 AS (
      |  SELECT e.user_id, min(e.ts) AS t
      |  FROM events e JOIN s1 USING (user_id)
      |  WHERE e.event_type = 'click' AND e.ts > s1.t GROUP BY e.user_id
      |), s3 AS (
      |  SELECT e.user_id, min(e.ts) AS t
      |  FROM events e JOIN s2 USING (user_id)
      |  WHERE e.event_type = 'purchase' AND e.ts > s2.t GROUP BY e.user_id
      |)
      |SELECT '1_view' AS step, count(*) AS users FROM s1
      |UNION ALL SELECT '2_click', count(*) FROM s2
      |UNION ALL SELECT '3_purchase', count(*) FROM s3
      |ORDER BY step""".stripMargin
}
