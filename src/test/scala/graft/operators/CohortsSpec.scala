package graft.operators

import java.sql.Timestamp

import graft.SparkSpec

class CohortsSpec extends SparkSpec {

  private def collected = {
    import spark.implicits._
    graft.sources.Tables.events(spark, sfDir)
      .select($"user_id", $"event_type", $"ts").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getTimestamp(2)))
  }

  test("q71 cohort matrix equals a driver-side reference") {
    val ev = collected
    val toDay = (t: Timestamp) => t.toLocalDateTime.toLocalDate
    val firstDay = ev.groupBy(_._1).map { case (u, rows) => u -> rows.map(r => toDay(r._3)).min }
    val cohort = firstDay.map { case (u, d) =>
      u -> d.minusDays((d.getDayOfWeek.getValue - 1).toLong) // Monday truncation
    }
    val expected = ev
      .map { case (u, _, t) =>
        val day = toDay(t)
        val cw = cohort(u)
        ((cw, java.time.temporal.ChronoUnit.DAYS.between(cw, day) / 7), u)
      }
      .groupBy(_._1)
      .map { case (cell, rows) => cell -> (rows.map(_._2).distinct.length, rows.length) }

    val got = Cohorts.q71CohortRetention(spark, sfDir).collect().map { r =>
      (r.getDate(0).toLocalDate, r.getInt(1).toLong) -> (r.getLong(2).toInt, r.getLong(3).toInt)
    }.toMap
    assert(got.size == expected.size)
    expected.foreach { case (cell, v) => assert(got(cell) == v, s"cell $cell") }
    // retention never exceeds week-0 cohort size
    val week0 = got.collect { case ((cw, 0L), (users, _)) => cw -> users }
    got.foreach { case ((cw, _), (users, _)) => assert(users <= week0(cw)) }
  }

  test("q72 funnel equals a strict-order reference and is monotone") {
    val ev = collected
    val byUser = ev.groupBy(_._1)
    def after(t: String, gate: Map[Long, Timestamp]): Map[Long, Timestamp] =
      byUser.flatMap { case (u, rows) =>
        val g = gate.get(u)
        val ts = rows.collect {
          case (_, et, x) if et == t && (gate.isEmpty || (g.isDefined && x.after(g.get))) => x
        }
        if ((gate.isEmpty || g.isDefined) && ts.nonEmpty) Some(u -> ts.min) else None
      }
    val s1 = after("view", Map.empty)
    val s2 = after("click", s1)
    val s3 = after("purchase", s2)

    val got = Cohorts.q72Funnel(spark, sfDir).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == Map("1_view" -> s1.size.toLong, "2_click" -> s2.size.toLong,
      "3_purchase" -> s3.size.toLong))
    assert(got("1_view") >= got("2_click") && got("2_click") >= got("3_purchase"))
    assert(got("1_view") > 0)
  }
}
