package graft.meta

import java.time.{Instant, ZoneOffset, ZonedDateTime}

/** Standard 5-field cron schedule (minute hour dom month dow), UTC —
  * the reference's scheduler surface (scheduler_cron.go:12-50; refresh
  * default `0 * * * *`, maintenance default `0 2 * * *`,
  * config.dist.yml:41,49).
  *
  * Supported syntax per field: `*`, `n`, `a-b`, lists `a,b,c`, steps
  * `*&#47;n` and `a-b/n`. Day-of-week 0-7 with both 0 and 7 = Sunday.
  * Standard cron OR-rule: when both day-of-month and day-of-week are
  * restricted, a day matches if either matches.
  */
final case class Cron(
    minutes: Set[Int], hours: Set[Int], dom: Set[Int], months: Set[Int],
    dow: Set[Int], domRestricted: Boolean, dowRestricted: Boolean) {

  private def dayMatches(t: ZonedDateTime): Boolean = {
    val domOk = dom.contains(t.getDayOfMonth)
    val dowOk = dow.contains(t.getDayOfWeek.getValue % 7) // java MON=1..SUN=7 → cron SUN=0
    // The starBit only switches the dom/dow COMBINATION to OR when both
    // are explicitly restricted; membership is always tested — a
    // star-headed step like `*/2` still only matches its stepped days
    // (its set is {1,3,…}, and a plain `*`'s set is the full range, so
    // the AND is vacuous there).
    if (domRestricted && dowRestricted) domOk || dowOk
    else domOk && dowOk
  }

  def matches(at: Instant): Boolean = {
    val t = at.atZone(ZoneOffset.UTC)
    minutes.contains(t.getMinute) && hours.contains(t.getHour) &&
      months.contains(t.getMonthValue) && dayMatches(t)
  }

  /** Next fire time strictly after `from` (minute granularity, UTC).
    * Skips by day/hour where possible; bails at 5 years (unsatisfiable
    * specs like Feb 30). */
  def next(from: Instant): Option[Instant] = {
    var t = from.atZone(ZoneOffset.UTC)
      .withSecond(0).withNano(0).plusMinutes(1)
    val limit = t.plusYears(5)
    while (t.isBefore(limit)) {
      if (!months.contains(t.getMonthValue))
        t = t.plusMonths(1).withDayOfMonth(1).withHour(0).withMinute(0)
      else if (!dayMatches(t))
        t = t.plusDays(1).withHour(0).withMinute(0)
      else if (!hours.contains(t.getHour))
        t = t.plusHours(1).withMinute(0)
      else if (!minutes.contains(t.getMinute))
        t = t.plusMinutes(1)
      else
        return Some(t.toInstant)
    }
    None
  }
}

object Cron {

  /** Parse a 5-field cron spec; Left(error) on malformed input
    * (scheduler_cron.go:14-21). */
  def parse(spec: String): Either[String, Cron] = {
    val fields = spec.trim.split("\\s+")
    if (fields.length != 5)
      return Left(s"invalid 5-field cron expression \"$spec\"")
    for {
      mins <- field(fields(0), 0, 59)
      hrs <- field(fields(1), 0, 23)
      dm <- field(fields(2), 1, 31)
      mon <- field(fields(3), 1, 12)
      dw <- field(fields(4), 0, 7).map(_.map(d => if (d == 7) 0 else d))
    } yield Cron(mins, hrs, dm, mon, dw,
      domRestricted = restricted(fields(2)),
      dowRestricted = restricted(fields(4)))
  }

  /** Vixie/robfig starBit semantics: any `*`-headed range (`*`, `*&#47;2`)
    * leaves the field unrestricted for the dom/dow OR-rule — only
    * explicit values/ranges restrict it. */
  private def restricted(f: String): Boolean =
    !f.split(",").exists(_.startsWith("*"))

  private def field(s: String, lo: Int, hi: Int): Either[String, Set[Int]] = {
    def one(part: String): Either[String, Seq[Int]] = {
      val (rangePart, step) = part.split("/") match {
        case Array(r) => (r, 1)
        case Array(r, st) =>
          st.toIntOption match {
            case Some(v) if v >= 1 => (r, v)
            case _ => return Left(s"bad step in \"$part\"")
          }
        case _ => return Left(s"bad field \"$part\"")
      }
      val bounds = rangePart match {
        case "*" => Right((lo, hi))
        case r if r.contains("-") => r.split("-") match {
          case Array(a, b) => (a.toIntOption, b.toIntOption) match {
            case (Some(x), Some(y)) if x <= y => Right((x, y))
            case _ => return Left(s"bad range \"$r\"")
          }
          case _ => return Left(s"bad range \"$r\"")
        }
        case n => n.toIntOption match {
          case Some(v) => Right((v, if (step > 1) hi else v))
          case None => return Left(s"bad value \"$n\"")
        }
      }
      bounds.map { case (a, b) =>
        if (a < lo || b > hi) return Left(s"value out of range [$lo,$hi] in \"$part\"")
        (a to b by step)
      }
    }
    val parts = s.split(",")
    val acc = Set.newBuilder[Int]
    for (p <- parts) one(p) match {
      case Right(vs) => acc ++= vs
      case Left(e) => return Left(e)
    }
    val out = acc.result()
    if (out.isEmpty) Left(s"empty field \"$s\"") else Right(out)
  }
}
