package graft.meta

import java.time.{DayOfWeek, Instant, LocalDate}

/** Driver-side optimize planning: range clamping by freshness delay and
  * daily/weekly/monthly chunk bucketing with dedup (SURVEY.md §2.8 F6,
  * §3.2 step 2).
  *
  * Reference behavior reproduced exactly
  * (backend/internal/service_tasks.go:190-296, 407-477; tests
  * service_tasks_test.go:10-68):
  *  - effective range = [from, min(to, now − delay truncated to UTC
  *    midnight)]; empty when from > clamped to.
  *  - week chunks start Monday ((weekday+6)%7 offset) and span 7 days;
  *    month chunks span first-of-month → +1 month −1 day; day chunks are
  *    the day itself.
  *  - each qualifying partition date maps to its chunk, chunks are clamped
  *    to the effective range and deduped preserving first-seen order.
  */
object Planner {

  final case class DateRange(from: LocalDate, to: LocalDate)

  sealed trait ChunkBy
  case object ChunkDay extends ChunkBy
  case object ChunkWeek extends ChunkBy
  case object ChunkMonth extends ChunkBy

  /** service_tasks.go:440-450: "", "day" → day; "week"; "month"; else error. */
  def normalizeChunkBy(s: String): Either[String, ChunkBy] =
    s.trim.toLowerCase match {
      case "" | "day" => Right(ChunkDay)
      case "week"     => Right(ChunkWeek)
      case "month"    => Right(ChunkMonth)
      case other      => Left(s"unsupported optimize chunking \"$other\"")
    }

  /** Latest day still optimizable: now − delay → UTC date
    * (service_iceberg.go:226-236). */
  def latestOptimizableDate(now: Instant, delayHours: Int): LocalDate =
    SmallFiles.cutoffDay(now, delayHours)

  /** service_tasks.go:407-424: clamp [from,to] upper bound to the delay
    * cutoff; None when the window is entirely too recent. */
  def rangeWithinDelay(from: LocalDate, to: LocalDate, now: Instant, delayHours: Int): Option[DateRange] = {
    val maxTo = latestOptimizableDate(now, delayHours)
    val to2 = if (to.isAfter(maxTo)) maxTo else to
    if (from.isAfter(to2)) None else Some(DateRange(from, to2))
  }

  /** service_tasks.go:426-438: intersect candidate with allowed. */
  def clampRange(candidate: DateRange, allowed: DateRange): Option[DateRange] = {
    val f = if (candidate.from.isBefore(allowed.from)) allowed.from else candidate.from
    val t = if (candidate.to.isAfter(allowed.to)) allowed.to else candidate.to
    if (f.isAfter(t)) None else Some(DateRange(f, t))
  }

  /** service_tasks.go:452-477: the chunk containing `date`. */
  def chunkForDate(date: LocalDate, chunkBy: ChunkBy): DateRange = chunkBy match {
    case ChunkDay => DateRange(date, date)
    case ChunkWeek =>
      val start = date.minusDays((date.getDayOfWeek.getValue - DayOfWeek.MONDAY.getValue).toLong)
      DateRange(start, start.plusDays(6))
    case ChunkMonth =>
      val start = date.withDayOfMonth(1)
      DateRange(start, start.plusMonths(1).minusDays(1))
  }

  /** Full planning pass (service_tasks.go:256-280): partition dates →
    * clamped, deduped chunk list in first-seen order. Input dates are the
    * needs_optimize=true partitions already filtered to the effective
    * range; output is one optimize task range per chunk. */
  def planChunks(partitionDates: Seq[LocalDate], effective: DateRange, chunkBy: ChunkBy): Seq[DateRange] = {
    val seen = scala.collection.mutable.LinkedHashSet.empty[DateRange]
    for (d <- partitionDates; c <- clampRange(chunkForDate(d, chunkBy), effective))
      seen += c
    seen.toSeq
  }
}
