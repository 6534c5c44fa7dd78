package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}

/** Streaming twin of the batch rate-anomaly detector
  * ([[graft.operators.Anomaly]]): per event type, hourly counts fold
  * into standing state and a bucket is scored the moment a LATER bucket
  * arrives (a bucket still receiving events can't be judged). The spike
  * test is the same integer formulation — `4·n > 3·med2` against the
  * trailing ≤24 finalized buckets — so closed buckets match the batch
  * operator bit-for-bit (the sessionization parity discipline; spec
  * pins it across a two-micro-batch run).
  *
  * Contract: time-ordered arrival per type at bucket granularity (same
  * caveat as sessionAssignments) — a batch may split a bucket, but once
  * a later bucket has been seen, earlier buckets are closed. The
  * contract is ENFORCED, not assumed: state tracks the newest closed
  * hour, and an event arriving for a bucket at or before it is DROPPED
  * and counted (`RateState.lateDropped`) instead of re-opening the
  * bucket — re-admitting it would emit a duplicate (type, hour) row
  * with a partial count and corrupt the trailing median with a
  * double-counted bucket, silently diverging from the batch operator.
  * State per type: the open buckets plus a 24-deep trailing window of
  * finalized counts — bounded, independent of stream length.
  */
object StreamingAnomaly {

  final case class HourCount(hour: Long, n: Long)
  final case class RateState(open: Seq[HourCount], trail: Seq[Long],
      closedThrough: Long = Long.MinValue, lateDropped: Long = 0L)
  final case class RateFlag(event_type: String, hour: java.sql.Timestamp,
      n_events: Long, med2: Option[Long], n_trail: Long, is_spike: Boolean)

  /** Integer trailing median ×2 — the exact arithmetic of the batch
    * operator's sorted-frame middles. */
  private[streaming] def med2Of(trail: Seq[Long]): Option[Long] =
    if (trail.isEmpty) None
    else {
      val s = trail.sorted
      val n = s.length
      Some(if (n % 2 == 1) s(n / 2) * 2 else s(n / 2 - 1) + s(n / 2))
    }

  def rateAnomalyStream(events: DataFrame, trailBuckets: Int = 24,
      minTrail: Int = 12): Dataset[RateFlag] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .select($"event_type",
        (unix_micros(date_trunc("hour", $"ts")) / 1000000L).cast("long").as("hour"))
      .as[(String, Long)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[RateState, RateFlag](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        case (etype, rows, state) =>
          val st = state.getOption.getOrElse(RateState(Nil, Nil))
          // fold this batch's events into per-hour counts, shedding
          // buckets already closed in an earlier micro-batch (see the
          // object doc: re-opening them would emit duplicate partial
          // rows and double-count the trail)
          val addAll = rows.foldLeft(Map.empty[Long, Long]) { case (m, (_, h)) =>
            m.updated(h, m.getOrElse(h, 0L) + 1L)
          }
          val (lateBuckets, add) = addAll.partition(_._1 <= st.closedThrough)
          val late = st.lateDropped + lateBuckets.values.sum
          val open = (st.open.map(hc => hc.hour -> hc.n).toMap.keySet ++ add.keySet)
            .toSeq.sorted.map { h =>
              HourCount(h, st.open.find(_.hour == h).map(_.n).getOrElse(0L) +
                add.getOrElse(h, 0L))
            }
          if (open.isEmpty) {
            // every row in this batch was late — record and move on
            state.update(st.copy(lateDropped = late))
            Iterator.empty
          } else {
            // every bucket strictly before the newest one is closed
            val maxHour = open.last.hour
            val (closed, stillOpen) = open.partition(_.hour < maxHour)
            var trail = st.trail
            val flags = closed.map { hc =>
              val m2 = med2Of(trail.takeRight(trailBuckets))
              val nTrail = math.min(trail.length, trailBuckets).toLong
              val spike = nTrail >= minTrail &&
                m2.exists(m => hc.n * 4 > m * 3)
              trail = trail :+ hc.n
              RateFlag(etype, new java.sql.Timestamp(hc.hour * 1000L),
                hc.n, m2, nTrail, spike)
            }
            val closedThrough = closed.lastOption.map(_.hour)
              .getOrElse(st.closedThrough)
            state.update(RateState(stillOpen, trail.takeRight(trailBuckets),
              closedThrough, late))
            flags.iterator
          }
      }
  }
}
