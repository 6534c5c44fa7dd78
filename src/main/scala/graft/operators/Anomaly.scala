package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Event-rate anomaly detection: flag hourly buckets whose event count
  * spikes above a robust trailing baseline — the ops-monitoring query a
  * lakehouse admin runs against the ingest stream (reference dashboards
  * surface per-table activity; this is the detection form of that
  * surface: backend/internal/service_browse.go renders the counts, the
  * admin eyeballs the spike — here the engine flags it).
  *
  * Robustness & portability: the baseline is the MEDIAN of the trailing
  * 24 hourly buckets (median shrugs off previous spikes, unlike a mean),
  * and the spike test `n > 1.5 × median` is evaluated CROSS-MULTIPLIED
  * in integers — both engines interpolate an even-count median to x.5,
  * which doubles exactly in binary floats, so `med2 = 2·median` is an
  * exact integer and the test becomes `4·n > 3·med2` with no float
  * comparison anywhere near a decision boundary.
  *
  * Scale shape: ONE shuffle to the (event_type, hour) grain — bounded
  * cardinality (types × hours, not events) — then a 24-row window per
  * event_type. At 100 TB the pre-aggregation is the whole cost and it's
  * a partial-agg-friendly count; the window state is control-plane
  * sized. Buckets with fewer than `minTrail` trailing observations are
  * reported unflagged (cold-start guard).
  */
object Anomaly {

  /** Hourly counts per event_type with the trailing-median spike flag.
    * Output: (event_type, hour, n_events, med2, n_trail, is_spike) —
    * med2 is twice the trailing median (the exact-integer surrogate),
    * NULL while the trailing frame is empty. */
  def rateAnomalyOf(events: DataFrame, trailBuckets: Int = 24,
      minTrail: Int = 12): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    val hourly = events
      .groupBy($"event_type", date_trunc("hour", $"ts").as("hour"))
      .agg(count(lit(1)).as("n_events"))
    val w = Window.partitionBy($"event_type").orderBy($"hour")
      .rowsBetween(-trailBuckets, -1)
    // Spark rejects holistic `median` over a window frame, and the
    // integer formulation is stronger anyway: sort the (≤24-element)
    // trailing frame and take med2 = middle element ×2 (odd) or the SUM
    // of the two middles (even) — exactly the integer DuckDB's
    // interpolated `median·2` evaluates to, with no float anywhere.
    hourly
      .withColumn("trail", array_sort(collect_list($"n_events").over(w)))
      .withColumn("n_trail", size($"trail").cast("long"))
      .withColumn("med2", when($"n_trail" > 0,
        when($"n_trail" % 2 === 1,
          element_at($"trail", (($"n_trail" + 1) / 2).cast("int")) * 2)
        .otherwise(
          element_at($"trail", ($"n_trail" / 2).cast("int")) +
          element_at($"trail", ($"n_trail" / 2 + 1).cast("int")))))
      .withColumn("is_spike",
        $"n_trail" >= minTrail && $"n_events" * 4 > $"med2" * 3)
      .select($"event_type", $"hour", $"n_events", $"med2", $"n_trail", $"is_spike")
      .orderBy($"event_type", $"hour")
  }

  def q126RateAnomaly(spark: SparkSession, d: String): DataFrame =
    rateAnomalyOf(Tables.events(spark, d))

  val q126Sql: String =
    """WITH hourly AS (
      |  SELECT event_type, date_trunc('hour', CAST(ts AS TIMESTAMP)) AS hour,
      |         count(*) AS n_events
      |  FROM events GROUP BY 1, 2
      |)
      |SELECT event_type, hour, n_events,
      |       CAST(median(n_events) OVER w * 2 AS BIGINT) AS med2,
      |       count(*) OVER w AS n_trail,
      |       (count(*) OVER w >= 12 AND
      |        n_events * 4 > CAST(median(n_events) OVER w * 2 AS BIGINT) * 3)
      |         AS is_spike
      |FROM hourly
      |WINDOW w AS (PARTITION BY event_type ORDER BY hour
      |             ROWS BETWEEN 24 PRECEDING AND 1 PRECEDING)
      |ORDER BY event_type, hour""".stripMargin
}
