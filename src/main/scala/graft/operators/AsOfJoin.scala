package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** As-of join — for every probe row, the single most recent build row
  * at or before the probe's time within the same key group: the
  * point-in-time lookup of feature stores, event attribution, and
  * market-data joins. DuckDB/kdb expose it as ASOF JOIN; Spark has no
  * native operator, so this is the composed form.
  *
  * Implementation is the union+window shape, NOT a range join: probe
  * and build rows are unioned with a marker, one window partitioned by
  * the key runs `last(payload, ignoreNulls)` over rows up to the
  * current one, and each probe row reads the latest build payload seen
  * so far. Cost is ONE shuffle on the key plus a per-group sort — no
  * candidate-pair blowup, skew bounded by the hottest key, the shape
  * that survives 100 TB of events. (The naive backward range join
  * generates |probe| x |build-history| candidate rows before picking a
  * winner; Spark plans it as BroadcastNestedLoopJoin when the band
  * predicate hides the equi-key.)
  *
  * Semantics (matching DuckDB ASOF `ON key = key AND p.time >= b.time`):
  * a build row exactly at the probe time IS visible; build rows sharing
  * (key, time) resolve to the greatest `tieBreak` value; probes with no
  * prior build row get nulls (left join). NULL never matches on either
  * column, exactly as the SQL comparisons behave: NULL-time and NULL-key
  * build rows are dropped (`p.time >= NULL` and `p.key = NULL` are never
  * true), while NULL-time and NULL-key probe rows come through with null
  * build columns.
  *
  * The probe side is read EXACTLY ONCE: unmatchable probe rows are not
  * split into a separate union branch, they ride the same window with a
  * nulls-first time sort, which guarantees they precede every build row
  * in their partition and therefore see no payload.
  */
object AsOfJoin {

  /** `forward = true` flips the direction: each probe row matches the
    * EARLIEST build row at or after its time (`p.time <= b.time`) —
    * next-event attribution, shipment-after-order lookups. Same
    * one-shuffle union+window shape; only the time sort reverses, so
    * the running `last` has seen exactly the build rows at-or-after the
    * probe when it reaches it, the closest one most recently. Tie
    * handling is unchanged: equal (key, time) build rows resolve to the
    * greatest `tieBreak`. */
  def asOf(probeIn: DataFrame, buildIn: DataFrame, key: String, time: String,
      tieBreak: String, buildPrefix: String = "b_",
      forward: Boolean = false): DataFrame = {
    val spark = probeIn.sparkSession
    import spark.implicits._
    // NULL time or key on the build side can't satisfy the join
    // predicate for any probe: drop those rows. Probe rows are all kept
    // — NULL-time probes sort before every build row (nulls-first), and
    // NULL-key probes land in the null window partition, which after
    // this filter contains no build rows; both read a null payload.
    val probe = probeIn
    val build = buildIn.where(col(time).isNotNull && col(key).isNotNull)
    val bPayload = build.columns.filterNot(_ == key).toSeq
    val pCols = probe.columns.toSeq
    val bStructT = StructType(build.schema.fields.filterNot(_.name == key))
    val pStructT = StructType(probe.schema.fields)
    val b = build.select(
      col(key), col(time).as("__t"), lit(1).as("__build"),
      col(tieBreak).cast("long").as("__tb"),
      struct(bPayload.map(col): _*).as("__payload"),
      lit(null).cast(pStructT).as("__probe"))
    val p = probe.select(
      col(key), col(time).as("__t"), lit(0).as("__build"),
      lit(null).cast("long").as("__tb"),
      lit(null).cast(bStructT).as("__payload"),
      struct(pCols.map(col): _*).as("__probe"))
    // Order within a key: NULL-time (probe-only) rows first, then by
    // time; at equal time build rows first (inclusive match) with
    // larger tiebreaks later (so `last` picks the max-tieBreak build
    // row of a tied group).
    val timeOrder = if (forward) $"__t".desc_nulls_first else $"__t".asc_nulls_first
    val w = Window.partitionBy(col(key))
      .orderBy(timeOrder, $"__build".desc, $"__tb".asc_nulls_first)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val matched = b.unionByName(p)
      .withColumn("__match", last($"__payload", ignoreNulls = true).over(w))
      .where($"__build" === 0)
    matched.select(
      pCols.map(c => col(s"__probe.$c").as(c)) ++
        bPayload.map(c => col(s"__match.$c").as(s"$buildPrefix$c")): _*)
  }
}
