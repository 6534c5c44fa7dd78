package graft.meta

import java.time.{Instant, LocalDate, ZoneOffset}

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** A7 needs_optimize scoring (reference: service_iceberg.go:189-236,
  * tests service_iceberg_test.go:10-99; defaults service_settings.go:15-23).
  *
  * A partition needs optimizing when
  *   smallCount >= minCount  &&  smallCount*100 >= totalCount*minSharePct
  * where smallCount counts files strictly below the size threshold —
  * unless the partition has a (year,month,day) date younger than the
  * freshness cutoff (now − delay, truncated to UTC midnight): fresh
  * partitions are never flagged; partitions without a date are exempt
  * from the freshness guard.
  */
object SmallFiles {

  final case class Config(
      thresholdBytes: Long = Model.Defaults.SmallFileThresholdBytes,
      minCount: Int = Model.Defaults.SmallFileMinCount,
      minSharePercent: Int = Model.Defaults.SmallFileMinSharePercent,
      delayHours: Int = Model.Defaults.NeedsOptimizeDelayHours)

  /** Resolve the scoring thresholds from the settings table at use time
    * (the reference re-reads them per ListPartitions call,
    * service_iceberg.go:129-141; keys + defaults
    * service_settings.go:15-23). `base` supplies the fallback defaults
    * and the freshness delay (config-file-driven in the reference, not a
    * settings row). */
  def fromSettings(store: MetaStore, base: Config = Config()): Config =
    base.copy(
      thresholdBytes = store.longSetting("small_file_threshold_bytes", base.thresholdBytes),
      minCount = store.intSetting("small_file_min_count", base.minCount),
      minSharePercent = store.intSetting("small_file_min_share_percent", base.minSharePercent))

  /** Latest day still allowed to be optimized: now − delay, truncated to
    * UTC midnight (service_iceberg.go:226-236; service_tasks_test.go:10-20:
    * now=2026-03-31T12:00Z, delay 48h → 2026-03-29). */
  def cutoffDay(now: Instant, delayHours: Int): LocalDate =
    now.minusSeconds(delayHours.toLong * 3600).atZone(ZoneOffset.UTC).toLocalDate

  /** Pure-Scala scoring — used by unit tests and the driver-side planner. */
  def needsOptimize(
      fileSizes: Seq[Long],
      partition: Map[String, String],
      cfg: Config,
      now: Instant): Boolean = {
    val smallCount = fileSizes.count(_ < cfg.thresholdBytes)
    val total = fileSizes.size
    val flagged = smallCount >= cfg.minCount && smallCount * 100 >= total * cfg.minSharePercent
    if (!flagged) false
    else PartitionModel.partitionDate(partition) match {
      case Some(d) => !d.isAfter(cutoffDay(now, cfg.delayHours))
      case None => true // date-less partitions skip the freshness guard
    }
  }

  /** Column-expression form for distributed scoring over grouped file
    * stats: given aggregated smallCount/totalCount columns and an optional
    * partition-date column, produce the flag. Stays inside whole-stage
    * codegen — no UDF. */
  def needsOptimizeCol(
      smallCount: Column,
      totalCount: Column,
      partitionDate: Column, // DateType, null when the partition has no date
      cfg: Config,
      now: Instant): Column = {
    val flagged = smallCount >= cfg.minCount &&
      smallCount * 100 >= totalCount * cfg.minSharePercent
    val fresh = partitionDate.isNotNull &&
      partitionDate > lit(java.sql.Date.valueOf(cutoffDay(now, cfg.delayHours)))
    flagged && !fresh
  }

  /** Aggregation columns to compute small/total counts from a per-file
    * frame grouped by partition. */
  def smallCountAgg(fileSize: Column, cfg: Config): Column =
    count(when(fileSize < cfg.thresholdBytes, 1))
}
