package graft

import org.apache.spark.sql.SparkSession

/** Single place to build a correctly-configured local SparkSession.
  *
  * Settings chosen for oracle parity + local[32] throughput:
  *  - UTC session timezone (DuckDB oracle compares naive timestamps)
  *  - shuffle.partitions sized to cores, not the 200 default
  *  - AQE on (runtime coalescing + skew-join handling — the knobs that
  *    also matter on a real 1000-executor cluster)
  */
object Sessions {
  /** The engine's session configuration, in ONE place (AqeSpec pins the
    * adaptive entries). The three `spark.sql.adaptive.*` rows are the
    * runtime-re-plan posture the 100 TB claims assume: post-shuffle
    * coalescing sizes reducers to real data volume, and skew-join
    * splitting is the backstop for hot keys the static salting
    * heuristics miss. Thresholds (advisory size, skew factor) stay at
    * Spark defaults — they are cluster-tuning knobs, not semantics.
    */
  val configs: Map[String, String] = Map(
    "spark.sql.adaptive.enabled" -> "true",
    "spark.sql.adaptive.coalescePartitions.enabled" -> "true",
    "spark.sql.adaptive.skewJoin.enabled" -> "true",
    "spark.sql.session.timeZone" -> "UTC",
    "spark.sql.parquet.int96RebaseModeInWrite" -> "CORRECTED",
    "spark.sql.parquet.datetimeRebaseModeInWrite" -> "CORRECTED",
    "spark.sql.mapKeyDedupPolicy" -> "LAST_WIN",
    // events.parquet carries TIMESTAMP(NANOS); read as long and let
    // Tables.events convert (set here too so plans never depend on
    // call order).
    "spark.sql.legacy.parquet.nanosAsLong" -> "true",
    "spark.ui.enabled" -> "false",
    "spark.driver.host" -> "localhost",
    // Catalyst extension entry point: the banded range-join rewrite
    // (graft.plans.RangeJoinRewrite). Registered the way any deployment
    // would — through spark.sql.extensions — so the naive BETWEEN-join
    // gets the scale-safe plan without calling the IntervalJoin library.
    "spark.sql.extensions" -> "graft.plans.GraftExtensions",
  )

  def local(appName: String = "graft", cores: String = defaultCores): SparkSession = {
    val builder = SparkSession
      .builder()
      .master(s"local[$cores]")
      .appName(appName)
      .config("spark.sql.shuffle.partitions", cores)
    configs.foreach { case (k, v) => builder.config(k, v) }
    // Operator knobs without a code change (A/B-ing the planner rule,
    // band widths, skew-gate limits): semicolon-separated k=v pairs.
    // Applied AFTER `configs`, so an override wins.
    sys.env.get("SPARK_GRAFT_EXTRA_CONF").foreach(_.split(';').foreach { kv =>
      kv.split("=", 2) match {
        case Array(k, v) if k.trim.nonEmpty => builder.config(k.trim, v.trim)
        case _ => ()
      }
    })
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }

  /** Honor SPARK_GRAFT_CPUS when the driver sets it; otherwise use the
    * machine (capped at 32, the driver's stated local[32] model). */
  def defaultCores: String = sys.env.getOrElse("SPARK_GRAFT_CPUS",
    math.min(32, Runtime.getRuntime.availableProcessors()).toString)
}
