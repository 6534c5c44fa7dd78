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
  def local(appName: String = "graft", cores: String = defaultCores): SparkSession = {
    val spark = SparkSession
      .builder()
      .master(s"local[$cores]")
      .appName(appName)
      .config("spark.sql.shuffle.partitions", cores)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.parquet.int96RebaseModeInWrite", "CORRECTED")
      .config("spark.sql.parquet.datetimeRebaseModeInWrite", "CORRECTED")
      .config("spark.sql.mapKeyDedupPolicy", "LAST_WIN")
      // events.parquet carries TIMESTAMP(NANOS); read as long and let
      // Tables.events convert (set here too so plans never depend on
      // call order).
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.driver.host", "localhost")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }

  /** Honor SPARK_GRAFT_CPUS when the driver sets it; otherwise use the
    * machine (capped at 32, the driver's stated local[32] model). */
  def defaultCores: String = sys.env.getOrElse("SPARK_GRAFT_CPUS",
    math.min(32, Runtime.getRuntime.availableProcessors()).toString)
}
