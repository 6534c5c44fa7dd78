package graft

/** Dev profiling harness: time a subset of SparkEntry.queries by name.
  *
  *   sbt "runMain graft.TimeQueries <sfDir> q78_fuzzy_names q38_correlated_avg"
  *
  * Runs each query `SPARK_GRAFT_ROUNDS` times (default 3) and prints
  * per-round seconds — round 1 includes index builds / JIT, later
  * rounds show the steady state the bench minimum reports. */
object TimeQueries {
  def main(args: Array[String]): Unit = {
    val sfDir = args.head
    val names = args.tail.toSeq
    val rounds = sys.env.getOrElse("SPARK_GRAFT_ROUNDS", "3").toInt
    val spark = Sessions.local("graft-time", Sessions.defaultCores)
    names.foreach { name =>
      val fn = SparkEntry.queries.getOrElse(name,
        sys.error(s"unknown query $name; known: ${SparkEntry.queries.keys.toSeq.sorted.mkString(", ")}"))
      val times = (1 to rounds).map { _ =>
        val t0 = System.nanoTime()
        fn(spark, sfDir).count()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"TIME $name%-26s ${times.map(t => f"$t%.2f").mkString(" ")}")
    }
    spark.stop()
  }
}
