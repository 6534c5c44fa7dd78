package graft

object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = Sessions.defaultCores
    val spark = Sessions.local("graft-bench", cpus)

    // Warm up code paths + JIT on the smallest SF so the first timed
    // query doesn't pay session/codegen/JIT startup.
    SparkEntry.queries.foreach { case (_, fn) =>
      try { fn(spark, "/root/testdata/sf0.001").count(); () }
      catch { case _: Throwable => () }
    }

    // Two timed rounds, report the per-query minimum: measures
    // steady-state plan execution, not residual JIT/page-cache noise.
    def round(): Map[String, Double] = SparkEntry.queries.map { case (name, fn) =>
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count() } catch { case _: Throwable => -1L }
      name -> (System.nanoTime() - t0) / 1e9
    }
    val (r1, r2) = (round(), round())
    val results = r1.map { case (k, v) => k -> math.min(v, r2(k)) }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.values.sum else 0.0
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
