package graft

/** Scratch profiling main (not part of the library surface). */
object ProbeScratch {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Sessions.local("graft-probe", Sessions.defaultCores)
    val names = args.toSeq match {
      case Nil => Seq("q24_embedding_neardup")
      case xs => xs
    }
    def time(label: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"PROBE $label ${(System.nanoTime() - t0) / 1e9}%.3f s")
    }
    if (names == Seq("q25parts")) {
      import org.apache.spark.sql.functions._
      import spark.implicits._
      for (r <- 1 to 3) {
        time(s"q25.read r$r") {
          graft.sources.Tables.embeddings(spark, sfDir).count(); ()
        }
        time(s"q25.normalize r$r") {
          graft.sources.Tables.embeddings(spark, sfDir)
            .select($"vec_id",
              graft.operators.Similarity.normalized($"embedding").as("v"))
            .count(); ()
        }
        time(s"q25.queries-collect r$r") {
          graft.sources.Tables.embeddings(spark, sfDir)
            .where($"vec_id" < 10)
            .select($"vec_id",
              graft.operators.Similarity.normalized($"embedding").as("v"))
            .collect(); ()
        }
        time(s"q25.norm-forced r$r") {
          graft.sources.Tables.embeddings(spark, sfDir)
            .select($"vec_id",
              graft.operators.Similarity.normalized($"embedding").as("v"))
            .select(sum(element_at($"v", 1))).collect(); ()
        }
        time(s"q25.deser r$r") {
          graft.sources.Tables.embeddings(spark, sfDir)
            .select($"vec_id",
              graft.operators.Similarity.normalized($"embedding").as("v"))
            .as[(Long, Array[Double])]
            .mapPartitions(it => Iterator.single(it.map(_._2.length).sum))
            .reduce(_ + _); ()
        }
        time(s"q25.full r$r") {
          graft.operators.Similarity.bruteForceTopK(spark, sfDir).count(); ()
        }
      }
    } else for (n <- names; r <- 1 to 3) {
      time(s"$n round$r") { SparkEntry.queries(n)(spark, sfDir).count(); () }
    }
    spark.stop()
    System.exit(0)
  }
}
