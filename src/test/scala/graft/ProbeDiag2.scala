package graft

/** Second probe diagnostic: TRUE hamming<=7 pair counts (the q108
  * OUTPUT size) at a given SF dir, to attribute output-bound runtime
  * ratios in the scale probe. */
object ProbeDiag2 {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/tmp/graft_sf1")
    val spark = Sessions.local("graft-diag2", "8")
    val n = graft.multimodal.Multimodal.frameNearDup(spark, d).count()
    println(s"dir=$d frameNearDupPairs=$n")
    spark.stop()
  }
}
