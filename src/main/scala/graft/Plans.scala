package graft
object Plans {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.local("plans", "8")
    val d = "/root/testdata/sf0.01"
    for ((name, fn) <- Seq(
      "q1_agg" -> graft.queries.Relational.q1Agg _,
      "q4_files_browse" -> graft.queries.Relational.q4FilesBrowse _,
      "q7_join_agg" -> graft.queries.Relational.q7JoinAgg _,
      "q3_antijoin" -> graft.queries.Relational.q3AntiJoin _,
      "q48_stratified_sample" -> graft.operators.Sampling.q48StratifiedSample _,
      "q50_sequence_packing" -> graft.operators.Packing.q50SequencePacking _,
      "q52_asof_attribution" -> graft.queries.Streams.q52AsOfAttribution _,
      "q56_order_timeline" -> graft.queries.Relational3.q56OrderTimeline _,
      "q57_order_count_dist" -> graft.queries.Relational2.q57OrderCountDist _)) {
      println(s"===== $name =====")
      println(fn(spark, d).queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode))
    }
    spark.stop()
  }
}
