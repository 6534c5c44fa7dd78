package graft.functions

import graft.SparkSpec

/** The bounded-buffer top-k aggregator must agree with the window
  * row_number approach on real data. */
class TopKAggregatorSpec extends SparkSpec {

  test("top-3 events per type match the window result") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.expressions.Window

    val events = graft.sources.Tables.events(spark, sfDirMid)
      .select($"event_type", $"value".cast("double").as("score"), $"event_id".as("id"))

    // window path
    val w = Window.partitionBy($"event_type").orderBy($"score".desc, $"id".asc)
    val viaWindow = events.withColumn("rn", row_number().over(w))
      .where($"rn" <= 3)
      .groupBy($"event_type").agg(sort_array(collect_list($"id")).as("ids"))
      .collect().map(r => r.getString(0) -> r.getSeq[Long](1).toSet).toMap

    // aggregator path
    val agg = udaf(new TopKAggregator(3))
    val viaAgg = events
      .groupBy($"event_type")
      .agg(agg($"score", $"id").as("ids"))
      .collect().map(r => r.getString(0) -> r.getSeq[Long](1).toSet).toMap

    assert(viaAgg == viaWindow)
    assert(viaAgg.values.forall(_.size == 3))
  }

  test("buffer stays bounded and ordered under merge") {
    val a = new TopKAggregator(2)
    val b1 = a.reduce(a.reduce(a.zero, ScoredId(1.0, 10)), ScoredId(5.0, 11))
    val b2 = a.reduce(a.reduce(a.zero, ScoredId(3.0, 20)), ScoredId(4.0, 21))
    val merged = a.merge(b1, b2)
    assert(merged.scores == Seq(5.0, 4.0))
    assert(a.finish(merged) == Seq(11L, 21L))
    // tie broken by smaller id
    val t = a.merge(
      a.reduce(a.zero, ScoredId(5.0, 2)),
      a.reduce(a.zero, ScoredId(5.0, 1)))
    assert(a.finish(t) == Seq(1L, 2L))
  }
}
