package graft.operators

import graft.SparkSpec

class HeavyHittersSpec extends SparkSpec {

  test("mgSketch guarantees: items above N/(capacity+1) always survive") {
    // Skewed stream: token i appears 2^(10-i) times, plus noise tokens.
    val heavy = (0 until 8).flatMap(i => Seq.fill(1 << (10 - i))(s"h$i"))
    val noise = (0 until 500).map(i => s"n$i")
    val stream = new scala.util.Random(42).shuffle(heavy ++ noise)
    val n = stream.length
    val capacity = 16
    val sketch = HeavyHitters.mgSketch(stream.iterator, capacity)
    assert(sketch.size <= capacity)
    val exact = stream.groupBy(identity).map { case (k, v) => k -> v.length.toLong }
    exact.foreach { case (t, c) =>
      if (c > n.toLong / (capacity + 1)) assert(sketch.contains(t), s"lost heavy $t ($c)")
      // MG bound is always a lower bound within n/(capacity+1)
      sketch.get(t).foreach { b =>
        assert(b <= c && c - b <= n.toLong / (capacity + 1))
      }
    }
  }

  test("q77 equals the exact top-k and is stable under repartition") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val got = HeavyHitters.q77HeavyHitters(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    val exact = graft.sources.Tables.documents(spark, sfDir)
      .select(explode(graft.functions.TextFunctions.tokens($"text")).as("token"))
      .groupBy($"token").agg(count(lit(1)).as("n"))
      .orderBy($"n".desc, $"token".asc).limit(20).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    assert(got.sameElements(exact))

    // candidate pass on a different partitioning: MG sketches differ
    // per partition, but the candidate union still covers the top-k.
    val toks = graft.sources.Tables.documents(spark, sfDir)
      .select(explode(graft.functions.TextFunctions.tokens($"text")).as("token"))
      .repartition(7)
    val cand = HeavyHitters.candidates(toks, capacity = 64, k = 20)
      .collect().map(_.getString(0)).toSet
    assert(exact.map(_._1).forall(cand.contains))
  }
}
