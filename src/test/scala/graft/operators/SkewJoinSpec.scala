package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Salted skew join: result parity with the plain join and hot-key
  * spreading. */
class SkewJoinSpec extends SparkSpec {

  test("salted join equals the plain join on a skewed dataset") {
    import spark.implicits._
    // 90% of left rows share one key — the salting target.
    val left = (1 to 2000).map(i =>
      (if (i % 10 == 0) i.toLong % 7 else 42L, i.toLong)).toDF("k", "lv")
    val right = Seq((42L, "hot"), (0L, "a"), (1L, "b"), (3L, "c"))
      .toDF("k", "rv")
    val plain = left.join(right, Seq("k")).select($"k", $"lv", $"rv")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    val salted = SkewJoin.salted(left, right, "k", salts = 8)
      .select($"k", $"lv", $"rv")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    assert(salted == plain)
    assert(plain.count(_._1 == 42L) == 1800)
  }

  test("left_outer salted join preserves unmatched left rows") {
    import spark.implicits._
    val left = Seq((1L, 10L), (2L, 20L), (99L, 30L)).toDF("k", "lv")
    val right = Seq((1L, "x"), (2L, "y")).toDF("k", "rv")
    val out = SkewJoin.salted(left, right, "k", salts = 4, joinType = "left_outer")
      .collect().map(r => (r.getLong(0), Option(r.getAs[String]("rv")))).toSet
    assert(out == Set((1L, Some("x")), (2L, Some("y")), (99L, None)))
  }

  test("salts spread the hot key across multiple salt values") {
    import spark.implicits._
    val left = (1 to 1000).map(i => (42L, i.toLong)).toDF("k", "lv")
    val saltCol = pmod(xxhash64(left.columns.map(col).toSeq: _*), lit(8))
    val nSalts = left.withColumn("__salt", saltCol)
      .select("__salt").distinct().count()
    assert(nSalts >= 6, s"expected hot key spread over >=6 of 8 salts, got $nSalts")
  }
}
