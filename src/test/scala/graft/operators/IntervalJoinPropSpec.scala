package graft.operators

import java.sql.Timestamp

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalacheck.rng.Seed

import graft.SparkSpec

/** Property checks: on random keyed interval sets — hot keys, touching
  * boundaries, degenerate and multi-band intervals by construction —
  * both banded joins equal their brute-force non-equi definitions. */
class IntervalJoinPropSpec extends SparkSpec {

  // timestamps in a small range, band = 7 units → intervals span 0..5 bands
  private val Band = 7L
  private val genPoints: Gen[List[(Long, Long)]] =
    Gen.listOfN(40, for {
      k <- Gen.choose(0L, 3L)
      t <- Gen.choose(0L, 40L)
    } yield (k, t))
  private val genIntervals: Gen[List[(Long, Long, Long)]] =
    Gen.listOfN(25, for {
      k <- Gen.choose(0L, 3L)
      s <- Gen.choose(0L, 40L)
      len <- Gen.choose(-2L, 30L) // negative → degenerate (start > end)
    } yield (k, s, s + len))

  test("pointInInterval equals brute force on random keyed sets") {
    import spark.implicits._
    val prop = Prop.forAll(genPoints, genIntervals) { (ptRows, ivRows) =>
      val pts = ptRows.zipWithIndex.map { case ((k, t), i) =>
        (i.toLong, k, new Timestamp(t * 1000))
      }
      val ivs = ivRows.zipWithIndex.map { case ((k, s, e), i) =>
        (k, 1000L + i, new Timestamp(s * 1000), new Timestamp(e * 1000))
      }
      val got = IntervalJoin.pointInInterval(
          pts.toDF("point_id", "key_id", "ts"),
          ivs.toDF("key_id", "ivl_id", "w_start", "w_end"),
          "key_id", "ts", "w_start", "w_end", bandSeconds = Band)
        .select($"point_id", $"i_ivl_id")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val expected = (for {
        (pid, pk, pt) <- pts
        (ik, iid, s, e) <- ivs
        if ik == pk && !pt.before(s) && !pt.after(e)
      } yield (pid, iid)).toSet
      got == expected
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(6).withInitialSeed(Seed(7L)),
      prop)
    assert(res.passed, res.status.toString)
  }

  test("intervalOverlap equals brute force on random keyed sets") {
    import spark.implicits._
    val prop = Prop.forAll(genIntervals, genIntervals) { (aRows, bRows) =>
      val as = aRows.zipWithIndex.map { case ((k, s, e), i) =>
        (k, i.toLong, new Timestamp(s * 1000), new Timestamp(e * 1000))
      }
      val bs = bRows.zipWithIndex.map { case ((k, s, e), i) =>
        (k, 1000L + i, new Timestamp(s * 1000), new Timestamp(e * 1000))
      }
      val got = IntervalJoin.intervalOverlap(
          as.toDF("key_id", "id_a", "w_start", "w_end"),
          bs.toDF("key_id", "id_b", "w_start", "w_end"),
          "key_id", "w_start", "w_end", bandSeconds = Band, rightPrefix = "b_")
        .select($"id_a", $"b_id_b")
        .collect().map(r => (r.getLong(0), r.getLong(1)))
      val gotSet = got.toSet
      val expected = (for {
        (ak, aid, as0, ae) <- as
        (bk, bid, bs0, be) <- bs
        if ak == bk && !as0.after(ae) && !bs0.after(be) && // non-degenerate
          !as0.after(be) && !bs0.after(ae) // overlap
      } yield (aid, bid)).toSet
      // exactly-once: no duplicate pair rows despite shared bands
      got.length == gotSet.size && gotSet == expected
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(6).withInitialSeed(Seed(11L)),
      prop)
    assert(res.passed, res.status.toString)
  }
}
