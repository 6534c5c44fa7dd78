package graft.operators

import java.sql.Timestamp

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalacheck.rng.Seed

import graft.SparkSpec

/** Property check: on random event sets — hot keys, duplicate
  * timestamps, unmatched probes included by construction — the as-of
  * join equals a brute-force backward scan. */
class AsOfJoinPropSpec extends SparkSpec {

  private val genRows: Gen[List[(Long, Long)]] =
    Gen.listOfN(50, for {
      k <- Gen.choose(0L, 4L) // few keys → plenty of per-key history
      t <- Gen.choose(0L, 30L) // small range → frequent exact-tie times
    } yield (k, t))

  test("asOf equals brute force on random keyed event sets") {
    import spark.implicits._
    val prop = Prop.forAll(genRows, genRows) { (probeRows, buildRows) =>
      val probe = probeRows.zipWithIndex
        .map { case ((k, t), i) => (i.toLong, k, new Timestamp(t)) }
      val build = buildRows.zipWithIndex
        .map { case ((k, t), i) => (k, 1000L + i, new Timestamp(t)) }
      val got = AsOfJoin.asOf(
          probe.toDF("event_id", "user_id", "ts"),
          build.toDF("user_id", "event_id", "ts"),
          "user_id", "ts", "event_id")
        .collect()
        .map(r => (r.getLong(0), Option(r.getAs[Any]("b_event_id"))))
        .toSet
      val expected = probe.map { case (pid, k, pt) =>
        val best = build
          .filter(b => b._1 == k && !b._3.after(pt))
          .sortBy(b => (b._3.getTime, b._2)).lastOption
        (pid, best.map(_._2: Any))
      }.toSet
      got == expected
    }
    val res = SCTest.check(
      SCTest.Parameters.default
        .withMinSuccessfulTests(8)
        .withInitialSeed(Seed(42L)),
      prop)
    assert(res.passed, res.status.toString)
  }
}
