package graft.operators

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalacheck.rng.Seed

import graft.SparkSpec

/** Property check: on random release pairs — overlapping and disjoint
  * id sets, duplicate labels, drifting and stable vectors by
  * construction — the drift rollup equals a naive driver-side model. */
class EmbeddingDriftPropSpec extends SparkSpec {

  // Axis-ish unit vectors make the cosine classes unambiguous: equal
  // axes → cos 1 (stable); different axes → cos 0 (drifted). No
  // generated case can sit near the 0.99 gate, so the property tests
  // the JOIN/rollup logic, not float luck.
  private val genRelease: Gen[List[(Long, Int, Int)]] =
    Gen.listOfN(40, for {
      id <- Gen.choose(0L, 25L)     // overlap + exclusive ids across releases
      axis <- Gen.choose(0, 3)      // the vector: e_axis in R^4
      label <- Gen.choose(0, 2)
    } yield (id, axis, label)).map(_.distinctBy(_._1))

  private def toVec(axis: Int): Array[Float] =
    Array.tabulate(4)(i => if (i == axis) 1f else 0f)

  test("drift equals the naive per-id model on random release pairs") {
    import spark.implicits._
    val prop = Prop.forAll(genRelease, genRelease) { (oldRows, newRows) =>
      val oldDf = oldRows.map { case (id, ax, l) => (id, toVec(ax), l) }
        .toDF("vec_id", "embedding", "label")
      val newDf = newRows.map { case (id, ax, l) => (id, toVec(ax), l) }
        .toDF("vec_id", "embedding", "label")
      val got = EmbeddingDrift.drift(oldDf, newDf, 0.99).collect()
        .map(r => r.getInt(0) ->
          (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
        .toMap
      val oldM = oldRows.map(r => r._1 -> r).toMap
      val newM = newRows.map(r => r._1 -> r).toMap
      val expected = (oldM.keySet ++ newM.keySet).toSeq
        .map { id =>
          (oldM.get(id), newM.get(id)) match {
            case (None, Some((_, _, l)))    => (l, "added", false)
            case (Some((_, _, l)), None)    => (l, "removed", false)
            case (Some((_, oa, _)), Some((_, na, l))) =>
              (l, "kept", oa != na) // different axes -> cos 0 -> drifted
            case _ => sys.error("unreachable")
          }
        }
        .groupBy(_._1)
        .map { case (l, rs) =>
          l -> (rs.count(_._2 == "added").toLong,
            rs.count(_._2 == "removed").toLong,
            rs.count(_._2 == "kept").toLong,
            rs.count(r => r._2 == "kept" && r._3).toLong)
        }
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
