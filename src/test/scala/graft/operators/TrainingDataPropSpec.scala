package graft.operators

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalacheck.rng.Seed

import graft.SparkSpec

/** Random-input parity for the round's corpus operators: each engine
  * path must equal a naive Scala model on adversarial small inputs
  * (tiny vocabularies → heavy segment/bigram collisions; few labels →
  * dense same-label neighborhoods). */
class TrainingDataPropSpec extends SparkSpec {

  private def check(prop: Prop, n: Int = 8): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default
        .withMinSuccessfulTests(n)
        .withInitialSeed(Seed(42L)),
      prop)
    assert(res.passed, res.status.toString)
  }

  // docs over a 6-word vocabulary, 0-20 tokens each → segments collide
  private val genDocs: Gen[List[String]] = {
    val word = Gen.oneOf("alpha", "beta", "gamma", "delta", "eps", "zeta")
    Gen.listOfN(8, Gen.choose(0, 20).flatMap(n =>
      Gen.listOfN(n, word).map(_.mkString(" "))))
  }

  private def naiveSegments(text: String, segTokens: Int): List[(Int, String)] = {
    // mirror the engine exactly: split("") is [""], so an empty text
    // yields ONE empty-string segment, not zero segments
    val toks = text.toLowerCase.split(' ').toList
    toks.grouped(segTokens).map(_.mkString(" ")).zipWithIndex
      .map { case (s, i) => (i, s) }.toList
  }

  test("boilerplate removal equals the naive df-threshold model") {
    import spark.implicits._
    val segTokens = 3
    val minDf = 2
    val prop = Prop.forAll(genDocs) { texts =>
      val docs = texts.zipWithIndex.map { case (t, i) => ((i + 1).toLong, t) }
      val segs = docs.flatMap { case (id, t) =>
        naiveSegments(t, segTokens).map { case (i, s) => (id, i, s) }
      }
      val df = segs.groupBy(_._3).map { case (s, xs) =>
        s -> xs.map(_._1).distinct.size
      }
      val expected = segs
        .groupBy(_._1)
        .flatMap { case (id, ss) =>
          val kept = ss.filter(x => df(x._3) < minDf).sortBy(_._2)
          if (kept.isEmpty) None
          else Some((id, ss.size.toLong, kept.size.toLong,
            kept.map(_._3).mkString(" ")))
        }.toSet
      val got = Dedup.removeBoilerplate(
          docs.toDF("doc_id", "text"), segTokens, minDf)
        .collect()
        .map(r => (r.getLong(0), r.getAs[Long]("n_segments"),
          r.getAs[Long]("n_kept"), r.getString(3))).toSet
      val stripped = Dedup.stripBoilerplate(
          docs.toDF("doc_id", "text"), segTokens, minDf)
        .collect().map(r => (r.getLong(0), r.getString(1))).toSet
      got == expected &&
        stripped == expected.map { case (id, _, _, t) => (id, t) }
    }
    check(prop)
  }

  test("bigram lift equals the naive marginal model, arithmetic included") {
    import spark.implicits._
    val prop = Prop.forAll(genDocs) { texts =>
      val docs = texts.zipWithIndex.map { case (t, i) => ((i + 1).toLong, t) }
      val bigrams = texts.flatMap { t =>
        val toks = t.toLowerCase.split(' ').toList
        toks.zip(toks.drop(1))
      }
      if (bigrams.isEmpty) Prop.passed
      else {
        val nAb = bigrams.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
        val cFirst = bigrams.groupBy(_._1).map { case (k, v) => k -> v.size.toLong }
        val cSecond = bigrams.groupBy(_._2).map { case (k, v) => k -> v.size.toLong }
        val n = bigrams.size.toLong
        val expected = nAb.map { case ((a, b), c) =>
          (s"$a $b", c, (c * n).toDouble / (cFirst(a) * cSecond(b)).toDouble)
        }.toSet
        val got = TextAnalysis.bigramLiftOf(
            docs.toDF("doc_id", "text"), n = 10000, minCount = 1)
          .collect()
          .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
        Prop(got == expected)
      }
    }
    check(prop)
  }

  test("hard negatives equal the naive label-filtered top-k, ties included") {
    import spark.implicits._
    val k = 3
    val nAnchors = 3L
    // 2-dim embeddings on a coarse grid → frequent exact cosine ties;
    // 2 labels → dense same-label neighborhoods the filter must skip
    val genEmb: Gen[List[(Array[Float], Int)]] =
      Gen.listOfN(12, for {
        x <- Gen.choose(-2, 2)
        y <- Gen.choose(-2, 2)
        l <- Gen.choose(0, 1)
      } yield (Array(x.toFloat, y.toFloat), l))
    val prop = Prop.forAll(genEmb) { rows =>
      val emb = rows.zipWithIndex.map { case ((v, l), i) => (i.toLong, v, l) }
      def norm(v: Array[Float]): Array[Double] = {
        val d = v.map(_.toDouble)
        val n = math.sqrt(d.map(x => x * x).sum)
        if (n == 0.0) d.map(_ => 0.0) else d.map(_ / n)
      }
      val expected = emb.filter(_._1 < nAnchors).flatMap { case (aid, av, al) =>
        val a = norm(av)
        emb.filter(_._3 != al)
          .map { case (nid, nv, _) =>
            val b = norm(nv)
            var s = 0.0
            var j = 0
            while (j < b.length) { s += a(j) * b(j); j += 1 }
            (nid, s)
          }
          .sortBy { case (nid, c) => (-c, nid) }
          .take(k)
          .map { case (nid, _) => (aid, nid) }
      }.toSet
      val got = Similarity.hardNegativesOf(
          emb.toDF("vec_id", "embedding", "label"), k, nAnchors.toInt)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      got == expected
    }
    check(prop)
  }

  test("bigram familiarity equals the naive mean-threshold model") {
    import spark.implicits._
    val prop = Prop.forAll(genDocs) { texts =>
      val docs = texts.zipWithIndex.map { case (t, i) => ((i + 1).toLong, t) }
      val bigrams = docs.flatMap { case (id, t) =>
        t.toLowerCase.split(' ').toList.sliding(2)
          .withFilter(_.length == 2).map(g => (id, g.mkString(" "))).toList
      }
      val counts = bigrams.groupBy(_._2).map { case (b, xs) => b -> xs.size.toLong }
      val nTotal = counts.values.sum
      val nDistinct = counts.size.toLong
      val familiar = counts.collect {
        case (b, n) if n * nDistinct >= nTotal => b
      }.toSet
      val expected = bigrams.groupBy(_._1).map { case (id, bs) =>
        val nb = bs.size.toLong
        val nf = bs.count(b => familiar(b._2)).toLong
        val q = nf.toDouble / nb.toDouble
        val bucket = if (q >= 0.9) "head" else if (q >= 0.5) "middle" else "tail"
        (id, nb, nf, q, bucket)
      }.toSet
      val frame = docs.map { case (id, t) => (id, t, "en", "web") }
        .toDF("doc_id", "text", "lang", "source")
      val got = TextAnalysis.bigramFamiliarityOf(frame)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getDouble(3), r.getString(4))).toSet
      got == expected
    }
    check(prop)
  }

  test("source cap equals the naive sort-and-take model under skew") {
    import spark.implicits._
    val cap = 3
    val genSourced: Gen[List[(Long, String)]] =
      Gen.listOfN(20, Gen.oneOf("mega", "mega", "mega", "mid", "rare"))
        .map(_.zipWithIndex.map { case (s, i) => ((i + 1).toLong, s) })
    val prop = Prop.forAll(genSourced) { rows =>
      val expected = rows.groupBy(_._2).map { case (src, xs) =>
        val ids = xs.map(_._1).sorted
        val kept = ids.take(cap)
        (src, ids.size.toLong, kept.size.toLong, kept.min, kept.max)
      }.toSet
      val frame = rows.map { case (id, s) => (id, s"text $id", "en", s) }
        .toDF("doc_id", "text", "lang", "source")
      val got = Sampling.sourceCapOf(frame, cap)
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
          r.getLong(3), r.getLong(4))).toSet
      got == expected
    }
    check(prop)
  }

  test("span pairs equal the naive diagonal-walk model, df-prune included") {
    import spark.implicits._
    val k = 2; val minRun = 3; val maxDf = 6; val topK = 1000
    val prop = Prop.forAll(genDocs) { texts =>
      val docs = texts.zipWithIndex.map { case (t, i) => ((i + 1).toLong, t) }
      def shingles(t: String): Vector[String] = {
        val toks = t.toLowerCase.split(' ').toVector
        if (toks.length < k) Vector.empty
        else toks.sliding(k).map(_.mkString(" ")).toVector
      }
      val sh = docs.map { case (id, t) => id -> shingles(t) }.toMap
      // the engine's candidate rule: shingle in >= 2 docs, total df <= maxDf
      val df = sh.values.flatten.groupBy(identity).view.mapValues(_.size).toMap
      val nd = sh.toList.flatMap { case (id, ss) => ss.distinct.map(_ -> id) }
        .groupBy(_._1).view.mapValues(_.map(_._2).distinct.size).toMap
      def live(s: String) = nd.getOrElse(s, 0) >= 2 && df(s) <= maxDf
      val expected = (for {
        (a, sa) <- sh.toList; (b, sb) <- sh.toList; if a < b
        d <- (-(sb.length - 1)) to (sa.length - 1)
      } yield {
        // maximal runs along diagonal d, broken by mismatch OR pruned shingle
        val hits = (0 until sa.length).filter { i =>
          val j = i - d
          j >= 0 && j < sb.length && sa(i) == sb(j) && live(sa(i))
        }
        hits.foldLeft(List.empty[List[Int]]) {
          case (acc, i) if acc.nonEmpty && acc.head.head == i - 1 =>
            (i :: acc.head) :: acc.tail
          case (acc, i) => List(i) :: acc
        }.collect {
          case run if run.length + k - 1 >= minRun =>
            (a, b, run.min, run.min - d, (run.length + k - 1).toLong)
        }
      }).flatten.toSet
      val got = SpanDedup.spanPairsOf(
          docs.toDF("doc_id", "text"), k, minRun, maxDf, topK)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2),
          r.getInt(3), r.getLong(4))).toSet
      got == expected
    }
    check(prop)
  }

  test("containment equals the naive shingle-set model, both directions") {
    import spark.implicits._
    val threshold = 0.5
    val prop = Prop.forAll(genDocs) { texts =>
      val docs = texts.zipWithIndex.map { case (t, i) => ((i + 1).toLong, t) }
      def shingles(t: String): Set[String] =
        t.toLowerCase.split(' ').toList.sliding(3)
          .withFilter(_.length == 3).map(_.mkString(" ")).toSet
      val sets = docs.map { case (id, t) => id -> shingles(t) }.toMap
      val expected = (for {
        (a, sa) <- sets.toList; (b, sb) <- sets.toList
        if a != b && sa.nonEmpty
        inter = (sa & sb).size
        if inter > 0 && inter.toDouble / sa.size >= threshold
      } yield (a, b, inter.toLong, sa.size.toLong)).toSet
      val got = Dedup.containmentPairs(docs.toDF("doc_id", "text"), threshold)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getLong(3))).toSet
      got == expected
    }
    check(prop)
  }
}
