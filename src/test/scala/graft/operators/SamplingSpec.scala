package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.sources.Tables

/** Deterministic hash sampling: reproducibility, nesting, stratification. */
class SamplingSpec extends SparkSpec {

  private def ids(df: org.apache.spark.sql.DataFrame): Set[Long] =
    df.select("doc_id").collect().map(_.getLong(0)).toSet

  test("rates within 2^-33 of 1.0 keep (almost) everything, monotonically") {
    import spark.implicits._
    val docs = Tables.documents(spark, sfDirMid)
    val n = docs.count()
    // the threshold must stay 8 chars (or the sentinel) at every rate
    assert(Sampling.hexThreshold(0.999999999999) == "ffffffff")
    assert(Sampling.hexThreshold(1.0) == "g")
    val nearOne = Sampling.sample(docs, $"doc_id", 0.999999999999).count()
    assert(nearOne >= n - 1 && nearOne <= n)
    assert(Sampling.sample(docs, $"doc_id", 1.0).count() == n)
  }

  test("same rate selects the same rows on every run") {
    import spark.implicits._
    val docs = Tables.documents(spark, sfDirMid)
    val a = ids(Sampling.sample(docs, $"doc_id", 0.3))
    val b = ids(Sampling.sample(docs, $"doc_id", 0.3))
    assert(a == b)
    assert(a.nonEmpty && a.size < docs.count())
  }

  test("samples nest: a lower rate is a subset of a higher rate") {
    import spark.implicits._
    val docs = Tables.documents(spark, sfDirMid)
    val small = ids(Sampling.sample(docs, $"doc_id", 0.1))
    val big = ids(Sampling.sample(docs, $"doc_id", 0.5))
    assert(small.subsetOf(big))
  }

  test("selection matches a reference md5 computed off-Spark") {
    import spark.implicits._
    val docs = Tables.documents(spark, sfDirMid)
    val kept = ids(Sampling.sample(docs, $"doc_id", 0.25))
    val all = docs.select($"doc_id").as[Long].collect()
    val md = java.security.MessageDigest.getInstance("MD5")
    def hash8(id: Long): String =
      md.digest(id.toString.getBytes("UTF-8")).take(4).map(b => f"$b%02x").mkString
    val expected = all.filter(id => hash8(id) < Sampling.hexThreshold(0.25)).toSet
    assert(kept == expected)
  }

  test("shard assignment matches a reference md5 computed off-Spark") {
    import spark.implicits._
    val docs = (1L to 64L).map(i => (i, "t", "en", "s", 1L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val got = Sampling.shuffleShardsOf(docs, "epoch-0", 8).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val md = java.security.MessageDigest.getInstance("MD5")
    def h60(id: Long): Long = {
      val hex = md.digest(s"epoch-0:$id".getBytes("UTF-8"))
        .map(b => f"$b%02x").mkString.take(15)
      java.lang.Long.parseLong(hex, 16)
    }
    (1L to 64L).foreach { id =>
      assert(got(id) == (h60(id) % 8).toInt, s"doc $id")
    }
  }

  test("empirical rates land near nominal per stratum") {
    import spark.implicits._
    val docs = Tables.documents(spark, sfDirMid)
    val sampled = Sampling.stratified(docs, $"doc_id", $"lang",
      Map("en" -> 0.5), defaultRate = 0.2)
    val byLang = sampled.groupBy($"lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val totals = docs.groupBy($"lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val enRate = byLang.getOrElse("en", 0L).toDouble / totals("en")
    assert(enRate > 0.3 && enRate < 0.7, s"en rate $enRate")
    val others = totals.keySet - "en"
    val otherRate = others.map(l => byLang.getOrElse(l, 0L)).sum.toDouble /
      others.map(totals).sum
    assert(otherRate > 0.08 && otherRate < 0.35, s"other rate $otherRate")
  }

  test("temperature rates: alpha=1 is proportional, alpha=0 equalizes, caps at 1") {
    val counts = Map("en" -> 800L, "de" -> 150L, "fr" -> 50L)
    // alpha = 1: every stratum keeps the same fraction (budget / total).
    val prop = Sampling.temperatureRates(counts, alpha = 1.0, budgetDocs = 500L)
    prop.values.foreach(r => assert(math.abs(r - 0.5) < 1e-12))
    // alpha = 0: equal share per stratum — fr (50 docs, ~167 wanted)
    // caps at 1, others keep 167/n.
    val eq = Sampling.temperatureRates(counts, alpha = 0.0, budgetDocs = 500L)
    assert(eq("fr") == 1.0)
    assert(math.abs(eq("en") - 500.0 / 3 / 800) < 1e-12)
    // 0 < alpha < 1 sits between: en's rate below proportional, fr's above.
    val mid = Sampling.temperatureRates(counts, alpha = 0.5, budgetDocs = 500L)
    assert(mid("en") < prop("en") && mid("fr") > prop("fr"))
    // Expected kept volume stays at the budget while no stratum caps.
    val kept = prop.map { case (k, r) => counts(k) * r }.sum
    assert(math.abs(kept - 500.0) < 1e-9)
  }

  test("temperature rates drive stratified sampling end to end") {
    import spark.implicits._
    val docs = Tables.documents(spark, sfDirMid)
    val counts = docs.groupBy($"lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val rates = Sampling.temperatureRates(counts, alpha = 0.3, budgetDocs = 200L)
    val sampled = Sampling.stratified(docs, $"doc_id", $"lang", rates, defaultRate = 0.0)
    val n = sampled.count()
    // Bernoulli noise around the 200-doc budget.
    assert(n > 120 && n < 280, s"kept $n")
  }

  test("rate edges: 0 selects nothing, 1 selects everything") {
    import spark.implicits._
    val docs = Tables.documents(spark, sfDirMid)
    assert(Sampling.sample(docs, $"doc_id", 0.0).count() == 0L)
    assert(Sampling.sample(docs, $"doc_id", 1.0).count() == docs.count())
  }

  test("splits are exhaustive, disjoint, stable, and near 80/10/10") {
    import spark.implicits._
    val docs = Tables.documents(spark, sfDirMid)
    val n = docs.count().toDouble
    val assigned = docs.withColumn("split", Sampling.splitAssign($"doc_id", 0.8, 0.1))
    val counts = assigned.groupBy($"split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts.keySet.subsetOf(Set("train", "val", "test")))
    assert(counts.values.sum == n.toLong)
    assert(counts("train") / n > 0.7 && counts("train") / n < 0.9)
    // row-local: repartitioning never changes an assignment
    val again = assigned.repartition(7)
      .select($"doc_id", $"split").collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assigned.select($"doc_id", $"split").collect().foreach { r =>
      assert(again(r.getLong(0)) == r.getString(1))
    }
  }

  test("source cap: hard cap on big sources, pass-through for small ones") {
    import spark.implicits._
    // source a: 5 docs (cap 3 -> keep ids 1,2,3); source b: 2 docs (all kept)
    val docs = ((1L to 5L).map(i => (i, s"t$i", "en", "a", 2L)) ++
      Seq((10L, "x", "en", "b", 1L), (11L, "y", "en", "b", 1L)))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val got = Sampling.sourceCapOf(docs, cap = 3)
      .collect().map(r => (r.getString(0),
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(got("a") == ((5L, 3L, 1L, 3L)))
    assert(got("b") == ((2L, 2L, 10L, 11L)))
  }

  test("shuffle shards: permutation, seed-keyed, uniform-ish, reproducible") {
    import spark.implicits._
    val docs = (1L to 200L).map(i => (i, s"t$i", "en", "s", 4L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val a = Sampling.shuffleShardsOf(docs, "epoch-0", 8).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2)))
    // exhaustive: every doc exactly once
    assert(a.map(_._1).sorted.sameElements(1L to 200L))
    // positions within a shard are 1..n, dense
    a.groupBy(_._2).foreach { case (_, rows) =>
      assert(rows.map(_._3).sorted.sameElements(1 to rows.length))
    }
    // no empty shard at 200/8 (md5 uniformity; deterministic data)
    assert(a.map(_._2).distinct.length == 8)
    // reproducible; a different seed produces a different order
    val b = Sampling.shuffleShardsOf(docs, "epoch-0", 8).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2)))
    assert(a.sortBy(_._1).sameElements(b.sortBy(_._1)))
    val c = Sampling.shuffleShardsOf(docs, "epoch-1", 8).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2)))
    assert(!a.sortBy(_._1).sameElements(c.sortBy(_._1)))
  }

  test("length batches: full batches within band width, waste = n*max - sum") {
    import spark.implicits._
    // band 0: 20 docs of lengths 1..20 → batches of 16 and 4
    // band 1: 3 docs of length 300 → one batch, zero waste
    val docs = ((1L to 20L).map(i => (i, "t", "en", "s", i)) ++
      (21L to 23L).map(i => (i, "t", "en", "s", 300L)))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val rows = Sampling.lengthBatchesOf(docs, bandChars = 256, batchSize = 16)
      .collect().map(r => ((r.getLong(0), r.getLong(1)),
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
    // band 0, batch 0: lengths 1..16 → waste 16*16 - 136 = 120
    assert(rows((0L, 0L)) == ((16L, 1L, 16L, 120L)))
    // band 0, batch 1: lengths 17..20 → waste 4*20 - 74 = 6
    assert(rows((0L, 1L)) == ((4L, 17L, 20L, 6L)))
    assert(rows((1L, 0L)) == ((3L, 300L, 300L, 0L)))
    assert(rows.size == 3)
  }

  test("scale curriculum: monotone phases, near-equal sizes, ties sink low") {
    import spark.implicits._
    // distinct token counts → cutoffs are clean order statistics
    val docs = (1L to 40L).map(i =>
      (i, Array.fill(i.toInt)("w").mkString(" "), "en", "s", 1L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val rows = Sampling.curriculumAtScale(docs, phases = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    assert(rows.length == 40)
    // monotone along the score order
    val ordered = rows.sortBy(r => (r._2, r._1)).map(_._3)
    assert(ordered.sameElements(ordered.sorted))
    // near-equal populations (exact quantiles, distinct scores)
    val sizes = rows.groupBy(_._3).view.mapValues(_.length).toMap
    assert(sizes.keySet == Set(1, 2, 3, 4))
    assert(sizes.values.forall(s => math.abs(s - 10) <= 1))
    // tied scores land in one (low) phase together — the documented trade
    val tied = (1L to 12L).map(i => (i, "a b c", "en", "s", 1L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val tiedPhases = Sampling.curriculumAtScale(tied, phases = 3)
      .collect().map(_.getInt(2)).toSet
    assert(tiedPhases == Set(1))
  }

  test("curriculum phases: monotone in score, sizes differ by at most one") {
    import spark.implicits._
    val rnd = new scala.util.Random(3)
    val docs = (1L to 23L).map(i =>
      (i, Array.fill(1 + rnd.nextInt(30))("w").mkString(" "), "en", "s", 1L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val rows = Sampling.curriculumOf(docs, phases = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    assert(rows.length == 23)
    val sizes = rows.groupBy(_._3).view.mapValues(_.length).toMap
    assert(sizes.keySet == Set(1, 2, 3, 4))
    assert(sizes.values.max - sizes.values.min <= 1)
    // phase is monotone along the (n_tokens, doc_id) order
    val ordered = rows.sortBy(r => (r._2, r._1)).map(_._3)
    assert(ordered.sameElements(ordered.sorted))
  }
}
