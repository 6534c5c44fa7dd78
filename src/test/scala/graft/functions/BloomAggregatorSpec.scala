package graft.functions

import org.scalatest.funsuite.AnyFunSuite

/** The Bloom filter's contract: NO false negatives ever (a key added
  * is always found), false positives rare at the documented sizing
  * (~1% at ~10 bits/key), and merge = the union filter — the property
  * that makes it a partial-agg-safe monoid. */
class BloomAggregatorSpec extends AnyFunSuite {

  private def hashOf(i: Long): Long = {
    // any 64-bit mix works for the unit test; the Spark side feeds
    // xxhash64 — the filter only sees an opaque Long either way
    var h = i * 0x9E3779B97F4A7C15L
    h ^= (h >>> 32)
    h * 0xBF58476D1CE4E5B9L
  }

  test("no false negatives: every added key is found") {
    val bits = 1 << 17
    val bloom = new Array[Byte](bits / 8)
    val keys = (0L until 10000L).map(hashOf)
    keys.foreach(BloomAggregator.add(bloom, _))
    assert(keys.forall(BloomAggregator.mightContain(bloom, _)))
  }

  test("false positives stay near the designed ~1% at 10 bits/key") {
    val bits = 1 << 17 // 131072 bits / ~13k keys ≈ 10 bits/key
    val bloom = new Array[Byte](bits / 8)
    (0L until 13000L).map(hashOf).foreach(BloomAggregator.add(bloom, _))
    val probes = (1000000L until 1020000L).map(hashOf)
    val fp = probes.count(BloomAggregator.mightContain(bloom, _))
    assert(fp < probes.size * 0.03,
      s"$fp of ${probes.size} absent keys hit — FP rate too high")
  }

  test("merge equals the union filter") {
    val agg = new BloomAggregator(1 << 12)
    val a = agg.zero
    val b = agg.zero
    val ka = (0L until 500L).map(hashOf)
    val kb = (500L until 1000L).map(hashOf)
    ka.foreach(h => agg.reduce(a, h))
    kb.foreach(h => agg.reduce(b, h))
    val merged = agg.merge(a, b)
    assert((ka ++ kb).forall(BloomAggregator.mightContain(merged, _)))
    val direct = agg.zero
    (ka ++ kb).foreach(h => agg.reduce(direct, h))
    assert(merged.sameElements(direct), "merge must be the bitwise union")
  }

  test("an empty filter contains nothing") {
    val empty = new Array[Byte]((1 << 12) / 8)
    assert((0L until 100L).map(hashOf)
      .forall(!BloomAggregator.mightContain(empty, _)))
  }

  test("non-power-of-two or tiny widths are rejected") {
    intercept[IllegalArgumentException](new BloomAggregator(1000))
    intercept[IllegalArgumentException](new BloomAggregator(32))
  }
}
