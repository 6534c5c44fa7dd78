package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Mergeable Bloom filter over pre-hashed 64-bit keys — the
  * EQUALITY-predicate sibling of the zone map: min/max zones prune
  * range scans only where the layout clusters the column, but a point
  * probe (`col = v`, `col IN (...)`) on a hash-scattered column leaves
  * every zone full-width and prunes nothing. A per-file Bloom filter
  * answers "might this file contain v?" regardless of layout — the
  * same role as Parquet's optional column bloom filters and Delta's
  * file-level bloom index, kept here in the standing skipping index so
  * the check costs one metadata-sized scan instead of 800k footer
  * opens at 100 TB.
  *
  * Shape: a fixed `bits`-wide bit array (power of two, so the modulo
  * is a mask), K=7 probes per key derived from one xxhash64 value by
  * Kirsch–Mitzenmacher double hashing (g_i = h + i·h2 — two halves of
  * the 64-bit hash, h2 forced odd; "Less Hashing, Same Performance",
  * ESA 2006). K=7 is the optimum for ~10 bits/key (~1% false-positive
  * rate); size `bits` ≈ 10× the file's expected distinct count —
  * 2^17 bits = 16 KB covers ~13k distinct keys per file at 1% FP, and
  * a 128 MB production file with ~1M distinct keys wants 2^23–2^24
  * (1–2 MB), which is exactly the per-file bloom budget Parquet's own
  * writer defaults to (`parquet.bloom.filter.max.bytes` = 1 MB).
  *
  * False positives cost I/O only (the file is read, the re-applied
  * predicate drops the rows); false negatives are impossible for keys
  * that were present at build time. The aggregation is a commutative
  * bitwise-OR monoid — partial-agg friendly, shuffle volume one bit
  * array per file per partition.
  */
class BloomAggregator(bits: Int)
    extends Aggregator[Long, Array[Byte], Array[Byte]] {
  require(bits >= 64 && (bits & (bits - 1)) == 0,
    s"bits must be a power of two >= 64 (got $bits)")

  override def zero: Array[Byte] = new Array[Byte](bits / 8)

  // reduce/merge mutate in place — the buffer is owned by this
  // aggregation path (the HllAggregator discipline): an immutable
  // rebuild would copy bits/8 bytes per input row.
  override def reduce(b: Array[Byte], h: Long): Array[Byte] = {
    BloomAggregator.add(b, h)
    b
  }

  override def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
    var i = 0
    while (i < a.length) { a(i) = (a(i) | b(i)).toByte; i += 1 }
    a
  }

  override def finish(b: Array[Byte]): Array[Byte] = b

  override def bufferEncoder: Encoder[Array[Byte]] = Encoders.BINARY
  override def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
}

object BloomAggregator {
  /** Probe count: optimal for ~10 bits per distinct key (~1% FP). */
  val K = 7

  /** Set the K probe bits for hash `h` in `bloom` (whose length
    * determines the bit width — always a power of two here). */
  def add(bloom: Array[Byte], h: Long): Unit = {
    val mask = bloom.length * 8 - 1
    val h2 = (h >>> 32) | 1L // odd, so successive probes never collapse
    var g = h
    var i = 0
    while (i < K) {
      val idx = (g & mask).toInt
      bloom(idx >> 3) = (bloom(idx >> 3) | (1 << (idx & 7))).toByte
      g += h2
      i += 1
    }
  }

  /** Might a key with hash `h` have been added? False positives ~1%
    * at the sizing above; false negatives never. */
  def mightContain(bloom: Array[Byte], h: Long): Boolean = {
    val mask = bloom.length * 8 - 1
    val h2 = (h >>> 32) | 1L
    var g = h
    var i = 0
    while (i < K) {
      val idx = (g & mask).toInt
      if ((bloom(idx >> 3) & (1 << (idx & 7))) == 0) return false
      g += h2
      i += 1
    }
    true
  }
}
