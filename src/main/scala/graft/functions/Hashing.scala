package graft.functions

/** Deterministic 64-bit hashing for the sketch operators (MinHash,
  * SimHash): FNV-1a base hash + splitmix64 finalizer for seeded
  * "permutations". Executor-side primitive code — the sketches are
  * hash-seeded (rows-only verified), so the only requirements are
  * determinism, speed, and bit dispersion.
  */
object Hashing {

  /** splitmix64 finalizer — full-avalanche 64-bit mix. */
  def mix64(x0: Long): Long = {
    var x = x0 + 0x9E3779B97F4A7C15L
    x = (x ^ (x >>> 30)) * 0xBF58476D1CE4E5B9L
    x = (x ^ (x >>> 27)) * 0x94D049BB133111EBL
    x ^ (x >>> 31)
  }

  /** FNV-1a 64 over UTF-8 bytes, then mixed. */
  def hashString(s: String): Long = {
    var h = 0xCBF29CE484222325L
    val bytes = s.getBytes("UTF-8")
    var i = 0
    while (i < bytes.length) {
      h = (h ^ (bytes(i) & 0xFFL)) * 0x100000001B3L
      i += 1
    }
    mix64(h)
  }

  /** The i-th "permutation" hash of a base hash. */
  def seeded(base: Long, seed: Int): Long =
    mix64(base ^ (seed.toLong * 0x9E3779B97F4A7C15L))

  /** Combine two longs into a band key. */
  def combine(a: Long, b: Long, seed: Int): Long =
    mix64(mix64(a ^ (seed.toLong * 0xC2B2AE3D27D4EB4FL)) ^ b)

  /** Code-point polynomial mod a 30-bit prime — ENGINE-PORTABLE: DuckDB
    * replays it with list_reduce over unicode(substr(...)), which is
    * what lets operators keyed on it (winnowing q30, SimHash q23) be
    * full hash-match oracles instead of rows-only. Intermediates stay
    * below 2^63 → Java wrap semantics never diverge from DuckDB's
    * checked BIGINT arithmetic. */
  def poly30(s: String, mult: Long): Long = {
    var h = 0L
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      h = (h * mult + cp) % 1000000007L
      i += Character.charCount(cp)
    }
    h
  }

  /** 60-bit portable hash: two independent 30-bit polynomials packed
    * side by side. Bit dispersion is adequate for signature voting
    * (spec-checked empirically); values stay in [0, 2^60). */
  def portable60(s: String): Long =
    (poly30(s, 131) << 30) | poly30(s, 137)
}
