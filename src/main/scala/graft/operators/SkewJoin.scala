package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Salted equi-join for extreme key skew — the fallback when one join
  * key's row count exceeds what a single task can hold and the right
  * side is too large to broadcast outright.
  *
  * AQE's skew-join handling (on in [[graft.Sessions]]) already splits
  * oversized *shuffle partitions* of a sort-merge join and is the
  * first-choice mechanism; explicit salting remains for the cases AQE
  * can't fix: a single key so hot that even one key's rows blow a task
  * (AQE splits partitions, not keys), or when the skewed relation
  * feeds an aggregation-after-join that must stay distributed.
  *
  * Mechanics: left rows get a deterministic salt in [0, salts) hashed
  * from the full row (content-addressed — reruns salt identically);
  * the right side is replicated `salts` times; the join key becomes
  * (key, salt), spreading the hot key over `salts` tasks. Result
  * equality with the plain join is asserted in SkewJoinSpec. Cost:
  * |right| × salts replication — size salts to the skew, not to the
  * cluster.
  */
object SkewJoin {

  def salted(left: DataFrame, right: DataFrame, key: String,
      salts: Int, joinType: String = "inner"): DataFrame = {
    require(salts > 0, "salts must be positive")
    val saltCol = pmod(xxhash64(left.columns.map(col).toSeq: _*), lit(salts))
    val l = left.withColumn("__salt", saltCol)
    val r = right.withColumn("__salt",
      explode(array((0 until salts).map(lit): _*)))
    l.join(r, Seq(key, "__salt"), joinType).drop("__salt")
  }
}
