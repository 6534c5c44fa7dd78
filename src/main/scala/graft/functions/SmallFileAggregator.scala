package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed UDAF demonstrating the custom-aggregator surface (SURVEY.md
  * §2.11): fold per-partition file sizes into the small-file decision
  * in one pass — the `Aggregator[-IN, BUF, OUT]` path for semantics the
  * built-in `count(when(...))` pair can't express in one column (here
  * it can, and the column form in [[graft.meta.SmallFiles]] is the
  * production path; this exists to keep the UDAF door open and
  * tested).
  *
  * Register for SQL with
  * `spark.udf.register("needs_optimize", functions.udaf(new SmallFileAggregator(...)))`.
  */
final case class SmallFileBuf(smallCount: Long, totalCount: Long)

class SmallFileAggregator(thresholdBytes: Long, minCount: Int, minSharePercent: Int)
    extends Aggregator[Long, SmallFileBuf, Boolean] {

  override def zero: SmallFileBuf = SmallFileBuf(0L, 0L)

  override def reduce(b: SmallFileBuf, fileSize: Long): SmallFileBuf =
    SmallFileBuf(b.smallCount + (if (fileSize < thresholdBytes) 1 else 0), b.totalCount + 1)

  override def merge(a: SmallFileBuf, b: SmallFileBuf): SmallFileBuf =
    SmallFileBuf(a.smallCount + b.smallCount, a.totalCount + b.totalCount)

  override def finish(b: SmallFileBuf): Boolean =
    b.smallCount >= minCount && b.smallCount * 100 >= b.totalCount * minSharePercent

  override def bufferEncoder: Encoder[SmallFileBuf] = Encoders.product[SmallFileBuf]
  override def outputEncoder: Encoder[Boolean] = Encoders.scalaBoolean
}
