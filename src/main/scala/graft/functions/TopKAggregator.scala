package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed top-k-per-group aggregator: keeps only the k best
  * (score, id) pairs per group while aggregating — the scale
  * alternative to `row_number().over(window)` when groups are huge: a
  * window sorts every group's rows; this carries a k-bounded buffer
  * through partial aggregation, so shuffle volume is k per group, not
  * the group size.
  *
  * Ordering: higher score wins; ties broken by smaller id (matches the
  * `orderBy(score.desc, id.asc)` window used by the ANN operators).
  */
final case class TopKBuf(scores: Seq[Double], ids: Seq[Long])
final case class ScoredId(score: Double, id: Long)

class TopKAggregator(k: Int)
    extends Aggregator[ScoredId, TopKBuf, Seq[Long]] {

  private def better(s1: Double, i1: Long, s2: Double, i2: Long): Boolean =
    s1 > s2 || (s1 == s2 && i1 < i2)

  private def insert(b: TopKBuf, score: Double, id: Long): TopKBuf = {
    // buffers stay sorted best-first and truncated to k
    if (b.scores.size >= k && !better(score, id, b.scores.last, b.ids.last)) b
    else {
      val pos = b.scores.indices
        .find(i => better(score, id, b.scores(i), b.ids(i)))
        .getOrElse(b.scores.size)
      TopKBuf(
        (b.scores.take(pos) :+ score) ++ b.scores.drop(pos).take(k - pos - 1),
        (b.ids.take(pos) :+ id) ++ b.ids.drop(pos).take(k - pos - 1))
    }
  }

  override def zero: TopKBuf = TopKBuf(Seq.empty, Seq.empty)

  override def reduce(b: TopKBuf, in: ScoredId): TopKBuf =
    insert(b, in.score, in.id)

  override def merge(a: TopKBuf, b: TopKBuf): TopKBuf =
    (b.scores zip b.ids).foldLeft(a) { case (acc, (s, i)) => insert(acc, s, i) }

  override def finish(b: TopKBuf): Seq[Long] = b.ids

  override def bufferEncoder: Encoder[TopKBuf] = Encoders.product[TopKBuf]
  override def outputEncoder: Encoder[Seq[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
}
