package graft.streaming

import scala.collection.mutable

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}

import graft.operators.HeavyHitters

/** Streaming heavy hitters: the Misra–Gries sketch as STANDING state —
  * the continuous twin of the batch q77 pipeline. Tokens shard by hash
  * into `nShards` groups; each group holds one capacity-bounded MG
  * counter table in `flatMapGroupsWithState`, folded forward every
  * micro-batch. MG folds item-by-item, so state resumed from batch N−1
  * equals one pass over the concatenated stream (the batch/stream
  * parity the spec pins), and any token with frequency
  * > n_shard/(capacity+1) is guaranteed present — the same bound as the
  * batch sketch, per shard.
  *
  * Scale: state is nShards × capacity counters TOTAL, independent of
  * vocabulary or stream length — the whole point versus a streaming
  * groupBy(token).count(), whose state is the vocabulary. Each emitted
  * row carries the shard's cumulative item count (`seen`) so a sink
  * can identify each shard's LATEST emission. Consumers must take a
  * shard's rows from its highest `seen` as a whole SNAPSHOT, replacing
  * the shard's previous set (exactly what the spec does) — NOT
  * last-wins per token: MG decrements can evict a counter between
  * batches, and an evicted token is never re-emitted or tombstoned, so
  * a per-token sink would retain its stale counter forever.
  */
object StreamingHeavyHitters {

  /** MG counter table as encodable state. */
  final case class MgState(tokens: Seq[String], counts: Seq[Long], seen: Long)

  final case class SketchRow(shard: Int, token: String, bound: Long, seen: Long)

  /** Continuous per-shard MG sketches over a stream of tokens. Works on
    * a streaming Dataset (state carried across micro-batches); each
    * batch emits every live counter of the shards it touched. */
  def sketchStream(tokens: Dataset[String], nShards: Int = 8,
      capacity: Int = 64): DataFrame = {
    val spark = tokens.sparkSession
    import spark.implicits._
    tokens
      .groupByKey(t => math.floorMod(t.hashCode, nShards))
      .flatMapGroupsWithState[MgState, SketchRow](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        case (shard, it, state) =>
          val prev = state.getOption.getOrElse(MgState(Nil, Nil, 0L))
          val counters = mutable.Map.from(prev.tokens.zip(prev.counts))
          var n = prev.seen
          HeavyHitters.mgUpdate(counters, it.map { t => n += 1; t }, capacity)
          // sorted state: deterministic encoding run-over-run
          val sorted = counters.toSeq.sortBy(_._1)
          state.update(MgState(sorted.map(_._1), sorted.map(_._2), n))
          sorted.iterator.map { case (t, c) => SketchRow(shard, t, c, n) }
      }
      .toDF("shard", "token", "bound", "seen")
  }
}
