package graft.streaming

import graft.streaming.StatefulUpsert.{KeyedEvent, KeyState}
import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Latest-wins state as a typed `Aggregator[IN, BUF, OUT]` — the
  * user-facing typed-aggregation API (usable with
  * `ds.groupByKey(_.key).agg(LatestStateAggregator.toColumn)`), giving the
  * same semantics as [[StatefulUpsert.fold]] and `LatestWins.latestState`
  * but as a partial-aggregable batch aggregate: `reduce` folds events into
  * a buffer per partition, `merge` combines partial buffers — map-side
  * combine for free, the right shape when the latest-state reduction runs
  * over a whole table rather than a micro-batch.
  *
  * All three formulations (window+filter, mapGroupsWithState fold, this
  * aggregator) are property-tested to agree.
  */
object LatestStateAggregator extends Aggregator[KeyedEvent, KeyState, KeyState] {

  private val ord: Ordering[(Long, Long)] = Ordering.Tuple2[Long, Long]

  override def zero: KeyState =
    KeyState(null, null, None, Long.MinValue, Long.MinValue, Long.MinValue, Long.MinValue)

  override def reduce(b: KeyState, e: KeyedEvent): KeyState =
    StatefulUpsert.fold(e.key, Some(if (b.key == null) b.copy(key = e.key) else b), Iterator(e))

  override def merge(a: KeyState, b: KeyState): KeyState = {
    if (a.key == null) return b
    if (b.key == null) return a
    val (denseSrc, denseTs, denseId) =
      if (ord.gteq((a.lastTs, a.lastId), (b.lastTs, b.lastId))) (a, a.lastTs, a.lastId)
      else (b, b.lastTs, b.lastId)
    val (amtSrc, amtTs, amtId) =
      if (ord.gteq((a.amtTs, a.amtId), (b.amtTs, b.amtId))) (a, a.amtTs, a.amtId)
      else (b, b.amtTs, b.amtId)
    KeyState(denseSrc.key, denseSrc.status, amtSrc.amount, denseTs, denseId, amtTs, amtId)
  }

  override def finish(reduction: KeyState): KeyState = reduction
  override def bufferEncoder: Encoder[KeyState] = Encoders.product[KeyState]
  override def outputEncoder: Encoder[KeyState] = Encoders.product[KeyState]
}
