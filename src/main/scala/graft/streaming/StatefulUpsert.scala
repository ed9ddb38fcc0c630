package graft.streaming

import org.apache.spark.sql.{Dataset, Encoder, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Keyed mutable state via `mapGroupsWithState` — the state-store-native
  * alternative to the foreachBatch + merge upsert in [[StreamPipelines]]
  * (SURVEY.md §1.1 abstraction 4). Instead of rewriting an external
  * snapshot every micro-batch, per-key state lives in Spark's state store
  * (checkpointed, partitioned by key across executors) and updated rows
  * stream out in update mode.
  *
  * Trade-off vs the merge sink (documented per reference
  * design_doc/PipelineArchitecture.md trade-off style): state-store upsert
  * scales with the ACTIVE key set and emits deltas; the merge sink
  * materializes a queryable table directly. Both implement the same
  * latest-wins + sparse-carry-forward semantics, property-tested against
  * each other.
  */
object StatefulUpsert {

  /** One keyed event: `amount` is the sparse field (update events omit it —
    * mirrors reference order events, mock_transaction_kafka_producer.py:106-113).
    */
  final case class KeyedEvent(key: String, ts: Long, id: Long, status: String, amount: Option[Double])

  /** Current state per key: latest dense fields, carried-forward sparse
    * field, and the (ts, id) high-water mark that makes replay idempotent.
    */
  final case class KeyState(key: String, status: String, amount: Option[Double], lastTs: Long, lastId: Long)

  implicit val eventEnc: Encoder[KeyedEvent] = Encoders.product[KeyedEvent]
  implicit val stateEnc: Encoder[KeyState]   = Encoders.product[KeyState]
  implicit val keyEnc: Encoder[String]       = Encoders.STRING

  private val tupleOrdering: Ordering[(Long, Long)] = Ordering.Tuple2[Long, Long]

  /** Fold a batch of events (any order) into the prior state. Pure —
    * shared by the streaming operator and tests.
    */
  def fold(key: String, prior: Option[KeyState], events: Iterator[KeyedEvent]): KeyState = {
    val sorted = events.toSeq.sortBy(e => (e.ts, e.id))
    var cur = prior.getOrElse(KeyState(key, null, None, Long.MinValue, Long.MinValue))
    sorted.foreach { e =>
      // replayed events at or below the high-water mark are no-ops
      if (tupleOrdering.gt((e.ts, e.id), (cur.lastTs, cur.lastId))) {
        cur = KeyState(key, e.status, e.amount.orElse(cur.amount), e.ts, e.id)
      }
    }
    cur
  }

  /** The streaming operator: update-mode stream of per-key states.
    * Use `OutputMode.Update` on the writer.
    */
  def latestPerKey(events: Dataset[KeyedEvent]): Dataset[KeyState] =
    events
      .groupByKey(_.key)
      .mapGroupsWithState[KeyState, KeyState](GroupStateTimeout.NoTimeout) {
        (key: String, it: Iterator[KeyedEvent], state: GroupState[KeyState]) =>
          val next = fold(key, state.getOption, it)
          state.update(next)
          next
      }

  val outputMode: OutputMode = OutputMode.Update()
}
