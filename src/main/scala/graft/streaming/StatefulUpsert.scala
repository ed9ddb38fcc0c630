package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoder, Encoders}
import org.apache.spark.sql.functions._
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

  /** Current state per key. Dense fields carry a (lastTs, lastId)
    * high-water mark; the sparse field carries its OWN (amtTs, amtId) mark
    * — the newest NON-NULL occurrence — so a late-arriving event that is
    * older than the dense state but newer than the last non-null amount
    * still updates the amount, exactly like the batch IGNORE-NULLS
    * carry-forward. Both marks also make replays no-ops.
    */
  final case class KeyState(key: String, status: String, amount: Option[Double],
                            lastTs: Long, lastId: Long, amtTs: Long, amtId: Long)

  implicit val eventEnc: Encoder[KeyedEvent] = Encoders.product[KeyedEvent]
  implicit val stateEnc: Encoder[KeyState]   = Encoders.product[KeyState]
  implicit val keyEnc: Encoder[String]       = Encoders.STRING

  private val ord: Ordering[(Long, Long)] = Ordering.Tuple2[Long, Long]

  /** Fold a batch of events (any order, late arrivals included) into the
    * prior state. Pure — shared by the streaming operator and tests.
    * Agrees with `LatestWins.latestState` over the union of all events
    * regardless of batching/ordering (property-tested).
    */
  def fold(key: String, prior: Option[KeyState], events: Iterator[KeyedEvent]): KeyState = {
    var cur = prior.getOrElse(
      KeyState(key, null, None, Long.MinValue, Long.MinValue, Long.MinValue, Long.MinValue))
    events.foreach { e =>
      val newerDense = ord.gt((e.ts, e.id), (cur.lastTs, cur.lastId))
      val newerAmt   = e.amount.isDefined && ord.gt((e.ts, e.id), (cur.amtTs, cur.amtId))
      cur = KeyState(
        key,
        if (newerDense) e.status else cur.status,
        if (newerAmt) e.amount else cur.amount,
        if (newerDense) e.ts else cur.lastTs,
        if (newerDense) e.id else cur.lastId,
        if (newerAmt) e.ts else cur.amtTs,
        if (newerAmt) e.id else cur.amtId)
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

  /** Sentinel status marking a state evicted by TTL. */
  val ExpiredStatus = "__expired__"

  /** Bounded-state variant via `flatMapGroupsWithState` + event-time TTL:
    * a key idle for longer than `ttl` past the watermark is EVICTED from
    * the state store (emitting a tombstone with [[ExpiredStatus]]), so
    * state size tracks the ACTIVE key set, not the all-time key set — the
    * property that keeps a 100 TB keyed-state job from growing without
    * bound (the reference caps state differently: 10 s watermark + append
    * windows; for current-state tables TTL eviction is the analog).
    *
    * `events.ts` is interpreted as epoch millis for watermarking.
    */
  def latestPerKeyWithTtl(
      events: Dataset[KeyedEvent],
      ttlMs: Long = 30L * 60 * 1000,
      watermarkDelay: String = "10 seconds"
  ): Dataset[KeyState] = {
    events
      .withColumn("eventTime", timestamp_millis(col("ts")))
      .withWatermark("eventTime", watermarkDelay)
      .as[KeyedEventWithTime]
      .groupByKey(_.key)
      .flatMapGroupsWithState[KeyState, KeyState](
        OutputMode.Update(), GroupStateTimeout.EventTimeTimeout()) {
        (key: String, it: Iterator[KeyedEventWithTime], state: GroupState[KeyState]) =>
          if (state.hasTimedOut) {
            val tomb = state.get.copy(status = ExpiredStatus)
            state.remove()
            Iterator(tomb)
          } else {
            val next = fold(key, state.getOption,
              it.map(e => KeyedEvent(e.key, e.ts, e.id, e.status, e.amount)))
            state.update(next)
            // evict once the watermark passes last activity + ttl; clamp
            // above the current watermark — a just-admitted late event can
            // otherwise produce a timeout at/below it, which Spark rejects
            // and fails the query
            val wm = state.getCurrentWatermarkMs()
            state.setTimeoutTimestamp(math.max(next.lastTs + ttlMs, wm + 1))
            Iterator(next)
          }
      }
  }

  /** [[KeyedEvent]] plus the derived event-time column for watermarking. */
  final case class KeyedEventWithTime(key: String, ts: Long, id: Long, status: String,
                                      amount: Option[Double], eventTime: java.sql.Timestamp)
  implicit val eventTimeEnc: Encoder[KeyedEventWithTime] = Encoders.product[KeyedEventWithTime]
}
