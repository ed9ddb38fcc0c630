package graft.functions

import java.nio.ByteBuffer
import java.nio.charset.StandardCharsets
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayBasedMapData, GenericArrayData}
import org.apache.spark.sql.types.{DataType, LongType, MapType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Misra-Gries heavy-hitters summary with capacity `m`: at most m counters;
  * an unseen item beyond capacity decrements every counter (dropping
  * zeros). Classic guarantees: every item with true frequency > N/(m+1) is
  * retained, and each kept counter undercounts by at most N/(m+1).
  *
  * Mergeable (Agarwal et al., "Mergeable Summaries", PODS 2012): add
  * counters pointwise, then subtract the (m+1)-th largest count from all
  * and drop non-positives — error bounds compose additively, so partial
  * summaries from 1000 executors combine into one with the same guarantee.
  */
final class MgBuffer(val m: Int) {
  private[functions] val counts = new java.util.HashMap[String, Long](2 * m)

  def add(item: String, w: Long = 1L): Unit = {
    val cur = counts.get(item)
    if (cur != 0L || counts.containsKey(item)) counts.put(item, cur + w)
    else if (counts.size < m) counts.put(item, w)
    else {
      // decrement-all by the new item's weight, bounded by the current min
      val it  = counts.values().iterator()
      var min = Long.MaxValue
      while (it.hasNext) min = math.min(min, it.next())
      val dec = math.min(w, min)
      decrementAll(dec)
      if (w > dec) add(item, w - dec) // leftover weight re-enters (space freed)
    }
  }

  private def decrementAll(by: Long): Unit = {
    val it = counts.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val nv = e.getValue - by
      if (nv <= 0L) it.remove() else e.setValue(nv)
    }
  }

  def mergeFrom(other: MgBuffer): Unit = {
    val it = other.counts.entrySet().iterator()
    while (it.hasNext) {
      val e   = it.next()
      val cur = counts.get(e.getKey)
      counts.put(e.getKey, cur + e.getValue)
    }
    if (counts.size > m) {
      // subtract the (m+1)-th largest count, keep positives (≤ m survive)
      val vals = new Array[Long](counts.size)
      val vi   = counts.values().iterator()
      var i    = 0
      while (vi.hasNext) { vals(i) = vi.next(); i += 1 }
      java.util.Arrays.sort(vals)
      val cutoff = vals(vals.length - (m + 1))
      decrementAll(cutoff)
    }
  }

  def size: Int = counts.size

  /** Snapshot of the kept (item, count) pairs. */
  def entries: Seq[(String, Long)] = {
    val b  = Seq.newBuilder[(String, Long)]
    val it = counts.entrySet().iterator()
    while (it.hasNext) { val e = it.next(); b += e.getKey -> e.getValue }
    b.result()
  }
}

/** Heavy-hitters aggregate `graft_freq_items(col, m)` over a STRING column:
  * returns a `map<string,bigint>` of up to `m` candidate frequent items
  * with their (under-)estimated counts — the bounded-state answer to
  * "top tokens / hot keys" that an exact groupBy-count cannot give at
  * 100 TB when the key space itself does not fit anywhere.
  */
case class FreqItems(
    child: Expression,
    m: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0
) extends TypedImperativeAggregate[MgBuffer] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = MapType(StringType, LongType, valueContainsNull = false)
  override def prettyName: String = "graft_freq_items"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType if m >= 1 => TypeCheckResult.TypeCheckSuccess
    case StringType => TypeCheckResult.TypeCheckFailure(s"$prettyName: m must be >= 1, got $m")
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string column, got ${other.catalogString}")
  }

  override def createAggregationBuffer(): MgBuffer = new MgBuffer(m)

  override def update(buffer: MgBuffer, input: InternalRow): MgBuffer = {
    val v = child.eval(input)
    if (v != null) buffer.add(v.asInstanceOf[UTF8String].toString)
    buffer
  }

  override def merge(buffer: MgBuffer, other: MgBuffer): MgBuffer = {
    buffer.mergeFrom(other); buffer
  }

  override def eval(buffer: MgBuffer): Any = {
    // deterministic map layout: entries sorted by (count desc, item asc)
    val sorted = buffer.entries.sortBy { case (k, c) => (-c, k) }
    new ArrayBasedMapData(
      new GenericArrayData(sorted.map(e => UTF8String.fromString(e._1)).toArray[Any]),
      new GenericArrayData(sorted.map(_._2).toArray[Any]))
  }

  override def serialize(buffer: MgBuffer): Array[Byte] = {
    val entries = buffer.counts.entrySet().toArray(Array.empty[java.util.Map.Entry[String, Long]])
    val payloads = entries.map(e => e.getKey.getBytes(StandardCharsets.UTF_8) -> e.getValue)
    val bb = ByteBuffer.allocate(8 + payloads.map(_._1.length + 12).sum)
    bb.putInt(buffer.m).putInt(payloads.length)
    payloads.foreach { case (kb, c) => bb.putInt(kb.length); bb.put(kb); bb.putLong(c) }
    java.util.Arrays.copyOf(bb.array(), bb.position())
  }

  override def deserialize(bytes: Array[Byte]): MgBuffer = {
    val bb  = ByteBuffer.wrap(bytes)
    val buf = new MgBuffer(bb.getInt)
    val n   = bb.getInt
    (0 until n).foreach { _ =>
      val kb = new Array[Byte](bb.getInt)
      bb.get(kb)
      buf.counts.put(new String(kb, StandardCharsets.UTF_8), bb.getLong)
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): FreqItems =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): FreqItems =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}
