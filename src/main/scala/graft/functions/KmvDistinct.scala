package graft.functions

import java.nio.ByteBuffer
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, XxHash64Function}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, MapType, StructType}

/** Bounded buffer of the `k` smallest 64-bit hashes seen (KMV sketch).
  * Mergeable: union-then-truncate. State is O(k) regardless of input size
  * — the property that makes the sketch shippable as a partial aggregate
  * from 1000 executors.
  */
final class KmvBuffer(val k: Int) {
  // max-heap of the k smallest values under UNSIGNED order (root = current
  // kth-smallest); the comparator must match the unsigned eviction test
  // and estimator
  private val heap = new java.util.PriorityQueue[java.lang.Long](
    math.max(1, k),
    new java.util.Comparator[java.lang.Long] {
      override def compare(a: java.lang.Long, b: java.lang.Long): Int =
        java.lang.Long.compareUnsigned(b, a)
    })
  private val seen = new java.util.HashSet[java.lang.Long](math.max(8, 2 * k))

  def add(h: Long): Unit = {
    val boxed = java.lang.Long.valueOf(h)
    if (seen.contains(boxed)) return
    if (heap.size < k) { heap.add(boxed); seen.add(boxed) }
    else if (java.lang.Long.compareUnsigned(h, heap.peek()) < 0) {
      seen.remove(heap.poll()); heap.add(boxed); seen.add(boxed)
    }
  }

  def mergeFrom(other: KmvBuffer): Unit = other.values.foreach(add)
  def values: Array[Long] = { val a = new Array[Long](heap.size); var i = 0
    val it = heap.iterator(); while (it.hasNext) { a(i) = it.next(); i += 1 }; a }
  def size: Int = heap.size
  /** kth smallest (unsigned) — only meaningful when size == k. */
  def kthMin: Long = heap.peek()
}

/** KMV (k-minimum-values) distinct-count sketch as a
  * `TypedImperativeAggregate` (SURVEY.md §7.3 "TypedImperativeAggregate
  * for mergeable sketches"). Exact below `k` distincts; above, the
  * standard estimator `(k-1) / R` where `R` is the kth-smallest hash
  * normalized to [0,1) — relative error ≈ 1/sqrt(k-2).
  *
  * vs built-in `approx_count_distinct` (HLL++): same role, simpler sketch,
  * included to demonstrate the custom-aggregate extension tier end to end
  * (buffer, partial update, merge, serialize) — the shape any
  * sketch-backed dedup/reach operator takes at 100 TB.
  */
case class KmvDistinct(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0
) extends TypedImperativeAggregate[KmvBuffer] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_kmv_distinct"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: ArrayType | _: MapType | _: StructType => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires an atomic input type, got ${child.dataType.catalogString}")
    case _ if k < 16 => TypeCheckResult.TypeCheckFailure(s"$prettyName: k must be >= 16, got $k")
    case _ => TypeCheckResult.TypeCheckSuccess
  }

  override def createAggregationBuffer(): KmvBuffer = new KmvBuffer(k)

  override def update(buffer: KmvBuffer, input: InternalRow): KmvBuffer = {
    val v = child.eval(input)
    if (v != null) buffer.add(XxHash64Function.hash(v, child.dataType, 42L))
    buffer
  }

  override def merge(buffer: KmvBuffer, other: KmvBuffer): KmvBuffer = {
    buffer.mergeFrom(other); buffer
  }

  override def eval(buffer: KmvBuffer): Any =
    if (buffer.size < k) buffer.size.toLong
    else {
      // kth-min under UNSIGNED order (matching the buffer) mapped to (0,1);
      // estimate (k-1)/R
      val twoTo64 = math.pow(2, 64)
      val kth     = buffer.kthMin
      val u       = if (kth >= 0) kth.toDouble else kth.toDouble + twoTo64
      val r       = u / twoTo64
      math.round((k - 1).toDouble / math.max(r, Double.MinPositiveValue))
    }

  override def serialize(buffer: KmvBuffer): Array[Byte] = {
    val vs = buffer.values
    val bb = ByteBuffer.allocate(4 + 4 + 8 * vs.length)
    bb.putInt(buffer.k).putInt(vs.length)
    vs.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): KmvBuffer = {
    val bb  = ByteBuffer.wrap(bytes)
    val buf = new KmvBuffer(bb.getInt)
    val n   = bb.getInt
    (0 until n).foreach(_ => buf.add(bb.getLong))
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): KmvDistinct =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KmvDistinct =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}

/** KMV sketch that RETAINS the k unsigned-smallest distinct values of a
  * pre-hashed LONG column (ascending array) instead of collapsing to a
  * count — the building block for theta-framework SET OPERATIONS
  * (union / intersection / difference estimates across groups, the
  * "audience overlap" problem). The caller supplies the hash (e.g.
  * [[graft.ext.ThetaSketch.hash40]]'s md5-derived 40-bit value) so the
  * sketch is engine-replayable: an oracle can reproduce the exact same
  * k-min set with a rank window over the same hash expression.
  *
  * Same O(k) buffer / map-side-combine / union-then-truncate merge
  * contract as [[KmvDistinct]]: state is bounded regardless of input
  * size, which is what makes per-group sketches shippable as partial
  * aggregates from 1000 executors while the groups themselves never
  * co-locate their raw member sets.
  */
case class KmvMinValues(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0
) extends TypedImperativeAggregate[KmvBuffer] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_kmv_values"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType if k >= 16 => TypeCheckResult.TypeCheckSuccess
    case LongType => TypeCheckResult.TypeCheckFailure(
      s"$prettyName: k must be >= 16, got $k")
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a pre-hashed BIGINT input, got ${other.catalogString}")
  }

  override def createAggregationBuffer(): KmvBuffer = new KmvBuffer(k)

  override def update(buffer: KmvBuffer, input: InternalRow): KmvBuffer = {
    val v = child.eval(input)
    if (v != null) buffer.add(v.asInstanceOf[Long])
    buffer
  }

  override def merge(buffer: KmvBuffer, other: KmvBuffer): KmvBuffer = {
    buffer.mergeFrom(other); buffer
  }

  override def eval(buffer: KmvBuffer): Any = {
    val vs = buffer.values
    java.util.Arrays.sort(vs)
    // unsigned ascending: negative longs (top bit set) rank ABOVE all
    // non-negative ones, and signed order among negatives matches
    // unsigned order — so rotate the negatives to the back
    val (neg, pos) = vs.partition(_ < 0)
    org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(pos ++ neg)
  }

  override def serialize(buffer: KmvBuffer): Array[Byte] = {
    val vs = buffer.values
    val bb = ByteBuffer.allocate(4 + 4 + 8 * vs.length)
    bb.putInt(buffer.k).putInt(vs.length)
    vs.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): KmvBuffer = {
    val bb  = ByteBuffer.wrap(bytes)
    val buf = new KmvBuffer(bb.getInt)
    val n   = bb.getInt
    (0 until n).foreach(_ => buf.add(bb.getLong))
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): KmvMinValues =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KmvMinValues =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}

/** [[KmvMinValues]] over ARRAY input: each input row contributes every
  * element of its `array<bigint>` of pre-hashed values, and the result is
  * the k unsigned-smallest distinct values across ALL rows' arrays —
  * i.e. the exact KMV union-merge of per-row sketches, as ONE aggregate.
  *
  * This is the sketch-typed-state shape for iterative sketch propagation
  * ([[graft.ext.Graphs.hyperAnf]]): merging neighbor sketches per node
  * previously required exploding every k-array into k rows (the shuffle
  * carried edges×k rows); with the array input the map-side partial
  * already holds ONE merged O(k) buffer per (node, task), so the shuffle
  * carries combined partials — per-node-per-map-partition, never
  * per-edge-per-element. Output order and semantics are bit-identical to
  * `kmvValues(explode(hs), k)`.
  */
case class KmvMergeArrays(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0
) extends TypedImperativeAggregate[KmvBuffer] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_kmv_merge_arrays"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) if k >= 16 => TypeCheckResult.TypeCheckSuccess
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckFailure(
      s"$prettyName: k must be >= 16, got $k")
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<bigint> of pre-hashed values, got ${other.catalogString}")
  }

  override def createAggregationBuffer(): KmvBuffer = new KmvBuffer(k)

  override def update(buffer: KmvBuffer, input: InternalRow): KmvBuffer = {
    val v = child.eval(input)
    if (v != null) {
      val arr = v.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
      var i = 0
      val n = arr.numElements()
      while (i < n) { buffer.add(arr.getLong(i)); i += 1 }
    }
    buffer
  }

  override def merge(buffer: KmvBuffer, other: KmvBuffer): KmvBuffer = {
    buffer.mergeFrom(other); buffer
  }

  override def eval(buffer: KmvBuffer): Any = {
    val vs = buffer.values
    java.util.Arrays.sort(vs)
    val (neg, pos) = vs.partition(_ < 0)
    org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(pos ++ neg)
  }

  override def serialize(buffer: KmvBuffer): Array[Byte] = {
    val vs = buffer.values
    val bb = ByteBuffer.allocate(4 + 4 + 8 * vs.length)
    bb.putInt(buffer.k).putInt(vs.length)
    vs.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): KmvBuffer = {
    val bb  = ByteBuffer.wrap(bytes)
    val buf = new KmvBuffer(bb.getInt)
    val n   = bb.getInt
    (0 until n).foreach(_ => buf.add(bb.getLong))
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): KmvMergeArrays =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KmvMergeArrays =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}
