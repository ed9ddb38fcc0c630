package graft.functions

import java.nio.ByteBuffer
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, XxHash64Function}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{ArrayType, BinaryType, DataType, IntegerType, LongType, MapType, StringType, StructType}

/** Mergeable Bloom filter (extension tier, SURVEY.md §7.3 — the same
  * TypedImperativeAggregate shape as [[KmvDistinct]]).
  *
  * Role at 100 TB: replace the exact broadcast set-membership side of an
  * operator (e.g. the holdout digest set in
  * [[graft.ext.Decontaminate.contamination]]) when that set outgrows an
  * executor hash table. A Bloom filter over n items costs `numBits` bits
  * total (~10 bits/item for ~1% false positives vs ~50 BYTES/entry for an
  * exact hash set), is built distributedly (partial filters OR-merge, so
  * 1000 executors each fold their partition and ship one bitset), and
  * broadcasts as a single opaque value. Probes can false-positive — never
  * false-negative — so a membership pre-filter stays SOUND for
  * decontamination/scrub verdicts (nothing contaminated slips through) and
  * any downstream exact verify only pays for the ε of flagged rows.
  *
  * Hashing: items are folded to 64 bits with the same xxhash64(seed=42)
  * used by [[KmvDistinct]]; the `numHashes` probe positions derive from
  * the standard two-hash construction h1 + i·h2 (Kirsch & Mitzenmacher,
  * "Less Hashing, Same Performance", ESA 2006), so adding an item touches
  * `numHashes` bits regardless of item width.
  */
final class BloomBuffer(val numBits: Int, val numHashes: Int) extends Serializable {
  require(numBits > 0 && numBits % 64 == 0, s"numBits must be a positive multiple of 64, got $numBits")
  require(numHashes > 0, s"numHashes must be positive, got $numHashes")

  val words = new Array[Long](numBits >>> 6)

  @inline private def bitIndex(h1: Long, h2: Long, i: Int): Int = {
    val combined = h1 + i.toLong * h2
    // floorMod keeps the index non-negative for negative hashes
    java.lang.Math.floorMod(combined, numBits.toLong).toInt
  }

  /** Second hash for double hashing: an independent-ish mix of h (odd
    * multiplier + rotation), forced odd so successive probes cycle through
    * distinct residues when numBits is a power of two.
    */
  @inline private def h2of(h: Long): Long =
    (java.lang.Long.rotateLeft(h * 0x9E3779B97F4A7C15L, 31)) | 1L

  def addHash(h: Long): Unit = {
    val h2 = h2of(h)
    var i = 0
    while (i < numHashes) {
      val idx = bitIndex(h, h2, i)
      words(idx >>> 6) |= 1L << (idx & 63)
      i += 1
    }
  }

  def containsHash(h: Long): Boolean = {
    val h2 = h2of(h)
    var i = 0
    while (i < numHashes) {
      val idx = bitIndex(h, h2, i)
      if ((words(idx >>> 6) & (1L << (idx & 63))) == 0L) return false
      i += 1
    }
    true
  }

  def mergeFrom(other: BloomBuffer): Unit = {
    require(other.numBits == numBits && other.numHashes == numHashes,
      s"cannot merge bloom filters with different parameters: " +
        s"($numBits,$numHashes) vs (${other.numBits},${other.numHashes})")
    var i = 0
    while (i < words.length) { words(i) |= other.words(i); i += 1 }
  }

  def serialized: Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 4 + 8 * words.length)
    bb.putInt(numBits).putInt(numHashes)
    words.foreach(bb.putLong)
    bb.array()
  }
}

object BloomBuffer {
  val HashSeed = 42L

  def deserialize(bytes: Array[Byte]): BloomBuffer = {
    val bb  = ByteBuffer.wrap(bytes)
    val buf = new BloomBuffer(bb.getInt, bb.getInt)
    var i = 0
    while (i < buf.words.length) { buf.words(i) = bb.getLong; i += 1 }
    buf
  }

  /** Item → 64-bit hash, identical in the aggregate's update and the
    * probe expression (and callable from generated code). `v` must be the
    * CATALYST representation of `dt` (UTF8String for strings). */
  def hashOf(v: Any, dt: DataType): Long = XxHash64Function.hash(v, dt, HashSeed)
}

/** `graft_bloom_agg(col, numBits, numHashes)` — builds the filter over the
  * column's non-null values and returns it as BINARY. Partial-aggregable:
  * each partition folds locally, partials OR-merge.
  */
case class BloomAgg(
    child: Expression,
    numBits: Int,
    numHashes: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0
) extends TypedImperativeAggregate[BloomBuffer] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType
  override def prettyName: String = "graft_bloom_agg"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: ArrayType | _: MapType | _: StructType => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires an atomic input type, got ${child.dataType.catalogString}")
    case _ if numBits <= 0 || numBits % 64 != 0 => TypeCheckResult.TypeCheckFailure(
      s"$prettyName: numBits must be a positive multiple of 64, got $numBits")
    case _ if numHashes <= 0 || numHashes > 16 => TypeCheckResult.TypeCheckFailure(
      s"$prettyName: numHashes must be in [1, 16], got $numHashes")
    case _ => TypeCheckResult.TypeCheckSuccess
  }

  override def createAggregationBuffer(): BloomBuffer = new BloomBuffer(numBits, numHashes)

  override def update(buffer: BloomBuffer, input: InternalRow): BloomBuffer = {
    val v = child.eval(input)
    if (v != null) buffer.addHash(BloomBuffer.hashOf(v, child.dataType))
    buffer
  }

  override def merge(buffer: BloomBuffer, other: BloomBuffer): BloomBuffer = {
    buffer.mergeFrom(other); buffer
  }

  override def eval(buffer: BloomBuffer): Any = buffer.serialized

  override def serialize(buffer: BloomBuffer): Array[Byte] = buffer.serialized
  override def deserialize(bytes: Array[Byte]): BloomBuffer = BloomBuffer.deserialize(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): BloomAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BloomAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}

/** `graft_bloom_contains(filterBinary, col)` — membership probe. The
  * filter side must be FOLDABLE (a literal / broadcast value): it is
  * deserialized once per task, not per row, and the per-row work is
  * `numHashes` word probes inside whole-stage codegen — the same
  * build-once-probe-per-row contract as Spark's own runtime bloom filter
  * join pruning. Null filter or null item → null.
  */
case class BloomContains(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = org.apache.spark.sql.types.BooleanType
  override def prettyName: String = "graft_bloom_contains"

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType != BinaryType)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName: filter argument must be BINARY, got ${left.dataType.catalogString}")
    else if (!left.foldable)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName: filter argument must be foldable (build it first, pass it as a literal)")
    else right.dataType match {
      case StringType | LongType | IntegerType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName: item argument must be STRING or integral, got ${other.catalogString}")
    }

  /** Deserialized once per task from the foldable filter child. */
  @transient private lazy val filter: BloomBuffer = {
    val bytes = left.eval(null)
    if (bytes == null) null else BloomBuffer.deserialize(bytes.asInstanceOf[Array[Byte]])
  }

  override def eval(input: InternalRow): Any = {
    if (filter == null) return null
    val v = right.eval(input)
    if (v == null) null
    else filter.containsHash(BloomBuffer.hashOf(v, right.dataType))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    import org.apache.spark.sql.catalyst.expressions.codegen.{JavaCode, TrueLiteral}
    if (filter == null) {
      // null filter literal → constant null result
      ev.copy(code = code"", isNull = TrueLiteral, value = JavaCode.defaultLiteral(dataType))
    } else {
      val bloomRef = ctx.addReferenceObj("graftBloom", filter, classOf[BloomBuffer].getName)
      val dtRef    = ctx.addReferenceObj("graftBloomDt", right.dataType, classOf[DataType].getName)
      val itemCode = right.genCode(ctx)
      // box the item explicitly — janino does not autobox primitives
      val boxed = right.dataType match {
        case StringType  => itemCode.value.toString
        case LongType    => s"((Object) java.lang.Long.valueOf(${itemCode.value}))"
        case IntegerType => s"((Object) java.lang.Integer.valueOf(${itemCode.value}))"
        case other => throw new IllegalStateException(s"unreachable: $other passed type check")
      }
      ev.copy(code =
        code"""
           |${itemCode.code}
           |boolean ${ev.isNull} = ${itemCode.isNull};
           |boolean ${ev.value} = false;
           |if (!${ev.isNull}) {
           |  ${ev.value} = $bloomRef.containsHash(
           |    graft.functions.BloomBuffer.hashOf($boxed, $dtRef));
           |}
         """.stripMargin)
    }
  }

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
