package graft.functions

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.{Column, SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expressions for the extension tier's hot loops
  * (SURVEY.md §7.3/§7.4): the interpreted higher-order-function forms
  * (`aggregate(zip_with(...))`, `size(array_intersect(...))`) evaluate an
  * expression tree per ELEMENT; these generate a tight Java loop per ROW
  * inside whole-stage codegen.
  *
  * Both are drop-in value-identical with their built-in formulations —
  * same left-to-right double fold, same intersection semantics — so the
  * DuckDB oracles keep hash-matching.
  *
  * Registered via [[GraftExtensions]] (`spark.sql.extensions`) and called
  * through [[GraftFunctions]].
  */

/** Dot product of two double arrays, summed left-to-right (bit-identical
  * to `aggregate(zip_with(a, b, (x,y) -> x*y), 0D, (acc,x) -> acc+x)`).
  * Null when either input is null, lengths differ, or any element is null
  * — exactly the built-in composition's behavior.
  */
case class DotProductD(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_dot"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), ArrayType(DoubleType, _)) => TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires two array<double> arguments, got " +
          s"${left.dataType.catalogString} and ${right.dataType.catalogString}")
    }

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val l = left.eval(input)
    if (l == null) return null
    val r = right.eval(input)
    if (r == null) return null
    DotProductUtil.compute(l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val sum = ctx.freshName("sum")
      val i   = ctx.freshName("i")
      val n   = ctx.freshName("n")
      val bad = ctx.freshName("bad")
      s"""
         |final int $n = $a.numElements();
         |boolean $bad = $n != $b.numElements();
         |double $sum = 0.0;
         |if (!$bad) {
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { $bad = true; break; }
         |    $sum += $a.getDouble($i) * $b.getDouble($i);
         |  }
         |}
         |if ($bad) { ${ev.isNull} = true; } else { ${ev.value} = $sum; }
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object DotProductUtil {
  /** Shared by interpreted eval; the codegen path inlines the same loop. */
  def compute(a: ArrayData, b: ArrayData): java.lang.Double = {
    val n = a.numElements()
    if (n != b.numElements()) return null
    var sum = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      sum += a.getDouble(i) * b.getDouble(i)
      i += 1
    }
    sum
  }
}

/** The 64-bit perceptual gradient hash (dHash, Krawetz) of a payload
  * string as ONE tight per-row loop — value-identical to the
  * [[graft.ext.Multimodal.DhashFpSql]] higher-order-function form (and
  * to the q294/q302 DuckDB oracles): char codes pool into the 72
  * proportional cells ((j·len div 72, (j+1)·len div 72]), integer mean
  * per cell, 64 brightness-order bits on the 8×9 grid, packed MSB-first
  * into two signed 32-bit halves.
  *
  * Why native: the HOF form's `split(__t, '')` allocates one
  * single-char string per character per evaluation — measured ~1 ms/doc
  * (the q294 floor) vs one char scan here. Char code = UTF-16 unit
  * (`ascii()` semantics on the documented all-ASCII stub-decode
  * contract, where the two coincide). CONTRACT NOTE for a codec-equipped
  * build: real decoded bytes must enter as latin-1 (one byte ↔ one
  * UTF-16 unit) or the swap must replace this char scan with a byte
  * scan — feeding UTF-8-decoded multi-byte text would pool UTF-16
  * surrogates, silently diverging from a byte-domain oracle.
  *
  * Output: struct(fp_hi: bigint, fp_lo: bigint); null in → null out.
  */
case class DhashFingerprint64(child: Expression)
  extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def dataType: DataType = org.apache.spark.sql.types.StructType(Seq(
    org.apache.spark.sql.types.StructField("hi", org.apache.spark.sql.types.LongType, nullable = false),
    org.apache.spark.sql.types.StructField("lo", org.apache.spark.sql.types.LongType, nullable = false)))
  override def prettyName: String = "graft_dhash64"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string payload, got ${other.catalogString}")
  }

  override protected def nullSafeEval(s: Any): Any =
    DhashUtil.compute(s.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, s => s"graft.functions.DhashUtil.compute($s)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object DhashUtil {
  /** Shared by interpreted eval; the codegen path calls this directly. */
  def compute(s: UTF8String): org.apache.spark.sql.catalyst.InternalRow = {
    val str = s.toString
    val len = str.length
    val cells = new Array[Long](72)
    var j = 0
    while (j < 72) {
      val lo = j.toLong * len / 72
      val hi = (j + 1).toLong * len / 72
      if (hi >= lo + 1) {
        var sum = 0L
        var i = lo.toInt
        while (i < hi.toInt) { sum += str.charAt(i).toLong; i += 1 }
        cells(j) = sum / (hi - lo)
      }
      j += 1
    }
    var hiBits = 0L
    var loBits = 0L
    var k = 0
    while (k < 64) {
      val r = k / 8
      val c = k % 8
      val bit = if (cells(r * 9 + c) > cells(r * 9 + c + 1)) 1L else 0L
      if (k < 32) hiBits = hiBits * 2L + bit else loBits = loBits * 2L + bit
      k += 1
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](hiBits, loBits))
  }
}

/** 32-bit chromaprint-shaped spectral fingerprint of a (current, previous)
  * window pair — the codegen'd native twin of
  * [[graft.ext.Multimodal.ChromaFpSql]]: each window pools into 33
  * proportional floor-mean band energies (char code = UTF-16 unit, the
  * all-ASCII stub-decode contract), and bit k records whether the band-k
  * spectral gradient E[k]−E[k+1] GREW from the previous window to the
  * current one (Lalinský's AcoustID bit rule).
  *
  * Why native: the HOF form's `split(__t, '')` allocates one single-char
  * string per character per window pair per evaluation (the q294 lesson);
  * here each window is one char scan.
  *
  * Output: non-negative BIGINT fp (< 2³²); null in → null out.
  */
case class ChromaFingerprint32(left: Expression, right: Expression)
  extends BinaryExpression {

  override def dataType: DataType = org.apache.spark.sql.types.LongType
  override def prettyName: String = "graft_chroma32"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, StringType) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires two string windows, got $other")
    }

  override protected def nullSafeEval(t: Any, p: Any): Any =
    ChromaUtil.compute(t.asInstanceOf[UTF8String], p.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (t, p) => s"graft.functions.ChromaUtil.compute($t, $p)")

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object ChromaUtil {
  /** 33 proportional floor-mean band energies of a window's char codes. */
  private def energies(s: UTF8String): Array[Long] = {
    val str = s.toString
    val len = str.length
    val e = new Array[Long](33)
    var b = 0
    while (b < 33) {
      val lo = b.toLong * len / 33
      val hi = (b + 1).toLong * len / 33
      if (hi >= lo + 1) {
        var sum = 0L
        var i = lo.toInt
        while (i < hi.toInt) { sum += str.charAt(i).toLong; i += 1 }
        e(b) = sum / (hi - lo)
      }
      b += 1
    }
    e
  }

  /** Shared by interpreted eval; the codegen path calls this directly. */
  def compute(t: UTF8String, p: UTF8String): Long = {
    val et = energies(t)
    val ep = energies(p)
    var fp = 0L
    var k = 0
    while (k < 32) {
      val bit = if (et(k) - et(k + 1) > ep(k) - ep(k + 1)) 1L else 0L
      fp = fp * 2L + bit
      k += 1
    }
    fp
  }
}

/** `size(array_intersect(a, b))` without materializing the intermediate
  * array: count of distinct elements of `a` also present in `b` (a shared
  * null element counts once, mirroring array_intersect).
  */
case class IntersectSize(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = IntegerType
  override def prettyName: String = "graft_intersect_size"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(StringType, _), ArrayType(StringType, _)) => TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires two array<string> arguments, got " +
          s"${left.dataType.catalogString} and ${right.dataType.catalogString}")
    }

  override protected def nullSafeEval(l: Any, r: Any): Any =
    IntersectSizeUtil.compute(l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.IntersectSizeUtil.compute($a, $b)")

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object IntersectSizeUtil {
  def compute(a: ArrayData, b: ArrayData): Int = {
    val bSet = new java.util.HashSet[UTF8String](Math.max(8, b.numElements() * 2))
    var bHasNull = false
    var i = 0
    while (i < b.numElements()) {
      if (b.isNullAt(i)) bHasNull = true else bSet.add(b.getUTF8String(i))
      i += 1
    }
    val seen = new java.util.HashSet[UTF8String](Math.max(8, a.numElements() * 2))
    var aNullCounted = false
    var count = 0
    i = 0
    while (i < a.numElements()) {
      if (a.isNullAt(i)) {
        if (bHasNull && !aNullCounted) { count += 1; aNullCounted = true }
      } else {
        val v = a.getUTF8String(i)
        if (bSet.contains(v) && seen.add(v)) count += 1
      }
      i += 1
    }
    count
  }
}

/** Jaro-Winkler similarity (Winkler 1990) as a native codegen'd
  * expression — Spark ships `levenshtein` but not the record-linkage
  * standard JW; a Scala UDF here would box both strings per row and fall
  * out of whole-stage codegen, so this is the custom-`Expression` path
  * (SURVEY.md §7.3 preference order). Canonical semantics: match window
  * ⌊max/2⌋−1, transpositions halved, prefix bonus 0.1·min(prefix,4)
  * applied only when jaro > 0.7 — verified value-identical to DuckDB's
  * `jaro_winkler_similarity` (the oracle side). Comparison is by UTF-16
  * code unit — identical to DuckDB for ASCII corpora; for non-BMP text
  * both engines' definitions diverge anyway (bytes vs code units), so
  * keys should be normalized upstream.
  */
case class JaroWinklerSim(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_jaro_winkler"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, StringType) => TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires two string arguments, got " +
          s"${left.dataType.catalogString} and ${right.dataType.catalogString}")
    }

  override protected def nullSafeEval(l: Any, r: Any): Any =
    JaroWinklerUtil.compute(l.asInstanceOf[UTF8String], r.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.JaroWinklerUtil.compute($a, $b)")

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object JaroWinklerUtil {
  def compute(a: UTF8String, b: UTF8String): Double = {
    val s1 = a.toString; val s2 = b.toString
    if (s1 == s2) return 1.0
    val l1 = s1.length; val l2 = s2.length
    if (l1 == 0 || l2 == 0) return 0.0
    val window = math.max(l1, l2) / 2 - 1
    val f1 = new Array[Boolean](l1); val f2 = new Array[Boolean](l2)
    var m = 0
    var i = 0
    while (i < l1) {
      val lo = math.max(0, i - window); val hi = math.min(i + window + 1, l2)
      var j = lo
      var hit = false
      while (j < hi && !hit) {
        if (!f2(j) && s1.charAt(i) == s2.charAt(j)) {
          f1(i) = true; f2(j) = true; m += 1; hit = true
        }
        j += 1
      }
      i += 1
    }
    if (m == 0) return 0.0
    var t = 0; var k = 0
    i = 0
    while (i < l1) {
      if (f1(i)) {
        while (!f2(k)) k += 1
        if (s1.charAt(i) != s2.charAt(k)) t += 1
        k += 1
      }
      i += 1
    }
    val tr = t / 2
    val jaro = (m.toDouble / l1 + m.toDouble / l2 + (m - tr).toDouble / m) / 3.0
    if (jaro <= 0.7) return jaro
    var p = 0
    val maxP = math.min(4, math.min(l1, l2))
    while (p < maxP && s1.charAt(p) == s2.charAt(p)) p += 1
    jaro + 0.1 * p * (1.0 - jaro)
  }
}

/** `spark.sql.extensions` entry point registering the graft functions.
  * Add `.config("spark.sql.extensions", "graft.functions.GraftExtensions")`
  * to the session builder.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    // hidden-partitioning predicate rewrite (graft.plans) — ts predicates
    // imply <ts>_day partition predicates, unlocking partition pruning
    ext.injectOptimizerRule(_ => graft.plans.PartitionPredicateRewrite)
    ext.injectFunction((
      new FunctionIdentifier("graft_dot"),
      new ExpressionInfo(classOf[DotProductD].getName, "graft_dot"),
      (children: Seq[Expression]) => {
        require(children.size == 2, "graft_dot(arrayA, arrayB)")
        DotProductD(children.head, children(1))
      }))
    ext.injectFunction((
      new FunctionIdentifier("graft_intersect_size"),
      new ExpressionInfo(classOf[IntersectSize].getName, "graft_intersect_size"),
      (children: Seq[Expression]) => {
        require(children.size == 2, "graft_intersect_size(arrayA, arrayB)")
        IntersectSize(children.head, children(1))
      }))
    ext.injectFunction((
      new FunctionIdentifier("graft_jaro_winkler"),
      new ExpressionInfo(classOf[JaroWinklerSim].getName, "graft_jaro_winkler"),
      (children: Seq[Expression]) => {
        require(children.size == 2, "graft_jaro_winkler(stringA, stringB)")
        JaroWinklerSim(children.head, children(1))
      }))
    ext.injectFunction((
      new FunctionIdentifier("graft_dhash64"),
      new ExpressionInfo(classOf[DhashFingerprint64].getName, "graft_dhash64"),
      (children: Seq[Expression]) => {
        require(children.size == 1, "graft_dhash64(payload)")
        DhashFingerprint64(children.head)
      }))
    ext.injectFunction((
      new FunctionIdentifier("graft_chroma32"),
      new ExpressionInfo(classOf[ChromaFingerprint32].getName, "graft_chroma32"),
      (children: Seq[Expression]) => {
        require(children.size == 2, "graft_chroma32(curWindow, prevWindow)")
        ChromaFingerprint32(children.head, children(1))
      }))
    ext.injectFunction((
      new FunctionIdentifier("graft_kmv_distinct"),
      new ExpressionInfo(classOf[KmvDistinct].getName, "graft_kmv_distinct"),
      (children: Seq[Expression]) => {
        require(children.size == 2, "graft_kmv_distinct(col, k)")
        val k = children(1) match {
          case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
          case other => throw new IllegalArgumentException(
            s"graft_kmv_distinct: k must be an integer literal, got $other")
        }
        KmvDistinct(children.head, k).toAggregateExpression()
      }))
    ext.injectFunction((
      new FunctionIdentifier("graft_kmv_values"),
      new ExpressionInfo(classOf[KmvMinValues].getName, "graft_kmv_values"),
      (children: Seq[Expression]) => {
        require(children.size == 2, "graft_kmv_values(hashCol, k)")
        val k = children(1) match {
          case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
          case other => throw new IllegalArgumentException(
            s"graft_kmv_values: k must be an integer literal, got $other")
        }
        KmvMinValues(children.head, k).toAggregateExpression()
      }))
    ext.injectFunction((
      new FunctionIdentifier("graft_kmv_merge_arrays"),
      new ExpressionInfo(classOf[KmvMergeArrays].getName, "graft_kmv_merge_arrays"),
      (children: Seq[Expression]) => {
        require(children.size == 2, "graft_kmv_merge_arrays(hashArrayCol, k)")
        val k = children(1) match {
          case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
          case other => throw new IllegalArgumentException(
            s"graft_kmv_merge_arrays: k must be an integer literal, got $other")
        }
        KmvMergeArrays(children.head, k).toAggregateExpression()
      }))
    ext.injectFunction((
      new FunctionIdentifier("graft_bloom_agg"),
      new ExpressionInfo(classOf[BloomAgg].getName, "graft_bloom_agg"),
      (children: Seq[Expression]) => {
        require(children.size == 3, "graft_bloom_agg(col, numBits, numHashes)")
        val args = children.tail.map {
          case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
          case other => throw new IllegalArgumentException(
            s"graft_bloom_agg: numBits/numHashes must be integer literals, got $other")
        }
        BloomAgg(children.head, args.head, args(1)).toAggregateExpression()
      }))
    ext.injectFunction((
      new FunctionIdentifier("graft_bloom_contains"),
      new ExpressionInfo(classOf[BloomContains].getName, "graft_bloom_contains"),
      (children: Seq[Expression]) => {
        require(children.size == 2, "graft_bloom_contains(filterBinary, col)")
        BloomContains(children.head, children(1))
      }))
    ext.injectFunction((
      new FunctionIdentifier("graft_freq_items"),
      new ExpressionInfo(classOf[FreqItems].getName, "graft_freq_items"),
      (children: Seq[Expression]) => {
        require(children.size == 2, "graft_freq_items(col, m)")
        val m = children(1) match {
          case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
          case other => throw new IllegalArgumentException(
            s"graft_freq_items: m must be an integer literal, got $other")
        }
        FreqItems(children.head, m).toAggregateExpression()
      }))
  }
}

/** Column-level entry points (require [[GraftExtensions]] on the session). */
object GraftFunctions {
  val ExtensionsConf: (String, String) = "spark.sql.extensions" -> classOf[GraftExtensions].getName

  def dot(a: Column, b: Column): Column = call_function("graft_dot", a, b)
  def intersectSize(a: Column, b: Column): Column = call_function("graft_intersect_size", a, b)
  /** 64-bit perceptual dHash of a payload string as struct(hi, lo) —
    * the codegen'd native twin of [[graft.ext.Multimodal.DhashFpSql]]. */
  def dhash64(c: Column): Column = call_function("graft_dhash64", c)
  /** 32-bit chroma window fingerprint of a (current, previous) window
    * pair — the codegen'd native twin of
    * [[graft.ext.Multimodal.ChromaFpSql]]. */
  def chroma32(cur: Column, prev: Column): Column =
    call_function("graft_chroma32", cur, prev)
  /** Jaro-Winkler similarity in [0,1] (codegen'd native expression). */
  def jaroWinkler(a: Column, b: Column): Column = call_function("graft_jaro_winkler", a, b)
  /** KMV distinct-count sketch aggregate (exact below k). */
  def kmvDistinct(c: Column, k: Int): Column =
    call_function("graft_kmv_distinct", c, org.apache.spark.sql.functions.lit(k))
  /** KMV value sketch aggregate: the k unsigned-smallest distinct values
    * of a pre-hashed BIGINT column, ascending — the theta-set-op input. */
  def kmvValues(c: Column, k: Int): Column =
    call_function("graft_kmv_values", c, org.apache.spark.sql.functions.lit(k))
  /** KMV union-merge of per-row `array<bigint>` sketches: the k
    * unsigned-smallest distinct values across all rows' arrays, ascending
    * — bit-identical to `kmvValues(explode(arr), k)` with O(k) map-side
    * state instead of an explode. */
  def kmvMergeArrays(c: Column, k: Int): Column =
    call_function("graft_kmv_merge_arrays", c, org.apache.spark.sql.functions.lit(k))
  /** Misra-Gries heavy-hitters aggregate: map of ≤ m candidate items. */
  def freqItems(c: Column, m: Int): Column =
    call_function("graft_freq_items", c, org.apache.spark.sql.functions.lit(m))
  /** Bloom filter aggregate → BINARY (mergeable, no false negatives). */
  def bloomAgg(c: Column, numBits: Int, numHashes: Int): Column =
    call_function("graft_bloom_agg", c,
      org.apache.spark.sql.functions.lit(numBits), org.apache.spark.sql.functions.lit(numHashes))
  /** Membership probe against a foldable serialized bloom filter. */
  def bloomContains(filter: Column, item: Column): Column =
    call_function("graft_bloom_contains", filter, item)

  /** True when the graft extension functions are resolvable on `spark`. */
  def installed(spark: SparkSession): Boolean = spark.catalog.functionExists("graft_dot")
}
