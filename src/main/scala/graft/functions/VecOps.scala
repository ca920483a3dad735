package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Dot product of two array<float|double> columns as a native Catalyst
  * expression — the hot loop of every embedding operator (cosine
  * top-k, LSH bucket verify, near-dup pairs, IVF assignment).
  *
  * Semantics are EXACTLY the HOF formulation it replaces
  * (`aggregate(zip_with(a, b, (x, y) => x.cast(double) *
  * y.cast(double)), 0.0, _ + _)`, kept in DedupSimilaritySpec as the
  * independent oracle): left-to-right fold from 0.0 (bit-identical
  * float→double widening and add order), NULL when either side is
  * null, when lengths differ (zip_with pads with null → null sum), or
  * when any element is null.
  *
  * Why an Expression: zip_with/aggregate lambdas are CodegenFallback —
  * per PAIR of vectors they allocate a zipped array plus a boxed
  * accumulator per element, interpreted. On a candidate-pair verify
  * that's millions of boxed ops; this loop is allocation-free, stays
  * inside whole-stage codegen, and reads both arrays' primitive
  * storage directly.
  */
object ArrayDotImpl {
  /** Boxed return: null encodes the HOF's null-propagation cases. */
  def dot(a: ArrayData, b: ArrayData, aFloat: Boolean,
      bFloat: Boolean): java.lang.Double = {
    val n = a.numElements()
    if (n != b.numElements()) return null
    var s = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val x = if (aFloat) a.getFloat(i).toDouble else a.getDouble(i)
      val y = if (bFloat) b.getFloat(i).toDouble else b.getDouble(i)
      s += x * y
      i += 1
    }
    java.lang.Double.valueOf(s)
  }
}

case class ArrayDot(left: Expression, right: Expression)
    extends BinaryExpression {

  private def elemIsFloat(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _) => true
    case ArrayType(DoubleType, _) => false
    case t => throw new IllegalArgumentException(
      s"ArrayDot needs array<float|double> children, got $t")
  }

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  /** Analysis-time rejection of non-float/double arrays: array_dot is
    * SQL-registered, so without this a user calling it on int arrays
    * would get a raw IllegalArgumentException out of codegen instead
    * of an AnalysisException naming the bad type.
    */
  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(t: DataType) = t match {
      case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      "array_dot requires array<float> or array<double> arguments, got " +
        s"${left.dataType.catalogString} and ${right.dataType.catalogString}")
  }

  override protected def nullSafeEval(a: Any, b: Any): Any =
    ArrayDotImpl.dot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData],
      elemIsFloat(left), elemIsFloat(right))

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val aF = elemIsFloat(left)
    val bF = elemIsFloat(right)
    val r = ctx.freshName("dotRes")
    nullSafeCodeGen(ctx, ev, (a, b) => {
      s"""java.lang.Double $r = graft.functions.ArrayDotImpl$$.MODULE$$
         |  .dot($a, $b, $aF, $bF);
         |if ($r == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = $r.doubleValue(); }""".stripMargin
    })
  }

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): ArrayDot = copy(left = newLeft, right = newRight)
}

/** Fused int8 quantize→dequantize reconstruction of a float vector —
  * what the quantized k-NN join scores against. Semantically identical
  * to `dequantizeInt8(quantizeInt8(v))` (the HOF formulation, kept as
  * the spec oracle): scale = max|x| (0 → 1), x̂_i =
  * clamp(floor(x_i/scale·127 + 0.5), ±127)·scale/127, null elements
  * pass through. Why an Expression: the HOF chain is 4 interpreted
  * array passes with per-element boxing (transform → array_max →
  * transform → transform), measured at ~7× the whole join's cost;
  * this is two allocation-free primitive loops inside codegen.
  */
object QuantRoundtripImpl {
  def eval(arr: ArrayData): ArrayData = {
    val n = arr.numElements()
    var scale = 0.0
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val a = math.abs(arr.getFloat(i).toDouble)
        if (a > scale) scale = a
      }
      i += 1
    }
    if (scale == 0.0) scale = 1.0
    val out = new Array[Any](n)
    i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val x = arr.getFloat(i).toDouble
        val q = math.max(-127.0, math.min(127.0,
          math.floor(x / scale * 127.0 + 0.5)))
        out(i) = q * scale / 127.0
      }
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }
}

case class QuantRoundtrip(child: Expression) extends
    org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def dataType: DataType = ArrayType(DoubleType, containsNull = true)
  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"quant_roundtrip requires array<float>, got ${t.catalogString}")
  }

  override protected def nullSafeEval(input: Any): Any =
    QuantRoundtripImpl.eval(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.QuantRoundtripImpl$$.MODULE$$.eval($c)")

  override protected def withNewChildInternal(
      newChild: Expression): QuantRoundtrip = copy(child = newChild)
}

/** Count of positions where two long arrays hold equal values — the
  * signature-agreement kernel of MinHash estimated Jaccard, which runs
  * once per CANDIDATE PAIR (millions under heavy duplication).
  * Semantics match the HOF it replaces
  * (`size(filter(zip_with(a, b, _ === _), b => b))`, kept as the spec
  * oracle): positions beyond the shorter array are zip_with null
  * padding → dropped by the filter, so only indexes < min(len) count.
  */
object ArrayEqCountImpl {
  def eval(a: ArrayData, b: ArrayData): Int = {
    val n = math.min(a.numElements(), b.numElements())
    var c = 0
    var i = 0
    while (i < n) {
      if (!a.isNullAt(i) && !b.isNullAt(i) &&
        a.getLong(i) == b.getLong(i)) c += 1
      i += 1
    }
    c
  }
}

case class ArrayEqCount(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = org.apache.spark.sql.types.IntegerType
  override def nullable: Boolean = left.nullable || right.nullable

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(org.apache.spark.sql.types.LongType, _),
            ArrayType(org.apache.spark.sql.types.LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        "array_eq_count requires two array<bigint> arguments, got " +
          s"${l.catalogString} and ${r.catalogString}")
    }

  override protected def nullSafeEval(a: Any, b: Any): Any =
    ArrayEqCountImpl.eval(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.ArrayEqCountImpl$$.MODULE$$.eval($a, $b)")

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): ArrayEqCount =
    copy(left = newLeft, right = newRight)
}

/** Merge-count of common elements of two SORTED ASCENDING distinct
  * string arrays — the verify kernel of the prefix-filtered Jaccard
  * join, run once per candidate pair. O(n1+n2) with zero per-call
  * allocation (vs `array_intersect`'s per-call hash set — the probe
  * measured that at ~10× the cost on millions of candidate pairs).
  * Inputs MUST be sorted ascending and distinct (`sort_array`
  * upstream); unsorted input undercounts. Null elements are skipped
  * (token arrays are null-filtered upstream; skipping keeps the
  * kernel total rather than throwing mid-codegen).
  */
object SortedIntersectCountImpl {
  def eval(a: ArrayData, b: ArrayData): Int = {
    val na = a.numElements()
    val nb = b.numElements()
    var i = 0
    var j = 0
    var c = 0
    while (i < na && j < nb) {
      if (a.isNullAt(i)) i += 1
      else if (b.isNullAt(j)) j += 1
      else {
        val cmp = a.getUTF8String(i).compareTo(b.getUTF8String(j))
        if (cmp == 0) { c += 1; i += 1; j += 1 }
        else if (cmp < 0) i += 1
        else j += 1
      }
    }
    c
  }
}

case class SortedIntersectCount(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = org.apache.spark.sql.types.IntegerType
  override def nullable: Boolean = left.nullable || right.nullable

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(org.apache.spark.sql.types.StringType, _),
            ArrayType(org.apache.spark.sql.types.StringType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        "sorted_intersect_count requires two array<string> arguments, " +
          s"got ${l.catalogString} and ${r.catalogString}")
    }

  override protected def nullSafeEval(a: Any, b: Any): Any =
    SortedIntersectCountImpl.eval(
      a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.SortedIntersectCountImpl$$.MODULE$$.eval($a, $b)")

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): SortedIntersectCount =
    copy(left = newLeft, right = newRight)
}

object VecOps {
  def arrayDot(a: Column, b: Column): Column =
    ColumnBridge.column(
      ArrayDot(ColumnBridge.expression(a), ColumnBridge.expression(b)))

  def quantRoundtrip(v: Column): Column =
    ColumnBridge.column(QuantRoundtrip(ColumnBridge.expression(v)))

  def arrayEqCount(a: Column, b: Column): Column =
    ColumnBridge.column(
      ArrayEqCount(ColumnBridge.expression(a), ColumnBridge.expression(b)))

  def sortedIntersectCount(a: Column, b: Column): Column =
    ColumnBridge.column(SortedIntersectCount(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))
}
