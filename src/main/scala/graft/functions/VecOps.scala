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

object VecOps {
  def arrayDot(a: Column, b: Column): Column =
    ColumnBridge.column(
      ArrayDot(ColumnBridge.expression(a), ColumnBridge.expression(b)))
}
