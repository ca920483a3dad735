package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Exact-binary decimal rounding, matching Python's round(x, n).
  *
  * Spark's round/bround convert the double to decimal via its shortest
  * string representation (BigDecimal.valueOf), which can land on the
  * other side of a .5 boundary than the exact binary value — e.g.
  * 0.8074999999999999956… prints as "0.8075" and brounds to 0.808,
  * while Python's round (and the reference scorer,
  * reference: database/quality_scorer.py:403) rounds the exact value to
  * 0.807. This expression rounds the exact binary value HALF_EVEN, with
  * codegen so it stays inside whole-stage codegen.
  */
object MathParity {
  def pythonRound(d: Double, scale: Int): Double =
    new java.math.BigDecimal(d)
      .setScale(scale, java.math.RoundingMode.HALF_EVEN)
      .doubleValue()
}

case class PythonRound(child: Expression, scale: Int) extends UnaryExpression {
  override def dataType: DataType = DoubleType
  override protected def nullSafeEval(v: Any): Any =
    MathParity.pythonRound(v.asInstanceOf[Double], scale)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.MathParity$$.MODULE$$.pythonRound($c, $scale)")
  override protected def withNewChildInternal(newChild: Expression): PythonRound =
    copy(child = newChild)
}

object PythonRound {
  import org.apache.spark.sql.graftbridge.ColumnBridge
  def py_round(c: Column, scale: Int): Column =
    ColumnBridge.column(PythonRound(ColumnBridge.expression(c), scale))
}
