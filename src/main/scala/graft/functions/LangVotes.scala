package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Marker-token language votes as a native Catalyst expression — the
  * per-row scan loop of language ID, a primary corpus-curation scan
  * at training-data scale.
  *
  * Bit-identical to the HOF formulation it replaces (kept in
  * graft.operators.TextAnalysis.langVotesHof as the spec oracle):
  * lowercase (UTF8String.toLowerCase — the same casing lower() uses),
  * space-only trim, whitespace split keeping trailing empties, then
  * one pass incrementing each language whose marker set contains the
  * token. Marker sets overlap across languages, so membership is a
  * token→language-bitmask map built once per expression.
  *
  * Why an Expression: the HOF fold allocates a boxed langs-wide array
  * PER TOKEN (zip_with of the accumulator against a freshly built
  * votes array), interpreted — this is one primitive loop with a hash
  * lookup per token inside whole-stage codegen.
  */
object LangVotesImpl extends Serializable {
  def eval(text: UTF8String, masks: java.util.HashMap[String, java.lang.Long],
      nLangs: Int): GenericArrayData = {
    val raw = text.toLowerCase.toString
    var st = 0
    var en = raw.length
    while (st < en && raw.charAt(st) == ' ') st += 1
    while (en > st && raw.charAt(en - 1) == ' ') en -= 1
    val words = raw.substring(st, en).split("\\s+", -1)
    val votes = new Array[Long](nLangs)
    var i = 0
    while (i < words.length) {
      val m = masks.get(words(i))
      if (m != null) {
        var mask = m.longValue()
        while (mask != 0L) {
          val l = java.lang.Long.numberOfTrailingZeros(mask)
          votes(l) += 1L
          mask &= mask - 1L
        }
      }
      i += 1
    }
    new GenericArrayData(votes)
  }
}

case class LangVotes(child: Expression, markers: Seq[Seq[String]])
    extends UnaryExpression {

  require(markers.length <= 64, "bitmask holds at most 64 languages")

  @transient private lazy val masks: java.util.HashMap[String, java.lang.Long] = {
    val m = new java.util.HashMap[String, java.lang.Long]()
    markers.zipWithIndex.foreach { case (ms, i) =>
      ms.foreach { tok =>
        val prev = m.get(tok)
        m.put(tok, java.lang.Long.valueOf(
          (if (prev == null) 0L else prev.longValue()) | (1L << i)))
      }
    }
    m
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"lang_votes requires a string argument, got ${t.catalogString}")
  }

  override protected def nullSafeEval(input: Any): Any =
    LangVotesImpl.eval(input.asInstanceOf[UTF8String], masks, markers.length)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val mRef = ctx.addReferenceObj("langMasks", masks, "java.util.HashMap")
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.LangVotesImpl$$.MODULE$$" +
        s".eval($c, $mRef, ${markers.length})")
  }

  override protected def withNewChildInternal(newChild: Expression): LangVotes =
    copy(child = newChild)
}

object LangVotes {
  def lang_votes(text: Column, markers: Seq[Seq[String]]): Column =
    ColumnBridge.column(LangVotes(ColumnBridge.expression(text), markers))
}
