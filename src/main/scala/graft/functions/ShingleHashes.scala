package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Hashed word n-gram shingles as a native Catalyst expression — the
  * per-row scan loop of the whole MinHash family (signatures, banded
  * pairs, decontamination sketches).
  *
  * Bit-identical to the HOF formulation it replaces (kept in
  * graft.operators.Dedup.shingleHashesHof as the spec oracle):
  * space-trim, whitespace-split preserving trailing empties (Spark's
  * split limit −1), per-token xxhash64(seed 42) masked to 31 bits,
  * 31-ary polynomial window combine re-masked per step, whole-text
  * fold when fewer than n tokens, distinct in first-occurrence order.
  *
  * Why an Expression: the HOF chain is transform + (n−1) zip_with
  * array builds + aggregate + filter + array_distinct — six
  * interpreted boxed array passes per row. This is one primitive loop
  * inside whole-stage codegen (the MinHashSig/BpeCount pattern).
  */
object ShingleHashesImpl {
  private val M31 = 0x7FFFFFFFL

  def eval(text: UTF8String, n: Int): GenericArrayData = {
    val raw = text.toString
    // Spark trim() strips ASCII spaces ONLY (not tabs/controls like
    // Java's String.trim) and split's default limit −1 KEEPS trailing
    // empty strings — both replicated exactly.
    var st = 0
    var en = raw.length
    while (st < en && raw.charAt(st) == ' ') st += 1
    while (en > st && raw.charAt(en - 1) == ' ') en -= 1
    val words = raw.substring(st, en).split("\\s+", -1)
    val w = words.length
    val th = new Array[Long](w)
    var i = 0
    while (i < w) {
      val u = UTF8String.fromString(words(i))
      th(i) = XXH64.hashUTF8String(u, 42L) & M31
      i += 1
    }
    val out = new java.util.LinkedHashSet[java.lang.Long]()
    if (w < n) {
      var acc = 0L
      i = 0
      while (i < w) { acc = (acc * 31L + th(i)) & M31; i += 1 }
      out.add(acc)
    } else {
      i = 0
      while (i <= w - n) {
        var acc = th(i)
        var j = 1
        while (j < n) { acc = (acc * 31L + th(i + j)) & M31; j += 1 }
        out.add(acc)
        i += 1
      }
    }
    val res = new Array[Long](out.size)
    val it = out.iterator()
    i = 0
    while (it.hasNext) { res(i) = it.next(); i += 1 }
    new GenericArrayData(res)
  }
}

case class ShingleHashes(child: Expression, n: Int) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"shingle_hashes requires a string argument, got ${t.catalogString}")
  }

  override protected def nullSafeEval(input: Any): Any =
    ShingleHashesImpl.eval(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.ShingleHashesImpl$$.MODULE$$.eval($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): ShingleHashes =
    copy(child = newChild)
}

object ShingleHashes {
  def shingle_hashes(text: Column, n: Int): Column =
    ColumnBridge.column(ShingleHashes(ColumnBridge.expression(text), n))
}
