package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Merges-table-driven byte-pair-encoding token count as a native
  * Catalyst expression — the real-tokenizer replacement for the
  * length-heuristic `subwordCountEstimate` (token counts feed sequence
  * packing and mixture quotas, where estimate-vs-real divergence skews
  * pack budgets at corpus scale).
  *
  * Algorithm: lowercase, trim, whitespace-split; each word becomes its
  * code-point symbols; merge rules apply in rank order, each swept
  * leftmost-non-overlapping repeatedly to fixpoint before the next
  * rank. For a WELL-FORMED merges table (every composite operand is
  * produced by an earlier-ranked rule — true of any learned BPE
  * vocabulary, where a pair can only be counted after its constituent
  * symbols exist) this is identical to the min-rank-pair loop used by
  * standard BPE tokenizers: merging rank r can only create pairs that
  * contain r's output, and any rule consuming that output has rank
  * > r, so no lower-ranked pair ever reappears once passed.
  *
  * Why an Expression: the per-word merge loop is imperative and runs
  * per row on the hot scan path; as a codegen'd expression it stays
  * inside whole-stage codegen with zero boxing (the MinHashSig
  * pattern), versus a Scala UDF's per-row encoder round-trip.
  */
/** Per-task word→symbols memo. Corpus text is zipfian — the same few
  * thousand words dominate — so the merge loop runs once per DISTINCT
  * word per task instead of once per occurrence (the same lru-cache
  * trick standard BPE tokenizers use). One instance rides each
  * expression as a codegen reference object: references deserialize
  * per task, and a task is single-threaded, so no synchronization.
  * Bounded: the map clears when it hits `maxEntries` (pathological
  * unique-word corpora can't grow it without bound).
  */
final class BpeMemo(maxEntries: Int = 1 << 16) extends Serializable {
  @transient private var map = new java.util.HashMap[String, Array[String]]()
  private def m = {
    if (map == null) map = new java.util.HashMap[String, Array[String]]()
    map
  }
  def get(w: String): Array[String] = m.get(w)
  def put(w: String, syms: Array[String]): Unit = {
    if (m.size >= maxEntries) m.clear()
    m.put(w, syms)
  }
}

object BpeImpl {

  /** BPE symbols of one word under the (a, b) rank-ordered rules. */
  def mergeWord(w: String, a: Array[String],
      b: Array[String]): java.util.ArrayList[String] = {
    val syms = new java.util.ArrayList[String](w.length)
    var i = 0
    while (i < w.length) {
      val cp = w.codePointAt(i)
      syms.add(new String(Character.toChars(cp)))
      i += Character.charCount(cp)
    }
    var r = 0
    while (r < a.length) {
      var changed = true
      while (changed) {
        changed = false
        var j = 0
        while (j < syms.size - 1) {
          if (syms.get(j) == a(r) && syms.get(j + 1) == b(r)) {
            syms.set(j, a(r) + b(r))
            syms.remove(j + 1)
            changed = true
          }
          j += 1
        }
      }
      r += 1
    }
    syms
  }

  /** Token count of one word. */
  def countWord(w: String, a: Array[String], b: Array[String]): Int =
    mergeWord(w, a, b).size

  private def memoized(w: String, a: Array[String], b: Array[String],
      memo: BpeMemo): Array[String] = {
    val hit = memo.get(w)
    if (hit != null) hit
    else {
      val syms = mergeWord(w, a, b).toArray(Array.empty[String])
      memo.put(w, syms)
      syms
    }
  }

  def count(text: UTF8String, a: Array[String], b: Array[String],
      memo: BpeMemo): Long = {
    val s = text.toString.toLowerCase(java.util.Locale.ROOT).trim
    if (s.isEmpty) return 0L
    var total = 0L
    val words = s.split("\\s+")
    var i = 0
    while (i < words.length) {
      if (words(i).nonEmpty) total += memoized(words(i), a, b, memo).length
      i += 1
    }
    total
  }

  /** All BPE tokens of a text, word by word, flattened in order. */
  def tokens(text: UTF8String, a: Array[String], b: Array[String],
      memo: BpeMemo): org.apache.spark.sql.catalyst.util.ArrayData = {
    val s = text.toString.toLowerCase(java.util.Locale.ROOT).trim
    val out = new java.util.ArrayList[AnyRef]
    if (s.nonEmpty) {
      val words = s.split("\\s+")
      var i = 0
      while (i < words.length) {
        if (words(i).nonEmpty) {
          val syms = memoized(words(i), a, b, memo)
          var j = 0
          while (j < syms.length) {
            out.add(UTF8String.fromString(syms(j)))
            j += 1
          }
        }
        i += 1
      }
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out.toArray)
  }
}

case class BpeCount(child: Expression, merges: Seq[(String, String)])
    extends UnaryExpression {

  private val lefts: Array[String] = merges.map(_._1).toArray
  private val rights: Array[String] = merges.map(_._2).toArray
  @transient private lazy val evalMemo = new BpeMemo()

  override def dataType: DataType = LongType
  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    BpeCount.checkString("bpe_count", child)

  override protected def nullSafeEval(input: Any): Any =
    BpeImpl.count(input.asInstanceOf[UTF8String], lefts, rights, evalMemo)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val aRef = ctx.addReferenceObj("bpeLefts", lefts, "java.lang.String[]")
    val bRef = ctx.addReferenceObj("bpeRights", rights, "java.lang.String[]")
    // the memo deserializes per task (single-threaded) — see BpeMemo
    val mRef = ctx.addReferenceObj("bpeMemo", new BpeMemo(),
      "graft.functions.BpeMemo")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.BpeImpl$$.MODULE$$" +
        s".count($c, $aRef, $bRef, $mRef);")
  }

  override protected def withNewChildInternal(newChild: Expression): BpeCount =
    copy(child = newChild)
}

/** The token ARRAY sibling of [[BpeCount]] — same merge semantics,
  * returns the subword tokens themselves (vocab profiling, downstream
  * id mapping) instead of the count.
  */
case class BpeTokens(child: Expression, merges: Seq[(String, String)])
    extends UnaryExpression {

  private val lefts: Array[String] = merges.map(_._1).toArray
  private val rights: Array[String] = merges.map(_._2).toArray
  @transient private lazy val evalMemo = new BpeMemo()

  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(
      org.apache.spark.sql.types.StringType, containsNull = false)
  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    BpeCount.checkString("bpe_tokens", child)

  override protected def nullSafeEval(input: Any): Any =
    BpeImpl.tokens(input.asInstanceOf[UTF8String], lefts, rights, evalMemo)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val aRef = ctx.addReferenceObj("bpeLefts", lefts, "java.lang.String[]")
    val bRef = ctx.addReferenceObj("bpeRights", rights, "java.lang.String[]")
    val mRef = ctx.addReferenceObj("bpeMemo", new BpeMemo(),
      "graft.functions.BpeMemo")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.BpeImpl$$.MODULE$$" +
        s".tokens($c, $aRef, $bRef, $mRef);")
  }

  override protected def withNewChildInternal(newChild: Expression): BpeTokens =
    copy(child = newChild)
}

object BpeCount {
  private[functions] def checkString(fn: String, child: Expression)
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case org.apache.spark.sql.types.StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$fn requires a string argument, got ${t.catalogString}")
    }

  def bpe_count(text: Column, merges: Seq[(String, String)]): Column =
    ColumnBridge.column(BpeCount(ColumnBridge.expression(text), merges))

  def bpe_tokens(text: Column, merges: Seq[(String, String)]): Column =
    ColumnBridge.column(BpeTokens(ColumnBridge.expression(text), merges))
}
