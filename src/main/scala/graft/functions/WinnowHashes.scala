package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Winnowing document fingerprints (Schleimer/Wilkerson/Aiken,
  * SIGMOD 2003 — the MOSS algorithm, public method): Rabin-Karp
  * POLYNOMIAL ROLLING HASH over character k-grams, then the distinct
  * minima of every w-window of consecutive gram hashes. Guarantees:
  * any shared substring of length ≥ w + k − 1 between two documents
  * contributes at least one shared fingerprint, while only ~2/(w+1)
  * of gram hashes are selected — a position-robust fingerprint set
  * (unlike bottom-k over the whole doc, a local edit only perturbs
  * the windows that overlap it).
  *
  * Arithmetic contract (mirrored literally by the DuckDB oracle):
  * code-POINT values (not UTF-16 units — matches `unicode(text[i])`),
  * h = fold (acc·257 + cp) mod 1e9+7 over each k-gram. The engine
  * computes grams with the O(n) rolling update
  * h' = (h − cp_out·257^{k−1})·257 + cp_in (mod M) — identical values
  * to the oracle's per-gram direct fold by modular arithmetic — and
  * the window minima with an O(n) monotonic deque. Ties in a window
  * need no rule: the output is the distinct minima VALUE set
  * (ascending), so equal minima collapse either way.
  *
  * Why an Expression: per-row char loop + sliding deque is one
  * primitive pass inside whole-stage codegen (the ShingleHashes /
  * BpeCount pattern); a HOF formulation would build n-k+1 boxed
  * slices per row.
  */
object WinnowHashesImpl {
  private val M = 1000000007L
  private val B = 257L

  def eval(text: UTF8String, k: Int, w: Int): GenericArrayData = {
    val s = text.toString
    val len = s.length
    val nCp = s.codePointCount(0, len)
    if (nCp == 0) return new GenericArrayData(Array.emptyLongArray)
    val cps = new Array[Long](nCp)
    var ci = 0
    var idx = 0
    while (idx < len) {
      val cp = s.codePointAt(idx)
      cps(ci) = cp.toLong
      ci += 1
      idx += Character.charCount(cp)
    }
    val n = nCp
    val nh = if (n < k) 1 else n - k + 1
    val hs = new Array[Long](nh)
    if (n < k) {
      var acc = 0L
      var i = 0
      while (i < n) { acc = (acc * B + cps(i)) % M; i += 1 }
      hs(0) = acc
    } else {
      var acc = 0L
      var i = 0
      while (i < k) { acc = (acc * B + cps(i)) % M; i += 1 }
      hs(0) = acc
      var bpow = 1L
      i = 1
      while (i < k) { bpow = (bpow * B) % M; i += 1 }
      i = 1
      while (i <= n - k) {
        acc = (acc - (cps(i - 1) * bpow) % M + M) % M
        acc = (acc * B + cps(i + k - 1)) % M
        hs(i) = acc
        i += 1
      }
    }
    val out = new java.util.TreeSet[java.lang.Long]()
    if (nh <= w) {
      var mn = Long.MaxValue
      var i = 0
      while (i < nh) { if (hs(i) < mn) mn = hs(i); i += 1 }
      out.add(mn)
    } else {
      val dq = new java.util.ArrayDeque[Integer]()
      var i = 0
      while (i < nh) {
        while (!dq.isEmpty && hs(dq.peekLast()) >= hs(i)) dq.pollLast()
        dq.addLast(i)
        if (dq.peekFirst() <= i - w) dq.pollFirst()
        if (i >= w - 1) out.add(hs(dq.peekFirst()))
        i += 1
      }
    }
    val res = new Array[Long](out.size)
    val it = out.iterator()
    var i = 0
    while (it.hasNext) { res(i) = it.next(); i += 1 }
    new GenericArrayData(res)
  }
}

case class WinnowHashes(child: Expression, k: Int, w: Int)
    extends UnaryExpression {
  require(k >= 1 && w >= 1, "winnow_hashes needs k >= 1 and w >= 1")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"winnow_hashes requires a string argument, got ${t.catalogString}")
  }

  override protected def nullSafeEval(input: Any): Any =
    WinnowHashesImpl.eval(input.asInstanceOf[UTF8String], k, w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.WinnowHashesImpl$$.MODULE$$.eval($c, $k, $w)")

  override protected def withNewChildInternal(newChild: Expression): WinnowHashes =
    copy(child = newChild)
}

object WinnowHashes {
  def winnow_hashes(text: Column, k: Int, w: Int): Column =
    ColumnBridge.column(WinnowHashes(ColumnBridge.expression(text), k, w))
}
