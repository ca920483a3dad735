package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** md5-hex word n-gram shingles as a native Catalyst expression — the
  * per-row loop of the exact-decontamination family (the curate
  * chain's stage 4, ev_stream_decontam, etl_decontaminate_exact, the
  * portable bottom-k fingerprint).
  *
  * Bit-identical to the HOF formulation it replaces
  * (`array_distinct(transform(Dedup.shingles(text, n), md5))`, kept
  * as the spec oracle): space-trim, whitespace-split preserving
  * trailing empties (split limit −1), n consecutive words joined by
  * one space per gram, whole-text join when fewer than n words,
  * lowercase md5 hex over the gram's UTF-8 bytes, distinct in
  * first-occurrence order (distinct-by-digest — exactly the outer
  * array_distinct's key).
  *
  * Why an Expression: the HOF chain is n−1 zip_with array builds
  * (each materializing every partial gram string — ~n/2× the final
  * gram bytes in throwaway concat output) + filter + two
  * array_distincts + a per-element md5 over boxed rows, all
  * interpreted. This is one primitive loop inside whole-stage codegen
  * feeding the digest incrementally from per-word byte arrays — no
  * partial-gram strings exist at all (the ShingleHashes pattern).
  */
object Md5ShinglesImpl {
  private val md = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }
  private val SPACE = Array[Byte](' ')
  private val HEX = "0123456789abcdef".toCharArray

  private def hex(b: Array[Byte]): UTF8String = {
    val out = new Array[Byte](32)
    var i = 0
    while (i < 16) {
      out(2 * i) = HEX((b(i) >> 4) & 0xf).toByte
      out(2 * i + 1) = HEX(b(i) & 0xf).toByte
      i += 1
    }
    UTF8String.fromBytes(out)
  }

  def eval(text: UTF8String, n: Int): GenericArrayData = {
    val raw = text.toString
    // Spark trim() strips ASCII spaces ONLY; split's limit −1 keeps
    // trailing empties — both replicated exactly (ShingleHashesImpl's
    // tokenizer, shared semantics by construction).
    var st = 0
    var en = raw.length
    while (st < en && raw.charAt(st) == ' ') st += 1
    while (en > st && raw.charAt(en - 1) == ' ') en -= 1
    val words = raw.substring(st, en).split("\\s+", -1)
    val w = words.length
    val bytes = new Array[Array[Byte]](w)
    var i = 0
    while (i < w) {
      bytes(i) = words(i).getBytes(java.nio.charset.StandardCharsets.UTF_8)
      i += 1
    }
    val digest = md.get()
    // distinct by digest in first-occurrence order — the outer
    // array_distinct's exact key (the md5 VALUE, not the gram)
    val out = new java.util.LinkedHashSet[UTF8String]()
    if (w < n) {
      digest.reset()
      i = 0
      while (i < w) {
        if (i > 0) digest.update(SPACE)
        digest.update(bytes(i))
        i += 1
      }
      out.add(hex(digest.digest()))
    } else {
      i = 0
      while (i <= w - n) {
        digest.reset()
        var j = 0
        while (j < n) {
          if (j > 0) digest.update(SPACE)
          digest.update(bytes(i + j))
          j += 1
        }
        out.add(hex(digest.digest()))
        i += 1
      }
    }
    val res = new Array[AnyRef](out.size)
    val it = out.iterator()
    i = 0
    while (it.hasNext) { res(i) = it.next(); i += 1 }
    new GenericArrayData(res)
  }
}

case class Md5Shingles(child: Expression, n: Int) extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"md5_shingles requires a string argument, got ${t.catalogString}")
  }

  override protected def nullSafeEval(input: Any): Any =
    Md5ShinglesImpl.eval(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.Md5ShinglesImpl$$.MODULE$$.eval($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): Md5Shingles =
    copy(child = newChild)
}

object Md5Shingles {
  def md5_shingles(text: Column, n: Int): Column =
    ColumnBridge.column(Md5Shingles(ColumnBridge.expression(text), n))
}
