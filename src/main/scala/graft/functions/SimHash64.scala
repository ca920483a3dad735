package graft.functions

import java.nio.charset.StandardCharsets

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.Platform
import org.apache.spark.unsafe.types.UTF8String

/** 64-bit SimHash of a text column as a native Catalyst expression.
  *
  * Semantics are EXACTLY the composed-built-ins formulation it replaces
  * (graft.operators.Dedup.simhash64Hof, kept as the test oracle):
  * whitespace tokens of the space-trimmed text (Java `\s+` split,
  * limit -1 — leading/trailing tab-runs yield empty tokens, same as
  * Spark's split()), per-token xxhash64 with Spark's default seed 42,
  * ±1 votes per bit, sign of the vote total sets the bit.
  *
  * Why an Expression: the HOF formulation allocates two 64-long arrays
  * per TOKEN per row in interpreted lambda evaluation and breaks
  * whole-stage codegen for its stage — the same pathology MinHashSig
  * was introduced for. Here the loop is one int[64] per row, zero
  * allocation per token, and stays inside codegen.
  */
object SimHash64Impl {
  private val WS = java.util.regex.Pattern.compile("\\s+")

  def compute(text: UTF8String): Long = {
    // SQL trim() strips ASCII 0x20 only (UTF8String.trim) — NOT
    // Character.isWhitespace — so mirror it manually.
    val s = text.toString
    var b = 0
    var e = s.length
    while (b < e && s.charAt(b) == ' ') b += 1
    while (e > b && s.charAt(e - 1) == ' ') e -= 1
    val toks = WS.split(s.substring(b, e), -1)
    val votes = new Array[Int](64)
    var i = 0
    while (i < toks.length) {
      val bytes = toks(i).getBytes(StandardCharsets.UTF_8)
      val h = XXH64.hashUnsafeBytes(bytes, Platform.BYTE_ARRAY_OFFSET,
        bytes.length, 42L)
      var j = 0
      while (j < 64) {
        if (((h >>> j) & 1L) != 0L) votes(j) += 1 else votes(j) -= 1
        j += 1
      }
      i += 1
    }
    var out = 0L
    var j = 0
    while (j < 64) {
      if (votes(j) > 0) out |= (1L << j)
      j += 1
    }
    out
  }
}

case class SimHash64(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override protected def nullSafeEval(v: Any): Any =
    SimHash64Impl.compute(v.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.SimHash64Impl$$.MODULE$$.compute($c)")
  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}

object SimHash64 {
  def simhash64(text: Column): Column =
    ColumnBridge.column(SimHash64(ColumnBridge.expression(text)))
}

/** SimHash vote loop over a PRECOMPUTED token-hash array — same ±1
  * bit votes as [[SimHash64]], but the base hash is whatever produced
  * the input column. Feeding it md5-derived hashes (portable across
  * engines) makes the sketch DuckDB-reproducible while the loop stays
  * codegen'd and allocation-free per token (one int[bits] per row).
  */
case class SimHashBits(child: Expression, bits: Int) extends UnaryExpression {
  require(bits > 0 && bits <= 64, s"bits must be in 1..64, got $bits")
  override def dataType: DataType = LongType

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    val votes = new Array[Int](bits)
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      val h = arr.getLong(i)
      var j = 0
      while (j < bits) {
        if (((h >>> j) & 1L) != 0L) votes(j) += 1 else votes(j) -= 1
        j += 1
      }
      i += 1
    }
    var out = 0L
    var j = 0
    while (j < bits) {
      if (votes(j) > 0) out |= (1L << j)
      j += 1
    }
    out
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val votes = ctx.freshName("votes")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val h = ctx.freshName("h")
      val n = ctx.freshName("n")
      val out = ctx.freshName("out")
      s"""
         |int[] $votes = new int[$bits];
         |int $n = $c.numElements();
         |for (int $i = 0; $i < $n; $i++) {
         |  long $h = $c.getLong($i);
         |  for (int $j = 0; $j < $bits; $j++) {
         |    if ((($h >>> $j) & 1L) != 0L) $votes[$j]++; else $votes[$j]--;
         |  }
         |}
         |long $out = 0L;
         |for (int $j = 0; $j < $bits; $j++) {
         |  if ($votes[$j] > 0) $out |= (1L << $j);
         |}
         |${ev.value} = $out;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): SimHashBits =
    copy(child = newChild)
}

object SimHashBits {
  def simhash_bits(tokenHashes: Column, bits: Int): Column =
    ColumnBridge.column(
      SimHashBits(ColumnBridge.expression(tokenHashes), bits))
}
