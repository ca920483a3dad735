package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** MinHash signature as a native Catalyst expression.
  *
  * Input: array<long> of shingle hashes. Output: array<long> of k
  * minimums over the affine permutation family
  * (a_j·h + b_j) mod (2^31-1). The modulus is deliberately SMALLER
  * than the base-hash range — see the rationale in
  * graft.operators.Dedup: with a modulus at or above the hash range
  * the maps are monotone and every permutation picks the same argmin.
  *
  * Why an Expression: the higher-order-function formulation
  * (aggregate + zip_with) allocates two k-wide arrays per shingle in
  * interpreted lambda evaluation — GC-bound at corpus scale. The
  * generated loop below is allocation-free per shingle and stays
  * inside whole-stage codegen. This is the §2.14 preference order at
  * work: compose built-ins first, drop to a custom Expression only
  * where the built-ins genuinely can't express the computation
  * efficiently.
  */
case class MinHashSig(child: Expression, as: Array[Long], bs: Array[Long])
    extends UnaryExpression {

  private val k = as.length
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val res = Array.fill(k)(Long.MaxValue)
    var i = 0
    val n = arr.numElements()
    while (i < n) {
      val h = arr.getLong(i)
      var j = 0
      while (j < k) {
        val p = java.lang.Math.floorMod(h * as(j) + bs(j), MinHashSig.P)
        if (p < res(j)) res(j) = p
        j += 1
      }
      i += 1
    }
    new GenericArrayData(res)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val aRef = ctx.addReferenceObj("minhashA", as, "long[]")
    val bRef = ctx.addReferenceObj("minhashB", bs, "long[]")
    nullSafeCodeGen(ctx, ev, c => {
      val res = ctx.freshName("res")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val h = ctx.freshName("h")
      val p = ctx.freshName("p")
      val n = ctx.freshName("n")
      s"""
         |long[] $res = new long[$k];
         |java.util.Arrays.fill($res, Long.MAX_VALUE);
         |int $n = $c.numElements();
         |for (int $i = 0; $i < $n; $i++) {
         |  long $h = $c.getLong($i);
         |  for (int $j = 0; $j < $k; $j++) {
         |    long $p = java.lang.Math.floorMod(
         |      $h * $aRef[$j] + $bRef[$j], ${MinHashSig.P}L);
         |    if ($p < $res[$j]) $res[$j] = $p;
         |  }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($res);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)
}

object MinHashSig {
  // 2^31-1: must be below the 31-bit base-hash range so affine maps
  // wrap (see Dedup scaladoc); products stay < 2^62 — overflow-safe.
  val P: Long = (1L << 31) - 1

  def minhash_sig(shingleHashes: Column, as: Array[Long], bs: Array[Long]): Column =
    ColumnBridge.column(
      MinHashSig(ColumnBridge.expression(shingleHashes), as, bs))
}
