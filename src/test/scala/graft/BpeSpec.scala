package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.functions.BpeImpl
import graft.operators.TextAnalysis

/** BpeCount correctness: hand-computed goldens, equivalence with an
  * INDEPENDENT min-rank-loop reference implementation (the standard
  * BPE tokenizer formulation — picks the globally lowest-ranked pair
  * present and merges every occurrence, rescans), well-formedness of
  * the default merges table, and engine-vs-Column-path agreement.
  */
class BpeSpec extends AnyFunSuite {

  private val merges = TextAnalysis.defaultBpeMerges
  private val lefts = merges.map(_._1).toArray
  private val rights = merges.map(_._2).toArray

  /** Independent reference: HF-style min-rank loop. Deliberately a
    * different algorithm from BpeImpl's rank-order fixpoint — the
    * well-formedness argument says they must agree.
    */
  private def refCount(word: String): Int = {
    val ranks = merges.zipWithIndex.toMap
    var syms = word.map(_.toString).toVector
    var done = syms.length < 2
    while (!done) {
      val best = syms.indices.dropRight(1)
        .flatMap(i => ranks.get((syms(i), syms(i + 1))))
        .sorted.headOption
      best match {
        case None => done = true
        case Some(r) =>
          val (a, b) = merges(r)
          val out = Vector.newBuilder[String]
          var i = 0
          while (i < syms.length) {
            if (i < syms.length - 1 && syms(i) == a && syms(i + 1) == b) {
              out += (a + b); i += 2
            } else { out += syms(i); i += 1 }
          }
          syms = out.result()
          done = syms.length < 2
      }
    }
    syms.length
  }

  test("default merges table is well-formed") {
    // every composite operand must be the output of an earlier rule
    val produced = scala.collection.mutable.Set.empty[String]
    merges.foreach { case (a, b) =>
      for (op <- Seq(a, b) if op.length > 1)
        assert(produced.contains(op),
          s"operand '$op' used before any rule produces it")
      produced += (a + b)
    }
  }

  test("hand-computed goldens") {
    val expected = Map(
      "window" -> 1,  // in→ow→ind→wind→window chain, 5 merge levels
      "the" -> 1, "that" -> 2, "order" -> 3, "key" -> 1,
      "value" -> 1, "data" -> 3, "wind" -> 1, "dow" -> 1,
      "down" -> 2, "scan" -> 2, "spark" -> 5, "customer" -> 7)
    expected.foreach { case (w, n) =>
      assert(BpeImpl.countWord(w, lefts, rights) === n, s"word '$w'")
    }
  }

  test("rank-order fixpoint == min-rank loop on fixture vocab and random strings") {
    val vocab = Seq("key", "agg", "row", "scan", "slow", "fast", "table",
      "value", "part", "hash", "merge", "batch", "spark", "a", "the",
      "window", "order", "data", "column", "join", "small", "line",
      "customer", "query", "big", "vector", "group", "filter",
      "thethe", "windowwindow", "tata", "atat", "keykey", "thatthat")
    val alphabet = "atherinowdvluqykbsc"
    val rnd = new scala.util.Random(42)
    val randoms = Seq.fill(500)(
      Seq.fill(1 + rnd.nextInt(12))(alphabet(rnd.nextInt(alphabet.length)))
        .mkString)
    (vocab ++ randoms).foreach { w =>
      assert(BpeImpl.countWord(w, lefts, rights) === refCount(w),
        s"divergence on '$w'")
    }
  }

  test("token array matches counts and order") {
    val spark = SparkTest.session
    import spark.implicits._
    val got = Seq(Tuple1("The window order")).toDF("text")
      .select(TextAnalysis.subwordTokensBpe($"text").as("t"))
      .head().getSeq[String](0)
    assert(got === Seq("the", "window", "or", "d", "er"))
  }

  test("Column path: whitespace split, lowercase, nulls, empty") {
    val spark = SparkTest.session
    import spark.implicits._
    val df = Seq(
      (1L, Some("The Window  ORDER key")),
      (2L, Some("")),
      (3L, Some("   ")),
      (4L, None: Option[String])).toDF("id", "text")
    val got = df.select($"id",
        TextAnalysis.subwordCountBpe($"text").as("n"))
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) -1L else r.getLong(1))).toMap
    // the(1) + window(1) + order(3) + key(1) = 6
    assert(got === Map(1L -> 6L, 2L -> 0L, 3L -> 0L, 4L -> -1L))
  }
}
