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

  test("trainBpeMerges learns the hand-derivable table on a tiny corpus") {
    val spark = SparkTest.session
    import spark.implicits._
    // Word counts: low x3, lower x2, newest x4.
    // Pair counts (positional, weighted):
    //   (l,o) 5, (o,w) 5, (w,e) 6, (e,r) 2, (n,e) 4, (e,w) 4,
    //   (e,s) 4, (s,t) 4
    // rank 1: (w,e) 6. After it: low/lower unchanged (w ends 'low'
    //   pair (o,w) still 5... 'lower' = l,o,w,e,r -> (w,e) merged ->
    //   l,o,we,r), newest = n,e,we,s,t.
    // rank 2: recount: (l,o) 5, (o,w) 3 (only 'low' x3), (o,we) 2,
    //   (we,r) 2, (n,e) 4, (e,we) 4, (we,s) 4, (s,t) 4 -> max 5 (l,o)
    val docs = Seq(
      "low low low lower lower",
      "newest newest newest newest").toDF("text")
    val merges = TextAnalysis.trainBpeMerges(docs, "text", numMerges = 2)
    assert(merges === Seq("w" -> "e", "l" -> "o"))
    // loop closure: applying the learned table through the tokenizer
    // shrinks counts and reproduces the merge on a held-out word
    val toks = Seq(Tuple1("wet lowest")).toDF("text")
      .select(TextAnalysis.subwordTokensBpe($"text", merges).as("t"))
      .head().getSeq[String](0)
    assert(toks === Seq("we", "t", "lo", "we", "s", "t"))
  }

  test("trainBpeMerges stops early when no pair repeats") {
    val spark = SparkTest.session
    import spark.implicits._
    val docs = Seq("ab cd", "ef gh").toDF("text")
    // every adjacent pair occurs once; argmax still deterministic:
    // (a,b) wins rank 1 by string order, then (ab) is one symbol and
    // (c,d) wins, etc. — with numMerges larger than distinct pairs the
    // trainer must terminate rather than loop
    val merges = TextAnalysis.trainBpeMerges(docs, "text", numMerges = 10)
    assert(merges.take(4) === Seq("a" -> "b", "c" -> "d", "e" -> "f",
      "g" -> "h"))
    assert(merges.size === 4, s"expected exhaustion after 4, got $merges")
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
