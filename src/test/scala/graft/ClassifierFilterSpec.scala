package graft

import graft.operators.TextClassify
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Hand-derived goldens for the Gopher rule filter and the Naive
  * Bayes classifier — the oracle rows pin cross-engine parity on the
  * fixture corpus; these pin the RULE SEMANTICS on inputs the fixture
  * does not contain (each rule failed in isolation; a separable
  * two-class corpus the fixture's shared vocab cannot express).
  */
class ClassifierFilterSpec extends AnyFunSuite {
  private lazy val spark = SparkTest.session
  import spark.implicits._

  // -- Gopher rules ---------------------------------------------------

  // 60 in-range words incl. two stopwords -> passes every rule
  private val passText =
    (Seq("the", "of") ++ (1 to 58).map(i => s"word$i")).mkString(" ")

  test("gopher: a compliant doc passes all five rules") {
    val df = Seq(("en", passText)).toDF("lang", "text")
    val r = TextClassify.gopherCensus(df).collect()(0)
    assert(r.getAs[Long]("n_docs") == 1L)
    assert(r.getAs[Long]("n_pass") == 1L)
    Seq("fail_word_count", "fail_mean_word_len", "fail_alpha_ratio",
      "fail_symbol_ratio", "fail_stopwords")
      .foreach(c => assert(r.getAs[Long](c) == 0L, c))
  }

  test("gopher: each rule fails in isolation") {
    // word-count: 10 words (below 50), others compliant
    val short = (Seq("the", "of") ++ (1 to 8).map(i => s"word$i"))
      .mkString(" ")
    // mean word length: 60 single-char words (mean 1 < 3)
    val thin = (Seq("the", "of") ++ Seq.fill(58)("a")).mkString(" ")
    // alpha ratio: 2 stopwords + 58 four-digit words -> 2/60
    // alphabetic (4-digit so mean word length stays in range)
    val nums = (Seq("the", "of") ++ (1000 to 1057).map(_.toString))
      .mkString(" ")
    // symbol ratio: 12 of 60 words contain '#' (> 10%)
    val symb = (Seq("the", "of") ++ (1 to 12).map(i => s"tag#$i") ++
      (1 to 46).map(i => s"word$i")).mkString(" ")
    // stopwords: one hit only
    val nostop = (Seq("the") ++ (1 to 59).map(i => s"word$i"))
      .mkString(" ")
    val df = Seq(
      ("short", short), ("thin", thin), ("nums", nums),
      ("symb", symb), ("nostop", nostop)).toDF("lang", "text")
    val rows = TextClassify.gopherCensus(df).collect()
      .map(r => r.getAs[String]("lang") -> r).toMap
    def failsOnly(lang: String, failCol: String): Unit = {
      val r = rows(lang)
      assert(r.getAs[Long]("n_pass") == 0L, s"$lang should fail")
      assert(r.getAs[Long](failCol) == 1L, s"$lang -> $failCol")
      Seq("fail_word_count", "fail_mean_word_len", "fail_alpha_ratio",
        "fail_symbol_ratio", "fail_stopwords").filterNot(_ == failCol)
        .foreach(c => assert(r.getAs[Long](c) == 0L, s"$lang spurious $c"))
    }
    failsOnly("short", "fail_word_count")
    failsOnly("thin", "fail_mean_word_len")
    failsOnly("nums", "fail_alpha_ratio")
    failsOnly("symb", "fail_symbol_ratio")
    failsOnly("nostop", "fail_stopwords")
  }

  test("gopher: thresholds are inclusive at the boundary") {
    // exactly 50 words, mean length exactly 3 (150 chars), exactly
    // 80% alphabetic (40/50), exactly 10% symbols (5/50), exactly 2
    // stopword hits -> every rule sits AT its bound and passes.
    // words: "the of" (2 alpha stopwords, 5 chars) + 5 "tag#N"
    // (alpha+symbol, 5 chars each) + "abcd" + 32 alpha 3-char words +
    // 10 numeric 2-char words: n = 50, n_alpha = 40 (the numerics are
    // the only non-alpha), n_sym = 5, sum_len = 5+25+4+96+20 = 150.
    val words = Seq("the", "of") ++ (1 to 5).map(i => s"tag#$i") ++
      Seq("abcd") ++ (1 to 32).map(i => f"w${i}%02d") ++
      (10 to 19).map(_.toString)
    assert(words.size == 50)
    assert(words.map(_.length).sum == 150)
    val df = Seq(("b", words.mkString(" "))).toDF("lang", "text")
    val r = TextClassify.gopherCensus(df).collect()(0)
    assert(r.getAs[Long]("n_pass") == 1L,
      s"boundary doc should pass: $r")
  }

  test("gopher: a null-text doc fails word-count and stopwords, not vanishes") {
    // without the empty-list coalesce every rule comparison is NULL
    // and the doc lands in n_docs but in NO fail or pass tally
    val df = Seq(("x", null.asInstanceOf[String]), ("x", passText))
      .toDF("lang", "text")
    val r = TextClassify.gopherCensus(df).collect()(0)
    assert(r.getAs[Long]("n_docs") == 2L)
    assert(r.getAs[Long]("n_pass") == 1L)
    assert(r.getAs[Long]("fail_word_count") == 1L)
    assert(r.getAs[Long]("fail_stopwords") == 1L)
    assert(r.getAs[Long]("fail_mean_word_len") == 0L)
    assert(r.getAs[Long]("fail_alpha_ratio") == 0L)
    assert(r.getAs[Long]("fail_symbol_ratio") == 0L)
  }

  // -- Naive Bayes ----------------------------------------------------

  test("nb: separable two-class corpus classifies perfectly") {
    // class 1 speaks {apple banana}, class 0 speaks {xylo zebra};
    // train = even ids, eval = odd ids with the same vocab split.
    val docs = Seq(
      (0L, 1, "apple banana apple"), (2L, 1, "banana banana"),
      (4L, 0, "xylo zebra"), (6L, 0, "zebra zebra xylo"),
      (1L, 1, "apple apple banana"), (3L, 1, "banana apple"),
      (5L, 0, "xylo xylo"), (7L, 0, "zebra xylo zebra"))
      .toDF("doc_id", "y", "text")
      .select(col("doc_id"), col("y"),
        graft.operators.TextAnalysis.tokens(col("text")).as("t"))
    val tok = docs
      .select(col("doc_id"), col("y"), explode(col("t")).as("token"))
      .filter(col("token") =!= "")
    val counts = TextClassify.nbTrainCounts(
      tok.filter(col("doc_id") % 2 === 0))
    val priors = docs.filter(col("doc_id") % 2 === 0)
      .agg(sum("y").as("d1"), sum(lit(1) - col("y")).as("d0"))
    val census = TextClassify.confusionCensus(TextClassify.nbPredict(
      tok.filter(col("doc_id") % 2 === 1), counts, priors)).collect()(0)
    assert(census.getAs[Long]("tp") == 2L)
    assert(census.getAs[Long]("tn") == 2L)
    assert(census.getAs[Long]("fp") == 0L)
    assert(census.getAs[Long]("fn") == 0L)
    assert(census.getAs[Long]("accuracy_x1e4") == 10000L)
  }

  test("nb: unseen-vocab doc falls to the prior-favored class") {
    // train 3 negative docs vs 1 positive: priors favor class 0
    // (prior bits floor(log2(4/1)) = 2 for y=1, floor(log2(4/3)) = 0
    // for y=0) while the Laplace fallback for unseen tokens favors
    // class 1 (smaller class mass: floor(log2(4)) = 2 bits/token vs
    // floor(log2(8)) = 3). For the 2-token eval doc the totals land
    // on an EXACT tie (4+2 vs 6+0) and the `<` tie-break resolves to
    // the negative class — pinning that arithmetic is the point.
    val docs = Seq(
      (0L, 0, "xylo zebra"), (2L, 0, "zebra zebra"), (4L, 0, "xylo"),
      (6L, 1, "apple"),
      (1L, 0, "qqq rrr"))
      .toDF("doc_id", "y", "text")
      .select(col("doc_id"), col("y"),
        graft.operators.TextAnalysis.tokens(col("text")).as("t"))
    val tok = docs
      .select(col("doc_id"), col("y"), explode(col("t")).as("token"))
      .filter(col("token") =!= "")
    val counts = TextClassify.nbTrainCounts(
      tok.filter(col("doc_id") % 2 === 0))
    val priors = docs.filter(col("doc_id") % 2 === 0)
      .agg(sum("y").as("d1"), sum(lit(1) - col("y")).as("d0"))
    val pred = TextClassify.nbPredict(
      tok.filter(col("doc_id") % 2 === 1), counts, priors).collect()(0)
    assert(pred.getAs[Int]("pred") == 0)
  }
}
