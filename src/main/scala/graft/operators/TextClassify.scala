package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Rule-based and model-based document quality gates — the two filter
  * stages every web-scale corpus pipeline runs before training (Gopher
  * heuristics first, a trained classifier second). Both are EXACT
  * integer arithmetic end to end: ratio thresholds clear by
  * cross-multiplication and log-probabilities are integral floor-log2
  * bit costs (length(bin(x))-1 — no libm), so every cell is
  * oracle-comparable across engines. Reference analogue: the
  * reference's quality gate is its validation score ladder
  * (helpers/quality_scorer.py); these are the corpus-scale siblings.
  */
object TextClassify {

  /** floor(log2 x) for x >= 1 as exact integer arithmetic. */
  private def bits(c: Column): Column = (length(bin(c)) - lit(1)).cast("long")

  /** Per-doc Gopher rule inputs from (lang, text): token count, summed
    * token length, alphabetic-token count, symbol-token count,
    * stopword-set hits. One narrow map — all folds are per-row array
    * ops, no explode, so the census below shuffles ~|langs| rows.
    *
    * NULL text coalesces to an empty token list rather than
    * null-propagating: without it a null doc lands in n_docs but in
    * NO fail or pass tally (every rule comparison is NULL, so both
    * `when` arms fall to 0) — a silently vanishing row. Empty-list
    * semantics instead fail the word-count and stopword rules, which
    * is what a filter should say about a document with no text.
    */
  def gopherMetrics(docs: DataFrame,
      keyCols: Seq[String] = Seq("lang")): DataFrame = {
    val tw = filter(
      coalesce(TextAnalysis.tokens(col("text")),
        array().cast("array<string>")),
      x => x =!= "")
    // The token array materializes ONCE through its own projection —
    // the six metric columns then reference the `w` ATTRIBUTE, so the
    // tokenizer provably runs once per row. Inlining `tw` into all six
    // would lean on codegen subexpression elimination firing (the
    // re-evaluation trap Dedup's shingles scaladoc documents for
    // HOF-argument subtrees); CollapseProject cannot merge the two
    // projections back because that would duplicate the non-cheap
    // tokenizer sixfold.
    docs.select(keyCols.map(col) :+ tw.as("w"): _*)
      .select(keyCols.map(col) ++ Seq(
        size(col("w")).cast("long").as("n"),
        aggregate(col("w"), lit(0L), (acc, x) => acc + length(x))
          .as("sum_len"),
        size(filter(col("w"), x => x.rlike("[a-z]"))).cast("long")
          .as("n_alpha"),
        size(filter(col("w"), x => x.contains("#") || x.contains("...")))
          .cast("long").as("n_sym"),
        Seq("the", "be", "to", "of", "and", "that", "have", "with")
          .map(t => when(array_contains(col("w"), t), 1).otherwise(0))
          .reduce(_ + _).as("stop_hits")): _*)
  }

  // The five rules, defined ONCE over gopherMetrics' column names —
  // the census and the streaming gate must never drift apart.
  private val rWords = col("n") >= 50 && col("n") <= 100000
  private val rMeanLen = col("sum_len") >= col("n") * 3 &&
    col("sum_len") <= col("n") * 10
  private val rAlpha = col("n_alpha") * 5 >= col("n") * 4
  private val rSym = col("n_sym") * 10 <= col("n")
  private val rStop = col("stop_hits") >= 2

  /** All-five-rules pass predicate over [[gopherMetrics]] columns —
    * the per-document form the streaming quality gate filters on. */
  def gopherPassCol: Column = rWords && rMeanLen && rAlpha && rSym && rStop

  /** The five rule outcomes as one integer bitmask (words=16,
    * mean-len=8, alpha=4, symbols=2, stopwords=1) — lets a census pin
    * every per-doc rule verdict in a single checksummable cell even
    * on a corpus where the all-rules conjunction never fires. */
  def gopherBitsCol: Column =
    when(rWords, 16).otherwise(0) + when(rMeanLen, 8).otherwise(0) +
      when(rAlpha, 4).otherwise(0) + when(rSym, 2).otherwise(0) +
      when(rStop, 1).otherwise(0)

  /** Per-language census of the five Gopher rules (Rae et al. 2021
    * §A1.1): word count in [50, 100k], mean word length in [3, 10],
    * >=80% alphabetic words, <=10% symbol words, >=2 stopword hits.
    * Emits per-rule fail counts and the all-rules pass count.
    */
  def gopherCensus(docs: DataFrame): DataFrame = {
    gopherMetrics(docs).groupBy(col("lang")).agg(
        count(lit(1)).as("n_docs"),
        sum(when(!rWords, 1L).otherwise(0L)).as("fail_word_count"),
        sum(when(!rMeanLen, 1L).otherwise(0L)).as("fail_mean_word_len"),
        sum(when(!rAlpha, 1L).otherwise(0L)).as("fail_alpha_ratio"),
        sum(when(!rSym, 1L).otherwise(0L)).as("fail_symbol_ratio"),
        sum(when(!rStop, 1L).otherwise(0L)).as("fail_stopwords"),
        sum(when(rWords && rMeanLen && rAlpha && rSym && rStop, 1L)
          .otherwise(0L)).as("n_pass"))
      .orderBy(col("lang"))
  }

  /** Per-token Laplace-smoothed class count table from labeled train
    * tokens (doc_id, y in {0,1}, token): ONE token-keyed partial-agg
    * shuffle collapsing the corpus to a vocab-bounded (token, n1, n0)
    * table, localCheckpointed because both the totals aggregate and
    * the scoring join consume it. Nothing grows with the train corpus
    * at fixed vocab.
    */
  def nbTrainCounts(trainTok: DataFrame): DataFrame = trainTok
    .groupBy(col("token"))
    .agg(sum(col("y")).as("n1"), sum(lit(1) - col("y")).as("n0"))
    .localCheckpoint()

  /** Per-doc class prediction for labeled eval tokens under a trained
    * count table: per-token cost floor(log2((N_c+V) div (n+1))) bits
    * via a token-keyed LEFT join (unseen tokens fall back to n=0 —
    * Laplace gives them the max cost), per-doc partial agg, class
    * priors as floor-log2 bits from the broadcast doc census, argmin
    * class with ties resolved to the negative class. Returns
    * (doc_id, y, pred). Requires both classes in `priors` (d1, d0 > 0).
    */
  def nbPredict(evalTok: DataFrame, counts: DataFrame,
      priors: DataFrame): DataFrame = {
    val totals = counts.agg(sum("n1").as("tn1"), sum("n0").as("tn0"),
      count(lit(1)).as("v"))
    evalTok
      .join(counts, Seq("token"), "left")
      .crossJoin(broadcast(totals))
      .select(col("doc_id"), col("y"),
        bits(expr("(tn1 + v) div (coalesce(n1, 0) + 1)")).as("b1"),
        bits(expr("(tn0 + v) div (coalesce(n0, 0) + 1)")).as("b0"))
      .groupBy(col("doc_id"), col("y"))
      .agg(sum("b1").as("bits1"), sum("b0").as("bits0"))
      .crossJoin(broadcast(priors))
      .select(col("doc_id"), col("y"),
        ((col("bits1") + bits(expr("(d1 + d0) div d1"))) <
          (col("bits0") + bits(expr("(d1 + d0) div d0"))))
          .cast("int").as("pred"))
  }

  /** Confusion-matrix census over (y, pred) rows. */
  def confusionCensus(scored: DataFrame): DataFrame = scored.agg(
      sum(when(col("y") === 1 && col("pred") === 1, 1L).otherwise(0L))
        .as("tp"),
      sum(when(col("y") === 0 && col("pred") === 1, 1L).otherwise(0L))
        .as("fp"),
      sum(when(col("y") === 1 && col("pred") === 0, 1L).otherwise(0L))
        .as("fn"),
      sum(when(col("y") === 0 && col("pred") === 0, 1L).otherwise(0L))
        .as("tn"),
      count(lit(1)).as("n_eval"))
    .withColumn("accuracy_x1e4", expr("(tp + tn) * 10000 div n_eval"))
}
