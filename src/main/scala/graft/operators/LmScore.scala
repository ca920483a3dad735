package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Shared bigram-LM machinery for the CCNet/KenLM-style corpus
  * quality filter (`ta_lm_quality_filter`) and its scaling probe
  * (ScaleProbe `lm`) — one implementation, so the probe measures
  * exactly the pipeline the query ships.
  *
  * Scale shape: bigrams explode in place (no shuffle); the count
  * table is ONE (w1, w2)-keyed partial-agg shuffle collapsing the
  * corpus to a vocab²-bounded table plus one w1-keyed window for the
  * context mass; scoring is a (w1, w2)-keyed LEFT join plus a per-doc
  * partial agg — nothing grows with the TRAIN corpus at fixed vocab.
  */
object LmScore {

  /** (doc_id, t: Array[String]) → one row per in-doc bigram, empty
    * tokens dropped. Input must already be tokenized (size >= 2).
    */
  def bigrams(docs: DataFrame): DataFrame = docs
    .select(col("doc_id"), explode(expr(
      "transform(sequence(0, size(t)-2), " +
        "i -> struct(t[i] AS w1, t[i+1] AS w2))")).as("b"))
    .select(col("doc_id"), col("b.w1").as("w1"), col("b.w2").as("w2"))
    .filter(col("w1") =!= "" && col("w2") =!= "")

  /** Bigram count table (w1, w2, n, c1 = Σ_w2 n) from a training
    * bigram stream, localCheckpointed (it is consumed by every score
    * batch — without this the train corpus re-aggregates per use).
    */
  def trainBigramTable(trainBigrams: DataFrame): DataFrame = trainBigrams
    .groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("n"))
    .withColumn("c1", sum(col("n")).over(Window.partitionBy(col("w1"))))
    .localCheckpoint()

  /** Per-doc integral bit cost of an eval bigram stream under a
    * trained table: seen bigrams cost floor(log2(c1 div n)) bits
    * (length(bin)−1 — no libm), unseen a flat `oovBits`. Returns
    * (doc_id, n_bigrams, total_bits).
    */
  def scoreDocs(evalBigrams: DataFrame, lm: DataFrame,
      oovBits: Long = 20L): DataFrame = evalBigrams
    .join(lm, Seq("w1", "w2"), "left")
    .select(col("doc_id"),
      when(col("n").isNull, lit(oovBits))
        .otherwise(length(bin(expr("c1 div n"))) - 1)
        .cast("long").as("bits"))
    .groupBy(col("doc_id"))
    .agg(count(lit(1)).as("n_bigrams"), sum(col("bits")).as("total_bits"))
}
