package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation utilities (SURVEY §4 / the 100 TB design stance).
  *
  * AQE's skew-join splitting handles most cases at runtime; these are
  * the explicit fallbacks for when a key distribution is so hot that
  * even a split partition can't hold one key's rows (the classic
  * "null key / celebrity key" problem), or when a deterministic plan
  * is preferred over runtime re-planning.
  */
object SkewOps {

  /** Two-phase (salted) aggregation: append a random-ish salt derived
    * from a uniqueness column, pre-aggregate on (key, salt), then
    * aggregate the partials. Turns one hot key's single reducer into
    * `buckets` reducers. Works for any decomposable aggregate; here
    * count + sum as the canonical pair.
    */
  def saltedCountSum(df: DataFrame, keyCol: String, valCol: String,
      uniqueCol: String, buckets: Int): DataFrame =
    df.withColumn("_salt", pmod(xxhash64(col(uniqueCol)), lit(buckets)))
      .groupBy(col(keyCol), col("_salt"))
      .agg(count(lit(1)).as("_pc"), sum(col(valCol)).as("_ps"))
      .groupBy(col(keyCol))
      .agg(sum(col("_pc")).as("n"), sum(col("_ps")).as("total"))

  /** Salted join for a skewed fact side against a small-ish dimension:
    * the fact side gets a salt in [0, buckets); the dimension is
    * replicated `buckets` times with matching salts, so one hot join
    * key spreads over `buckets` tasks. Dimension grows ×buckets —
    * only use when dim ≪ fact (which is when skew hurts anyway).
    */
  def saltedJoin(fact: DataFrame, dim: DataFrame, key: String,
      buckets: Int, joinType: String = "inner"): DataFrame = {
    val salted = fact.withColumn("_salt",
      pmod(xxhash64(monotonically_increasing_id()), lit(buckets)).cast("int"))
    val replicated = dim.withColumn("_salt",
      explode(sequence(lit(0), lit(buckets - 1))))
    salted.join(replicated, Seq(key, "_salt"), joinType).drop("_salt")
  }

  /** Key-distribution report — the diagnostic that decides whether to
    * salt: top-k keys by row count with their share of the table.
    *
    * ONE scan of the base table: the grand total is the sum of the
    * per-key counts (a cross join against the one-row aggregate of the
    * already-tiny counts relation), not a second df.count() pass.
    */
  def keySkewReport(df: DataFrame, keyCol: String, k: Int = 20): DataFrame = {
    val counts = df.groupBy(col(keyCol)).agg(count(lit(1)).as("n"))
    counts
      .crossJoin(broadcast(counts.agg(sum(col("n")).as("_total"))))
      .withColumn("share", col("n").cast("double") / col("_total").cast("double"))
      .drop("_total")
      .orderBy(col("n").desc, col(keyCol))
      .limit(k)
  }
}
