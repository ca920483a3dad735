package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Parquet table loaders for the driver-generated testdata
  * (see /root/repo/TESTDATA.md) plus numeric-parity helpers shared by
  * every query that must hash-match the DuckDB oracle.
  */
object Tables {
  def t(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def lineitem(s: SparkSession, d: String): DataFrame = t(s, d, "lineitem")
  def orders(s: SparkSession, d: String): DataFrame   = t(s, d, "orders")
  def customer(s: SparkSession, d: String): DataFrame = t(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = t(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame     = t(s, d, "part")
  def nation(s: SparkSession, d: String): DataFrame   = t(s, d, "nation")
  def region(s: SparkSession, d: String): DataFrame   = t(s, d, "region")
  /** events.parquet stores ts as INT64 TIMESTAMP(NANOS), which Spark's
    * parquet reader rejects. Read nanos as long (legacy conf) and
    * derive the TimestampType column by integer-dividing to micros —
    * same floor truncation DuckDB applies when comparing at micro/milli
    * grain, so oracle parity holds.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    normalizeEventTs(t(s, d, "events"))
  }

  /** The nanos→TimestampType normalization alone, for read paths that
    * obtain the raw frame differently (the streaming source declares
    * its schema and must apply the SAME rule, or stream results would
    * silently diverge from the batch oracles).
    */
  def normalizeEventTs(raw: DataFrame): DataFrame =
    raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
  def documents(s: SparkSession, d: String): DataFrame  = t(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = t(s, d, "embeddings")

  /** Oracle-parity numeric discipline.
    *
    * Summing doubles is partition-order dependent in Spark and
    * vectorization-order dependent in DuckDB, so raw `sum(double)` can
    * differ in the last ulps between the two engines and break the
    * driver's hash compare. Instead: compute per-row arithmetic in
    * double (IEEE-deterministic given identical expressions), cast each
    * row to DECIMAL(18,4) (deterministic rounding; exact-halfway ties
    * are unrepresentable in binary doubles), SUM the decimals (exact,
    * order-independent in both engines), and cast the final result back
    * to double (deterministic nearest-even). Averages divide that exact
    * sum by the exact count — one deterministic double division.
    * Mirror in oracle SQL: CAST(SUM(CAST(x AS DECIMAL(18,4))) AS DOUBLE).
    */
  def decSum(c: Column): Column =
    sum(c.cast(DecimalType(18, 4))).cast("double")

  def decAvg(c: Column): Column =
    sum(c.cast(DecimalType(18, 4))).cast("double") / count(lit(1))

  /** SQL-side mirror of decSum for oracle strings. */
  def sqlDecSum(expr: String): String =
    s"CAST(SUM(CAST($expr AS DECIMAL(18,4))) AS DOUBLE)"
  def sqlDecAvg(expr: String): String =
    s"CAST(SUM(CAST($expr AS DECIMAL(18,4))) AS DOUBLE) / COUNT(*)"
}
