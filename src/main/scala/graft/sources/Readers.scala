package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Source readers (SURVEY §2.1 S1–S3). */
object Readers {

  /** S1 — JSON file holding a list of event dicts
    * (reference: database/data_migration.py:42-49).
    */
  def jsonEvents(spark: SparkSession, path: String,
      schema: Option[StructType] = None): DataFrame = {
    val r = spark.read.option("multiLine", true)
    schema.fold(r)(s => r.schema(s)).json(path)
  }

  /** S2 — nested calendar export {metadata, events:[...]} → one row per
    * event (reference: ibiza_spotlight_calendar_events.json:1-30).
    * Pass `schema` (the full {metadata, events} shape) when known: an
    * EMPTY events array under inference types as array<string>, and the
    * star-expansion of its elements fails — with a declared schema an
    * empty calendar yields zero typed rows instead.
    */
  def calendarEvents(spark: SparkSession, path: String,
      schema: Option[StructType] = None): DataFrame = {
    val r = spark.read.option("multiLine", true)
    schema.fold(r)(s => r.schema(s)).json(path)
      .select(explode(col("events")).as("e"))
      .select(col("e.*"))
  }

  /** S3 — scraped_events staging scan with the ETL filter
    * `success AND event_data IS NOT NULL`, then F17 JSON parse of the
    * payload (reference: database/etl_sqlite_to_mongo.py:60-69, 86).
    * The staging table arrives as parquet here (the reference reads
    * SQLite; JDBC would be a drop-in swap).
    */
  def stagingEvents(spark: SparkSession, path: String,
      payloadSchema: StructType): DataFrame =
    spark.read.parquet(path)
      .filter(col("success") === true && col("event_data").isNotNull)
      .withColumn("payload", from_json(col("event_data"), payloadSchema))
}
