package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Export sinks (SURVEY §2.1 K2–K4). */
object Sinks {

  /** K2 — the app-export projection: quality filter + drop bulky
    * fields (reference: database/query_examples.py:269-300). Exposed
    * separately from the write so callers can read the export back
    * with the DECLARED schema instead of inference (an empty export
    * would fail schema inference outright, and inference can narrow
    * types the filter happened to make uniform).
    */
  def appExportProjection(events: DataFrame, minQuality: Double): DataFrame =
    events.filter(col("data_quality.overall_score") >= minQuality)
      .drop("data_quality", "deduplication")
      .withColumn("scraping_metadata",
        col("scraping_metadata").dropFields("raw_data"))

  /** K2 — app JSON export. */
  def exportForApp(events: DataFrame, minQuality: Double, path: String): Unit =
    appExportProjection(events, minQuality)
      .coalesce(1).write.mode("overwrite").json(path)

  /** K3 — CSV export of flat summary columns
    * (reference: my_scrapers/unified_scraper.py:670-687).
    */
  def exportCsv(events: DataFrame, path: String): Unit =
    events.select(
      col("event_id"), col("title"), col("type"), col("status"),
      col("datetime.start_date").as("start_date"),
      col("venue.name").as("venue_name"),
      col("data_quality.overall_score").as("quality"))
      .coalesce(1).write.mode("overwrite").option("header", true).csv(path)

  /** K4 — per-event Markdown report column: projection, lineup
    * truncated to 5, quality block
    * (reference: database/generate_events_markdown.py:32-133).
    */
  def markdownColumn: Column = {
    val lineup = transform(slice(col("acts"), 1, 5), a => a.getField("act_name"))
    val more = when(size(col("acts")) > 5,
      concat(lit("\n...and "), (size(col("acts")) - 5).cast("string"),
        lit(" more"))).otherwise(lit(""))
    concat(
      lit("## "), coalesce(col("title"), lit("Untitled")), lit("\n\n"),
      lit("- **When**: "),
      coalesce(col("datetime.recurring.pattern_description"),
        col("datetime.start_date"), lit("TBA")), lit("\n"),
      lit("- **Venue**: "), coalesce(col("venue.name"), lit("Unknown")), lit("\n"),
      lit("- **Lineup**: "),
      when(size(col("acts")) > 0, concat(array_join(lineup, ", "), more))
        .otherwise(lit("TBA")), lit("\n"),
      lit("- **Quality**: "),
      coalesce(format_number(col("data_quality.overall_score"), 3),
        lit("unscored")), lit("\n"))
  }

  /** K4 — write the Markdown report as a single text file part. */
  def exportMarkdown(events: DataFrame, path: String): Unit =
    events.orderBy(col("datetime.start_date"))
      .select(markdownColumn.as("md"))
      .coalesce(1).write.mode("overwrite").text(path)
}
