package graft.operators

import graft.QueryDef
import org.apache.spark.sql.functions._
import graft.sources.Sinks
import V2Fixtures.{events => ev, oracleCte => CTE}

/** Oracle-checked ROUNDTRIPS for the file-export sinks (SURVEY §2.1
  * K2/K3): each query WRITES the export with the production sink, reads
  * the files back, and aggregates the read-back rows — so the driver's
  * DuckDB compare (which recomputes the same aggregates from the source
  * parquet) verifies the full write→parse cycle, not just the
  * projection. A self-cancelling formatting bug (write and read-back
  * agreeing on something wrong) would still need the aggregate to
  * match an independently-derived oracle value, which it can't.
  *
  * Exports land under target/sink_roundtrip/<fmt>_<sf>, overwritten on
  * each run — bench reruns are idempotent.
  */
object SinkQueries {

  private def outDir(fmt: String, dir: String) =
    new java.io.File("target/sink_roundtrip/" +
      fmt + "_" + dir.replaceAll("[^A-Za-z0-9.]", "_")).getAbsolutePath

  val registry: Map[String, QueryDef] = Map(

    // K2 — app JSON export (reference: database/query_examples.py:
    // 269-300): quality floor, bulky/internal fields dropped, JSON
    // files written, read back, aggregated.
    "k2_json_roundtrip" -> QueryDef(
      (s, d) => {
        // the fixture's pruned serving table lacks scraping_metadata;
        // give the sink the raw_data field it must strip
        val docs = ev(s, d).withColumn("scraping_metadata",
          struct(lit("ibiza-spotlight").as("source_platform"),
            lit("<html>bulk</html>").as("raw_data")))
        val path = outDir("json", d)
        Sinks.exportForApp(docs, minQuality = 0.7, path)
        val back = s.read.json(path)
        // raw_data must NOT have survived the exclude-projection
        require(!back.select(col("scraping_metadata.*")).columns
          .contains("raw_data"), "raw_data leaked into the JSON export")
        back.agg(
          count(lit(1)).as("n_rows"),
          sum(col("doc_id")).as("sum_ids"),
          count(col("content.short_description")).as("n_descriptions"),
          min(col("datetime.start_date")).as("min_start"),
          countDistinct(col("venue.name")).as("n_venues"))
      },
      s"""$CTE SELECT COUNT(*) AS n_rows,
         |  CAST(SUM(doc_id) AS BIGINT) AS sum_ids,
         |  COUNT(sdesc) AS n_descriptions,
         |  MIN(start_date) AS min_start,
         |  COUNT(DISTINCT venue_name) AS n_venues
         |FROM v2ev WHERE overall_score >= CAST(0.7 AS DOUBLE)""".stripMargin),

    // K3 — flat CSV export (reference: my_scrapers/unified_scraper.py:
    // 670-687): summary columns through CSV text and back. The quality
    // double survives because Spark writes the shortest roundtripping
    // decimal form; the comparison happens on read-back values.
    "k3_csv_roundtrip" -> QueryDef(
      (s, d) => {
        val docs = ev(s, d)
          .withColumn("event_id", concat(lit("ev"), col("doc_id")))
          .withColumn("status", lit("scheduled"))
        val path = outDir("csv", d)
        Sinks.exportCsv(docs, path)
        val back = s.read.option("header", true)
          .schema("event_id string, title string, type string, " +
            "status string, start_date string, venue_name string, " +
            "quality double")
          .csv(path)
        back.agg(
          count(lit(1)).as("n_rows"),
          countDistinct(col("venue_name")).as("n_venues"),
          sum(when(col("quality") >= 0.8, 1L).otherwise(0L)).as("n_good"),
          min(col("start_date")).as("min_start"),
          count(when(col("type") === "club_night", 1)).as("n_club"))
      },
      s"""$CTE SELECT COUNT(*) AS n_rows,
         |  COUNT(DISTINCT venue_name) AS n_venues,
         |  CAST(SUM(CASE WHEN overall_score >= CAST(0.8 AS DOUBLE)
         |    THEN 1 ELSE 0 END) AS BIGINT) AS n_good,
         |  MIN(start_date) AS min_start,
         |  COUNT(CASE WHEN event_type = 'club_night' THEN 1 END) AS n_club
         |FROM v2ev""".stripMargin)
  )
}
