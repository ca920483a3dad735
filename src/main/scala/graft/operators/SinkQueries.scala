package graft.operators

import graft.QueryDef
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, DecimalType, StructField, StructType}
import graft.sources.{Readers, Sinks, TableLayout}
import graft.{Tables => T}
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
        // read back with the DECLARED export schema (derived from the
        // projection, not inference): an empty export must read as 0
        // rows, not die with 'Unable to infer schema'
        val exportSchema = Sinks.appExportProjection(docs, 0.7).schema
        val back = s.read.schema(exportSchema).json(path)
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
         |FROM v2ev""".stripMargin),

    // K4 — Markdown report sink (reference: database/
    // generate_events_markdown.py:32-133): every event renders to a
    // fixed 6-line block + blank; the read-back line census must match
    // counts derived independently from the source table.
    "k4_markdown_roundtrip" -> QueryDef(
      (s, d) => {
        val path = outDir("md", d)
        Sinks.exportMarkdown(ev(s, d), path)
        s.read.text(path).agg(
          count(lit(1)).as("n_lines"),
          count(when(col("value").startsWith("## "), 1)).as("n_events"),
          count(when(col("value") === "- **Venue**: Unknown Venue", 1))
            .as("n_unknown_venue"),
          count(when(col("value") === "- **Lineup**: TBA", 1))
            .as("n_lineup_tba"))
      },
      s"""$CTE SELECT CAST(COUNT(*) * 7 AS BIGINT) AS n_lines,
         |  COUNT(*) AS n_events,
         |  COUNT(CASE WHEN venue_name = 'Unknown Venue' THEN 1 END)
         |    AS n_unknown_venue,
         |  COUNT(CASE WHEN nacts = 0 THEN 1 END) AS n_lineup_tba
         |FROM v2ev""".stripMargin),

    // S1 — JSON file holding a LIST of event dicts (reference:
    // database/data_migration.py:42-49 json.load of an array): the
    // array file is produced Spark-side (bounded slice → one
    // collect_list), then parsed back by the production reader.
    "s1_json_roundtrip" -> QueryDef(
      (s, d) => {
        val path = outDir("s1", d)
        val slice = V2Fixtures.raw(s, d).filter(col("doc_id") < 200)
        slice.agg(to_json(collect_list(struct(slice.columns.map(col): _*)))
            .as("doc"))
          .coalesce(1).write.mode("overwrite").text(path)
        // declared schema (the production ETL knows its event shape):
        // robust to an empty export, where inference has no rows
        Readers.jsonEvents(s, path,
          Some(StructType(slice.schema.map(_.copy(nullable = true))))).agg(
          count(lit(1)).as("n_rows"),
          sum(col("doc_id")).as("sum_ids"),
          count(col("title")).as("n_titles"),
          count(col("url")).as("n_urls"),
          sum(size(col("lineup"))).as("n_acts"))
      },
      """SELECT COUNT(*) AS n_rows,
        |  CAST(SUM(doc_id) AS BIGINT) AS sum_ids,
        |  COUNT(CASE WHEN doc_id % 23 <> 0 THEN 1 END) AS n_titles,
        |  COUNT(CASE WHEN doc_id % 6 <> 5 THEN 1 END) AS n_urls,
        |  CAST(SUM(doc_id % 5) AS BIGINT) AS n_acts
        |FROM documents WHERE doc_id < 200""".stripMargin),

    // S2 — nested calendar export {metadata, events:[...]} → one row
    // per event (reference: ibiza_spotlight_calendar_events.json:1-30).
    "s2_calendar_roundtrip" -> QueryDef(
      (s, d) => {
        val path = outDir("s2", d)
        val slice = V2Fixtures.raw(s, d)
          .filter(col("doc_id") >= 200 && col("doc_id") < 450)
        slice.agg(to_json(struct(
            struct(lit("ibiza-spotlight").as("source"),
              count(lit(1)).as("total")).as("metadata"),
            collect_list(struct(slice.columns.map(col): _*)).as("events")))
            .as("doc"))
          .coalesce(1).write.mode("overwrite").text(path)
        val calSchema = StructType(Seq(
          StructField("metadata",
            StructType.fromDDL("source string, total bigint")),
          StructField("events", ArrayType(slice.schema))))
        Readers.calendarEvents(s, path, Some(calSchema)).agg(
          count(lit(1)).as("n_rows"),
          sum(col("doc_id")).as("sum_ids"),
          count(col("venue")).as("n_venues"))
      },
      """SELECT COUNT(*) AS n_rows,
        |  CAST(SUM(doc_id) AS BIGINT) AS sum_ids,
        |  COUNT(CASE WHEN doc_id % 8 <> 7 THEN 1 END) AS n_venues
        |FROM documents WHERE doc_id >= 200 AND doc_id < 450""".stripMargin),

    // S3 — staging scan with the ETL filter `success AND event_data IS
    // NOT NULL` + F17 JSON payload parse (reference:
    // database/etl_sqlite_to_mongo.py:60-69, 86).
    "s3_staging_roundtrip" -> QueryDef(
      (s, d) => {
        val path = outDir("s3", d)
        V2Fixtures.raw(s, d).filter(col("doc_id") < 600)
          .select(col("doc_id"),
            (col("doc_id") % 10 =!= 0).as("success"),
            when(col("doc_id") % 7 === 0, lit(null).cast("string"))
              .otherwise(to_json(struct(col("title"), col("venue"))))
              .as("event_data"))
          .write.mode("overwrite").parquet(path)
        Readers.stagingEvents(s, path,
            StructType.fromDDL("title string, venue string"))
          .agg(count(lit(1)).as("n_rows"),
            sum(col("doc_id")).as("sum_ids"),
            count(col("payload.title")).as("n_titles"),
            count(col("payload.venue")).as("n_venues"))
      },
      """WITH st AS (
        |  SELECT * FROM documents
        |  WHERE doc_id < 600 AND doc_id % 10 <> 0 AND doc_id % 7 <> 0)
        |SELECT COUNT(*) AS n_rows,
        |  CAST(SUM(doc_id) AS BIGINT) AS sum_ids,
        |  COUNT(CASE WHEN doc_id % 23 <> 0 THEN 1 END) AS n_titles,
        |  COUNT(CASE WHEN doc_id % 8 <> 7 THEN 1 END) AS n_venues
        |FROM st""".stripMargin),

    // DYNAMIC partition pruning on the month layout: the fact table
    // is month-partitioned (TableLayout), the quarter dimension lives
    // in a FILE (a local literal would constant-fold and make the
    // pruning static), and the Q3 filter reaches the fact scan only
    // at RUNTIME via the broadcast result — Catalyst's
    // DynamicPruningExpression in PartitionFilters, pinned by
    // PlanAuditSpec. At 100 TB this is the difference between
    // scanning 3 months and scanning the table when the month list
    // comes from data. Oracle: the equivalent static month predicate.
    "j_dpp_month" -> QueryDef(
      (s, d) => {
        import s.implicits._
        val path = outDir("dpp", d)
        TableLayout.writeEventsTable(
          ev(s, d).withColumn("event_id",
            concat(lit("ev"), col("doc_id"))), path)
        val dimPath = outDir("dpp_dim", d)
        (1 to 12).map(m => (f"2025-$m%02d", "Q" + ((m - 1) / 3 + 1)))
          .toDF("start_month", "quarter")
          .write.mode("overwrite").parquet(dimPath)
        val dim = s.read.parquet(dimPath).filter(col("quarter") === "Q3")
        TableLayout.readEventsTable(s, path)
          .join(broadcast(dim), "start_month")
          .groupBy(col("start_month")).agg(count(lit(1)).as("n"))
          .orderBy(col("start_month"))
      },
      s"""$CTE SELECT substr(start_date, 1, 7) AS start_month,
         |  COUNT(*) AS n
         |FROM v2ev
         |WHERE substr(start_date, 1, 7) IN ('2025-07', '2025-08', '2025-09')
         |GROUP BY 1 ORDER BY 1""".stripMargin),

    // Bucketed CO-LOCATED fact-fact join (SURVEY §4 layout family):
    // both sides written with TableLayout.writeBucketed on the join
    // key with the SAME bucket count, so the sort-merge join reads
    // bucket i of each table directly — NO exchange on either input.
    // At 100 TB this converts the recurring lineitem⋈orders-class
    // join from the dominant per-query shuffle into a local zip of
    // co-numbered buckets, paid once at write time. The only shuffle
    // left in the plan is the tiny 5-row aggregate; PlanAuditSpec
    // pins the no-input-exchange property. Oracle: the same census
    // from the UNBUCKETED parquet in DuckDB — a layout bug that
    // drops/duplicates rows across buckets turns the row red.
    "j_bucket_colocated" -> QueryDef(
      (s, d) => {
        val base = outDir("bucketed", d)
        TableLayout.writeBucketed(T.orders(s, d)
            .select(col("o_orderkey"), col("o_orderpriority")),
          "graft_b_orders", "o_orderkey", 8, Some(base + "/orders"))
        TableLayout.writeBucketed(T.lineitem(s, d)
            .select(col("l_orderkey"), col("l_extendedprice"), col("l_discount")),
          "graft_b_lineitem", "l_orderkey", 8, Some(base + "/lineitem"))
        s.table("graft_b_lineitem").hint("merge")
          .join(s.table("graft_b_orders"),
            col("l_orderkey") === col("o_orderkey"))
          .groupBy(col("o_orderpriority"))
          .agg(count(lit(1)).as("n_items"),
            round(sum(col("l_extendedprice").cast(DecimalType(12, 4)) *
                (lit(1).cast(DecimalType(6, 4)) -
                  col("l_discount").cast(DecimalType(6, 4)))), 4)
              .cast("double").as("revenue"))
          .orderBy(col("o_orderpriority"))
      },
      """SELECT o_orderpriority, COUNT(*) AS n_items,
        |  CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(12,4)) *
        |    (1 - CAST(l_discount AS DECIMAL(6,4)))), 4) AS DOUBLE) AS revenue
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY 1 ORDER BY 1""".stripMargin),

    // S5 — batched table copy through the month-partitioned layout
    // (reference: database/migrate_to_atlas.py:42-76 batches a
    // collection copy; here the copy IS the partitioned rewrite).
    // Read-back aggregates group by the PARTITION column, so the
    // directory layout itself is under test, and the month filter
    // exercises partition pruning on the copy.
    "s5_table_copy" -> QueryDef(
      (s, d) => {
        val path = outDir("s5", d)
        TableLayout.writeEventsTable(
          ev(s, d).withColumn("event_id",
            concat(lit("ev"), col("doc_id"))), path)
        TableLayout.readEventsTable(s, path)
          .filter(col("start_month") >= "2025-06" &&
            col("start_month") <= "2025-12")
          .groupBy(col("start_month")).agg(count(lit(1)).as("n"))
          .orderBy(col("start_month"))
      },
      s"""$CTE SELECT substr(start_date, 1, 7) AS start_month,
         |  COUNT(*) AS n
         |FROM v2ev
         |WHERE substr(start_date, 1, 7) >= '2025-06'
         |  AND substr(start_date, 1, 7) <= '2025-12'
         |GROUP BY 1 ORDER BY 1""".stripMargin)
  )
}
