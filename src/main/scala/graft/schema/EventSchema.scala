package graft.schema

import org.apache.spark.sql.types._

/** The canonical nested event-document schema (unifiedEventsSchema_v2).
  *
  * Faithful Spark rendering of the reference's type map
  * (reference: helpers/schemas.py:12-180) and MongoDB $jsonSchema
  * validator (helpers/schemas.py:183-457). Dates are ISO-8601 strings
  * by reference convention (compared lexicographically); derived
  * TimestampType twins are added downstream by the unify transform.
  *
  * Open objects (`popularity_metrics`, `raw_data`) stay
  * MapType/StringType so we don't over-schema them
  * (SURVEY §7.3 risk 6).
  */
object EventSchema {

  val setTime: StructType = StructType(Seq(
    StructField("start", StringType),
    StructField("end", StringType),
    StructField("duration_minutes", IntegerType)))

  val stageAct: StructType = StructType(Seq(
    StructField("act_id", StringType),
    StructField("set_time", setTime),
    StructField("billing_order", IntegerType),
    StructField("is_headliner", BooleanType)))

  val stage: StructType = StructType(Seq(
    StructField("stage_id", StringType),
    StructField("stage_name", StringType),
    StructField("capacity", IntegerType),
    StructField("stage_type", StringType),
    StructField("host", StructType(Seq(
      StructField("host_name", StringType),
      StructField("host_id", StringType)))),
    StructField("stage_genres", ArrayType(StringType)),
    StructField("acts", ArrayType(stageAct))))

  val venue: StructType = StructType(Seq(
    StructField("venue_id", StringType),
    StructField("name", StringType),
    StructField("address", StructType(Seq(
      StructField("street", StringType),
      StructField("city", StringType),
      StructField("state", StringType),
      StructField("country", StringType),
      StructField("postal_code", StringType),
      StructField("full_address", StringType)))),
    // GeoJSON point, [lon, lat] (reference: helpers/schemas.py:49-52)
    StructField("coordinates", StructType(Seq(
      StructField("type", StringType),
      StructField("coordinates", ArrayType(DoubleType))))),
    StructField("venue_type", StringType),
    StructField("total_capacity", IntegerType),
    StructField("has_disabled_access", BooleanType),
    StructField("website", StringType),
    StructField("social_links", MapType(StringType, StringType)),
    StructField("stage_count", IntegerType),
    StructField("stages", ArrayType(stage))))

  val act: StructType = StructType(Seq(
    StructField("act_id", StringType),
    StructField("act_name", StringType),
    StructField("act_type", StringType),
    StructField("genres", ArrayType(StringType)),
    StructField("styles", ArrayType(StringType)),
    StructField("social_media", MapType(StringType, StringType)),
    StructField("popularity_metrics", MapType(StringType, StringType))))

  val datetimeT: StructType = StructType(Seq(
    StructField("start_date", StringType),
    StructField("end_date", StringType),
    StructField("timezone", StringType),
    StructField("doors_open", StringType),
    StructField("last_entry", StringType),
    StructField("is_all_day", BooleanType),
    StructField("duration_hours", DoubleType),
    StructField("recurring", StructType(Seq(
      StructField("is_recurring", BooleanType),
      StructField("frequency", StringType),
      StructField("pattern_description", StringType),
      StructField("end_recurrence", StringType))))))

  val ticketTier: StructType = StructType(Seq(
    StructField("tier_id", StringType),
    StructField("tier_name", StringType),
    StructField("tier_price", DoubleType),
    StructField("currency", StringType),
    StructField("sale_start", StringType),
    StructField("sale_end", StringType),
    StructField("is_sold_out", BooleanType),
    StructField("is_nearly_sold_out", BooleanType)))

  val ticketing: StructType = StructType(Seq(
    StructField("tickets_url", StringType),
    StructField("is_free", BooleanType),
    StructField("age_restriction", StructType(Seq(
      StructField("minimum_age", IntegerType),
      StructField("restriction_type", StringType)))),
    StructField("promos", ArrayType(StringType)),
    StructField("tiers", ArrayType(ticketTier)),
    StructField("external_platforms", ArrayType(StringType))))

  val scrapingMetadata: StructType = StructType(Seq(
    StructField("source_platform", StringType),
    StructField("source_url", StringType),
    StructField("source_event_id", StringType),
    StructField("first_scraped", StringType),
    StructField("last_scraped", StringType),
    StructField("scraper_version", StringType),
    StructField("raw_data", StringType)))

  val validationFlag: StructType = StructType(Seq(
    StructField("field", StringType),
    StructField("issue", StringType)))

  // Fixed five keys (reference: database/quality_scorer.py:21-27) —
  // a struct of doubles keeps scoring whole-stage-codegen friendly.
  val fieldQualityScores: StructType = StructType(Seq(
    StructField("title", DoubleType),
    StructField("venue", DoubleType),
    StructField("datetime", DoubleType),
    StructField("acts", DoubleType),
    StructField("ticketing", DoubleType)))

  val dataQuality: StructType = StructType(Seq(
    StructField("overall_score", DoubleType),
    StructField("field_quality_scores", fieldQualityScores),
    StructField("validation_flags", ArrayType(validationFlag)),
    StructField("manual_verification", StructType(Seq(
      StructField("is_verified", BooleanType),
      StructField("verified_by", StringType),
      StructField("verified_at", StringType))))))

  val schema: StructType = StructType(Seq(
    StructField("event_id", StringType, nullable = false),
    StructField("canonical_id", StringType),
    StructField("title", StringType),
    StructField("type", StringType),
    StructField("status", StringType),
    StructField("datetime", datetimeT),
    StructField("venue", venue),
    StructField("acts", ArrayType(act)),
    StructField("content", StructType(Seq(
      StructField("short_description", StringType),
      StructField("full_description", StringType),
      StructField("keywords", ArrayType(StringType)),
      StructField("hashtags", ArrayType(StringType))))),
    StructField("music", StructType(Seq(
      StructField("primary_genre", StringType),
      StructField("sub_genres", ArrayType(StringType)),
      StructField("styles", ArrayType(StringType)),
      StructField("mood_tags", ArrayType(StringType)),
      StructField("energy_level", IntegerType),
      StructField("genre_confidence", DoubleType)))),
    StructField("ticketing", ticketing),
    StructField("scraping_metadata", scrapingMetadata),
    StructField("data_quality", dataQuality),
    StructField("deduplication", StructType(Seq(
      StructField("is_canonical", BooleanType),
      StructField("merged_from_ids", ArrayType(StringType)),
      StructField("merge_log", ArrayType(StringType))))),
    StructField("knowledge_graph", StructType(Seq(
      StructField("related_events", ArrayType(StringType)),
      StructField("audience_profile_tags", ArrayType(StringType)),
      StructField("influence_score", DoubleType)))),
    StructField("analytics", StructType(Seq(
      StructField("views", IntegerType),
      StructField("saves", IntegerType),
      StructField("clicks_to_tickets", IntegerType)))),
    StructField("created_at", StringType),
    StructField("updated_at", StringType),
    StructField("system_flags", StructType(Seq(
      StructField("is_featured", BooleanType),
      StructField("is_hidden", BooleanType),
      StructField("needs_refresh", BooleanType),
      StructField("refresh_requested_at", StringType))))))
}
