package graft.schema

import org.apache.spark.sql.{DataFrame, Dataset, Encoder, Encoders, SparkSession}

/** Typed case-class hierarchy for unifiedEventsSchema_v2 — the Scala
  * analog of the reference's Pydantic models
  * (reference: database/api_server.py:39-239,
  * scrapers_v2/schema_adapter.py:218-236). Field names and types match
  * [[EventSchema.schema]] exactly, so `df.as[Event]` round-trips
  * against parquet/JSON written with that schema.
  *
  * Use the typed surface where compile-time field checks help (scorer
  * rules, adapter logic, tests); the DataFrame surface remains the
  * primary query API (SURVEY §7.0).
  */
case class SetTime(start: Option[String], end: Option[String],
    duration_minutes: Option[Int])

case class StageAct(act_id: Option[String], set_time: Option[SetTime],
    billing_order: Option[Int], is_headliner: Option[Boolean])

case class Host(host_name: Option[String], host_id: Option[String])

case class Stage(stage_id: Option[String], stage_name: Option[String],
    capacity: Option[Int], stage_type: Option[String], host: Option[Host],
    stage_genres: Option[Seq[String]], acts: Option[Seq[StageAct]])

case class Address(street: Option[String], city: Option[String],
    state: Option[String], country: Option[String],
    postal_code: Option[String], full_address: Option[String])

case class GeoPoint(`type`: Option[String], coordinates: Option[Seq[Double]])

case class Venue(venue_id: Option[String], name: Option[String],
    address: Option[Address], coordinates: Option[GeoPoint],
    venue_type: Option[String], total_capacity: Option[Int],
    has_disabled_access: Option[Boolean], website: Option[String],
    social_links: Option[Map[String, String]], stage_count: Option[Int],
    stages: Option[Seq[Stage]])

case class Act(act_id: Option[String], act_name: Option[String],
    act_type: Option[String], genres: Option[Seq[String]],
    styles: Option[Seq[String]], social_media: Option[Map[String, String]],
    popularity_metrics: Option[Map[String, String]])

case class Recurring(is_recurring: Option[Boolean], frequency: Option[String],
    pattern_description: Option[String], end_recurrence: Option[String])

case class EventDateTime(start_date: Option[String], end_date: Option[String],
    timezone: Option[String], doors_open: Option[String],
    last_entry: Option[String], is_all_day: Option[Boolean],
    duration_hours: Option[Double], recurring: Option[Recurring])

case class Content(short_description: Option[String],
    full_description: Option[String], keywords: Option[Seq[String]],
    hashtags: Option[Seq[String]])

case class Music(primary_genre: Option[String], sub_genres: Option[Seq[String]],
    styles: Option[Seq[String]], mood_tags: Option[Seq[String]],
    energy_level: Option[Int], genre_confidence: Option[Double])

case class AgeRestriction(minimum_age: Option[Int],
    restriction_type: Option[String])

case class TicketTier(tier_id: Option[String], tier_name: Option[String],
    tier_price: Option[Double], currency: Option[String],
    sale_start: Option[String], sale_end: Option[String],
    is_sold_out: Option[Boolean], is_nearly_sold_out: Option[Boolean])

case class Ticketing(tickets_url: Option[String], is_free: Option[Boolean],
    age_restriction: Option[AgeRestriction], promos: Option[Seq[String]],
    tiers: Option[Seq[TicketTier]], external_platforms: Option[Seq[String]])

case class ScrapingMetadata(source_platform: Option[String],
    source_url: Option[String], source_event_id: Option[String],
    first_scraped: Option[String], last_scraped: Option[String],
    scraper_version: Option[String], raw_data: Option[String])

case class ValidationFlag(field: Option[String], issue: Option[String])

case class FieldQualityScores(title: Option[Double], venue: Option[Double],
    datetime: Option[Double], acts: Option[Double], ticketing: Option[Double])

case class ManualVerification(is_verified: Option[Boolean],
    verified_by: Option[String], verified_at: Option[String])

case class DataQuality(overall_score: Option[Double],
    field_quality_scores: Option[FieldQualityScores],
    validation_flags: Option[Seq[ValidationFlag]],
    manual_verification: Option[ManualVerification])

case class Deduplication(is_canonical: Option[Boolean],
    merged_from_ids: Option[Seq[String]], merge_log: Option[Seq[String]])

case class KnowledgeGraph(related_events: Option[Seq[String]],
    audience_profile_tags: Option[Seq[String]],
    influence_score: Option[Double])

case class Analytics(views: Option[Int], saves: Option[Int],
    clicks_to_tickets: Option[Int])

case class SystemFlags(is_featured: Option[Boolean], is_hidden: Option[Boolean],
    needs_refresh: Option[Boolean], refresh_requested_at: Option[String])

case class Event(
    event_id: String,
    canonical_id: Option[String],
    title: Option[String],
    `type`: Option[String],
    status: Option[String],
    datetime: Option[EventDateTime],
    venue: Option[Venue],
    acts: Option[Seq[Act]],
    content: Option[Content],
    music: Option[Music],
    ticketing: Option[Ticketing],
    scraping_metadata: Option[ScrapingMetadata],
    data_quality: Option[DataQuality],
    deduplication: Option[Deduplication],
    knowledge_graph: Option[KnowledgeGraph],
    analytics: Option[Analytics],
    created_at: Option[String],
    updated_at: Option[String],
    system_flags: Option[SystemFlags])

/** Flat API summary row (the reference's EventSummary response model,
  * api_server.py:285-293).
  */
case class EventSummary(event_id: String, title: Option[String],
    venue_name: Option[String], start_date: Option[String],
    overall_score: Option[Double])

object Event {
  implicit val encoder: Encoder[Event] = Encoders.product[Event]
  implicit val summaryEncoder: Encoder[EventSummary] =
    Encoders.product[EventSummary]

  /** Typed view over a V2 events DataFrame. */
  def ds(df: DataFrame): Dataset[Event] = df.as[Event]

  def read(spark: SparkSession, path: String): Dataset[Event] =
    spark.read.schema(EventSchema.schema).parquet(path).as[Event]
}
