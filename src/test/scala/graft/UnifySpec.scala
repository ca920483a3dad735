package graft

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Unify

/** Unify (schema adapter) tests — FIXTURES.md §3 raw scraper dict with
  * the expected behavior listed there; entity-id goldens computed with
  * Python uuid.uuid5 (reference: schema_adapter_enhanced.py:424-427).
  */
class UnifySpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkTest.session
  import spark.implicits._

  private val rawJson =
    """{"title": "Techno Night at Amnesia",
      | "time": "Friday 15 July 2025",
      | "venue": "amnesia",
      | "lineup": [{"name": "Charlotte de Witte", "role": "headliner"},
      |            {"name": "Amelie Lens", "role": "support"}],
      | "url": "www.ibiza-spotlight.com/event/12345",
      | "genres": ["techno", "melodic-techno"],
      | "price_text": "From €50.00 - Tickets available"}""".stripMargin

  private lazy val unified: Row = {
    val raw = spark.read.json(Seq(rawJson).toDS)
    Unify.unify(raw, "ibiza-spotlight",
      lit("2025-06-10 00:00:00").cast("timestamp")).head()
  }

  private def field(path: String): Any = {
    val raw = spark.read.json(Seq(rawJson).toDS)
    Unify.unify(raw, "ibiza-spotlight",
      lit("2025-06-10 00:00:00").cast("timestamp"))
      .select(col(path)).head().get(0)
  }

  test("venue name normalized via lookup; uuid5-golden venue_id") {
    assert(field("venue.name") === "Amnesia")
    assert(field("venue.venue_id") === "venue_amnesia_06d2647a")
  }

  test("ibiza date parse: day-name strip + 23:00 default, canonical ISO") {
    assert(field("datetime.start_date") === "2025-07-15T23:00:00Z")
    assert(field("datetime.recurring.pattern_description") === "Friday 15 July 2025")
  }

  test("genres normalized through lookup") {
    assert(field("music.primary_genre") === "Techno")
    assert(field("music.sub_genres") === Seq("Techno", "Melodic Techno"))
  }

  test("price text extraction to tier (50.0 EUR), not free") {
    assert(field("ticketing.is_free") === false)
    val tier = field("ticketing.tiers").asInstanceOf[scala.collection.Seq[Row]].head
    assert(tier.getAs[Double]("tier_price") === 50.0)
    assert(tier.getAs[String]("currency") === "EUR")
  }

  test("lineup → acts with uuid5-golden ids; first artist headliner") {
    val acts = field("acts").asInstanceOf[scala.collection.Seq[Row]]
    assert(acts.map(_.getAs[String]("act_name")) ===
      Seq("Charlotte de Witte", "Amelie Lens"))
    assert(acts.head.getAs[String]("act_id") === "artist_charlotte_de_witte_21508948")
    assert(acts(1).getAs[String]("act_id") === "artist_amelie_lens_df2cf13a")
    assert(acts.head.getAs[String]("act_type") === "headliner")
    val stageActs = field("venue.stages").asInstanceOf[scala.collection.Seq[Row]]
      .head.getAs[scala.collection.Seq[Row]]("acts")
    assert(stageActs.map(_.getAs[Boolean]("is_headliner")) === Seq(true, false))
    assert(stageActs.map(_.getAs[Int]("billing_order")) === Seq(1, 2))
  }

  test("schemeless URL https-prefixed") {
    assert(field("scraping_metadata.source_url") ===
      "https://www.ibiza-spotlight.com/event/12345")
  }

  test("uuid5-golden event_id from platform + title + raw date") {
    assert(field("event_id") ===
      "ibiza-spotlight_techno_night_at_amnesia_friday_15_july_2025_72f21477")
  }

  test("event type heuristic and quality attached") {
    assert(field("type") === "club_night")
    val overall = field("data_quality.overall_score").asInstanceOf[Double]
    assert(overall > 0.5 && overall <= 1.0)
  }

  test("calendar-shape record with unparseable time range falls back to now") {
    val calJson =
      """{"title": "Introducing... Baddest Behaviour",
        | "url": "https://www.ibiza-spotlight.com/night/promoters/x",
        | "time": "23:00\n                         - 06:00",
        | "lineup": [{"name": "Mau P", "room": "Main"}, {"name": "CAMELPHAT", "room": "Main"}],
        | "venue": "Pacha"}""".stripMargin
    val raw = spark.read.json(Seq(calJson).toDS)
    val u = Unify.unify(raw, "ibiza-spotlight-calendar",
      lit("2025-06-10 00:00:00").cast("timestamp"))
    val r = u.select(col("datetime.start_date"), col("venue.name"),
      col("datetime.recurring.pattern_description"), size(col("acts"))).head()
    assert(r.getString(0) === "2025-06-10T00:00:00Z") // fallback to now
    assert(r.getString(1) === "Pacha")
    // unparseable time → no raw_date_string recorded (reference:
    // schema_adapter_enhanced.py:206-213)
    assert(r.isNullAt(2))
    assert(r.getInt(3) === 2)
  }

  test("timezone-from-location lookup (J3)") {
    val df = Seq("Club in Ibiza town", "somewhere in London", "unknown city", null)
      .toDF("loc")
      .select(Unify.timezoneFromLocation(col("loc")).as("tz"))
    assert(df.collect().map(_.getString(0)).toSeq ===
      Seq("Europe/Madrid", "Europe/London", "UTC", "UTC"))
  }

  test("empty lineup / missing columns degrade to defaults") {
    val raw = spark.read.json(Seq("""{"title": "Solo Event 2025"}""").toDS)
    val u = Unify.unify(raw, "ibiza-spotlight",
      lit("2025-06-10 00:00:00").cast("timestamp"))
    val r = u.select(size(col("acts")), col("venue.name"), col("ticketing.is_free"),
      size(col("ticketing.tiers"))).head()
    assert(r.getInt(0) === 0)
    assert(r.getString(1) === "Unknown Venue")
    assert(r.getBoolean(2) === false)
    assert(r.getInt(3) === 0)
  }

  test("clean record → empty validation lists, confidence 1.0") {
    val raw = spark.read.json(Seq(rawJson).toDS)
    val r = Unify.unify(raw, "ibiza-spotlight",
        lit("2025-06-10 00:00:00").cast("timestamp"))
      .select(size(col("validation_metadata.validation_errors")),
        size(col("validation_metadata.validation_warnings")),
        size(col("validation_metadata.validation_info")),
        col("validation_metadata.confidence_score"),
        col("validation_metadata.platform_validator")).head()
    assert(r.getInt(0) === 0 && r.getInt(1) === 0 && r.getInt(2) === 0)
    assert(r.getDouble(3) === 1.0)
    assert(r.getString(4) === "IbizaSpotlightValidator")
  }

  test("validation decay: error ×0.7, warning ×0.9, info ×0.95 in issue order") {
    // missing title (error), bad date (error), missing venue (warning),
    // 1-char artist name (info) — reference sequential *= order:
    // 1.0 * 0.7 * 0.7 * 0.9 * 0.95
    val raw = spark.read.json(Seq(
      """{"time": "whenever vibes", "lineup": [{"name": "X"}], "url": "www.ok.com/e"}""").toDS)
    val u = Unify.unify(raw, "ibiza-spotlight",
      lit("2025-06-10 00:00:00").cast("timestamp"))
    val r = u.select(
      col("validation_metadata.confidence_score"),
      transform(col("validation_metadata.validation_errors"),
        x => x.getField("message")).as("errs"),
      transform(col("validation_metadata.validation_warnings"),
        x => x.getField("field")).as("warns"),
      transform(col("validation_metadata.validation_info"),
        x => x.getField("message")).as("infos"),
      col("datetime.start_date")).head()
    assert(r.getDouble(0) === 1.0 * 0.7 * 0.7 * 0.9 * 0.95)
    assert(r.getSeq[String](1) ===
      Seq("Missing event title", "Invalid date format: whenever vibes"))
    assert(r.getSeq[String](2) === Seq("venue"))
    assert(r.getSeq[String](3) === Seq("Very short artist name: X"))
    // unparseable date still falls back to now for start_date — the
    // reference's own behavior (schema_adapter_enhanced.py:592); the
    // failure is recorded here, not by nulling the field.
    assert(r.getString(4) === "2025-06-10T00:00:00Z")
  }

  test("short-title warning decays ×0.9 and keeps the title") {
    val raw = spark.read.json(Seq("""{"title": "XY", "venue": "pacha"}""").toDS)
    val r = Unify.unify(raw, "ibiza-spotlight",
        lit("2025-06-10 00:00:00").cast("timestamp"))
      .select(col("validation_metadata.confidence_score"), col("title")).head()
    assert(r.getDouble(0) === 0.9)
    assert(r.getString(1) === "XY")
  }

  test("platform registry: V1 ticketmaster TypedDict shape unifies") {
    val tmJson =
      """{"title": "Summer Closing",
        | "url": "https://www.ticketmaster.com/event/99",
        | "location": {"venue": "hi ibiza", "address": "Platja d'en Bossa"},
        | "dateTime": {"displayText": "2025-07-15 21:00:00"},
        | "lineUp": [{"name": "Some DJ", "headliner": true},
        |            {"name": "Opener Act"}],
        | "ticketInfo": {"displayText": "From €45", "currency": "EUR"}}""".stripMargin
    val raw = spark.read.json(Seq(tmJson).toDS)
    val u = Unify.unify(raw, "ticketmaster",
      lit("2025-06-10 00:00:00").cast("timestamp"))
    val r = u.select(col("title"), col("venue.name"),
      col("datetime.start_date"),
      element_at(col("ticketing.tiers"), 1).getField("tier_price"),
      transform(col("acts"), a => a.getField("act_name")),
      col("validation_metadata.platform_validator")).head()
    assert(r.getString(0) === "Summer Closing")
    assert(r.getString(1) === "Hï Ibiza") // nested location.venue + lookup
    assert(r.getString(2) === "2025-07-15T21:00:00Z") // universal ladder
    assert(r.getDouble(3) === 45.0)
    assert(r.getSeq[String](4) === Seq("Some DJ", "Opener Act"))
    assert(r.getString(5) === "TicketmasterValidator")
  }

  test("unknown platform falls back to the default (ibiza) validator") {
    val raw = spark.read.json(Seq(rawJson).toDS)
    val r = Unify.unify(raw, "some-new-site",
        lit("2025-06-10 00:00:00").cast("timestamp"))
      .select(col("venue.name"),
        col("validation_metadata.platform_validator")).head()
    assert(r.getString(0) === "Amnesia")
    assert(r.getString(1) === "IbizaSpotlightValidator")
  }

  test("universal date ladder: every reference format parses to ISO") {
    import graft.functions.ScalarFunctions
    val cases = Seq(
      "2025-07-15T23:00:00+0200" -> "2025-07-15T21:00:00Z",
      "2025-07-15T23:00:00+02:00" -> "2025-07-15T21:00:00Z",
      "2025-07-15T23:00:00Z" -> "2025-07-15T23:00:00Z",
      "2025-07-15 23:00:00" -> "2025-07-15T23:00:00Z",
      "2025-07-15" -> "2025-07-15T00:00:00Z",
      "15/07/2025 23:00" -> "2025-07-15T23:00:00Z",
      "15-07-2025 23:00" -> "2025-07-15T23:00:00Z",
      "July 15, 2025 at 11:30 PM" -> "2025-07-15T23:30:00Z",
      "15 July 2025" -> "2025-07-15T00:00:00Z",
      "total garbage" -> null)
    val got = cases.map(_._1).toDF("s")
      .select(ScalarFunctions.parseDateTimeMulti(col("s"))).collect()
      .map(r => if (r.isNullAt(0)) null else r.getString(0))
    assert(got.toSeq === cases.map(_._2))
  }

  test("year-context parse resolves yearless dates (scrapers_v2)") {
    import graft.functions.ScalarFunctions
    val got = Seq("15 July", "15 July 2024").toDF("s")
      .select(ScalarFunctions.parseDateTimeMulti(col("s"),
        yearContext = Some(2025))).collect().map(_.getString(0))
    assert(got.toSeq === Seq("2025-07-15T00:00:00Z", "2024-07-15T00:00:00Z"))
  }

  test("keep columns pass through after the unified schema") {
    val raw = spark.read.json(
      Seq("""{"title": "Solo Event", "my_key": 42}""").toDS)
    val u = Unify.unify(raw, "ibiza-spotlight",
      lit("2025-06-10 00:00:00").cast("timestamp"), keep = Seq("my_key"))
    assert(u.columns.contains("my_key"))
    assert(u.select(col("my_key")).head().getLong(0) === 42L)
  }
}
