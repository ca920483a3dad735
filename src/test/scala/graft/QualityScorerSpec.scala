package graft

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.QualityScorer
import graft.schema.EventSchema

/** Golden tests for the quality scorer. Expected values were produced
  * by executing the reference scorer
  * (reference: database/quality_scorer.py) on the same event documents
  * with the clock frozen at 2025-06-10T00:00:00Z; title goldens match
  * the reference unit suite (tests/unit/test_quality_scorer.py:56-146).
  */
class QualityScorerSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkTest.session
  import spark.implicits._

  private val now = lit("2025-06-10 00:00:00").cast("timestamp")

  private def quality(json: String): Row =
    spark.read.schema(EventSchema.schema).json(Seq(json).toDS)
      .select(QualityScorer.dataQuality(col("title"), col("venue"),
        col("datetime"), col("acts"), col("ticketing"), now).as("dq"))
      .select("dq.*").head()

  private def checkEvent(json: String, overall: Double,
      fields: Seq[Double], flags: Seq[(String, String)]): Unit = {
    val r = quality(json)
    assert(r.getDouble(0) === overall, "overall_score")
    val fs = r.getStruct(1)
    fields.zipWithIndex.foreach { case (exp, i) =>
      assert(math.abs(fs.getDouble(i) - exp) < 1e-9, s"field score $i")
    }
    val got = r.getSeq[Row](2).map(f => (f.getString(0), f.getString(1)))
    assert(got === flags, "validation_flags")
  }

  test("title golden scores (reference test_quality_scorer.py)") {
    val goldens = Seq(
      "" -> 0.0, "abc" -> 0.2, "Title" -> 0.6,
      "Good Event" -> 0.7999999999999999,
      "Event on 12/05/2024" -> 0.9999999999999999,
      "ALL CAPS EVENT" -> 0.7,
      " ഷോർട്ട് ഇവന്റ് " -> 0.5,
      "Amnesia presents: Pyramid 2025!!!" -> 0.9999999999999999,
      "xxxx" -> 0.2, "24/7 Party" -> 0.7)
    val got = goldens.map(_._1).toDF("title")
      .select(col("title"), QualityScorer.scoreTitle(col("title")).as("s"))
      .select(col("title"), col("s.score"), col("s.flags"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    goldens.foreach { case (t, exp) =>
      assert(got(t) === exp, s"title '$t'")
    }
  }

  test("title flags") {
    val r = Seq(" ഷോർട്ട് ഇവന്റ് ").toDF("title")
      .select(QualityScorer.scoreTitle(col("title")).as("s"))
      .select(col("s.flags")).head().getSeq[String](0)
    assert(r === Seq("excessive_special_chars"))
  }

  test("fixture V2 event scores 0.807") {
    checkEvent(
      """{"title":"Techno Night at Amnesia",
        |"datetime":{"start_date":"2025-07-15T23:00:00Z","timezone":"Europe/Madrid",
        |  "recurring":{"is_recurring":false}},
        |"venue":{"venue_id":"venue_amnesia","name":"Amnesia",
        |  "address":{"city":"Ibiza","country":"Spain"},
        |  "coordinates":{"type":"Point","coordinates":[1.405,38.955]}},
        |"acts":[{"act_id":"artist_charlotte","act_name":"Charlotte de Witte","act_type":"dj",
        |  "genres":["Techno"]}],
        |"ticketing":{"tickets_url":"https://amnesia.es/tickets","is_free":false,
        |  "age_restriction":{"minimum_age":18,"restriction_type":"18+"},
        |  "tiers":[{"tier_name":"Standard","tier_price":50.0,"currency":"EUR",
        |    "is_sold_out":false,"is_nearly_sold_out":false}]}}""".stripMargin,
      0.807,
      Seq(0.7999999999999999, 0.9000000000000001, 0.75, 0.8, 0.8000000000000002),
      Seq("venue" -> "missing_address_details"))
  }

  test("rich event scores 0.97") {
    checkEvent(
      """{"title":"Carl Cox at Privilege Ibiza - 15/07/2025",
        |"datetime":{"start_date":"2025-07-15T23:00:00Z","end_date":"2025-07-16T06:00:00Z",
        |  "timezone":"Europe/Madrid","recurring":{"is_recurring":true,"pattern_description":"weekly"}},
        |"venue":{"name":"Privilege","address":{"street":"Carretera","city":"Ibiza",
        |  "full_address":"Carretera Ibiza a San Antonio, Ibiza"},
        |  "coordinates":{"type":"Point","coordinates":[1.4109,38.9784]}},
        |"acts":[{"act_name":"Carl Cox","act_type":"dj","genres":["Techno"]},
        |  {"act_name":"Adam Beyer","act_type":"dj"},{"act_name":"Charlotte de Witte"}],
        |"ticketing":{"tickets_url":"https://ticketsibiza.com/x","is_free":false,
        |  "age_restriction":{"minimum_age":18},
        |  "tiers":[{"tier_name":"GA","tier_price":60.0,"currency":"EUR"},
        |    {"tier_name":"VIP","tier_price":120.0,"currency":"EUR"}]}}""".stripMargin,
      0.97,
      Seq(0.9999999999999999, 1.0, 1.0, 1.0, 0.8000000000000002),
      Seq.empty)
  }

  test("poor event scores 0.21") {
    checkEvent(
      """{"title":"Event","venue":{"name":"Unknown"},"datetime":{},"acts":[],"ticketing":{}}""",
      0.21,
      Seq(0.6, 0.3, 0.0, 0.0, 0.0),
      Seq("venue" -> "missing_address_details", "venue" -> "missing_city",
        "venue" -> "missing_coordinates", "datetime" -> "missing_datetime_data",
        "acts" -> "missing_acts_data", "ticketing" -> "missing_ticketing_data"))
  }

  test("empty event scores 0.0 with all missing flags") {
    checkEvent("{}", 0.0, Seq(0.0, 0.0, 0.0, 0.0, 0.0),
      Seq("title" -> "missing_title", "venue" -> "missing_venue_data",
        "datetime" -> "missing_datetime_data", "acts" -> "missing_acts_data",
        "ticketing" -> "missing_ticketing_data"))
  }

  test("edge dates / invalid formats score 0.755") {
    checkEvent(
      """{"title":"Weird Dates",
        |"datetime":{"start_date":"not-a-date","end_date":"2025-01-01T00:00:00Z","timezone":"UTC",
        |  "recurring":{"is_recurring":true}},
        |"venue":{"name":"Pacha Club","address":{"city":"San Antonio"},
        |  "coordinates":{"type":"Point","coordinates":[2.5,40.0]}},
        |"acts":[{"act_name":"X"},{"act_type":"dj"}],
        |"ticketing":{"is_free":true,"tickets_url":"ftp://x",
        |  "tiers":[{"tier_name":"T","tier_price":2.0,"currency":"USD"},
        |    {"tier_price":1.0,"currency":"EUR"}]}}""".stripMargin,
      0.755,
      Seq(0.7999999999999999, 0.6000000000000001, 0.75, 0.7000000000000001, 0.95),
      Seq("venue" -> "missing_address_details", "venue" -> "coordinates_outside_ibiza",
        "datetime" -> "invalid_start_date_format", "datetime" -> "invalid_end_date_format",
        "datetime" -> "missing_recurring_pattern_description",
        "acts" -> "missing_act_name_in_list",
        "ticketing" -> "invalid_tickets_url", "ticketing" -> "very_low_ticket_price"))
  }

  test("end before start / malformed coordinates score 0.738") {
    checkEvent(
      """{"title":"Backwards Time 2025",
        |"datetime":{"start_date":"2025-06-20T23:00:00","end_date":"2025-06-19T06:00:00",
        |  "timezone":"CET","recurring":{}},
        |"venue":{"name":"DC10","address":{},"coordinates":{"type":"Point","coordinates":[1.3]}},
        |"acts":[{"act_name":"A"},{"act_name":"B"},{"act_name":"C"},{"act_name":""}],
        |"ticketing":{"is_free":false,
        |  "tiers":[{"tier_name":"Big","tier_price":900.0,"currency":"GBP"}]}}""".stripMargin,
      0.738,
      Seq(0.9999999999999999, 0.4, 0.8500000000000001, 0.9000000000000001, 0.4),
      Seq("venue" -> "missing_address_details", "venue" -> "missing_city",
        "venue" -> "invalid_coordinates_format",
        "datetime" -> "end_date_before_start_date",
        "acts" -> "missing_act_name_in_list",
        "ticketing" -> "missing_tickets_url_for_paid_event",
        "ticketing" -> "very_high_ticket_price"))
  }

  test("quality summary: weak fields + recommendation strings") {
    val json =
      """{"title":"Event","venue":{"name":"Unknown"},"datetime":{},"acts":[],"ticketing":{}}"""
    val dq = spark.read.schema(EventSchema.schema).json(Seq(json).toDS)
      .select(QualityScorer.dataQuality(col("title"), col("venue"),
        col("datetime"), col("acts"), col("ticketing"), now).as("dq"))
      .select(QualityScorer.qualitySummary(col("dq")).as("s"))
      .select("s.*").head()
    assert(dq.getAs[String]("qualityLevel") === "Very Poor")
    assert(dq.getAs[scala.collection.Seq[String]]("weakFields") ===
      Seq("title", "venue", "datetime", "acts", "ticketing"))
    assert(dq.getAs[Int]("totalFlags") === 6)
    assert(dq.getAs[String]("recommendation").startsWith("Poor data quality (0.21)"))
  }

  test("basic 100-point scorer (reference scoring.py:43-100)") {
    val r = Seq(
      ("Good Title", "2025-07-15T23:00:00Z", "Pacha", "a description"),
      ("", "not-a-date", "Pacha", null),
      (null, null, null, null))
      .toDF("t", "d", "v", "x")
      .select(QualityScorer.basicQualityScore(col("t"), col("d"),
        col("v"), col("x")).as("q"))
      .select(col("q.overall_score"), size(col("q.issues")).as("n"))
      .collect().map(r => (r.getDouble(0), r.getInt(1)))
    assert(r(0) === (100.0, 0))
    assert(r(1) === (20.0, 3)) // -30 title, -30 bad date, -20 description
    assert(r(2) === (0.0, 4))
  }

  test("quality level bands (reference quality_scorer.py:412-433)") {
    val df = Seq(0.95, 0.85, 0.75, 0.65, 0.3).toDF("s")
      .select(QualityScorer.qualityLevel(col("s")).as("lvl"))
    assert(df.collect().map(_.getString(0)).toSeq ===
      Seq("Excellent", "Good", "Fair", "Poor", "Very Poor"))
  }
}
