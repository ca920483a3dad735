package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.schema.{Event, EventSchema, EventSummary}
import graft.operators.EventQueries

class TypedEventSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkTest.session

  private def eventsDF = spark.read.schema(EventSchema.schema)
    .option("multiLine", true).json("fixtures/events_v2_sample.json")

  test("Dataset[Event] round-trips the full nested schema") {
    val ds = Event.ds(eventsDF)
    val evts = ds.collect().sortBy(_.event_id)
    assert(evts.length === 4)
    val e1 = evts.find(_.event_id == "evt_1").get
    assert(e1.title === Some("Techno Night at Amnesia"))
    assert(e1.venue.flatMap(_.name) === Some("Amnesia"))
    assert(e1.venue.flatMap(_.coordinates).flatMap(_.coordinates)
      === Some(Seq(1.405, 38.955)))
    assert(e1.datetime.flatMap(_.start_date) === Some("2025-07-15T23:00:00Z"))
    assert(e1.acts.map(_.flatMap(_.act_name)) === Some(Seq("Charlotte de Witte")))
    assert(e1.ticketing.flatMap(_.tiers).map(_.flatMap(_.tier_price))
      === Some(Seq(50.0)))
  }

  test("typed filters compose with the column API") {
    import spark.implicits._
    val ds = Event.ds(eventsDF)
    val withActs = ds.filter(e => e.acts.exists(_.nonEmpty))
    assert(withActs.count() === 2)
    val names = withActs.flatMap(_.acts.toSeq.flatten.flatMap(_.act_name))
      .collect().toSet
    assert(names.contains("Carl Cox"))
  }

  test("typed EventSummary from the API query") {
    import Event.summaryEncoder
    val summaries = EventQueries.events(
      graft.operators.QualityScorer.withQuality(eventsDF,
        lit("2025-06-10 00:00:00").cast("timestamp")),
      lit("2025-06-10T00:00:00Z"), minQuality = 0.5)
      .as[EventSummary].collect()
    assert(summaries.map(_.event_id).toSeq === Seq("evt_1", "evt_3"))
    assert(summaries.forall(_.overall_score.exists(_ >= 0.5)))
  }
}
