package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The reference's serving-analytics query surface (SURVEY §3.1) as
  * DataFrame transforms over a V2 events table. Each function is one
  * FastAPI endpoint's semantics; the app-side reshaping the reference
  * does in Python (api_server.py:285-293) is folded into the same
  * Catalyst plan as aliases.
  *
  * ISO-string date semantics: the reference compares
  * datetime.start_date lexicographically against utcnow().isoformat()
  * (api_server.py:269) — faithful here, `nowIso` is a string column.
  */
object EventQueries {

  private def summaryCols(keyCol: String) = Seq(
    col(keyCol), col("title"),
    col("venue.name").as("venue_name"),
    col("datetime.start_date").as("start_date"),
    col("data_quality.overall_score").as("overall_score"))

  /** Python-round(×,3) of a deterministic average: exact decimal sum
    * (order-independent in any engine) divided by the exact count, then
    * exact-binary HALF_EVEN rounding — the reference's round(avg, 3)
    * without float-summation drift.
    */
  private def avg3(c: Column): Column =
    graft.functions.PythonRound.py_round(graft.Tables.decAvg(c), 3)

  /** GET /api/events (reference: database/api_server.py:252-295).
    * `keyCol` is the identity column to expose and use as the
    * deterministic sort tiebreak (default event_id).
    */
  def events(ev: DataFrame, nowIso: Column, minQuality: Double = 0.7,
      venueRegex: Option[String] = None, futureOnly: Boolean = true,
      limit: Int = 50, skip: Int = 0, keyCol: String = "event_id"): DataFrame = {
    var df = ev.filter(col("data_quality.overall_score") >= minQuality)
    venueRegex.foreach(v => df = df.filter(col("venue.name").rlike("(?i)" + v)))
    if (futureOnly) df = df.filter(col("datetime.start_date") >= nowIso)
    df.select(summaryCols(keyCol): _*)
      .orderBy(col("start_date"), col(keyCol))
      .offset(skip).limit(limit)
  }

  /** GET /api/events/{id} — point lookup
    * (reference: api_server.py:298-311).
    */
  def eventById(ev: DataFrame, eventId: String): DataFrame =
    ev.filter(col("event_id") === eventId).limit(1)

  /** Declared text-search scoring (SURVEY §2.9): tokenize the indexed
    * fields (title, descriptions, venue name, act names — the text
    * index of fix_schema.py:142-148), count case-insensitive
    * whole-token matches of each search term, equal field weights.
    */
  def textScore(searchTerm: String): Column = {
    val searchText = lower(concat_ws(" ",
      coalesce(col("title"), lit("")),
      coalesce(col("content.short_description"), lit("")),
      coalesce(col("content.full_description"), lit("")),
      coalesce(col("venue.name"), lit("")),
      when(col("acts").isNull, lit(""))
        .otherwise(array_join(transform(col("acts"),
          a => coalesce(a.getField("act_name"), lit(""))), " "))))
    val toks = split(searchText, "\\s+")
    searchTerm.toLowerCase.split("\\s+").toSeq.map(t =>
      size(filter(toks, x => x === lit(t))).cast("long")).reduce(_ + _)
  }

  /** GET /api/events/search/{term}
    * (reference: api_server.py:314-350) — O5 sort by relevance.
    */
  def search(ev: DataFrame, term: String, minQuality: Double = 0.6,
      limit: Int = 20, keyCol: String = "event_id"): DataFrame =
    ev.filter(col("data_quality.overall_score") >= minQuality)
      .withColumn("score", textScore(term))
      .filter(col("score") > 0)
      .select(summaryCols(keyCol) :+ col("score"): _*)
      .orderBy(col("score").desc, col(keyCol))
      .limit(limit)

  /** GET /api/venues (reference: api_server.py:353-385) — A8. */
  def venues(ev: DataFrame, nowIso: Column): DataFrame =
    ev.filter(col("venue.name").isNotNull)
      .groupBy(col("venue.name").as("venueName"))
      .agg(
        count(lit(1)).as("eventCount"),
        avg3(col("data_quality.overall_score")).as("avgQuality"),
        sum(when(col("datetime.start_date") >= nowIso, 1L).otherwise(0L))
          .as("upcomingEvents"))
      .orderBy(col("eventCount").desc, col("venueName"))

  /** GET /api/venues/{name}/events (reference: api_server.py:388-424). */
  def venueEvents(ev: DataFrame, venueName: String, nowIso: Column,
      futureOnly: Boolean = true, limit: Int = 50,
      keyCol: String = "event_id"): DataFrame = {
    var df = ev.filter(col("venue.name").rlike("(?i)" + venueName))
    if (futureOnly) df = df.filter(col("datetime.start_date") >= nowIso)
    df.select(summaryCols(keyCol): _*)
      .orderBy(col("start_date"), col(keyCol)).limit(limit)
  }

  /** GET /api/stats/quality — global stats half
    * (reference: api_server.py:427-460) — A5+A6.
    */
  def qualityStats(ev: DataFrame): DataFrame = {
    val s = col("data_quality.overall_score")
    ev.agg(
      count(lit(1)).as("totalEvents"),
      avg3(s).as("averageQuality"),
      sum(when(s >= 0.9, 1L).otherwise(0L)).as("excellent"),
      sum(when(s >= 0.8 && s < 0.9, 1L).otherwise(0L)).as("good"),
      sum(when(s >= 0.7 && s < 0.8, 1L).otherwise(0L)).as("fair"),
      sum(when(s < 0.7, 1L).otherwise(0L)).as("poor"))
  }

  /** GET /api/stats/quality — top-venues half
    * (reference: api_server.py:462-483) — A9 top-k.
    */
  def topVenues(ev: DataFrame, k: Int = 10): DataFrame =
    ev.filter(col("venue.name").isNotNull)
      .groupBy(col("venue.name").as("venueName"))
      .agg(avg3(col("data_quality.overall_score")).as("averageQuality"),
        count(lit(1)).as("eventCount"))
      .orderBy(col("averageQuality").desc, col("eventCount").desc, col("venueName"))
      .limit(k)

  /** GET /api/upcoming (reference: api_server.py:498-538). */
  def upcoming(ev: DataFrame, nowIso: Column, days: Int = 7,
      minQuality: Double = 0.75, limit: Int = 20,
      keyCol: String = "event_id"): DataFrame = {
    val endIso = date_format(
      to_timestamp(nowIso, "yyyy-MM-dd'T'HH:mm:ss'Z'") +
        expr(s"INTERVAL $days DAYS"), "yyyy-MM-dd'T'HH:mm:ss'Z'")
    ev.filter(col("datetime.start_date") >= nowIso &&
        col("datetime.start_date") <= endIso &&
        col("data_quality.overall_score") >= minQuality)
      .select(summaryCols(keyCol): _*)
      .orderBy(col("start_date"), col(keyCol))
      .limit(limit)
  }

  /** P11 — cache-freshness predicate
    * (reference: my_scrapers/ventura_crawler.py:260-287): fresh iff
    * last_scraped within maxAgeHours of now.
    */
  def isFresh(lastScrapedIso: Column, now: Column, maxAgeHours: Int): Column =
    to_timestamp(lastScrapedIso) >= now - expr(s"INTERVAL $maxAgeHours HOURS")

  /** A4 — date distribution: events per day
    * (reference: database/mongo_queries.py:55-66).
    */
  def dateDistribution(ev: DataFrame): DataFrame =
    ev.groupBy(date_format(to_timestamp(col("datetime.start_date")),
        "yyyy-MM-dd").as("date"))
      .agg(count(lit(1)).as("count"))
      .orderBy(col("date"))

  /** A3 — distinct hosts across the multikey nested path
    * venue.stages[].host.host_name
    * (reference: database/mongo_queries.py:50-53).
    */
  def distinctHosts(ev: DataFrame): DataFrame =
    ev.select(explode(col("venue.stages")).as("stage"))
      .select(col("stage.host.host_name").as("host_name"))
      .filter(col("host_name").isNotNull)
      .distinct()

  /** P5 — multikey array predicate: any act matches by name
    * (reference: database/mongo_queries.py:28-34).
    */
  def hasAct(actName: String): Column =
    exists(col("acts"), a => a.getField("act_name") === actName)

  /** P12 — extraction-sufficiency predicate
    * (reference: my_scrapers/mono_ticketmaster.py:69-79): jsonld needs
    * only a title; fallback needs a title plus any of venue /
    * display-date / positive price / description. Column-name
    * parameterized so it applies to any staging shape.
    */
  def isDataSufficient(method: Column, title: Column, venue: Column,
      displayDate: Column, startingPrice: Column, description: Column): Column = {
    val hasTitle = title.isNotNull && title =!= ""
    (method === "jsonld" && hasTitle) ||
      (method === "fallback" && hasTitle && (
        (venue.isNotNull && venue =!= "") ||
          (displayDate.isNotNull && displayDate =!= "") ||
          coalesce(startingPrice, lit(0.0)) > 0.0 ||
          (description.isNotNull && description =!= "")))
  }

  /** J4 — stage-act ↔ top-level act lineage: explode both sides and
    * equi-join on act_id (the schema-level FK,
    * reference: helpers/schemas.py:69-70). Yields one row per stage
    * booking with the act's display fields resolved.
    */
  def stageActLineage(ev: DataFrame, keyCol: String = "event_id"): DataFrame = {
    val stageActs = ev.select(col(keyCol),
        explode(col("venue.stages")).as("stage"))
      .select(col(keyCol), col("stage.stage_name").as("stage_name"),
        explode(col("stage.acts")).as("sa"))
      .select(col(keyCol), col("stage_name"),
        col("sa.act_id").as("act_id"),
        col("sa.billing_order").cast("long").as("billing_order"),
        col("sa.is_headliner").as("is_headliner"))
    // The acts array is per-event (schemas.py:69-70): the same act_id
    // can carry different attributes on different events (e.g. the same
    // artist booked as dj on one bill, live on another), so the
    // dimension must be resolved within the event — joining a globally
    // deduped acts table would fan rows out per attribute variant.
    val acts = ev.select(col(keyCol), explode(col("acts")).as("a"))
      .select(col(keyCol), col("a.act_id").as("act_id"),
        col("a.act_name").as("act_name"),
        col("a.act_type").as("act_type"))
      .distinct()
    stageActs.join(acts, Seq(keyCol, "act_id"), "left")
  }

  /** Month-range comparison
    * (reference: database/query_july_vs_august.py:36-86): event counts
    * for two ISO-string month windows side by side.
    */
  def monthComparison(ev: DataFrame, monthAStart: String, monthAEnd: String,
      monthBStart: String, monthBEnd: String): DataFrame = {
    val d = col("datetime.start_date")
    ev.agg(
      sum(when(d >= monthAStart && d < monthAEnd, 1L).otherwise(0L)).as("month_a"),
      sum(when(d >= monthBStart && d < monthBEnd, 1L).otherwise(0L)).as("month_b"))
  }
}
