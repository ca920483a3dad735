package graft.operators

import graft.{QueryDef, Tables => T}
import graft.functions.ScalarFunctions
import org.apache.spark.sql.functions._

/** Oracle-checked queries for the scalar-function library (SURVEY §2.8)
  * that previously had only ScalaTest specs: date-ladder parsing,
  * price extraction, currency normalization, HTML unescape, URL
  * normalization, ticket booleans, cheapest-tier selection.
  *
  * Pattern: inputs are derived from `documents` by pure doc_id
  * arithmetic (so the DuckDB oracle can reconstruct them), the Spark
  * side runs the REAL ScalarFunctions implementation on the derived
  * text, and the oracle states the expected output in closed form —
  * a genuine end-to-end check of the function, not of the derivation.
  */
object FunctionQueries {

  private val docLimit = 400

  val registry: Map[String, QueryDef] = Map(

    // §2.8 F3 — the full UniversalValidator date ladder
    // (reference: schema_adapter_enhanced.py:108-141): 8 parseable
    // shapes incl. offset-bearing ISO, plus unparseable and null.
    "f3_date_ladder" -> QueryDef(
      (s, d) => {
        val id = col("doc_id")
        val off = (id * 13 % 400 - 100).cast("int")
        val dt = date_add(to_date(lit("2025-06-10")), off)
        val day = date_format(dt, "yyyy-MM-dd")
        val raw = when(id % 10 === 0, concat(day, lit("T14:30:00+02:00")))
          .when(id % 10 === 1, concat(day, lit("T09:15:00Z")))
          .when(id % 10 === 2, concat(day, lit(" 18:45:30")))
          .when(id % 10 === 3, day)
          .when(id % 10 === 4, concat(date_format(dt, "d/M/yyyy"), lit(" 22:00")))
          .when(id % 10 === 5, concat(date_format(dt, "d-M-yyyy"), lit(" 07:30")))
          .when(id % 10 === 6,
            concat(date_format(dt, "MMMM d, yyyy"), lit(" at 2:30 PM")))
          .when(id % 10 === 7, date_format(dt, "d MMMM yyyy"))
          .when(id % 10 === 8, lit("sometime soon"))
          .otherwise(lit(null).cast("string"))
        T.documents(s, d)
          .select(id.as("doc_id"),
            ScalarFunctions.parseDateTimeMulti(raw).as("parsed"))
          .orderBy(col("doc_id")).limit(docLimit)
      },
      """SELECT doc_id,
        |  CASE doc_id % 10
        |    WHEN 0 THEN strftime(dt + INTERVAL 12 HOUR + INTERVAL 30 MINUTE, '%Y-%m-%dT%H:%M:%SZ')
        |    WHEN 1 THEN strftime(dt + INTERVAL 9 HOUR + INTERVAL 15 MINUTE, '%Y-%m-%dT%H:%M:%SZ')
        |    WHEN 2 THEN strftime(dt + INTERVAL 18 HOUR + INTERVAL 45 MINUTE + INTERVAL 30 SECOND, '%Y-%m-%dT%H:%M:%SZ')
        |    WHEN 3 THEN strftime(dt, '%Y-%m-%dT%H:%M:%SZ')
        |    WHEN 4 THEN strftime(dt + INTERVAL 22 HOUR, '%Y-%m-%dT%H:%M:%SZ')
        |    WHEN 5 THEN strftime(dt + INTERVAL 7 HOUR + INTERVAL 30 MINUTE, '%Y-%m-%dT%H:%M:%SZ')
        |    WHEN 6 THEN strftime(dt + INTERVAL 14 HOUR + INTERVAL 30 MINUTE, '%Y-%m-%dT%H:%M:%SZ')
        |    WHEN 7 THEN strftime(dt, '%Y-%m-%dT%H:%M:%SZ')
        |    ELSE NULL END AS parsed
        |FROM (
        |  SELECT doc_id,
        |    CAST(DATE '2025-06-10' + CAST(doc_id * 13 % 400 - 100 AS INT) AS TIMESTAMP) AS dt
        |  FROM documents)
        |ORDER BY doc_id LIMIT 400""".stripMargin),

    // §2.8 F7 — price extraction from free text
    // (reference: scrapers_v2/schema_adapter.py:71-105).
    "f7_price_extract" -> QueryDef(
      (s, d) => {
        val id = col("doc_id")
        val amt = (id % 300 + 1).cast("string")
        val raw = when(id % 8 === 0, concat(lit("From €"), amt))
          .when(id % 8 === 1, lit("free entry"))
          .when(id % 8 === 2, concat(lit("£"), amt, lit(".50")))
          .when(id % 8 === 3, concat(amt, lit(" EUR")))
          .when(id % 8 === 4, concat(amt, lit(",25 CHF")))
          .when(id % 8 === 5, lit(null).cast("string"))
          .when(id % 8 === 6, lit("tba"))
          .otherwise(concat(lit("$ "), amt))
        val p = ScalarFunctions.extractPrice(raw)
        T.documents(s, d)
          .select(id.as("doc_id"), p.getField("price").as("price"),
            p.getField("currency").as("currency"))
          .orderBy(col("doc_id")).limit(docLimit)
      },
      """SELECT doc_id,
        |  CASE doc_id % 8
        |    WHEN 0 THEN CAST(amt AS DOUBLE)
        |    WHEN 1 THEN CAST(0.0 AS DOUBLE)
        |    WHEN 2 THEN CAST(amt AS DOUBLE) + CAST(0.5 AS DOUBLE)
        |    WHEN 3 THEN CAST(amt AS DOUBLE)
        |    WHEN 4 THEN CAST(amt AS DOUBLE) + CAST(0.25 AS DOUBLE)
        |    WHEN 7 THEN CAST(amt AS DOUBLE)
        |    ELSE NULL END AS price,
        |  CASE doc_id % 8
        |    WHEN 0 THEN 'EUR' WHEN 1 THEN 'EUR' WHEN 2 THEN 'GBP'
        |    WHEN 3 THEN 'EUR' WHEN 4 THEN 'CHF' WHEN 7 THEN 'USD'
        |    ELSE NULL END AS currency
        |FROM (SELECT doc_id, doc_id % 300 + 1 AS amt FROM documents)
        |ORDER BY doc_id LIMIT 400""".stripMargin),

    // §2.8 F8 — currency amount normalization + ISO validation
    // (reference: schema_adapter_enhanced.py:158-175).
    "f8_currency_normalize" -> QueryDef(
      (s, d) => {
        val id = col("doc_id")
        val amt = (id % 500 + 1).cast("string")
        val rawAmt = when(id % 5 === 0, concat(lit("€"), amt))
          .when(id % 5 === 1, concat(lit(" "), amt, lit(".75 ")))
          .when(id % 5 === 2, concat(lit("1,"), amt))
          .when(id % 5 === 3, lit("n/a"))
          .otherwise(amt)
        val rawCur = when(id % 4 === 0, lit("eur"))
          .when(id % 4 === 1, lit("USD"))
          .when(id % 4 === 2, lit("xyz"))
          .otherwise(lit(null).cast("string"))
        val n = ScalarFunctions.normalizeCurrency(rawAmt, rawCur)
        T.documents(s, d)
          .select(id.as("doc_id"), n.getField("amount").as("amount"),
            n.getField("currency").as("currency"))
          .orderBy(col("doc_id")).limit(docLimit)
      },
      """SELECT doc_id,
        |  CASE doc_id % 5
        |    WHEN 0 THEN CAST(amt AS DOUBLE)
        |    WHEN 1 THEN CAST(amt AS DOUBLE) + CAST(0.75 AS DOUBLE)
        |    WHEN 2 THEN CAST('1' || CAST(amt AS VARCHAR) AS DOUBLE)
        |    WHEN 3 THEN NULL
        |    ELSE CAST(amt AS DOUBLE) END AS amount,
        |  CASE doc_id % 4
        |    WHEN 0 THEN 'EUR' WHEN 1 THEN 'USD'
        |    ELSE 'EUR' END AS currency
        |FROM (SELECT doc_id, doc_id % 500 + 1 AS amt FROM documents)
        |ORDER BY doc_id LIMIT 400""".stripMargin),

    // §2.8 F2 — HTML-entity unescape; &amp; must unescape LAST so
    // "&amp;lt;" stays "&lt;" (reference:
    // scrapers_v2/data_quality/cleaning.py:21-32). The oracle replays
    // the same replace chain in the same order over the same input.
    "f2_html_unescape" -> QueryDef(
      (s, d) => {
        val b = trim(substring(regexp_replace(col("text"), "\\s+", " "), 1, 24))
        val raw = concat(lit("&lt;p&gt;"), b,
          lit(" &amp;amp; Friends &euro;50&nbsp;&hellip;&#39;tba&#39; &quot;live&quot; &ndash; end&amp;" +
            // numeric forms: decimal, hex (both cases), cp1252 remap
            // (&#146; → ’), missing semicolon, surrogate → U+FFFD,
            // control → dropped, literal &# with no digits
            " &#8364;100 &#x2026!&#X27;ok&#X27; say&#146;s &#65 A&#xD800;B&#31;C &# end"))
        T.documents(s, d)
          .select(col("doc_id"), ScalarFunctions.htmlUnescape(raw).as("clean"))
          .orderBy(col("doc_id")).limit(docLimit)
      },
      """WITH raw AS (
        |  SELECT doc_id,
        |    '&lt;p&gt;' || trim(substr(regexp_replace(text, '\s+', ' ', 'g'), 1, 24))
        |      || ' &amp;amp; Friends &euro;50&nbsp;&hellip;&#39;tba&#39; &quot;live&quot; &ndash; end&amp;'
        |      || ' &#8364;100 &#x2026!&#X27;ok&#X27; say&#146;s &#65 A&#xD800;B&#31;C &# end'
        |      AS r
        |  FROM documents),
        |-- numeric refs (fixed strings here, so literal replaces mirror
        |-- the engine's single-pass decode): decimal, hex, cp1252
        |-- remap, no-semicolon, surrogate → U+FFFD, control → dropped
        |num AS (
        |  SELECT doc_id,
        |    replace(replace(replace(replace(replace(replace(replace(r,
        |      '&#8364;', '€'), '&#x2026', '…'), '&#X27;', ''''),
        |      '&#146;', '’'), '&#xD800;', '�'), '&#31;', ''),
        |      '&#65', 'A') AS r
        |  FROM raw)
        |SELECT doc_id,
        |  replace(replace(replace(replace(replace(replace(replace(replace(
        |  replace(replace(replace(replace(r,
        |    '&lt;', '<'), '&gt;', '>'), '&quot;', '"'), '&#39;', ''''),
        |    '&apos;', ''''), '&nbsp;', ' '), '&euro;', '€'), '&pound;', '£'),
        |    '&hellip;', '…'), '&ndash;', '–'), '&mdash;', '—'), '&amp;', '&')
        |    AS clean
        |FROM num ORDER BY doc_id LIMIT 400""".stripMargin),

    // §2.8 F9 — URL normalization: scheme completion + host validation
    // (reference: schema_adapter_enhanced.py:90-105).
    "f9_url_normalize" -> QueryDef(
      (s, d) => {
        val id = col("doc_id")
        val raw = when(id % 6 === 0,
            concat(lit("www.example.com/event/"), id.cast("string")))
          .when(id % 6 === 1,
            concat(lit("http://tickets.example.org/e/"), id.cast("string")))
          .when(id % 6 === 2,
            concat(lit("https://shop.example.net/"), id.cast("string")))
          .when(id % 6 === 3, lit(""))
          .when(id % 6 === 4, lit("not a url"))
          .otherwise(lit(null).cast("string"))
        T.documents(s, d)
          .select(id.as("doc_id"), ScalarFunctions.normalizeUrl(raw).as("url"))
          .orderBy(col("doc_id")).limit(docLimit)
      },
      """SELECT doc_id,
        |  CASE doc_id % 6
        |    WHEN 0 THEN 'https://www.example.com/event/' || CAST(doc_id AS VARCHAR)
        |    WHEN 1 THEN 'http://tickets.example.org/e/' || CAST(doc_id AS VARCHAR)
        |    WHEN 2 THEN 'https://shop.example.net/' || CAST(doc_id AS VARCHAR)
        |    ELSE NULL END AS url
        |FROM documents ORDER BY doc_id LIMIT 400""".stripMargin),

    // §2.8 F14 — derived ticket booleans
    // (reference: my_scrapers/mono_ticketmaster.py:370-383).
    "f14_ticket_flags" -> QueryDef(
      (s, d) => {
        val id = col("doc_id")
        val price = when(id % 4 === 0, (id % 90 + 10).cast("double"))
          .when(id % 4 === 1, lit(0.0))
          .otherwise(lit(null).cast("double"))
        val text = when(id % 3 === 0, lit("From €20"))
          .when(id % 3 === 1, lit("  "))
          .otherwise(lit(null).cast("string"))
        val url = when(id % 5 === 0, lit("https://tix.example.com"))
          .otherwise(lit(null).cast("string"))
        val tiers = when(id % 7 === 0, array(lit("ga"), lit("vip")))
          .when(id % 7 === 1, array().cast("array<string>"))
          .otherwise(lit(null).cast("array<string>"))
        val status = when(id % 6 === 0, lit("SOLD OUT"))
          .when(id % 6 === 1, lit("tickets unavailable"))
          .when(id % 6 === 2, lit("OffSale"))
          .when(id % 6 === 3, lit("on sale"))
          .otherwise(lit(null).cast("string"))
        T.documents(s, d)
          .select(id.as("doc_id"),
            ScalarFunctions.hasTicketInfo(price, text, url, tiers).as("has_info"),
            ScalarFunctions.isSoldOut(status).as("sold_out"))
          .orderBy(col("doc_id")).limit(docLimit)
      },
      """SELECT doc_id,
        |  (doc_id % 4 = 0 OR doc_id % 3 = 0 OR doc_id % 5 = 0 OR doc_id % 7 = 0)
        |    AS has_info,
        |  (doc_id % 6 IN (0, 1, 2)) AS sold_out
        |FROM documents ORDER BY doc_id LIMIT 400""".stripMargin),

    // §2.2 P12 — extraction-sufficiency predicate
    // (reference: my_scrapers/mono_ticketmaster.py:500-516): jsonld
    // needs only a title; fallback needs title + any secondary signal.
    "p12_sufficiency" -> QueryDef(
      (s, d) => {
        val id = col("doc_id")
        val method = when(id % 2 === 0, "jsonld").otherwise("fallback")
        val title = when(id % 5 === 0, lit(null).cast("string"))
          .when(id % 5 === 1, lit(""))
          .otherwise(concat(lit("Event "), id.cast("string")))
        val venue = when(id % 3 === 0, lit("Amnesia"))
          .otherwise(lit(null).cast("string"))
        val date = when(id % 7 === 0, lit("15 July 2025"))
          .otherwise(lit(null).cast("string"))
        val price = when(id % 11 === 0, lit(25.0))
          .otherwise(lit(null).cast("double"))
        val desc = lit(null).cast("string")
        T.documents(s, d).select(id.as("doc_id"),
          graft.operators.EventQueries.isDataSufficient(
            method, title, venue, date, price, desc).as("sufficient"))
          .orderBy(col("doc_id")).limit(docLimit)
      },
      """SELECT doc_id,
        |  CASE WHEN doc_id % 5 IN (0, 1) THEN FALSE
        |       WHEN doc_id % 2 = 0 THEN TRUE
        |       ELSE (doc_id % 3 = 0 OR doc_id % 7 = 0 OR doc_id % 11 = 0)
        |       END AS sufficient
        |FROM documents ORDER BY doc_id LIMIT 400""".stripMargin),

    // §2.3 J3 — timezone-from-location substring lookup
    // (reference: schema_adapter_enhanced.py:363-373); first table
    // entry wins, default UTC.
    "j3_timezone_lookup" -> QueryDef(
      (s, d) => {
        val id = col("doc_id")
        val loc = when(id % 9 === 0, lit(null).cast("string"))
          .when(id % 9 === 1, lit("Playa d'en Bossa, IBIZA"))
          .when(id % 9 === 2, lit("Shoreditch, London UK"))
          .when(id % 9 === 3, lit("Berlin Mitte"))
          .when(id % 9 === 4, lit("New York, NY"))
          .when(id % 9 === 5, lit("downtown los angeles"))
          .when(id % 9 === 6, lit("Shibuya, Tokyo"))
          .when(id % 9 === 7, lit("Sydney Harbour"))
          .otherwise(lit("Reykjavik"))
        T.documents(s, d).select(id.as("doc_id"),
          graft.operators.Unify.timezoneFromLocation(loc).as("tz"))
          .orderBy(col("doc_id")).limit(docLimit)
      },
      """SELECT doc_id,
        |  CASE doc_id % 9
        |    WHEN 1 THEN 'Europe/Madrid' WHEN 2 THEN 'Europe/London'
        |    WHEN 3 THEN 'Europe/Berlin' WHEN 4 THEN 'America/New_York'
        |    WHEN 5 THEN 'America/Los_Angeles' WHEN 6 THEN 'Asia/Tokyo'
        |    WHEN 7 THEN 'Australia/Sydney' ELSE 'UTC' END AS tz
        |FROM documents ORDER BY doc_id LIMIT 400""".stripMargin),

    // §2.8 F16 — cheapest non-sold-out tier over a tier-struct array
    // (reference: database/query_examples.py:38-52). The oracle
    // recomputes the min over the same derived tier list with DuckDB
    // list functions — a genuine mirror, not closed form.
    "f16_cheapest_tier" -> QueryDef(
      (s, d) => {
        val id = col("doc_id")
        val nTiers = (id % 4).cast("int")
        val tiers = transform(sequence(lit(0), nTiers - 1), j => struct(
          ((id % 150 + 5).cast("double") + j * 10.0).as("tier_price"),
          ((id + j) % 3 === 0).as("is_sold_out")))
        val safe = when(nTiers > 0, tiers)
          .otherwise(lit(null).cast(
            "array<struct<tier_price:double,is_sold_out:boolean>>"))
        T.documents(s, d)
          .select(id.as("doc_id"),
            ScalarFunctions.cheapestAvailableTier(safe).as("cheapest"))
          .orderBy(col("doc_id")).limit(docLimit)
      },
      """SELECT doc_id,
        |  list_min(list_transform(
        |    list_filter(range(0, CAST(doc_id % 4 AS INT)),
        |      j -> (doc_id + j) % 3 <> 0),
        |    j -> CAST(doc_id % 150 + 5 AS DOUBLE) + j * CAST(10.0 AS DOUBLE)))
        |    AS cheapest
        |FROM documents ORDER BY doc_id LIMIT 400""".stripMargin),

    // F18 — $type introspection over schemaless staging JSON
    // (reference: the Mongo $type debug report pattern,
    // database/check_fields.py-style): each raw doc is JSON-encoded,
    // jsonTypeOf classifies selected paths per row, and the type
    // histogram must match the closed-form derivation rules. Fields
    // chosen so their JSON type is decidable from doc_id arithmetic
    // alone (doc_id: always long; genres: array|missing; url /
    // price_text / short_description: string|missing).
    "f18_type_report" -> QueryDef(
      (s, d) => {
        val r = V2Fixtures.raw(s, d)
        val j = r.select(
          to_json(struct(r.columns.map(col): _*)).as("doc"))
        // ONE json_tuple parse for all five paths (top-level fields),
        // then the shared value classifier — not five get_json_object
        // re-parses of the same document
        j.select(json_tuple(col("doc"), "doc_id", "genres", "url",
            "price_text", "short_description"))
          .toDF("v_id", "v_genres", "v_url", "v_price", "v_desc")
          .select(
            ScalarFunctions.jsonValueType(col("v_id")).as("t_id"),
            ScalarFunctions.jsonValueType(col("v_genres")).as("t_genres"),
            ScalarFunctions.jsonValueType(col("v_url")).as("t_url"),
            ScalarFunctions.jsonValueType(col("v_price")).as("t_price"),
            ScalarFunctions.jsonValueType(col("v_desc")).as("t_desc"))
          .groupBy(col("t_id"), col("t_genres"), col("t_url"),
            col("t_price"), col("t_desc"))
          .agg(count(lit(1)).as("n"))
          .orderBy(col("t_genres"), col("t_url"), col("t_price"), col("t_desc"))
      },
      """SELECT 'long' AS t_id,
        |  CASE WHEN doc_id % 4 = 3 THEN 'missing' ELSE 'array' END AS t_genres,
        |  CASE WHEN doc_id % 6 = 5 THEN 'missing' ELSE 'string' END AS t_url,
        |  CASE WHEN doc_id % 7 = 4 THEN 'missing' ELSE 'string' END AS t_price,
        |  CASE WHEN doc_id % 13 = 0 THEN 'missing' ELSE 'string' END AS t_desc,
        |  COUNT(*) AS n
        |FROM documents GROUP BY 1, 2, 3, 4, 5
        |ORDER BY t_genres, t_url, t_price, t_desc""".stripMargin)
  )
}
