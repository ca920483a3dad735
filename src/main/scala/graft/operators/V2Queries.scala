package graft.operators

import graft.QueryDef
import org.apache.spark.sql.functions._
import graft.functions.ScalarFunctions
import V2Fixtures.{events => ev, nowIso, oracleCte => CTE}

/** Oracle-checked queries over the NESTED V2 event schema — the
  * reference's actual serving surface (api_server.py endpoints), the
  * quality scorer, and the document-shaped operators (multikey arrays,
  * nested projections), all verified against a DuckDB recomputation of
  * the same derived table (V2Fixtures.oracleCte).
  *
  * Plan shape note: V2Fixtures.events materializes the unified table
  * once per sf dir (persist), so each query here is a filter/agg over
  * a cached ~N-row nested table — the production layout (adapter
  * writes a table; serving queries read it), not 15 re-unifications.
  */
object V2Queries {

  private val q = (s: String) => "\"" + s + "\""

  private def pyAvg(col: String) =
    s"CAST(printf('%.3f', CAST(SUM(CAST($col AS DECIMAL(18,4))) AS DOUBLE) / COUNT(*)) AS DOUBLE)"

  val registry: Map[String, QueryDef] = Map(

    // §2.10 — the quality scorer itself, oracle-checked per event:
    // 5 field scores + Python-rounded overall + flag count +
    // validation-confidence decay, for every document-derived event.
    "q_quality_scorer" -> QueryDef(
      (s, d) => ev(s, d).select(col("doc_id"),
        col("data_quality.field_quality_scores.title").as("s_title"),
        col("data_quality.field_quality_scores.venue").as("s_venue"),
        col("data_quality.field_quality_scores.datetime").as("s_datetime"),
        col("data_quality.field_quality_scores.acts").as("s_acts"),
        col("data_quality.field_quality_scores.ticketing").as("s_ticketing"),
        col("data_quality.overall_score").as("overall_score"),
        size(col("data_quality.validation_flags")).cast("long").as("n_flags"),
        col("validation_metadata.confidence_score").as("confidence"))
        .orderBy(col("doc_id")),
      s"""$CTE SELECT doc_id, s_title, s_venue, s_datetime, s_acts,
         |  s_ticketing, overall_score, n_flags, confidence
         |FROM v2ev ORDER BY doc_id""".stripMargin),

    // P6+O4 on nested schema — GET /api/events: quality floor, ISO
    // lexicographic future filter, start_date ordering, skip+limit.
    "v2_events_page" -> QueryDef(
      (s, d) => EventQueries.events(ev(s, d), lit(nowIso),
        minQuality = 0.7, futureOnly = true, limit = 50, skip = 10,
        keyCol = "doc_id"),
      s"""$CTE SELECT doc_id, title, venue_name, start_date, overall_score
         |FROM v2ev
         |WHERE overall_score >= CAST(0.7 AS DOUBLE)
         |  AND start_date >= '$nowIso'
         |ORDER BY start_date, doc_id LIMIT 50 OFFSET 10""".stripMargin),

    // A8 nested — GET /api/venues rollup.
    "v2_venues" -> QueryDef(
      (s, d) => EventQueries.venues(ev(s, d), lit(nowIso)),
      s"""$CTE SELECT venue_name AS ${q("venueName")},
         |  COUNT(*) AS ${q("eventCount")},
         |  ${pyAvg("overall_score")} AS ${q("avgQuality")},
         |  CAST(SUM(CASE WHEN start_date >= '$nowIso' THEN 1 ELSE 0 END) AS BIGINT)
         |    AS ${q("upcomingEvents")}
         |FROM v2ev GROUP BY venue_name
         |ORDER BY ${q("eventCount")} DESC, ${q("venueName")}""".stripMargin),

    // A5/A6 nested — GET /api/stats/quality bands.
    "v2_quality_stats" -> QueryDef(
      (s, d) => EventQueries.qualityStats(ev(s, d)),
      s"""$CTE SELECT COUNT(*) AS ${q("totalEvents")},
         |  ${pyAvg("overall_score")} AS ${q("averageQuality")},
         |  CAST(SUM(CASE WHEN overall_score >= CAST(0.9 AS DOUBLE) THEN 1 ELSE 0 END) AS BIGINT) AS excellent,
         |  CAST(SUM(CASE WHEN overall_score >= CAST(0.8 AS DOUBLE) AND overall_score < CAST(0.9 AS DOUBLE) THEN 1 ELSE 0 END) AS BIGINT) AS good,
         |  CAST(SUM(CASE WHEN overall_score >= CAST(0.7 AS DOUBLE) AND overall_score < CAST(0.8 AS DOUBLE) THEN 1 ELSE 0 END) AS BIGINT) AS fair,
         |  CAST(SUM(CASE WHEN overall_score < CAST(0.7 AS DOUBLE) THEN 1 ELSE 0 END) AS BIGINT) AS poor
         |FROM v2ev""".stripMargin),

    // A9 nested — top venues by average quality.
    "v2_top_venues" -> QueryDef(
      (s, d) => EventQueries.topVenues(ev(s, d), k = 10),
      s"""$CTE SELECT venue_name AS ${q("venueName")},
         |  ${pyAvg("overall_score")} AS ${q("averageQuality")},
         |  COUNT(*) AS ${q("eventCount")}
         |FROM v2ev GROUP BY venue_name
         |ORDER BY ${q("averageQuality")} DESC, ${q("eventCount")} DESC,
         |  ${q("venueName")} LIMIT 10""".stripMargin),

    // P6 nested — GET /api/upcoming: 7-day ISO window + quality floor.
    "v2_upcoming" -> QueryDef(
      (s, d) => EventQueries.upcoming(ev(s, d), lit(nowIso), days = 7,
        minQuality = 0.75, limit = 20, keyCol = "doc_id"),
      s"""$CTE SELECT doc_id, title, venue_name, start_date, overall_score
         |FROM v2ev
         |WHERE start_date >= '$nowIso'
         |  AND start_date <= '2025-06-17T00:00:00Z'
         |  AND overall_score >= CAST(0.75 AS DOUBLE)
         |ORDER BY start_date, doc_id LIMIT 20""".stripMargin),

    // §2.9/O5 nested — token-match relevance search over ALL FIVE
    // indexed fields of fix_schema.py:142-148: title, both content
    // descriptions, venue name, act names. "dj" can only come from
    // acts/titles; "rooftop" only from content.short_description — the
    // score mixes both sources.
    "v2_search" -> QueryDef(
      (s, d) => EventQueries.search(ev(s, d), "dj rooftop",
        minQuality = 0.6, limit = 20, keyCol = "doc_id"),
      s"""$CTE, srch AS (
         |  SELECT doc_id, title, venue_name, start_date, overall_score,
         |    string_split_regex(lower(title || ' ' || coalesce(sdesc, '')
         |      || '  ' || venue_name || ' ' ||
         |      array_to_string(act_names, ' ')), '\\s+') AS tk
         |  FROM v2ev)
         |SELECT doc_id, title, venue_name, start_date, overall_score,
         |  len(list_filter(tk, x -> x = 'dj'))
         |    + len(list_filter(tk, x -> x = 'rooftop')) AS score
         |FROM srch
         |WHERE overall_score >= CAST(0.6 AS DOUBLE)
         |  AND len(list_filter(tk, x -> x = 'dj'))
         |    + len(list_filter(tk, x -> x = 'rooftop')) > 0
         |ORDER BY score DESC, doc_id LIMIT 20""".stripMargin),

    // A3 multikey nested — distinct stage hosts across
    // venue.stages[].host.host_name.
    "v2_distinct_hosts" -> QueryDef(
      (s, d) => EventQueries.distinctHosts(ev(s, d))
        .orderBy(col("host_name")),
      s"""$CTE SELECT DISTINCT host_name FROM v2ev
         |WHERE host_name IS NOT NULL ORDER BY host_name""".stripMargin),

    // P5 multikey nested — any-act-matches predicate.
    "v2_has_act" -> QueryDef(
      (s, d) => ev(s, d).filter(EventQueries.hasAct("DJ 42"))
        .select(col("doc_id"), col("title")).orderBy(col("doc_id")),
      s"""$CTE SELECT doc_id, title FROM v2ev
         |WHERE len(list_filter(range(0, CAST(nacts AS INT)),
         |  j -> (doc_id * 7 + j) % 97 = 42)) > 0
         |ORDER BY doc_id""".stripMargin),

    // J4 nested — stage-act ↔ top-level act lineage join on the uuid5
    // FK (the FK itself is join-internal; compared columns are the
    // resolved display fields).
    "v2_stage_act_lineage" -> QueryDef(
      (s, d) => EventQueries.stageActLineage(ev(s, d), keyCol = "doc_id")
        .drop("act_id")
        .orderBy(col("doc_id"), col("billing_order")),
      s"""$CTE SELECT doc_id, 'Main Stage' AS stage_name,
         |  CAST(j + 1 AS BIGINT) AS billing_order,
         |  (j = 0) AS is_headliner,
         |  'DJ ' || CAST((doc_id * 7 + j) % 97 AS VARCHAR) AS act_name,
         |  CASE WHEN j % 3 = 1 THEN 'live' WHEN j % 3 = 2 THEN 'vj'
         |       ELSE 'dj' END AS act_type
         |FROM (SELECT doc_id, unnest(range(0, CAST(nacts AS INT))) AS j
         |      FROM v2ev)
         |ORDER BY doc_id, billing_order""".stripMargin),

    // A4 nested — events per day from the ISO start_date.
    "v2_date_histogram" -> QueryDef(
      (s, d) => EventQueries.dateDistribution(ev(s, d)),
      s"""$CTE SELECT strftime(start_ts, '%Y-%m-%d') AS date,
         |  COUNT(*) AS count
         |FROM v2ev GROUP BY 1 ORDER BY 1""".stripMargin),

    // F16 — availability-status when-chain + cheapest available tier.
    "v2_ticket_status" -> QueryDef(
      (s, d) => ev(s, d).select(
          ScalarFunctions.availabilityStatus(col("ticketing")).as("ticket_status"),
          ScalarFunctions.cheapestAvailableTier(col("ticketing.tiers")).as("p"))
        .groupBy(col("ticket_status"))
        .agg(count(lit(1)).as("n_events"), min(col("p")).as("min_price"))
        .orderBy(col("ticket_status")),
      s"""$CTE SELECT ticket_status, COUNT(*) AS n_events,
         |  MIN(avail_price) AS min_price
         |FROM v2ev GROUP BY 1 ORDER BY 1""".stripMargin),

    // A7 with the reference's boundaries [0,.5,.6,.7,.8,.9,1.01] and
    // "Other" default over overall_score (query_examples.py:187-201).
    "v2_score_buckets" -> QueryDef(
      (s, d) => {
        val sc = col("data_quality.overall_score")
        val bucket = when(sc >= 0.0 && sc < 0.5, "0")
          .when(sc >= 0.5 && sc < 0.6, "0.5")
          .when(sc >= 0.6 && sc < 0.7, "0.6")
          .when(sc >= 0.7 && sc < 0.8, "0.7")
          .when(sc >= 0.8 && sc < 0.9, "0.8")
          .when(sc >= 0.9 && sc < 1.01, "0.9")
          .otherwise("Other")
        ev(s, d).groupBy(bucket.as("bucket"))
          .agg(count(lit(1)).as("n")).orderBy(col("bucket"))
      },
      s"""$CTE SELECT CASE
         |    WHEN overall_score >= CAST(0.0 AS DOUBLE) AND overall_score < CAST(0.5 AS DOUBLE) THEN '0'
         |    WHEN overall_score >= CAST(0.5 AS DOUBLE) AND overall_score < CAST(0.6 AS DOUBLE) THEN '0.5'
         |    WHEN overall_score >= CAST(0.6 AS DOUBLE) AND overall_score < CAST(0.7 AS DOUBLE) THEN '0.6'
         |    WHEN overall_score >= CAST(0.7 AS DOUBLE) AND overall_score < CAST(0.8 AS DOUBLE) THEN '0.7'
         |    WHEN overall_score >= CAST(0.8 AS DOUBLE) AND overall_score < CAST(0.9 AS DOUBLE) THEN '0.8'
         |    WHEN overall_score >= CAST(0.9 AS DOUBLE) AND overall_score < CAST(1.01 AS DOUBLE) THEN '0.9'
         |    ELSE 'Other' END AS bucket,
         |  COUNT(*) AS n
         |FROM v2ev GROUP BY 1 ORDER BY 1""".stripMargin),

    // F13 + J2 nested — event-type heuristic × normalized primary genre.
    "v2_event_types" -> QueryDef(
      (s, d) => ev(s, d).groupBy(col("type").as("event_type"),
          col("music.primary_genre").as("primary_genre"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("event_type"), col("primary_genre")),
      s"""$CTE SELECT event_type, primary_genre, COUNT(*) AS n
         |FROM v2ev GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin),

    // J1-shaped nested endpoint — venue regex filter + future window.
    "v2_venue_events" -> QueryDef(
      (s, d) => EventQueries.venueEvents(ev(s, d), "bora", lit(nowIso),
        futureOnly = true, limit = 50, keyCol = "doc_id"),
      s"""$CTE SELECT doc_id, title, venue_name, start_date, overall_score
         |FROM v2ev
         |WHERE regexp_matches(venue_name, '(?i)bora')
         |  AND start_date >= '$nowIso'
         |ORDER BY start_date, doc_id LIMIT 50""".stripMargin),

    // Month-window comparison on ISO strings
    // (query_july_vs_august.py:36-86).
    "v2_month_comparison" -> QueryDef(
      (s, d) => EventQueries.monthComparison(ev(s, d),
        "2025-07-01T00:00:00Z", "2025-08-01T00:00:00Z",
        "2025-08-01T00:00:00Z", "2025-09-01T00:00:00Z"),
      s"""$CTE SELECT
         |  CAST(SUM(CASE WHEN start_date >= '2025-07-01T00:00:00Z'
         |    AND start_date < '2025-08-01T00:00:00Z' THEN 1 ELSE 0 END) AS BIGINT) AS month_a,
         |  CAST(SUM(CASE WHEN start_date >= '2025-08-01T00:00:00Z'
         |    AND start_date < '2025-09-01T00:00:00Z' THEN 1 ELSE 0 END) AS BIGINT) AS month_b
         |FROM v2ev""".stripMargin),

    // Multi-level rollup — venue × month with subtotals and a grand
    // total in one pass (Spark expands grouping sets map-side; both
    // engines use the same grouping-id bitmask convention, first
    // listed column = highest bit).
    "v2_rollup" -> QueryDef(
      (s, d) => ev(s, d)
        .select(col("venue.name").as("venue_name"),
          substring(col("datetime.start_date"), 1, 7).as("month"))
        .rollup(col("venue_name"), col("month"))
        .agg(count(lit(1)).as("n"), grouping_id().as("gid"))
        .orderBy(col("gid"), col("venue_name"), col("month")),
      s"""$CTE SELECT venue_name, month, COUNT(*) AS n,
         |  GROUPING(venue_name, month) AS gid
         |FROM (SELECT venue_name, substr(start_date, 1, 7) AS month
         |      FROM v2ev)
         |GROUP BY ROLLUP (venue_name, month)
         |ORDER BY gid, venue_name NULLS FIRST, month NULLS FIRST""".stripMargin),

    // J2 nested — the normalized-genre histogram over music.sub_genres:
    // exercises both lookup hits ("deep-house" → "Deep House") and the
    // initcap fallback ("ambient" → "Ambient")
    // (reference: schema_adapter_enhanced.py:343-361, 375-381).
    "v2_genres" -> QueryDef(
      (s, d) => ev(s, d)
        .select(explode(col("music.sub_genres")).as("genre"))
        .groupBy(col("genre")).agg(count(lit(1)).as("n"))
        .orderBy(col("genre")),
      s"""$CTE, g AS (
         |  SELECT unnest(CASE WHEN gsel = 0 THEN ['Techno', 'Deep House']
         |                     WHEN gsel = 1 THEN ['House']
         |                     WHEN gsel = 2 THEN ['Ambient']
         |                     ELSE [] END) AS genre
         |  FROM v2ev)
         |SELECT genre, COUNT(*) AS n FROM g
         |GROUP BY genre ORDER BY genre""".stripMargin),

    // P2 — exclude-projection, the app-export shape (reference:
    // database/query_examples.py:281-287: drop data_quality +
    // deduplication wholesale, drop one NESTED field from an otherwise
    // kept struct). The surviving field list is derived from the
    // PROJECTED schema — the oracle pins exactly which fields an
    // exclude-projection must keep — and the row aggregates prove the
    // kept data still flows.
    "v2_export" -> QueryDef(
      (s, d) => {
        val exported = ev(s, d)
          .drop("data_quality", "validation_metadata")
          .withColumn("content",
            col("content").dropFields("full_description"))
        val sub = exported.schema("content").dataType
          .asInstanceOf[org.apache.spark.sql.types.StructType]
          .fieldNames.toSeq.map("content." + _)
        val fields = (exported.schema.fieldNames.toSeq ++ sub).sorted
        import s.implicits._
        fields.toDF("field")
          .crossJoin(exported.agg(
            count(lit(1)).as("n_rows"),
            count(col("content.short_description")).as("n_descriptions")))
          .orderBy(col("field"))
      },
      s"""$CTE, f AS (
         |  SELECT unnest(['acts', 'content', 'content.hashtags',
         |    'content.keywords', 'content.short_description', 'datetime',
         |    'doc_id', 'music', 'ticketing', 'title', 'type', 'venue'])
         |    AS field)
         |SELECT field,
         |  (SELECT COUNT(*) FROM v2ev) AS n_rows,
         |  (SELECT COUNT(sdesc) FROM v2ev) AS n_descriptions
         |FROM f ORDER BY field""".stripMargin)
  )
}
