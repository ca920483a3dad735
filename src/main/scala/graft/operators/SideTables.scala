package graft.operators

import graft.{QueryDef, Tables => T}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The reference's 4-collection layout beyond `events`
  * (reference: database/IMPLEMENTATION_SUMMARY.md:5-11,
  * tests/test_mongodb_setup.py:455-508):
  *
  *  - `quality_scores`  — historical quality-score tracking: one row
  *    APPENDED per event per scoring run; indexed (eventId,
  *    calculatedAt DESC) / (calculatedAt DESC) / (overallScore DESC).
  *  - `validation_history` — validation attempt log: one row APPENDED
  *    per event per validation attempt; indexed (eventId, validatedAt
  *    DESC) / (validatedAt DESC) / (validationType).
  *  - `extraction_methods` — method-effectiveness stats: one row
  *    per (method, domain) UPSERTED as attempt batches land; indexed
  *    (method, domain) / (successRate DESC) / (lastUsed DESC).
  *
  * Spark-first modeling: the append-only collections are plain
  * unions of per-run DataFrames (at cluster scale: date-partitioned
  * appends to a parquet/log table — no read-modify-write, which is why
  * Mongo uses capped-style append collections here too). The serving
  * reads the indexes stand for become window/aggregate queries:
  * "latest score per event" is exactly a (eventId, calculatedAt DESC)
  * row_number window; "method ranking" is an ordered aggregate. The
  * stats collection's upsert is a keyed merge of PRE-AGGREGATED
  * batches — commutative counts, so batches can land in any order and
  * the merge is one small-table join, not a per-document update loop.
  */
object SideTables {

  /** quality_scores append: one scoring-run row per input event.
    * `overall` is the caller's scoring expression (the production path
    * plugs QualityScorer.overall in; fixtures use arithmetic oracles).
    */
  def scoreRun(events: DataFrame, idCol: Column, overall: Column,
      runId: String, calculatedAt: String): DataFrame =
    events.select(
      idCol.as("event_id"),
      lit(runId).as("run_id"),
      lit(calculatedAt).as("calculated_at"),
      overall.as("overall_score"))

  /** validation_history append: one attempt row per input event. */
  def validationRun(events: DataFrame, idCol: Column, passed: Column,
      validationType: String, validatedAt: String): DataFrame =
    events.select(
      idCol.as("event_id"),
      lit(validationType).as("validation_type"),
      lit(validatedAt).as("validated_at"),
      passed.as("passed"))

  /** Append-only collection = union of run frames. At scale each run
    * is one partition-append; nothing is rewritten.
    */
  def appendLog(runs: Seq[DataFrame]): DataFrame =
    runs.reduce(_ unionByName _)

  /** The (keyCol, atCol DESC) index read: latest row per key, with the
    * run count and score spread the quality-report workflow asks for
    * (latest vs first score, how many runs). One hash shuffle on the
    * key; every aggregate rides the same window partition.
    */
  def scoreHistorySummary(log: DataFrame): DataFrame = {
    val byKey = Window.partitionBy(col("event_id"))
    // run_id breaks calculated_at ties: two runs stamped in the same
    // second must still yield a deterministic latest_score
    val recency = byKey.orderBy(col("calculated_at").desc, col("run_id").desc)
    val all = byKey.rowsBetween(
      Window.unboundedPreceding, Window.unboundedFollowing)
    log
      .withColumn("_rn", row_number().over(recency))
      .withColumn("n_runs", count(lit(1)).over(all))
      .withColumn("max_score", max(col("overall_score")).over(all))
      .withColumn("min_score", min(col("overall_score")).over(all))
      .filter(col("_rn") === 1)
      .select(col("event_id"),
        col("n_runs"),
        col("overall_score").as("latest_score"),
        col("max_score"), col("min_score"))
  }

  /** Per-event validation digest — the (eventId, validatedAt DESC)
    * index read over the attempt log: attempt/pass counts plus the
    * most recent attempt's type and time.
    */
  def validationSummary(log: DataFrame): DataFrame = {
    val byKey = Window.partitionBy(col("event_id"))
    val recency = byKey.orderBy(col("validated_at").desc,
      col("validation_type"))
    val all = byKey.rowsBetween(
      Window.unboundedPreceding, Window.unboundedFollowing)
    log
      .withColumn("_rn", row_number().over(recency))
      .withColumn("n_checks", count(lit(1)).over(all))
      .withColumn("n_passed",
        sum(when(col("passed"), 1L).otherwise(0L)).over(all))
      .filter(col("_rn") === 1)
      .select(col("event_id"), col("n_checks"), col("n_passed"),
        col("validation_type").as("last_type"),
        col("validated_at").as("last_at"))
  }

  /** extraction_methods upsert: merge a raw attempt batch into the
    * existing per-(method, domain) stats table. The batch is
    * aggregated FIRST (map-side combinable counts), then one
    * full-outer join on the key merges it with the existing stats —
    * counts add, last_used takes the max, success_rate is recomputed
    * from the merged counts. Stats tables are tiny (methods × domains)
    * at any corpus size, so the merge join is trivially cheap — note
    * Spark cannot BROADCAST a full-outer join (both sides must stream
    * to emit unmatched rows), so this plans as a sort-merge join over
    * a few hundred rows; the only data-scale work is the batch
    * aggregation, which is a single partial-agg shuffle.
    */
  def extractionMethodsUpsert(existing: DataFrame,
      attempts: DataFrame): DataFrame = {
    val batch = attempts.groupBy(col("method"), col("domain")).agg(
      sum(when(col("success"), 1L).otherwise(0L)).as("_b_succ"),
      sum(when(col("success"), 0L).otherwise(1L)).as("_b_fail"),
      max(col("used_at")).as("_b_last"))
    def z(c: String) = coalesce(col(c), lit(0L))
    existing.join(batch, Seq("method", "domain"), "full_outer")
      .select(col("method"), col("domain"),
        (z("success_count") + z("_b_succ")).as("success_count"),
        (z("failure_count") + z("_b_fail")).as("failure_count"),
        // greatest() skips nulls (null only when both sides are null),
        // which is exactly right for a key present on only one side
        greatest(col("last_used"), col("_b_last")).as("last_used"))
      .withColumn("success_rate",
        col("success_count").cast("double") /
          (col("success_count") + col("failure_count")).cast("double"))
  }

  /** Aggregate a raw attempt log into the stats shape (used to seed
    * the existing table and as the conservation oracle: upserting
    * batch B into agg(A) must equal agg(A ∪ B)).
    */
  def extractionMethodsAgg(attempts: DataFrame): DataFrame =
    attempts.groupBy(col("method"), col("domain")).agg(
      sum(when(col("success"), 1L).otherwise(0L)).as("success_count"),
      sum(when(col("success"), 0L).otherwise(1L)).as("failure_count"),
      max(col("used_at")).as("last_used"))
    .withColumn("success_rate",
      col("success_count").cast("double") /
        (col("success_count") + col("failure_count")).cast("double"))
}

/** Oracle-checked queries for the side-collection layout. All inputs
  * are pure doc_id arithmetic over `documents`, so DuckDB recomputes
  * the appended/merged state from the parquet alone.
  */
object SideTableQueries {

  private val methods = Seq("css", "jsonld", "llm", "regex")
  private val domains =
    Seq("clubtickets.com", "ibiza-spotlight.com", "ticketsibiza.com")

  val registry: Map[String, QueryDef] = Map(

    // quality_scores: two scoring runs (a full pass, then a partial
    // re-score a week later) appended, read back through the
    // (eventId, calculatedAt DESC) index analog.
    "side_quality_scores" -> QueryDef(
      (s, d) => {
        val docs = T.documents(s, d)
        def pct(mult: Int) =
          (col("doc_id") * mult % 101).cast("double") / lit(100.0)
        val run1 = SideTables.scoreRun(docs, concat(lit("ev"), col("doc_id")),
          pct(7), "run1", "2025-06-01T00:00:00Z")
        val run2 = SideTables.scoreRun(
          docs.filter(col("doc_id") % 3 === 0),
          concat(lit("ev"), col("doc_id")),
          pct(13), "run2", "2025-06-08T00:00:00Z")
        SideTables.scoreHistorySummary(SideTables.appendLog(Seq(run1, run2)))
          .orderBy(col("event_id"))
      },
      """WITH log AS (
        |  SELECT 'ev' || doc_id AS event_id, 'run1' AS run_id,
        |    '2025-06-01T00:00:00Z' AS calculated_at,
        |    CAST(doc_id * 7 % 101 AS DOUBLE) / 100.0 AS overall_score
        |  FROM documents
        |  UNION ALL
        |  SELECT 'ev' || doc_id, 'run2',
        |    '2025-06-08T00:00:00Z',
        |    CAST(doc_id * 13 % 101 AS DOUBLE) / 100.0
        |  FROM documents WHERE doc_id % 3 = 0),
        |r AS (
        |  SELECT *, ROW_NUMBER() OVER (PARTITION BY event_id
        |    ORDER BY calculated_at DESC, run_id DESC) AS rn
        |  FROM log)
        |SELECT event_id,
        |  COUNT(*) AS n_runs,
        |  MAX(CASE WHEN rn = 1 THEN overall_score END) AS latest_score,
        |  MAX(overall_score) AS max_score,
        |  MIN(overall_score) AS min_score
        |FROM r GROUP BY event_id ORDER BY event_id""".stripMargin),

    // validation_history: three attempt waves (schema-validate all,
    // field-validate the even half, manually verify every 10th),
    // appended, digested per event via the (eventId, validatedAt DESC)
    // index analog. Wave times are strictly increasing so last_type is
    // deterministic.
    "side_validation_history" -> QueryDef(
      (s, d) => {
        val docs = T.documents(s, d)
        val eid = concat(lit("ev"), col("doc_id"))
        val a = SideTables.validationRun(docs, eid,
          col("doc_id") % 7 =!= 0, "schema", "2025-06-01T00:00:00Z")
        val b = SideTables.validationRun(docs.filter(col("doc_id") % 2 === 0),
          eid, col("doc_id") % 5 =!= 0, "fields", "2025-06-02T00:00:00Z")
        val c = SideTables.validationRun(docs.filter(col("doc_id") % 10 === 0),
          eid, lit(true), "manual", "2025-06-03T00:00:00Z")
        SideTables.validationSummary(SideTables.appendLog(Seq(a, b, c)))
          .orderBy(col("event_id"))
      },
      """WITH log AS (
        |  SELECT 'ev' || doc_id AS event_id, 'schema' AS validation_type,
        |    '2025-06-01T00:00:00Z' AS validated_at,
        |    doc_id % 7 <> 0 AS passed
        |  FROM documents
        |  UNION ALL
        |  SELECT 'ev' || doc_id, 'fields', '2025-06-02T00:00:00Z',
        |    doc_id % 5 <> 0
        |  FROM documents WHERE doc_id % 2 = 0
        |  UNION ALL
        |  SELECT 'ev' || doc_id, 'manual', '2025-06-03T00:00:00Z', TRUE
        |  FROM documents WHERE doc_id % 10 = 0),
        |r AS (
        |  SELECT *, ROW_NUMBER() OVER (PARTITION BY event_id
        |    ORDER BY validated_at DESC, validation_type) AS rn
        |  FROM log)
        |SELECT event_id,
        |  COUNT(*) AS n_checks,
        |  CAST(SUM(CASE WHEN passed THEN 1 ELSE 0 END) AS BIGINT) AS n_passed,
        |  MAX(CASE WHEN rn = 1 THEN validation_type END) AS last_type,
        |  MAX(CASE WHEN rn = 1 THEN validated_at END) AS last_at
        |FROM r GROUP BY event_id ORDER BY event_id""".stripMargin),

    // The quality-report workflow the side tables exist FOR: join the
    // serving events table with the latest tracked score per event
    // (the (eventId, calculatedAt DESC) index read), surfacing the
    // top-20 — history summary is tiny next to the corpus, so it
    // broadcasts into the serving join.
    "side_quality_report" -> QueryDef(
      (s, d) => {
        val docs = T.documents(s, d)
        def pct(mult: Int) =
          (col("doc_id") * mult % 101).cast("double") / lit(100.0)
        val eid = concat(lit("ev"), col("doc_id"))
        val log = SideTables.appendLog(Seq(
          SideTables.scoreRun(docs, eid, pct(7), "run1",
            "2025-06-01T00:00:00Z"),
          SideTables.scoreRun(docs.filter(col("doc_id") % 3 === 0), eid,
            pct(13), "run2", "2025-06-08T00:00:00Z")))
        val latest = SideTables.scoreHistorySummary(log)
          .select(col("event_id"), col("n_runs"), col("latest_score"))
        V2Fixtures.events(s, d)
          .select(concat(lit("ev"), col("doc_id")).as("event_id"),
            col("title"), col("venue.name").as("venue_name"),
            col("data_quality.overall_score").as("engine_score"))
          .join(broadcast(latest), Seq("event_id"))
          .orderBy(col("latest_score").desc, col("event_id"))
          .limit(20)
      },
      s"""${V2Fixtures.oracleCte} , log AS (
         |  SELECT 'ev' || doc_id AS event_id, 'run1' AS run_id,
         |    '2025-06-01T00:00:00Z' AS calculated_at,
         |    CAST(doc_id * 7 % 101 AS DOUBLE) / 100.0 AS overall_score
         |  FROM documents
         |  UNION ALL
         |  SELECT 'ev' || doc_id, 'run2', '2025-06-08T00:00:00Z',
         |    CAST(doc_id * 13 % 101 AS DOUBLE) / 100.0
         |  FROM documents WHERE doc_id % 3 = 0),
         |lr AS (
         |  SELECT *, ROW_NUMBER() OVER (PARTITION BY event_id
         |    ORDER BY calculated_at DESC, run_id DESC) AS rn
         |  FROM log),
         |latest AS (
         |  SELECT event_id, COUNT(*) AS n_runs,
         |    MAX(CASE WHEN rn = 1 THEN overall_score END) AS latest_score
         |  FROM lr GROUP BY event_id)
         |SELECT 'ev' || v.doc_id AS event_id, v.title, v.venue_name,
         |  v.overall_score AS engine_score, l.n_runs, l.latest_score
         |FROM v2ev v JOIN latest l ON l.event_id = 'ev' || v.doc_id
         |ORDER BY l.latest_score DESC, event_id LIMIT 20""".stripMargin),

    // extraction_methods: stats seeded from an earlier attempt log,
    // then a new attempt batch upserted per (method, domain). The
    // oracle recomputes the merged state from the union of both logs —
    // the conservation property the commutative-counts design
    // guarantees (upsert(agg(A), B) == agg(A ∪ B)).
    "side_extraction_methods" -> QueryDef(
      (s, d) => {
        val docs = T.documents(s, d)
        def attempts(df: DataFrame, succMod: Int, baseDate: String,
            daySpan: Int) = df.select(
          element_at(typedLit(methods), (col("doc_id") % 4 + 1).cast("int"))
            .as("method"),
          element_at(typedLit(domains), (col("doc_id") % 3 + 1).cast("int"))
            .as("domain"),
          (col("doc_id") % succMod =!= 0).as("success"),
          date_format(date_add(to_date(lit(baseDate)),
            (col("doc_id") % daySpan).cast("int")), "yyyy-MM-dd")
            .as("used_at"))
        val existing = SideTables.extractionMethodsAgg(
          attempts(docs, 5, "2025-05-01", 30))
        val batch = attempts(docs.filter(col("doc_id") % 2 === 0),
          7, "2025-06-01", 9)
        SideTables.extractionMethodsUpsert(existing, batch)
          .orderBy(col("method"), col("domain"))
      },
      """WITH log AS (
        |  SELECT
        |    ['css','jsonld','llm','regex'][CAST(doc_id % 4 + 1 AS INT)]
        |      AS method,
        |    ['clubtickets.com','ibiza-spotlight.com','ticketsibiza.com']
        |      [CAST(doc_id % 3 + 1 AS INT)] AS domain,
        |    doc_id % 5 <> 0 AS success,
        |    strftime(DATE '2025-05-01' + CAST(doc_id % 30 AS INT),
        |      '%Y-%m-%d') AS used_at
        |  FROM documents
        |  UNION ALL
        |  SELECT
        |    ['css','jsonld','llm','regex'][CAST(doc_id % 4 + 1 AS INT)],
        |    ['clubtickets.com','ibiza-spotlight.com','ticketsibiza.com']
        |      [CAST(doc_id % 3 + 1 AS INT)],
        |    doc_id % 7 <> 0,
        |    strftime(DATE '2025-06-01' + CAST(doc_id % 9 AS INT),
        |      '%Y-%m-%d')
        |  FROM documents WHERE doc_id % 2 = 0)
        |SELECT method, domain,
        |  CAST(SUM(CASE WHEN success THEN 1 ELSE 0 END) AS BIGINT)
        |    AS success_count,
        |  CAST(SUM(CASE WHEN success THEN 0 ELSE 1 END) AS BIGINT)
        |    AS failure_count,
        |  MAX(used_at) AS last_used,
        |  CAST(SUM(CASE WHEN success THEN 1 ELSE 0 END) AS DOUBLE)
        |    / CAST(COUNT(*) AS DOUBLE) AS success_rate
        |FROM log GROUP BY method, domain ORDER BY method, domain""".stripMargin)
  )
}
