package graft.operators

import graft.{QueryDef, Tables => T}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.DecimalType

/** Relational query inventory — one named query per operator family of
  * SURVEY.md §2 (scans, P-filters, A-aggregations, O-sorts, J-joins,
  * D-dedup, K1 upsert machinery, set ops), instantiated on the
  * driver-generated testdata tables.
  *
  * Every query carries its DuckDB oracle SQL. Numeric parity rules are
  * documented on [[graft.Tables.decSum]]: double sums go through
  * DECIMAL(18,4) so results are bit-identical across engines.
  *
  * Scale notes (100 TB design stance):
  *  - filters/projections sit directly on the parquet scan → pushdown +
  *    column pruning (verified via explain in BenchSpec);
  *  - dimension joins (nation/region/part) are explicitly broadcast;
  *  - fact-fact joins shuffle on the join key only after map-side
  *    partial aggregation where possible;
  *  - top-k queries rely on TakeOrderedAndProject (no global sort).
  */
object RelationalQueries {

  private val dec = DecimalType(18, 4)

  val registry: Map[String, QueryDef] = Map(

    // ---- scans / projections -------------------------------------------
    // SURVEY §2.1 S4: full collection scan with projection + stable order.
    "s4_scan_projection" -> QueryDef(
      (s, d) => T.events(s, d)
        .select(col("event_id"), col("user_id"), col("event_type"), col("value"))
        .orderBy(col("event_id")).limit(1000),
      """SELECT event_id, user_id, event_type, value
        |FROM events ORDER BY event_id LIMIT 1000""".stripMargin),

    // SURVEY §2.2 P1/P13 + §2.8 F17: JSON field extraction projection.
    "p1_json_projection" -> QueryDef(
      (s, d) => T.events(s, d)
        .select(col("event_id"), col("event_type"),
          get_json_object(col("props"), "$.k").cast("int").as("prop_k"))
        .orderBy(col("event_id")).limit(500),
      """SELECT event_id, event_type,
        |  CAST(json_extract_string(props, '$.k') AS INTEGER) AS prop_k
        |FROM events ORDER BY event_id LIMIT 500""".stripMargin),

    // ---- filters --------------------------------------------------------
    // SURVEY §2.2 P6 (range on time) + §2.6 O1/O3.
    "p6_range_filter" -> QueryDef(
      (s, d) => T.events(s, d)
        .filter(col("ts") >= lit("2024-01-10 00:00:00").cast("timestamp") &&
                col("ts") <  lit("2024-01-20 00:00:00").cast("timestamp") &&
                col("value") > 100.0)
        .select(col("event_id"), col("user_id"), col("event_type"), col("value"))
        .orderBy(col("event_id")).limit(200),
      """SELECT event_id, user_id, event_type, value FROM events
        |WHERE ts >= TIMESTAMP '2024-01-10 00:00:00'
        |  AND ts <  TIMESTAMP '2024-01-20 00:00:00'
        |  AND value > 100.0
        |ORDER BY event_id LIMIT 200""".stripMargin),

    // SURVEY §2.2 P7: numeric threshold filter, multi-predicate.
    "p7_threshold_filter" -> QueryDef(
      (s, d) => T.lineitem(s, d)
        .filter(col("l_discount").between(0.05, 0.07) && col("l_quantity") < 10.0)
        .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"), col("l_discount"))
        .orderBy(col("l_orderkey"), col("l_linenumber")),
      """SELECT l_orderkey, l_linenumber, l_quantity, l_discount
        |FROM lineitem
        |WHERE l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 10.0
        |ORDER BY l_orderkey, l_linenumber""".stripMargin),

    // SURVEY §2.2 P8: case-insensitive substring regex filter.
    "p8_pattern_filter" -> QueryDef(
      (s, d) => T.part(s, d)
        .filter(col("p_name").rlike("(?i)widget"))
        .select(col("p_partkey"), col("p_name"), col("p_brand"), col("p_retailprice"))
        .orderBy(col("p_partkey")),
      """SELECT p_partkey, p_name, p_brand, p_retailprice FROM part
        |WHERE regexp_matches(p_name, '(?i)widget')
        |ORDER BY p_partkey""".stripMargin),

    // SURVEY §2.2 P9 + §2.4 A2: existence predicate + filtered count.
    "p9_existence_counts" -> QueryDef(
      (s, d) => T.events(s, d)
        .filter(col("props").isNotNull && col("value").isNotNull)
        .groupBy(col("event_type")).agg(count(lit(1)).as("n"))
        .orderBy(col("event_type")),
      """SELECT event_type, COUNT(*) AS n FROM events
        |WHERE props IS NOT NULL AND value IS NOT NULL
        |GROUP BY event_type ORDER BY event_type""".stripMargin),

    // SURVEY §2.2 P10: point lookup by unique key.
    "p10_point_lookup" -> QueryDef(
      (s, d) => T.orders(s, d)
        .filter(col("o_orderkey") === 42L)
        .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"), col("o_totalprice")),
      """SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice
        |FROM orders WHERE o_orderkey = 42""".stripMargin),

    // ---- sorts / pagination --------------------------------------------
    // SURVEY §2.6 O4: skip+limit pagination with stable order.
    "o4_pagination" -> QueryDef(
      (s, d) => T.orders(s, d)
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
        .orderBy(col("o_orderkey")).offset(100).limit(50),
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
        |ORDER BY o_orderkey LIMIT 50 OFFSET 100""".stripMargin),

    // O4 at scale — KEYSET pagination: offset/limit re-sorts and skips
    // O(offset) rows per page (page 10,000 of a 100 TB table scans 10k
    // pages' worth); a cursor predicate on the sort key is O(page)
    // regardless of depth. The cursor here is o4's last key (the page
    // AFTER o4's page), proving the two formulations paginate the same
    // ordering. In a real keyset API the cursor arrives as a client
    // literal and pushes into the scan; this demo derives it in-plan —
    // a broadcast 1-row aggregate joined ahead of the filter (the SQL
    // scalar-subquery shape) — so query CONSTRUCTION is job-free and
    // the whole registry is plan-only sweepable. max() over an
    // empty/short table is NULL; COALESCE to key 0 = first page.
    "o6_keyset_pagination" -> QueryDef(
      (s, d) => {
        val cursor = T.orders(s, d)
          .select(col("o_orderkey"))
          .orderBy(col("o_orderkey")).offset(100).limit(50)
          .agg(max(col("o_orderkey")).as("_last_key"))
        T.orders(s, d)
          .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
          .crossJoin(broadcast(cursor))
          .filter(col("o_orderkey") > coalesce(col("_last_key"), lit(0L)))
          .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
          .orderBy(col("o_orderkey")).limit(50)
      },
      """WITH cursor AS (
        |  SELECT MAX(o_orderkey) AS last_key FROM (
        |    SELECT o_orderkey FROM orders
        |    ORDER BY o_orderkey LIMIT 50 OFFSET 100))
        |SELECT o_orderkey, o_custkey, o_totalprice
        |FROM orders, cursor WHERE o_orderkey > COALESCE(last_key, 0)
        |ORDER BY o_orderkey LIMIT 50""".stripMargin),

    // §2.5 depth — lead/lag deltas: per-user time-between-events stats
    // (the gap arithmetic ev_sessionize uses, surfaced as its own
    // windowed aggregate: one hash shuffle on the key, both window
    // functions ride the same sort).
    "w_lag_delta" -> QueryDef(
      (s, d) => {
        val byUser = Window.partitionBy(col("user_id"))
          .orderBy(col("event_id"))
        T.events(s, d)
          .withColumn("gap_ms",
            unix_millis(col("ts")) -
              lag(unix_millis(col("ts")), 1).over(byUser))
          .filter(col("gap_ms").isNotNull)
          .groupBy(col("user_id"))
          .agg(count(lit(1)).as("n_gaps"),
            min(col("gap_ms")).as("min_gap_ms"),
            max(col("gap_ms")).as("max_gap_ms"),
            sum(col("gap_ms")).as("total_gap_ms"))
          .orderBy(col("user_id"))
      },
      """WITH g AS (
        |  SELECT user_id,
        |    epoch_ms(ts) - LAG(epoch_ms(ts)) OVER
        |      (PARTITION BY user_id ORDER BY event_id) AS gap_ms
        |  FROM events)
        |SELECT user_id, COUNT(*) AS n_gaps,
        |  MIN(gap_ms) AS min_gap_ms, MAX(gap_ms) AS max_gap_ms,
        |  CAST(SUM(gap_ms) AS BIGINT) AS total_gap_ms
        |FROM g WHERE gap_ms IS NOT NULL
        |GROUP BY user_id ORDER BY user_id""".stripMargin),

    // ---- aggregations ---------------------------------------------------
    // Flagship — TPC-H Q1-style pricing summary (SURVEY §2.4 A5/A6 math).
    "q1_pricing_summary" -> QueryDef(
      (s, d) => {
        // Derived money amounts stay in exact decimal arithmetic end to
        // end: double→decimal casts of *computed* doubles round
        // differently across engines (Spark goes through the shortest
        // string representation, DuckDB through the exact binary
        // value), so cast the raw 2-dp inputs once and multiply as
        // decimals — exact in both engines.
        val price = col("l_extendedprice").cast(DecimalType(12, 4))
        val disc1 = lit(1).cast(DecimalType(6, 4)) - col("l_discount").cast(DecimalType(6, 4))
        val tax1  = lit(1).cast(DecimalType(6, 4)) + col("l_tax").cast(DecimalType(6, 4))
        T.lineitem(s, d)
          .groupBy(col("l_returnflag"), col("l_linestatus"))
          .agg(
            T.decSum(col("l_quantity")).as("sum_qty"),
            T.decSum(col("l_extendedprice")).as("sum_base_price"),
            // round(·,4) before the double cast: DuckDB's decimal→double
            // is float-division-lossy once the scaled integer exceeds
            // 2^53; at scale 4 these sums stay exactly convertible.
            round(sum(price * disc1), 4).cast("double").as("sum_disc_price"),
            round(sum(price * disc1 * tax1), 4).cast("double").as("sum_charge"),
            T.decAvg(col("l_quantity")).as("avg_qty"),
            T.decAvg(col("l_extendedprice")).as("avg_price"),
            T.decAvg(col("l_discount")).as("avg_disc"),
            count(lit(1)).as("count_order"))
          .orderBy(col("l_returnflag"), col("l_linestatus"))
      },
      s"""SELECT l_returnflag, l_linestatus,
         |  ${T.sqlDecSum("l_quantity")} AS sum_qty,
         |  ${T.sqlDecSum("l_extendedprice")} AS sum_base_price,
         |  CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(12,4)) * (1 - CAST(l_discount AS DECIMAL(6,4)))), 4) AS DOUBLE) AS sum_disc_price,
         |  CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(12,4)) * (1 - CAST(l_discount AS DECIMAL(6,4))) * (1 + CAST(l_tax AS DECIMAL(6,4)))), 4) AS DOUBLE) AS sum_charge,
         |  ${T.sqlDecAvg("l_quantity")} AS avg_qty,
         |  ${T.sqlDecAvg("l_extendedprice")} AS avg_price,
         |  ${T.sqlDecAvg("l_discount")} AS avg_disc,
         |  COUNT(*) AS count_order
         |FROM lineitem
         |GROUP BY l_returnflag, l_linestatus
         |ORDER BY l_returnflag, l_linestatus""".stripMargin),

    // SURVEY §2.4 A1: global count.
    "a1_global_count" -> QueryDef(
      (s, d) => T.lineitem(s, d).agg(count(lit(1)).as("n_rows")),
      "SELECT COUNT(*) AS n_rows FROM lineitem"),

    // SURVEY §2.4 A3: distinct counts.
    "a3_distinct_count" -> QueryDef(
      (s, d) => T.events(s, d).agg(
        countDistinct(col("event_type")).as("n_types"),
        countDistinct(col("user_id")).as("n_users")),
      """SELECT COUNT(DISTINCT event_type) AS n_types,
        |       COUNT(DISTINCT user_id) AS n_users FROM events""".stripMargin),

    // SURVEY §2.4 A4: group-by-date histogram (month grain).
    "a4_date_histogram" -> QueryDef(
      (s, d) => T.orders(s, d)
        .groupBy(date_format(col("o_orderdate"), "yyyy-MM").as("month"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("month")),
      """SELECT strftime(o_orderdate, '%Y-%m') AS month, COUNT(*) AS n
        |FROM orders GROUP BY 1 ORDER BY month""".stripMargin),

    // SURVEY §2.4 A5: global multi-stat aggregate.
    "a5_global_stats" -> QueryDef(
      (s, d) => T.orders(s, d).agg(
        count(lit(1)).as("n"),
        T.decAvg(col("o_totalprice")).as("avg_price"),
        min(col("o_totalprice")).as("min_price"),
        max(col("o_totalprice")).as("max_price")),
      s"""SELECT COUNT(*) AS n, ${T.sqlDecAvg("o_totalprice")} AS avg_price,
         |  MIN(o_totalprice) AS min_price, MAX(o_totalprice) AS max_price
         |FROM orders""".stripMargin),

    // SURVEY §2.4 A6: conditional band counts ($cond histogram).
    "a6_conditional_bands" -> QueryDef(
      (s, d) => T.orders(s, d).agg(
        sum(when(col("o_totalprice") < 50000.0, 1L).otherwise(0L)).as("band_low"),
        sum(when(col("o_totalprice") >= 50000.0 && col("o_totalprice") < 150000.0, 1L).otherwise(0L)).as("band_mid"),
        sum(when(col("o_totalprice") >= 150000.0 && col("o_totalprice") < 300000.0, 1L).otherwise(0L)).as("band_high"),
        sum(when(col("o_totalprice") >= 300000.0, 1L).otherwise(0L)).as("band_top")),
      """SELECT
        |  CAST(SUM(CASE WHEN o_totalprice < 50000.0 THEN 1 ELSE 0 END) AS BIGINT) AS band_low,
        |  CAST(SUM(CASE WHEN o_totalprice >= 50000.0 AND o_totalprice < 150000.0 THEN 1 ELSE 0 END) AS BIGINT) AS band_mid,
        |  CAST(SUM(CASE WHEN o_totalprice >= 150000.0 AND o_totalprice < 300000.0 THEN 1 ELSE 0 END) AS BIGINT) AS band_high,
        |  CAST(SUM(CASE WHEN o_totalprice >= 300000.0 THEN 1 ELSE 0 END) AS BIGINT) AS band_top
        |FROM orders""".stripMargin),

    // SURVEY §2.4 A7: $bucket histogram with labeled boundaries.
    "a7_bucket_histogram" -> QueryDef(
      (s, d) => T.events(s, d)
        .groupBy(
          when(col("value") < 50.0, "[0,50)")
            .when(col("value") < 100.0, "[50,100)")
            .when(col("value") < 200.0, "[100,200)")
            .otherwise("[200,inf)").as("bucket"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("bucket")),
      """SELECT CASE WHEN value < 50.0 THEN '[0,50)'
        |            WHEN value < 100.0 THEN '[50,100)'
        |            WHEN value < 200.0 THEN '[100,200)'
        |            ELSE '[200,inf)' END AS bucket, COUNT(*) AS n
        |FROM events GROUP BY 1 ORDER BY bucket""".stripMargin),

    // SURVEY §2.4 A8: group stats with embedded conditional count.
    "a8_group_stats" -> QueryDef(
      (s, d) => T.orders(s, d)
        .join(T.customer(s, d), col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_mktsegment"))
        .agg(
          count(lit(1)).as("n_orders"),
          T.decAvg(col("o_totalprice")).as("avg_price"),
          sum(when(col("o_orderdate") >= lit("1999-01-01 00:00:00").cast("timestamp"), 1L)
            .otherwise(0L)).as("recent_orders"))
        .orderBy(col("c_mktsegment")),
      s"""SELECT c_mktsegment, COUNT(*) AS n_orders,
         |  ${T.sqlDecAvg("o_totalprice")} AS avg_price,
         |  CAST(SUM(CASE WHEN o_orderdate >= TIMESTAMP '1999-01-01 00:00:00' THEN 1 ELSE 0 END) AS BIGINT) AS recent_orders
         |FROM orders JOIN customer ON o_custkey = c_custkey
         |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin),

    // SURVEY §2.4 A9 + §2.6 O2: top-k by aggregate, multi-key desc sort.
    "a9_topk_customers" -> QueryDef(
      (s, d) => T.orders(s, d)
        .groupBy(col("o_custkey"))
        .agg(T.decSum(col("o_totalprice")).as("revenue"), count(lit(1)).as("n_orders"))
        .orderBy(col("revenue").desc, col("o_custkey"))
        .limit(10),
      s"""SELECT o_custkey, ${T.sqlDecSum("o_totalprice")} AS revenue,
         |  COUNT(*) AS n_orders
         |FROM orders GROUP BY o_custkey
         |ORDER BY revenue DESC, o_custkey LIMIT 10""".stripMargin),

    // A13 — replayable HyperLogLog distinct count (operators.Sketches):
    // unlike approx_count_distinct's opaque binary sketch, every step
    // (md5-derived 60-bit hash, bucket/rho split via binary-string
    // length, integer-scaled register sum, integral-division estimate)
    // is exact declarative algebra, so DuckDB recomputes the IDENTICAL
    // sketch — estimate, register sum, and bucket census all
    // hash-compared, with ZERO double arithmetic in any compared cell
    // (Sketches.estConstant / linearTable). Exact distinct rides along
    // as the accuracy witness; sum_int is CAST in the oracle's final
    // SELECT (DuckDB SUM(BIGINT) is HUGEINT, Spark emits int64).
    "a13_hll_distinct" -> QueryDef(
      (s, d) => {
        val ev = T.events(s, d)
        Sketches.hllEstimate(ev, col("event_id").cast("string"), p = 8)
          .crossJoin(ev.agg(countDistinct(col("event_id")).as("n_exact")))
          .select(col("n_exact"), col("n_buckets"), col("zeros"),
            col("sum_int"), col("hll_estimate_x100"))
      },
      Sketches.hllOracleSql("events", "event_id", p = 8, extraSelect =
        "(SELECT COUNT(DISTINCT event_id) FROM events) AS n_exact,")),

    // A13 mergeability — THE property that makes the sketch a 100 TB
    // tool: registers computed independently per month (per shard /
    // day / executor in production, stored as tiny register tables)
    // merge via max-per-bucket into EXACTLY the whole-corpus sketch.
    // The row carries the merged estimate AND the direct estimate so
    // equality is visible in the output, and the oracle replays the
    // same two-level merge (month regs → max → estimate), not a
    // shortcut.
    "a13_hll_merge" -> QueryDef(
      (s, d) => {
        val ev = T.events(s, d)
        val perMonth = Sketches.hllRegistersBy(
          ev.withColumn("m", date_format(col("ts"), "yyyy-MM")),
          col("event_id").cast("string"), Seq("m"), p = 8)
        Sketches.hllEstimateFromRegisters(
            Sketches.hllMergeRegisters(perMonth), p = 8)
          .crossJoin(Sketches.hllEstimate(ev,
              col("event_id").cast("string"), p = 8)
            .select(col("hll_estimate_x100").as("direct_estimate_x100")))
          .select(col("n_buckets"), col("zeros"), col("sum_int"),
            col("hll_estimate_x100"), col("direct_estimate_x100"))
      },
      s"""WITH h AS (
         |  SELECT strftime(ts, '%Y-%m') AS m,
         |    CAST(('0x' || substr(md5(CAST(event_id AS VARCHAR)), 1, 15))
         |      AS BIGINT) AS h
         |  FROM events),
         |monthreg AS (
         |  SELECT m, h & 255 AS bucket,
         |    MAX(CASE WHEN (h >> 8) = 0 THEN 53
         |             ELSE 53 - length(bin(h >> 8)) END) AS rho
         |  FROM h GROUP BY 1, 2),
         |reg AS (
         |  SELECT bucket, MAX(rho) AS rho FROM monthreg GROUP BY 1),
         |agg AS (
         |  SELECT COUNT(*) AS n_buckets,
         |    SUM(CAST(1 AS BIGINT) << (53 - rho)) AS present_sum
         |  FROM reg),
         |s AS (
         |  SELECT n_buckets, 256 - n_buckets AS zeros,
         |    present_sum + (256 - n_buckets) * CAST(9007199254740992 AS BIGINT)
         |      AS sum_int
         |  FROM agg),
         |e AS (
         |  SELECT n_buckets, zeros, sum_int,
         |    CAST(${Sketches.estConstant(8)} // sum_int AS BIGINT) AS raw_x100
         |  FROM s)
         |SELECT n_buckets, zeros, CAST(sum_int AS BIGINT) AS sum_int,
         |  CASE WHEN raw_x100 <= 64000 AND zeros > 0
         |       THEN CAST(list_extract(${Sketches.linearTableSql(256)},
         |                 CAST(zeros AS INT)) AS BIGINT)
         |       ELSE raw_x100 END AS hll_estimate_x100,
         |  CASE WHEN raw_x100 <= 64000 AND zeros > 0
         |       THEN CAST(list_extract(${Sketches.linearTableSql(256)},
         |                 CAST(zeros AS INT)) AS BIGINT)
         |       ELSE raw_x100 END AS direct_estimate_x100
         |FROM e""".stripMargin),

    // A13 small-range fixture — same sketch over the 5-value
    // event_type column, pinning the linear-counting branch
    // (zeros > 0, raw below 2.5m) that a13_hll_distinct's high
    // cardinality never reaches: the correction path is now an
    // exercised oracle row, not dormant code.
    "a13_hll_small" -> QueryDef(
      (s, d) => {
        val ev = T.events(s, d)
        Sketches.hllEstimate(ev, col("event_type"), p = 8)
          .crossJoin(ev.agg(countDistinct(col("event_type")).as("n_exact")))
          .select(col("n_exact"), col("n_buckets"), col("zeros"),
            col("sum_int"), col("hll_estimate_x100"))
      },
      Sketches.hllOracleSql("events", "event_type", p = 8, extraSelect =
        "(SELECT COUNT(DISTINCT event_type) FROM events) AS n_exact,")),

    // A13 sketch set algebra — distinct-intersection estimate via
    // inclusion–exclusion over STORED register tables: |A∩B| ≈
    // est(A) + est(B) − est(A∪B), where the union sketch is the
    // per-bucket register MAX (hllMergeRegisters) of the two stored
    // sketches. Nothing rescans the raw data: an audience-overlap
    // matrix over S segments at 100 TB is S·2^p stored register rows
    // and S² cheap merges. All three estimates are the same
    // integer-exact pipeline (K div sum_int / linear-table literal),
    // so the compared cells — including the possibly-negative
    // intersection — are pure BIGINT arithmetic in both engines; the
    // exact intersect count rides along as the error witness.
    "a13_hll_intersect" -> QueryDef(
      (s, d) => {
        val ev = T.events(s, d)
        // (user, day) grain: view-days and purchase-days overlap
        // partially (~2 events per user-day), so the three sketches
        // are genuinely distinct sets
        val key = concat(col("user_id").cast("string"), lit(":"),
          expr("unix_millis(ts) div 86400000").cast("string"))
        val ra = Sketches.hllRegisters(
          ev.filter(col("event_type") === "view"), key, p = 8)
        val rb = Sketches.hllRegisters(
          ev.filter(col("event_type") === "purchase"), key, p = 8)
        val ru = Sketches.hllMergeRegisters(ra.unionByName(rb))
        def est(regs: org.apache.spark.sql.DataFrame, name: String) =
          Sketches.hllEstimateFromRegisters(regs, p = 8)
            .select(col("hll_estimate_x100").as(name))
        val exact = ev.filter(col("event_type") === "view")
          .select(key.as("k"))
          .intersect(ev.filter(col("event_type") === "purchase")
            .select(key.as("k")))
          .agg(count(lit(1)).as("exact_intersect"))
        est(ra, "est_a_x100")
          .crossJoin(est(rb, "est_b_x100"))
          .crossJoin(est(ru, "est_union_x100"))
          .select(col("est_a_x100"), col("est_b_x100"),
            col("est_union_x100"),
            (col("est_a_x100") + col("est_b_x100") -
              col("est_union_x100")).as("est_intersect_x100"))
          .crossJoin(broadcast(exact))
      }, {
        def estCtes(src: String, nm: String) =
          s"""${nm}_agg AS (
             |  SELECT COUNT(*) AS nb,
             |    SUM(CAST(1 AS BIGINT) << (53 - rho)) AS ps
             |  FROM $src),
             |${nm}_raw AS (
             |  SELECT nb, CAST(${Sketches.estConstant(8)} //
             |    (ps + (256 - nb) * CAST(9007199254740992 AS BIGINT))
             |    AS BIGINT) AS raw
             |  FROM ${nm}_agg),
             |$nm AS (
             |  SELECT CASE WHEN raw <= 64000 AND (256 - nb) > 0
             |    THEN CAST(list_extract(${Sketches.linearTableSql(256)},
             |              CAST(256 - nb AS INT)) AS BIGINT)
             |    ELSE raw END AS est
             |  FROM ${nm}_raw)""".stripMargin
        s"""WITH k AS (
           |  SELECT event_type, CAST(user_id AS VARCHAR) || ':' ||
           |    CAST(epoch_ms(ts) // 86400000 AS VARCHAR) AS key
           |  FROM events),
           |ha AS (
           |  SELECT CAST(('0x' || substr(md5(key), 1, 15)) AS BIGINT) AS h
           |  FROM k WHERE event_type = 'view'),
           |hb AS (
           |  SELECT CAST(('0x' || substr(md5(key), 1, 15)) AS BIGINT) AS h
           |  FROM k WHERE event_type = 'purchase'),
           |ra AS (
           |  SELECT h & 255 AS bucket,
           |    MAX(CASE WHEN (h >> 8) = 0 THEN 53
           |             ELSE 53 - length(bin(h >> 8)) END) AS rho
           |  FROM ha GROUP BY 1),
           |rb AS (
           |  SELECT h & 255 AS bucket,
           |    MAX(CASE WHEN (h >> 8) = 0 THEN 53
           |             ELSE 53 - length(bin(h >> 8)) END) AS rho
           |  FROM hb GROUP BY 1),
           |ru AS (
           |  SELECT bucket, MAX(rho) AS rho FROM
           |    (SELECT * FROM ra UNION ALL SELECT * FROM rb)
           |  GROUP BY 1),
           |${estCtes("ra", "ea")},
           |${estCtes("rb", "eb")},
           |${estCtes("ru", "eu")},
           |ex AS (
           |  SELECT COUNT(*) AS exact_intersect FROM (
           |    SELECT DISTINCT key FROM k WHERE event_type = 'view'
           |    INTERSECT
           |    SELECT DISTINCT key FROM k WHERE event_type = 'purchase'))
           |SELECT ea.est AS est_a_x100, eb.est AS est_b_x100,
           |  eu.est AS est_union_x100,
           |  ea.est + eb.est - eu.est AS est_intersect_x100,
           |  ex.exact_intersect
           |FROM ea, eb, eu, ex""".stripMargin
      }),

    // Column-profile distinct census — the distinct count of EVERY
    // column of a table from ONE scan: rows unpivot into (colname,
    // value) pairs in place (stack — a codegen'd Expand, no shuffle,
    // no per-column rescan), then a single (colname, bucket)
    // aggregation builds all the HLL sketches at once. State is
    // ncols × 2^p cells regardless of input size; at 100 TB the
    // alternative — COUNT(DISTINCT c) per column — is ncols
    // expand-multiplied exact aggregations over the raw data. Columns
    // enter as engine-portable strings (ints verbatim, doubles via
    // floor-cents — never raw double formatting, which engines render
    // differently). The correction branch matters here: a profile
    // spans event_id (~rows) down to event_type (4), exactly the
    // regime split hllProfileBy handles per group. Exact per-column
    // distincts ride along as the error witness (the production path
    // drops them).
    "prof_distinct_columns" -> QueryDef(
      (s, d) => {
        val ev = T.events(s, d)
        val pairs = ev.selectExpr(
          """stack(5,
            |  'event_id', CAST(event_id AS STRING),
            |  'user_id', CAST(user_id AS STRING),
            |  'event_type', event_type,
            |  'props', props,
            |  'value_cents', CAST(CAST(floor(value * 100) AS BIGINT) AS STRING)
            |) AS (colname, value)""".stripMargin)
          .filter(col("value").isNotNull)
        Sketches.hllProfileBy(pairs, col("value"), Seq("colname"), p = 8)
          .join(pairs.groupBy(col("colname"))
            .agg(countDistinct(col("value")).as("n_exact")), "colname")
          .orderBy(col("colname"))
      },
      s"""WITH pairs0 AS (
         |  SELECT 'event_id' AS colname, CAST(event_id AS VARCHAR) AS value
         |  FROM events
         |  UNION ALL
         |  SELECT 'user_id', CAST(user_id AS VARCHAR) FROM events
         |  UNION ALL
         |  SELECT 'event_type', event_type FROM events
         |  UNION ALL
         |  SELECT 'props', props FROM events
         |  UNION ALL
         |  SELECT 'value_cents',
         |    CAST(CAST(floor(value * 100) AS BIGINT) AS VARCHAR)
         |  FROM events),
         |pairs AS (SELECT colname, value FROM pairs0 WHERE value IS NOT NULL),
         |h AS (
         |  SELECT colname,
         |    CAST(('0x' || substr(md5(value), 1, 15)) AS BIGINT) AS h
         |  FROM pairs),
         |reg AS (
         |  SELECT colname, h & 255 AS bucket,
         |    MAX(CASE WHEN (h >> 8) = 0 THEN 53
         |             ELSE 53 - length(bin(h >> 8)) END) AS rho
         |  FROM h GROUP BY 1, 2),
         |agg AS (
         |  SELECT colname, COUNT(*) AS n_buckets,
         |    SUM(CAST(1 AS BIGINT) << (53 - rho)) AS present_sum
         |  FROM reg GROUP BY 1),
         |s AS (
         |  SELECT colname, n_buckets, 256 - n_buckets AS zeros,
         |    present_sum + (256 - n_buckets) * CAST(9007199254740992 AS BIGINT)
         |      AS sum_int
         |  FROM agg),
         |e AS (
         |  SELECT colname, n_buckets, zeros, CAST(sum_int AS BIGINT) AS sum_int,
         |    CAST(${Sketches.estConstant(8)} // sum_int AS BIGINT) AS raw_x100
         |  FROM s),
         |ex AS (
         |  SELECT colname, COUNT(DISTINCT value) AS n_exact
         |  FROM pairs GROUP BY 1)
         |SELECT e.colname, e.n_buckets, e.zeros, e.sum_int,
         |  CASE WHEN raw_x100 <= 64000 AND zeros > 0
         |       THEN CAST(list_extract(${Sketches.linearTableSql(256)},
         |                 CAST(zeros AS INT)) AS BIGINT)
         |       ELSE raw_x100 END AS hll_estimate_x100,
         |  ex.n_exact
         |FROM e JOIN ex ON ex.colname = e.colname
         |ORDER BY e.colname""".stripMargin),

    // A23 — Pearson correlation matrix over lineitem's numeric
    // columns, ONE scan / ONE global aggregation: all 15 moments
    // (n, 4 sums, 4 square-sums, 6 cross-sums) partial-aggregate
    // map-side into a single row, which stacks into the 6 pair rows.
    // Exactness strategy: per-row cells are integral (floor at the
    // column's natural grain) and PRE-CENTERED by pinned integer
    // constants — correlation is exactly translation-invariant on
    // integers, and centering keeps every moment below 2^53, so sums
    // stay exact BIGINTs and the final corr cell uses only IEEE
    // exactly-rounded ops (×, −, ÷, sqrt — never libm), making the
    // floored ×1e6 value identical across engines by construction.
    // (At n ≫ 10^7 rows the square-sums would cross 2^53 — there the
    // census coarsens the grain or chunks sums through DECIMAL; the
    // one-pass moment shape is unchanged.)
    "a23_corr_matrix" -> QueryDef(
      (s, d) => {
        val li = T.lineitem(s, d).select(
          (floor(col("l_quantity")).cast("long") - 25).as("q"),
          (floor(col("l_extendedprice")).cast("long") - 38000).as("p"),
          (floor(col("l_discount") * 100).cast("long") - 5).as("dd"),
          (floor(col("l_tax") * 100).cast("long") - 4).as("t"))
        val corrExpr =
          """CAST(floor((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) -
            |     CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)) /
            |  sqrt((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) -
            |        CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) *
            |       (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE) -
            |        CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))) * 1000000)
            |  AS BIGINT) AS corr_x1e6""".stripMargin
        li.agg(
            count(lit(1)).as("n"),
            sum(col("q")).as("s_q"), sum(col("p")).as("s_p"),
            sum(col("dd")).as("s_d"), sum(col("t")).as("s_t"),
            sum(col("q") * col("q")).as("ss_q"),
            sum(col("p") * col("p")).as("ss_p"),
            sum(col("dd") * col("dd")).as("ss_d"),
            sum(col("t") * col("t")).as("ss_t"),
            sum(col("q") * col("p")).as("s_qp"),
            sum(col("q") * col("dd")).as("s_qd"),
            sum(col("q") * col("t")).as("s_qt"),
            sum(col("p") * col("dd")).as("s_pd"),
            sum(col("p") * col("t")).as("s_pt"),
            sum(col("dd") * col("t")).as("s_dt"))
          .selectExpr("n",
            """stack(6,
              |  'q:p', s_q, s_p, s_qp, ss_q, ss_p,
              |  'q:d', s_q, s_d, s_qd, ss_q, ss_d,
              |  'q:t', s_q, s_t, s_qt, ss_q, ss_t,
              |  'p:d', s_p, s_d, s_pd, ss_p, ss_d,
              |  'p:t', s_p, s_t, s_pt, ss_p, ss_t,
              |  'd:t', s_d, s_t, s_dt, ss_d, ss_t
              |) AS (pair, sx, sy, sxy, sxx, syy)""".stripMargin)
          .selectExpr("pair", "n", "sx", "sy", "sxy", corrExpr)
          .orderBy(col("pair"))
      },
      """WITH c AS (
        |  SELECT CAST(floor(l_quantity) AS BIGINT) - 25 AS q,
        |    CAST(floor(l_extendedprice) AS BIGINT) - 38000 AS p,
        |    CAST(floor(l_discount * 100) AS BIGINT) - 5 AS dd,
        |    CAST(floor(l_tax * 100) AS BIGINT) - 4 AS t
        |  FROM lineitem),
        |m AS (
        |  SELECT COUNT(*) AS n,
        |    CAST(SUM(q) AS BIGINT) AS s_q, CAST(SUM(p) AS BIGINT) AS s_p,
        |    CAST(SUM(dd) AS BIGINT) AS s_d, CAST(SUM(t) AS BIGINT) AS s_t,
        |    CAST(SUM(q * q) AS BIGINT) AS ss_q,
        |    CAST(SUM(p * p) AS BIGINT) AS ss_p,
        |    CAST(SUM(dd * dd) AS BIGINT) AS ss_d,
        |    CAST(SUM(t * t) AS BIGINT) AS ss_t,
        |    CAST(SUM(q * p) AS BIGINT) AS s_qp,
        |    CAST(SUM(q * dd) AS BIGINT) AS s_qd,
        |    CAST(SUM(q * t) AS BIGINT) AS s_qt,
        |    CAST(SUM(p * dd) AS BIGINT) AS s_pd,
        |    CAST(SUM(p * t) AS BIGINT) AS s_pt,
        |    CAST(SUM(dd * t) AS BIGINT) AS s_dt
        |  FROM c),
        |pairs AS (
        |  SELECT 'q:p' AS pair, n, s_q AS sx, s_p AS sy, s_qp AS sxy,
        |    ss_q AS sxx, ss_p AS syy FROM m
        |  UNION ALL SELECT 'q:d', n, s_q, s_d, s_qd, ss_q, ss_d FROM m
        |  UNION ALL SELECT 'q:t', n, s_q, s_t, s_qt, ss_q, ss_t FROM m
        |  UNION ALL SELECT 'p:d', n, s_p, s_d, s_pd, ss_p, ss_d FROM m
        |  UNION ALL SELECT 'p:t', n, s_p, s_t, s_pt, ss_p, ss_t FROM m
        |  UNION ALL SELECT 'd:t', n, s_d, s_t, s_dt, ss_d, ss_t FROM m)
        |SELECT pair, n, sx, sy, sxy,
        |  CAST(floor((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) -
        |       CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)) /
        |    sqrt((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) -
        |          CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) *
        |         (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE) -
        |          CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))) * 1000000)
        |    AS BIGINT) AS corr_x1e6
        |FROM pairs ORDER BY pair""".stripMargin),

    // A15 — ordered funnel conversion: per user, did view happen, did
    // a purchase follow STRICTLY AFTER the first view, and how long
    // did conversion take (first qualifying purchase − first view, in
    // whole seconds — integer cells, engine-exact). One shuffle on
    // user_id; both stage timestamps ride the same aggregation. The
    // classic product-analytics ask the reference's event store would
    // serve with two indexed scans.
    "a15_funnel_conversion" -> QueryDef(
      (s, d) => {
        val ev = T.events(s, d)
        val perUser = ev.groupBy(col("user_id")).agg(
          min(when(col("event_type") === "view", col("ts")))
            .as("first_view"),
          count(when(col("event_type") === "view", 1)).as("n_views"))
        val conv = ev.filter(col("event_type") === "purchase")
          .join(perUser, "user_id")
          .filter(col("ts") > col("first_view"))
          .groupBy(col("user_id"))
          .agg(min(col("ts")).as("first_conv"))
        perUser.join(conv, Seq("user_id"), "left")
          .agg(count(lit(1)).as("n_users"),
            sum(when(col("first_view").isNotNull, 1L).otherwise(0L))
              .as("n_viewed"),
            sum(when(col("first_conv").isNotNull, 1L).otherwise(0L))
              .as("n_converted"),
            sum(when(col("first_conv").isNotNull,
              unix_timestamp(col("first_conv")) -
                unix_timestamp(col("first_view"))).otherwise(0L))
              .as("total_conv_seconds"))
      },
      """WITH pu AS (
        |  SELECT user_id,
        |    MIN(CASE WHEN event_type = 'view' THEN ts END) AS first_view
        |  FROM events GROUP BY user_id),
        |conv AS (
        |  SELECT e.user_id, MIN(e.ts) AS first_conv
        |  FROM events e JOIN pu ON pu.user_id = e.user_id
        |  WHERE e.event_type = 'purchase' AND e.ts > pu.first_view
        |  GROUP BY e.user_id)
        |SELECT COUNT(*) AS n_users,
        |  CAST(SUM(CASE WHEN pu.first_view IS NOT NULL THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_viewed,
        |  CAST(SUM(CASE WHEN c.first_conv IS NOT NULL THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_converted,
        |  CAST(SUM(CASE WHEN c.first_conv IS NOT NULL
        |    THEN epoch_ms(c.first_conv) // 1000 - epoch_ms(pu.first_view) // 1000
        |    ELSE 0 END) AS BIGINT) AS total_conv_seconds
        |FROM pu LEFT JOIN conv c ON c.user_id = pu.user_id""".stripMargin),

    // Multi-step WINDOW FUNNEL (view → click → purchase, each step
    // within 1 h of the previous) with chained-earliest semantics:
    // step k's timestamp is the MIN occurrence after step k-1 inside
    // its window — deterministic, and each chaining step is one
    // user-keyed join + partial-agg min that rides the same hash
    // partitioning (no windows over the raw table, no per-user
    // sequence materialization). Census per reached depth on
    // SECOND-floored epochs: users and total first-to-last span.
    "a21_window_funnel" -> QueryDef(
      (s, d) => {
        val e = T.events(s, d).select(col("user_id"), col("event_type"),
          unix_timestamp(col("ts")).as("sec"))
        val s1 = e.filter(col("event_type") === "view")
          .groupBy(col("user_id")).agg(min(col("sec")).as("t1"))
        val s2 = e.filter(col("event_type") === "click")
          .join(s1, "user_id")
          .filter(col("sec") > col("t1") && col("sec") <= col("t1") + 86400)
          .groupBy(col("user_id")).agg(min(col("sec")).as("t2"))
        val s3 = e.filter(col("event_type") === "purchase")
          .join(s2, "user_id")
          .filter(col("sec") > col("t2") && col("sec") <= col("t2") + 86400)
          .groupBy(col("user_id")).agg(min(col("sec")).as("t3"))
        s1.join(s2, Seq("user_id"), "left").join(s3, Seq("user_id"), "left")
          .withColumn("depth",
            when(col("t3").isNotNull, 3)
              .when(col("t2").isNotNull, 2).otherwise(1))
          .groupBy(col("depth"))
          .agg(count(lit(1)).as("n_users"),
            sum(coalesce(col("t3"), col("t2"), col("t1")) - col("t1"))
              .as("span_seconds_sum"))
          .orderBy(col("depth"))
      },
      """WITH e AS (
        |  SELECT user_id, event_type, epoch_ms(ts) // 1000 AS sec
        |  FROM events),
        |s1 AS (
        |  SELECT user_id, MIN(sec) AS t1 FROM e
        |  WHERE event_type = 'view' GROUP BY 1),
        |s2 AS (
        |  SELECT e.user_id, MIN(sec) AS t2 FROM e JOIN s1 USING (user_id)
        |  WHERE event_type = 'click' AND sec > t1 AND sec <= t1 + 86400
        |  GROUP BY 1),
        |s3 AS (
        |  SELECT e.user_id, MIN(sec) AS t3 FROM e JOIN s2 USING (user_id)
        |  WHERE event_type = 'purchase' AND sec > t2 AND sec <= t2 + 86400
        |  GROUP BY 1),
        |f AS (
        |  SELECT s1.user_id, t1, t2, t3,
        |    CASE WHEN t3 IS NOT NULL THEN 3
        |         WHEN t2 IS NOT NULL THEN 2 ELSE 1 END AS depth
        |  FROM s1 LEFT JOIN s2 USING (user_id) LEFT JOIN s3 USING (user_id))
        |SELECT depth, COUNT(*) AS n_users,
        |  CAST(SUM(COALESCE(t3, t2, t1) - t1) AS BIGINT)
        |    AS span_seconds_sum
        |FROM f GROUP BY 1 ORDER BY 1""".stripMargin),

    // k-anonymity census over quasi-identifiers (event_type,
    // hour-of-day, value band) — the privacy pre-screen a training
    // corpus needs before release. All derivations are pure integer
    // arithmetic ((sec div 3600) % 24; floor(value/100) is IEEE-exact
    // in both engines). Per event_type: equivalence classes, risky
    // classes (size < k=5), and the row mass needing suppression —
    // one partial-agg shuffle on the QI tuple, then a tiny rollup.
    "qa_k_anonymity" -> QueryDef(
      (s, d) => {
        val k = 5
        val classes = T.events(s, d)
          .select(col("event_type"),
            expr("(unix_timestamp(ts) div 3600) % 24").as("hour_of_day"),
            expr("CAST(floor(value / 100.0) AS BIGINT)").as("value_band"))
          .groupBy(col("event_type"), col("hour_of_day"), col("value_band"))
          .agg(count(lit(1)).as("n"))
        classes.groupBy(col("event_type"))
          .agg(count(lit(1)).as("n_classes"),
            sum(when(col("n") < k, 1L).otherwise(0L)).as("n_risky_classes"),
            sum(when(col("n") < k, col("n")).otherwise(0L))
              .as("n_risky_rows"),
            sum(col("n")).as("n_rows"))
          .orderBy(col("event_type"))
      },
      """WITH c AS (
        |  SELECT event_type,
        |    (epoch_ms(ts) // 1000 // 3600) % 24 AS hour_of_day,
        |    CAST(FLOOR(value / 100.0) AS BIGINT) AS value_band,
        |    COUNT(*) AS n
        |  FROM events GROUP BY 1, 2, 3)
        |SELECT event_type, COUNT(*) AS n_classes,
        |  CAST(SUM(CASE WHEN n < 5 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_risky_classes,
        |  CAST(SUM(CASE WHEN n < 5 THEN n ELSE 0 END) AS BIGINT)
        |    AS n_risky_rows,
        |  CAST(SUM(n) AS BIGINT) AS n_rows
        |FROM c GROUP BY 1 ORDER BY 1""".stripMargin),

    // Distribution-drift census between two corpus snapshots — the
    // domain-shift pre-screen a training pipeline runs before mixing
    // a new crawl into the corpus: value distributions (64-bin
    // histogram SKETCH — bounded state, so the comparison never
    // rescans either snapshot at 100 TB) for the earliest vs latest
    // month, compared bin-by-bin with the 2×k contingency chi-square.
    // Snapshots derive from the data — the time range splits at its
    // midpoint day ((d_lo + d_hi + 1) div 2, pure integers), sf-proof
    // with no pinned literals and non-degenerate whenever the data
    // spans two days; every compared cell is integral: the
    // per-bin cross term n1·N2 − n2·N1 is exact BIGINT, and the
    // per-bin chi-square contribution uses only IEEE exactly-rounded
    // double ops on sub-2^53 integers before one floor (the
    // a23_corr_matrix discipline). Total drift = SUM of the integral
    // contributions — order-independent by construction.
    "qa_dist_drift" -> QueryDef(
      (s, d) => {
        val ev = T.events(s, d)
          .select(expr("unix_millis(ts) div 86400000").as("day"),
            col("value"))
        val mm = ev.agg(min(col("day")).as("d_lo"), max(col("day")).as("d_hi"))
        val slice = ev.crossJoin(broadcast(mm))
          .select(when(col("day") < expr("(d_lo + d_hi + 1) div 2"),
            lit(1)).otherwise(lit(2)).as("snap"),
            least(lit(63), greatest(lit(0),
              floor(col("value") / lit(10.0)).cast("int"))).as("bin"))
        val hist = slice.groupBy(col("bin"))
          .agg(sum(when(col("snap") === 1, 1L).otherwise(0L)).as("n1"),
            sum(when(col("snap") === 2, 1L).otherwise(0L)).as("n2"))
        val tot = hist.agg(sum(col("n1")).as("t1"), sum(col("n2")).as("t2"))
        hist.crossJoin(broadcast(tot))
          .select(col("bin"), col("n1"), col("n2"),
            (col("n1") * col("t2") - col("n2") * col("t1")).as("cross_term"),
            floor((col("n1") * col("t2") - col("n2") * col("t1"))
                .cast("double") *
              (col("n1") * col("t2") - col("n2") * col("t1"))
                .cast("double") /
              (col("t1").cast("double") * col("t2").cast("double") *
                (col("n1") + col("n2")).cast("double")) * 1e6)
              .cast("long").as("chi2_x1e6"))
          .orderBy(col("bin"))
      },
      """WITH e AS (
        |  SELECT epoch_ms(ts) // 86400000 AS day, value FROM events),
        |mm AS (SELECT MIN(day) AS d_lo, MAX(day) AS d_hi FROM e),
        |s AS (
        |  SELECT CASE WHEN e.day < (mm.d_lo + mm.d_hi + 1) // 2
        |         THEN 1 ELSE 2 END AS snap,
        |    LEAST(63, GREATEST(0, CAST(FLOOR(value / 10.0) AS INT))) AS bin
        |  FROM e, mm),
        |hist AS (
        |  SELECT bin,
        |    CAST(SUM(CASE WHEN snap = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n1,
        |    CAST(SUM(CASE WHEN snap = 2 THEN 1 ELSE 0 END) AS BIGINT) AS n2
        |  FROM s GROUP BY 1),
        |tot AS (
        |  SELECT CAST(SUM(n1) AS BIGINT) AS t1, CAST(SUM(n2) AS BIGINT) AS t2
        |  FROM hist)
        |SELECT bin, n1, n2,
        |  n1 * t2 - n2 * t1 AS cross_term,
        |  CAST(FLOOR(CAST(n1 * t2 - n2 * t1 AS DOUBLE) *
        |    CAST(n1 * t2 - n2 * t1 AS DOUBLE) /
        |    (CAST(t1 AS DOUBLE) * CAST(t2 AS DOUBLE) *
        |     CAST(n1 + n2 AS DOUBLE)) * 1e6) AS BIGINT) AS chi2_x1e6
        |FROM hist, tot ORDER BY bin""".stripMargin),

    // Rolling 7-day distinct users per day (the MAU/WAU family) via
    // per-day HLL registers + windowed register max
    // (Sketches.hllRollingEstimateBy): rolling DISTINCT does not
    // decompose, but register MAX does — the per-day sketch table is
    // stored once and any trailing window derives from it with a ×7
    // fan-out over days×256 sketch rows, never a rescan of events.
    // Exact 7-day distinct joined alongside as the witness (its ×7
    // explode over distinct (day,user) pairs is the cost the sketch
    // path exists to avoid at 100 TB).
    "ev_rolling_mau" -> QueryDef(
      (s, d) => {
        val ev = T.events(s, d)
          .select(expr("unix_millis(ts) div 86400000").as("day"),
            col("user_id"))
        val days = ev.select(col("day")).distinct()
        val regs = Sketches.hllRegistersBy(ev,
          col("user_id").cast("string"), Seq("day"), p = 8)
        val exact = ev.distinct()
          .select(col("user_id"),
            explode(sequence(col("day"), col("day") + 6)).as("tday"))
          .join(broadcast(days.select(col("day").as("tday"))), "tday")
          .groupBy(col("tday"))
          .agg(countDistinct(col("user_id")).as("n_exact_7d"))
          .withColumnRenamed("tday", "day")
        Sketches.hllRollingEstimateBy(regs, days, windowDays = 7, p = 8)
          .join(exact, "day")
          .orderBy(col("day"))
      },
      s"""WITH e AS (
        |  SELECT epoch_ms(ts) // 86400000 AS day, user_id FROM events),
        |days AS (SELECT DISTINCT day FROM e),
        |h AS (
        |  SELECT day,
        |    CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15))
        |      AS BIGINT) AS h
        |  FROM e),
        |reg AS (
        |  SELECT day, h & 255 AS bucket,
        |    MAX(CASE WHEN (h >> 8) = 0 THEN 53
        |             ELSE 53 - length(bin(h >> 8)) END) AS rho
        |  FROM h GROUP BY 1, 2),
        |rolled AS (
        |  SELECT r.day + t.o AS day, r.bucket, MAX(r.rho) AS rho
        |  FROM reg r CROSS JOIN range(0, 7) AS t(o)
        |  JOIN days dd ON dd.day = r.day + t.o
        |  GROUP BY 1, 2),
        |agg AS (
        |  SELECT day, COUNT(*) AS n_buckets,
        |    SUM(CAST(1 AS BIGINT) << (53 - rho)) AS present_sum
        |  FROM rolled GROUP BY 1),
        |s AS (
        |  SELECT day, n_buckets,
        |    present_sum + (256 - n_buckets) * CAST(9007199254740992 AS BIGINT)
        |      AS sum_int
        |  FROM agg),
        |ex AS (
        |  SELECT du.day + t.o AS day,
        |    COUNT(DISTINCT du.user_id) AS n_exact_7d
        |  FROM (SELECT DISTINCT day, user_id FROM e) du
        |  CROSS JOIN range(0, 7) AS t(o)
        |  JOIN days dd ON dd.day = du.day + t.o
        |  GROUP BY 1),
        |e2 AS (
        |  SELECT day, n_buckets, 256 - n_buckets AS zeros,
        |    CAST(${Sketches.estConstant(8)} // sum_int AS BIGINT)
        |      AS raw_x100
        |  FROM s)
        |SELECT e2.day, CAST(e2.n_buckets AS BIGINT) AS n_buckets,
        |  CASE WHEN e2.raw_x100 <= 64000 AND e2.zeros > 0
        |       THEN CAST(list_extract(${Sketches.linearTableSql(256)},
        |                 CAST(e2.zeros AS INT)) AS BIGINT)
        |       ELSE e2.raw_x100 END AS hll_estimate_x100,
        |  ex.n_exact_7d
        |FROM e2 JOIN ex USING (day)
        |ORDER BY e2.day""".stripMargin),

    // A13 grouped — per-event-type HLL distinct event_ids, the
    // operational distinct-per-segment form: (group, bucket) registers
    // then the per-group integer-exact estimate; exact distinct joined
    // alongside per group.
    "a13_hll_grouped" -> QueryDef(
      (s, d) => {
        val ev = T.events(s, d)
        Sketches.hllEstimateBy(ev, col("event_id").cast("string"),
            Seq("event_type"), p = 8)
          .join(ev.groupBy(col("event_type"))
            .agg(countDistinct(col("event_id")).as("n_exact")), "event_type")
          .orderBy(col("event_type"))
      },
      s"""WITH h AS (
        |  SELECT event_type,
        |    CAST(('0x' || substr(md5(CAST(event_id AS VARCHAR)), 1, 15))
        |      AS BIGINT) AS h
        |  FROM events),
        |reg AS (
        |  SELECT event_type, h & 255 AS bucket,
        |    MAX(CASE WHEN (h >> 8) = 0 THEN 53
        |             ELSE 53 - length(bin(h >> 8)) END) AS rho
        |  FROM h GROUP BY 1, 2),
        |agg AS (
        |  SELECT event_type, COUNT(*) AS n_buckets,
        |    SUM(CAST(1 AS BIGINT) << (53 - rho)) AS present_sum
        |  FROM reg GROUP BY 1),
        |s AS (
        |  SELECT event_type, n_buckets,
        |    present_sum + (256 - n_buckets) * CAST(9007199254740992 AS BIGINT)
        |      AS sum_int
        |  FROM agg),
        |ex AS (
        |  SELECT event_type, COUNT(DISTINCT event_id) AS n_exact
        |  FROM events GROUP BY 1)
        |SELECT s.event_type, s.n_buckets,
        |  CAST(${Sketches.estConstant(8)} // sum_int AS BIGINT)
        |    AS hll_estimate_x100,
        |  ex.n_exact
        |FROM s JOIN ex ON ex.event_type = s.event_type
        |ORDER BY s.event_type""".stripMargin),

    // A17 — pivot reshape (long → wide): days × event types as a
    // crosstab, the report-facing reshape every analytics surface
    // needs. Pivot values are PINNED literals, so Spark plans one
    // pass (no distinct-discovery job) and the output schema is
    // static; absent combinations are 0, not null, in both engines.
    // Under the hood this is one partial-agg shuffle — the same cost
    // as the long groupBy, just a different output shape.
    "a17_pivot" -> QueryDef(
      (s, d) => T.events(s, d)
        .withColumn("m", date_format(col("ts"), "yyyy-MM-dd"))
        .groupBy(col("m"))
        .pivot("event_type", Seq("click", "error", "purchase", "signup", "view"))
        .agg(count(lit(1)))
        .na.fill(0L)
        .orderBy(col("m")),
      """SELECT strftime(ts, '%Y-%m-%d') AS m,
        |  COUNT(CASE WHEN event_type = 'click' THEN 1 END) AS click,
        |  COUNT(CASE WHEN event_type = 'error' THEN 1 END) AS error,
        |  COUNT(CASE WHEN event_type = 'purchase' THEN 1 END) AS purchase,
        |  COUNT(CASE WHEN event_type = 'signup' THEN 1 END) AS signup,
        |  COUNT(CASE WHEN event_type = 'view' THEN 1 END) AS view
        |FROM events GROUP BY 1 ORDER BY m""".stripMargin),

    // OLAP cube: all four grouping sets of (priority, status) in one
    // pass — Spark's Expand operator computes every set in a single
    // shuffle (vs 4 scans if unioned by hand). Subtotal NULLs are
    // folded to 'ALL' (base columns are non-null) so the sort order is
    // engine-independent, and grouping_id disambiguates levels.
    "a18_cube" -> QueryDef(
      (s, d) => T.orders(s, d)
        .cube(col("o_orderpriority"), col("o_orderstatus"))
        .agg(count(lit(1)).as("n"),
          T.decSum(col("o_totalprice")).as("revenue"),
          grouping_id().as("gid"))
        .select(
          coalesce(col("o_orderpriority"), lit("ALL")).as("priority"),
          coalesce(col("o_orderstatus"), lit("ALL")).as("status"),
          col("gid"), col("n"), col("revenue"))
        .orderBy(col("gid"), col("priority"), col("status")),
      """SELECT COALESCE(o_orderpriority, 'ALL') AS priority,
        |  COALESCE(o_orderstatus, 'ALL') AS status,
        |  CAST(GROUPING(o_orderpriority, o_orderstatus) AS BIGINT) AS gid,
        |  COUNT(*) AS n,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE)
        |    AS revenue
        |FROM orders
        |GROUP BY CUBE (o_orderpriority, o_orderstatus)
        |ORDER BY gid, priority, status""".stripMargin),

    // §2.5 depth — TIME-RANGE rolling window (RANGE frame on epoch
    // seconds, not a row count): per user, events and integer-cents
    // value volume in the trailing 24 h at every event. The frame is
    // value-based so ties and gaps behave identically in both engines
    // (RANGE includes all peers); one hash shuffle on the key, both
    // aggregates ride one sort. Integer cells only — a windowed SUM of
    // raw doubles would be accumulation-order-sensitive (Tables.decSum
    // scaladoc), so value rides as floor(value·100) cents.
    "w_time_window" -> QueryDef(
      (s, d) => {
        val w = Window.partitionBy(col("user_id"))
          .orderBy(col("sec"))
          .rangeBetween(-86399L, 0L)
        T.events(s, d)
          .filter(col("user_id") < 20)
          .select(col("event_id"), col("user_id"),
            unix_timestamp(col("ts")).as("sec"),
            floor(col("value") * 100).cast("long").as("cents"))
          .select(col("event_id"), col("user_id"),
            count(lit(1)).over(w).as("n_24h"),
            sum(col("cents")).over(w).as("cents_24h"))
          .orderBy(col("event_id"))
      },
      """WITH e AS (
        |  SELECT event_id, user_id, epoch_ms(ts) // 1000 AS sec,
        |    CAST(FLOOR(value * 100) AS BIGINT) AS cents
        |  FROM events WHERE user_id < 20)
        |SELECT event_id, user_id,
        |  COUNT(*) OVER w AS n_24h,
        |  CAST(SUM(cents) OVER w AS BIGINT) AS cents_24h
        |FROM e
        |WINDOW w AS (PARTITION BY user_id ORDER BY sec
        |  RANGE BETWEEN 86399 PRECEDING AND CURRENT ROW)
        |ORDER BY event_id""".stripMargin),

    // A16 — replayable histogram quantile sketch (operators.Sketches):
    // 64 equi-width bins over events.value, then p50/p90/p99 as the
    // first bin whose cumulative count reaches ceil(q·n/1000) — upper
    // bin edge reported, error bounded by one bin width. State is 64
    // integer cells whatever the input size, counts ADD across shards
    // (the SUM-mergeable sketch beside HLL's max), and every compared
    // cell is integer rank arithmetic both engines replay exactly.
    // The exact-percentile row ta_length_quantiles stays the precise
    // path; this is the bounded-state path for streams/shards.
    "a16_hist_quantiles" -> QueryDef(
      (s, d) => {
        val hist = Sketches.histogramCounts(T.events(s, d), col("value"),
          lo = 0.0, width = 10.0, nBins = 64)
        Sketches.histogramQuantiles(hist, Seq(500, 900, 990),
          loX100 = 0L, widthX100 = 1000L)
      },
      """WITH h AS (
        |  SELECT LEAST(63, GREATEST(0, CAST(FLOOR(value / 10.0) AS INT)))
        |    AS bin
        |  FROM events),
        |hist AS (SELECT bin, COUNT(*) AS cnt FROM h GROUP BY bin),
        |nn AS (SELECT CAST(SUM(cnt) AS BIGINT) AS n FROM hist),
        |c AS (
        |  SELECT bin, CAST(SUM(cnt) OVER (ORDER BY bin) AS BIGINT) AS cum
        |  FROM hist),
        |q(q_x1000) AS (VALUES (500), (900), (990)),
        |t AS (
        |  SELECT q_x1000, nn.n,
        |    CAST((q_x1000 * nn.n + 999) // 1000 AS BIGINT) AS target_rank
        |  FROM q, nn)
        |SELECT t.q_x1000, t.n, t.target_rank, MIN(c.bin) AS bin,
        |  CAST((MIN(c.bin) + 1) * 1000 AS BIGINT) AS est_hi_x100
        |FROM t JOIN c ON c.cum >= t.target_rank
        |GROUP BY 1, 2, 3 ORDER BY t.q_x1000""".stripMargin),

    // A16 mergeability — the histogram sketch's shard story, mirroring
    // a13_hll_merge: bin counts computed independently per month (the
    // storable per-shard table) SUM-merge into EXACTLY the direct
    // whole-corpus histogram — counts are the additive monoid, so
    // merge == direct is an identity, and the row makes it VISIBLE
    // per bin (any divergence flips a cell). At 100 TB quantiles over
    // any month range come from summing tiny stored count tables,
    // never a rescan.
    "a16_hist_merge" -> QueryDef(
      (s, d) => {
        val ev = T.events(s, d)
        val perMonth = Sketches.histogramCountsBy(
          ev.withColumn("m", date_format(col("ts"), "yyyy-MM")),
          col("value"), Seq("m"), lo = 0.0, width = 10.0, nBins = 64)
        val merged = perMonth.groupBy(col("bin"))
          .agg(sum(col("cnt")).as("merged_cnt"))
        val direct = Sketches.histogramCounts(ev, col("value"),
            lo = 0.0, width = 10.0, nBins = 64)
          .withColumnRenamed("cnt", "direct_cnt")
        merged.join(direct, "bin").orderBy(col("bin"))
      },
      """WITH b AS (
        |  SELECT strftime(ts, '%Y-%m') AS m,
        |    LEAST(63, GREATEST(0, CAST(FLOOR(value / 10.0) AS INT))) AS bin
        |  FROM events),
        |permonth AS (
        |  SELECT m, bin, COUNT(*) AS cnt FROM b GROUP BY 1, 2),
        |merged AS (
        |  SELECT bin, CAST(SUM(cnt) AS BIGINT) AS merged_cnt
        |  FROM permonth GROUP BY 1),
        |direct AS (
        |  SELECT bin, COUNT(*) AS direct_cnt FROM b GROUP BY 1)
        |SELECT merged.bin, merged.merged_cnt, direct.direct_cnt
        |FROM merged JOIN direct ON direct.bin = merged.bin
        |ORDER BY merged.bin""".stripMargin),

    // A24 — winsorized robust stats per group, the sketch-bounded
    // outlier-clipping pass a metrics pipeline runs before averaging
    // heavy-tailed values: per-group p1/p99 bounds come from the
    // 64-bin histogram SKETCH (groups × 64 cells of state — rank
    // arithmetic over the sketch frame, never a per-group sort), then
    // one clip-and-aggregate pass with the bounds broadcast. Every
    // compared cell is integral: bounds are bin edges ×100, clipped
    // values floor to cents, the winsorized mean is integral
    // division. Two scans total at any scale; the clip never
    // shuffles (the census groupBy reuses the partial-agg shape).
    "a24_winsorized_stats" -> QueryDef(
      (s, d) => {
        val ev = T.events(s, d)
        val hist = Sketches.histogramCountsBy(ev, col("value"),
          Seq("event_type"), lo = 0.0, width = 10.0, nBins = 64)
        val wcum = Window.partitionBy(col("event_type")).orderBy(col("bin"))
        val wall = Window.partitionBy(col("event_type"))
        val c = hist
          .withColumn("cum", sum(col("cnt")).over(wcum))
          .withColumn("n", sum(col("cnt")).over(wall))
        val bounds = c.groupBy(col("event_type")).agg(
            min(when(col("cum") >= expr("(n + 99) div 100"), col("bin")))
              .as("lo_bin"),
            min(when(col("cum") >= expr("(99 * n + 99) div 100"), col("bin")))
              .as("hi_bin"))
          .select(col("event_type"),
            (col("lo_bin").cast("long") * 1000).as("lo_x100"),
            ((col("hi_bin").cast("long") + 1) * 1000).as("hi_x100"))
        ev.select(col("event_type"),
            floor(col("value") * 100).cast("long").as("v_x100"))
          .join(broadcast(bounds), "event_type")
          .groupBy(col("event_type"))
          .agg(count(lit(1)).as("n"),
            max(col("lo_x100")).as("lo_x100"),
            max(col("hi_x100")).as("hi_x100"),
            sum(when(col("v_x100") < col("lo_x100"), 1L).otherwise(0L))
              .as("n_clipped_lo"),
            sum(when(col("v_x100") > col("hi_x100"), 1L).otherwise(0L))
              .as("n_clipped_hi"),
            sum(least(col("hi_x100"), greatest(col("lo_x100"),
              col("v_x100")))).as("s_wins"))
          .selectExpr("event_type", "n", "lo_x100", "hi_x100",
            "n_clipped_lo", "n_clipped_hi",
            "s_wins div n AS wins_mean_x100")
          .orderBy(col("event_type"))
      },
      """WITH b AS (
        |  SELECT event_type,
        |    LEAST(63, GREATEST(0, CAST(FLOOR(value / 10.0) AS INT))) AS bin
        |  FROM events),
        |hist AS (
        |  SELECT event_type, bin, COUNT(*) AS cnt FROM b GROUP BY 1, 2),
        |c AS (
        |  SELECT event_type, bin, cnt,
        |    SUM(cnt) OVER (PARTITION BY event_type ORDER BY bin) AS cum,
        |    SUM(cnt) OVER (PARTITION BY event_type) AS n
        |  FROM hist),
        |bounds AS (
        |  SELECT event_type,
        |    CAST(MIN(CASE WHEN cum >= (n + 99) // 100 THEN bin END)
        |      AS BIGINT) * 1000 AS lo_x100,
        |    (CAST(MIN(CASE WHEN cum >= (99 * n + 99) // 100 THEN bin END)
        |      AS BIGINT) + 1) * 1000 AS hi_x100
        |  FROM c GROUP BY 1),
        |v AS (
        |  SELECT e.event_type,
        |    CAST(FLOOR(e.value * 100) AS BIGINT) AS v_x100,
        |    bo.lo_x100, bo.hi_x100
        |  FROM events e JOIN bounds bo ON bo.event_type = e.event_type)
        |SELECT event_type, COUNT(*) AS n,
        |  MAX(lo_x100) AS lo_x100, MAX(hi_x100) AS hi_x100,
        |  CAST(SUM(CASE WHEN v_x100 < lo_x100 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_clipped_lo,
        |  CAST(SUM(CASE WHEN v_x100 > hi_x100 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_clipped_hi,
        |  CAST(SUM(LEAST(hi_x100, GREATEST(lo_x100, v_x100))) AS BIGINT) //
        |    COUNT(*) AS wins_mean_x100
        |FROM v GROUP BY event_type ORDER BY event_type""".stripMargin),

    // A14 — replayable count-min frequency sketch (operators.Sketches):
    // d=4 salted hash rows × w=64 buckets over ~250 (user, event_type)
    // keys — w deliberately small so collisions happen and the
    // OVERESTIMATE-ONLY guarantee is exercised, not just stated. The
    // summary pins: zero undercounts (the CMS invariant), how many
    // keys collided into overestimates, the worst overestimate, and
    // the exact/estimated totals — every cell integer, every hash
    // md5-replayable, so DuckDB rebuilds the identical sketch.
    "a14_cms_frequency" -> QueryDef(
      (s, d) => {
        val ev = T.events(s, d)
        val key = concat(col("user_id").cast("string"), lit(":"),
          col("event_type"))
        val cms = Sketches.cmsCounts(ev, key, d = 4, w = 64)
        val exact = ev.groupBy(key.as("key")).agg(count(lit(1)).as("exact"))
        val est = Sketches.cmsEstimate(cms, exact.select(col("key")),
          col("key"), d = 4, w = 64)
        exact.join(est, "key")
          .agg(count(lit(1)).as("n_keys"),
            sum(when(col("est") > col("exact"), 1L).otherwise(0L))
              .as("n_overestimated"),
            sum(when(col("est") < col("exact"), 1L).otherwise(0L))
              .as("n_undercount"),
            max(col("est") - col("exact")).as("max_overestimate"),
            sum(col("exact")).as("sum_exact"),
            sum(col("est")).as("sum_est"))
      },
      """WITH k AS (
        |  SELECT CAST(user_id AS VARCHAR) || ':' || event_type AS key
        |  FROM events),
        |exact AS (SELECT key, COUNT(*) AS exact FROM k GROUP BY key),
        |cells AS (
        |  SELECT r.i AS row,
        |    CAST(('0x' || substr(md5('s' || r.i || '|' || key), 1, 15))
        |      AS BIGINT) & 63 AS bucket,
        |    COUNT(*) AS cnt
        |  FROM k, range(0, 4) r(i)
        |  GROUP BY 1, 2),
        |probe AS (
        |  SELECT e.key, r.i AS row,
        |    CAST(('0x' || substr(md5('s' || r.i || '|' || e.key), 1, 15))
        |      AS BIGINT) & 63 AS bucket
        |  FROM exact e, range(0, 4) r(i)),
        |est AS (
        |  SELECT p.key, MIN(COALESCE(c.cnt, 0)) AS est
        |  FROM probe p LEFT JOIN cells c
        |    ON c.row = p.row AND c.bucket = p.bucket
        |  GROUP BY p.key)
        |SELECT COUNT(*) AS n_keys,
        |  CAST(SUM(CASE WHEN est > exact THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_overestimated,
        |  CAST(SUM(CASE WHEN est < exact THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_undercount,
        |  CAST(MAX(est - exact) AS BIGINT) AS max_overestimate,
        |  CAST(SUM(exact) AS BIGINT) AS sum_exact,
        |  CAST(SUM(est) AS BIGINT) AS sum_est
        |FROM exact JOIN est USING (key)""".stripMargin),

    // A14 mergeability — the CMS shard story: cells counted
    // independently per month SUM-merge into exactly the direct
    // sketch (cell counts are additive, like the histogram's bins and
    // unlike HLL's max). The census compares merged vs direct per
    // hash row with a bucket-weighted checksum, so a single misplaced
    // cell — not just a wrong total — turns the row red. The 100 TB
    // shape: store d·w-cell sketches per shard/day, answer frequency
    // queries over any shard subset by summing sketches.
    "a14_cms_merge" -> QueryDef(
      (s, d) => {
        val ev = T.events(s, d)
        val key = concat(col("user_id").cast("string"), lit(":"),
          col("event_type"))
        val perMonth = Sketches.cmsCountsBy(
          ev.withColumn("m", date_format(col("ts"), "yyyy-MM")),
          concat(col("user_id").cast("string"), lit(":"), col("event_type")),
          Seq("m"), d = 4, w = 64)
        val merged = perMonth.groupBy(col("row"), col("bucket"))
          .agg(sum(col("cnt")).as("cnt"))
        val direct = Sketches.cmsCounts(ev, key, d = 4, w = 64)
        def census(cms: org.apache.spark.sql.DataFrame, pfx: String) =
          cms.groupBy(col("row")).agg(
            count(lit(1)).as(s"${pfx}_buckets"),
            sum(col("cnt")).as(s"${pfx}_total"),
            sum(col("bucket") * col("cnt")).as(s"${pfx}_checksum"))
        census(merged, "merged").join(census(direct, "direct"), "row")
          .orderBy(col("row"))
      },
      """WITH k AS (
        |  SELECT strftime(ts, '%Y-%m') AS m,
        |    CAST(user_id AS VARCHAR) || ':' || event_type AS key
        |  FROM events),
        |cells AS (
        |  SELECT m, r.i AS row,
        |    CAST(('0x' || substr(md5('s' || r.i || '|' || key), 1, 15))
        |      AS BIGINT) & 63 AS bucket,
        |    COUNT(*) AS cnt
        |  FROM k, range(0, 4) r(i)
        |  GROUP BY 1, 2, 3),
        |merged AS (
        |  SELECT row, bucket, CAST(SUM(cnt) AS BIGINT) AS cnt
        |  FROM cells GROUP BY 1, 2),
        |direct AS (
        |  SELECT r.i AS row,
        |    CAST(('0x' || substr(md5('s' || r.i || '|' || key), 1, 15))
        |      AS BIGINT) & 63 AS bucket,
        |    COUNT(*) AS cnt
        |  FROM k, range(0, 4) r(i)
        |  GROUP BY 1, 2),
        |mc AS (
        |  SELECT row, COUNT(*) AS merged_buckets,
        |    CAST(SUM(cnt) AS BIGINT) AS merged_total,
        |    CAST(SUM(bucket * cnt) AS BIGINT) AS merged_checksum
        |  FROM merged GROUP BY 1),
        |dc AS (
        |  SELECT row, COUNT(*) AS direct_buckets,
        |    CAST(SUM(cnt) AS BIGINT) AS direct_total,
        |    CAST(SUM(bucket * cnt) AS BIGINT) AS direct_checksum
        |  FROM direct GROUP BY 1)
        |SELECT mc.row, mc.merged_buckets, mc.merged_total,
        |  mc.merged_checksum, dc.direct_buckets, dc.direct_total,
        |  dc.direct_checksum
        |FROM mc JOIN dc ON dc.row = mc.row
        |ORDER BY mc.row""".stripMargin),

    // Two-pass heavy hitters: pass 1 builds the CMS (d·w bounded
    // cells); the sketch is then embedded as a LITERAL table in the
    // fact scan (Sketches.cmsEstimateLit — the Bloom-bitmap pattern
    // applied to frequency), so pass 2's exact-count shuffle sees ONLY
    // rows whose estimated frequency clears the threshold. CMS never
    // undercounts, so every true heavy key reaches the exact pass;
    // false positives are removed there by the exact filter. At 100 TB
    // this replaces a full-keyspace groupBy (billions of reducer
    // groups) with a scan-side filter + a shuffle bounded by the
    // candidate mass. The census compares candidates vs confirmed, so
    // the filter's selectivity and the overestimate survival are both
    // pinned.
    "a22_heavy_hitters" -> QueryDef(
      (s, d) => {
        val ev = T.events(s, d)
        val key = col("user_id").cast("string")
        val cms = Sketches.cmsCounts(ev, key, d = 4, w = 256)
        val tbl = Sketches.cmsTable(cms, 4, 256)
        val est = Sketches.cmsEstimateLit(tbl, key, 4, 256)
        val exact = ev.filter(est >= 80)
          .groupBy(key.as("key"))
          .agg(count(lit(1)).as("exact"), max(est).as("est"))
        val nCand = exact.agg(count(lit(1)).as("n_candidates"))
        exact.filter(col("exact") >= 80)
          .crossJoin(broadcast(nCand))
          .select(col("key"), col("exact"), col("est"),
            col("n_candidates"))
          .orderBy(col("exact").desc, col("key"))
      },
      """WITH k AS (
        |  SELECT CAST(user_id AS VARCHAR) AS key FROM events),
        |cells AS (
        |  SELECT r.i AS row,
        |    CAST(('0x' || substr(md5('s' || r.i || '|' || key), 1, 15))
        |      AS BIGINT) & 255 AS bucket,
        |    COUNT(*) AS cnt
        |  FROM k, range(0, 4) r(i) GROUP BY 1, 2),
        |est AS (
        |  SELECT k2.key, MIN(COALESCE(c.cnt, 0)) AS est
        |  FROM (SELECT DISTINCT key FROM k) k2
        |  CROSS JOIN range(0, 4) r(i)
        |  LEFT JOIN cells c ON c.row = r.i AND c.bucket =
        |    CAST(('0x' || substr(md5('s' || r.i || '|' || k2.key), 1, 15))
        |      AS BIGINT) & 255
        |  GROUP BY 1),
        |exact AS (SELECT key, COUNT(*) AS exact FROM k GROUP BY 1),
        |cand AS (
        |  SELECT e.key, e.exact, s.est
        |  FROM exact e JOIN est s USING (key) WHERE s.est >= 80),
        |nc AS (SELECT COUNT(*) AS n_candidates FROM cand)
        |SELECT c.key, c.exact, CAST(c.est AS BIGINT) AS est,
        |  nc.n_candidates
        |FROM cand c, nc WHERE c.exact >= 80
        |ORDER BY c.exact DESC, c.key""".stripMargin),

    // SURVEY §2.4 A12: smoothed success-rate ranking.
    "a12_smoothed_ranking" -> QueryDef(
      (s, d) => T.events(s, d)
        .groupBy(col("user_id"))
        .agg(
          sum(when(col("event_type") === "purchase", 1L).otherwise(0L)).as("n_success"),
          sum(when(col("event_type") === "error", 1L).otherwise(0L)).as("n_failure"))
        .withColumn("rate",
          col("n_success").cast("double") / (col("n_success") + col("n_failure") + lit(1L)))
        .orderBy(col("rate").desc, col("n_success").desc, col("user_id"))
        .limit(20),
      """WITH s AS (
        |  SELECT user_id,
        |    CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS n_success,
        |    CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS n_failure
        |  FROM events GROUP BY user_id)
        |SELECT user_id, n_success, n_failure,
        |  CAST(n_success AS DOUBLE) / (n_success + n_failure + 1) AS rate
        |FROM s ORDER BY rate DESC, n_success DESC, user_id LIMIT 20""".stripMargin),

    // As-of join — for every purchase, the latest view of the same
    // user at or before it (TemporalJoins.asofJoin: a running window,
    // not a join — one shuffle on user_id regardless of key skew).
    // The view side pre-aggregates to one row per (user, ts) with a
    // deterministic max-event_id winner, satisfying the uniqueness
    // contract in both engines. Oracle: DuckDB's native ASOF LEFT
    // JOIN over the same deduped side — an independent implementation
    // of the semantics, not a replay of the window trick.
    "j_asof_latest_view" -> QueryDef(
      (s, d) => {
        val ev = T.events(s, d)
        val purchases = ev.filter(col("event_type") === "purchase")
          .select(col("user_id"), col("event_id"), col("ts"))
        val views = ev.filter(col("event_type") === "view")
          .groupBy(col("user_id"), col("ts"))
          .agg(max(col("event_id")).as("view_event_id"))
          .withColumn("view_ts", col("ts"))
        TemporalJoins.asofJoin(purchases, views, Seq("user_id"), "ts",
            Seq("view_event_id", "view_ts"))
          .select(col("event_id"), col("user_id"), col("view_event_id"),
            (unix_timestamp(col("ts")) - unix_timestamp(col("view_ts")))
              .as("gap_seconds"))
          .orderBy(col("event_id"))
      },
      """WITH v AS (
        |  SELECT user_id, ts, MAX(event_id) AS view_event_id
        |  FROM events WHERE event_type = 'view' GROUP BY user_id, ts),
        |p AS (
        |  SELECT user_id, event_id, ts FROM events
        |  WHERE event_type = 'purchase')
        |SELECT p.event_id, p.user_id, v.view_event_id,
        |  epoch_ms(p.ts) // 1000 - epoch_ms(v.ts) // 1000 AS gap_seconds
        |FROM p ASOF LEFT JOIN v
        |  ON p.user_id = v.user_id AND v.ts <= p.ts
        |ORDER BY p.event_id""".stripMargin),

    // Last-touch attribution — each purchase attributes to the LATEST
    // preceding touch (view/click/signup) by the same user within a
    // 24 h lookback, else the 'none' bucket. The as-of step is the
    // same shuffle-once window machinery as j_asof_latest_view (no
    // join node, skew-immune); the lookback predicate runs on
    // SECOND-floored epochs so both engines compare identical
    // integers. Census per channel: purchases, distinct buyers, and
    // the integral attribution-lag sum. Oracle: DuckDB native ASOF
    // LEFT JOIN — an independent implementation of the semantics.
    "ev_attribution" -> QueryDef(
      (s, d) => {
        val ev = T.events(s, d)
        val touches = ev
          .filter(col("event_type").isin("view", "click", "signup"))
          .groupBy(col("user_id"), col("ts"))
          .agg(max(col("event_type")).as("touch_type"))
          .withColumn("touch_ts", col("ts"))
        val purchases = ev.filter(col("event_type") === "purchase")
          .select(col("user_id"), col("event_id"), col("ts"))
        TemporalJoins.asofJoin(purchases, touches, Seq("user_id"), "ts",
            Seq("touch_type", "touch_ts"))
          .withColumn("lag_sec",
            unix_timestamp(col("ts")) - unix_timestamp(col("touch_ts")))
          .withColumn("channel",
            when(col("lag_sec").isNotNull && col("lag_sec") < 86400,
              col("touch_type")).otherwise(lit("none")))
          .groupBy(col("channel"))
          .agg(count(lit(1)).as("n_purchases"),
            countDistinct(col("user_id")).as("n_users"),
            sum(when(col("channel") =!= "none", col("lag_sec"))
              .otherwise(0L)).as("lag_seconds_sum"))
          .orderBy(col("channel"))
      },
      """WITH t AS (
        |  SELECT user_id, ts, MAX(event_type) AS touch_type
        |  FROM events WHERE event_type IN ('view', 'click', 'signup')
        |  GROUP BY 1, 2),
        |p AS (
        |  SELECT user_id, event_id, ts FROM events
        |  WHERE event_type = 'purchase'),
        |j AS (
        |  SELECT p.user_id,
        |    epoch_ms(p.ts) // 1000 - epoch_ms(t.ts) // 1000 AS lag_sec,
        |    t.touch_type
        |  FROM p ASOF LEFT JOIN t
        |    ON p.user_id = t.user_id AND t.ts <= p.ts),
        |c AS (
        |  SELECT user_id, lag_sec,
        |    CASE WHEN lag_sec IS NOT NULL AND lag_sec < 86400
        |      THEN touch_type ELSE 'none' END AS channel
        |  FROM j)
        |SELECT channel, COUNT(*) AS n_purchases,
        |  COUNT(DISTINCT user_id) AS n_users,
        |  CAST(SUM(CASE WHEN channel <> 'none' THEN lag_sec
        |    ELSE 0 END) AS BIGINT) AS lag_seconds_sum
        |FROM c GROUP BY 1 ORDER BY 1""".stripMargin),

    // Bucketed range join — purchases within 600 s after an error by
    // the same user (TemporalJoins.rangeJoinBucketed: intervals
    // explode to grid cells, points land in ONE cell, equi-join on
    // (user, cell) + exact containment — candidates per point are the
    // cell's intervals, never the table; no dedup needed). Oracle:
    // DuckDB evaluates the containment predicate directly — the naive
    // formulation the bucketing must agree with exactly.
    "j_range_bucketed" -> QueryDef(
      (s, d) => {
        val ev = T.events(s, d)
        val errors = ev.filter(col("event_type") === "error")
          .select(col("user_id"), col("event_id").as("error_id"),
            unix_timestamp(col("ts")).as("start_sec"))
          .withColumn("end_sec", col("start_sec") + 600)
        val purchases = ev.filter(col("event_type") === "purchase")
          .select(col("user_id"), col("event_id").as("purchase_id"),
            unix_timestamp(col("ts")).as("pt_sec"))
        TemporalJoins.rangeJoinBucketed(errors, purchases, Seq("user_id"),
            "start_sec", "end_sec", "pt_sec", bucketSeconds = 600)
          .groupBy(col("user_id"))
          .agg(count(lit(1)).as("n_pairs"),
            countDistinct(col("error_id")).as("n_errors_hit"),
            sum(col("pt_sec") - col("start_sec")).as("sum_gap_seconds"))
          .orderBy(col("user_id"))
      },
      """WITH e AS (
        |  SELECT user_id, event_id AS error_id,
        |    epoch_ms(ts) // 1000 AS start_sec
        |  FROM events WHERE event_type = 'error'),
        |p AS (
        |  SELECT user_id, event_id AS purchase_id,
        |    epoch_ms(ts) // 1000 AS pt_sec
        |  FROM events WHERE event_type = 'purchase')
        |SELECT e.user_id, COUNT(*) AS n_pairs,
        |  COUNT(DISTINCT e.error_id) AS n_errors_hit,
        |  CAST(SUM(p.pt_sec - e.start_sec) AS BIGINT) AS sum_gap_seconds
        |FROM e JOIN p ON p.user_id = e.user_id
        |  AND p.pt_sec >= e.start_sec AND p.pt_sec <= e.start_sec + 600
        |GROUP BY e.user_id ORDER BY e.user_id""".stripMargin),

    // Bloom-filter semi-join census (operators.Bloom) — the
    // scan-reduction runtime filter: high-value order keys become a
    // 2048-bit bitmap evaluated inside the lineitem scan, so only
    // possible matches reach the join. The census pins the filter's
    // CONTRACT in one integer row: zero false negatives (every true
    // match passes), the false-positive count the bitmap's fill rate
    // implies, and the exact pass/true totals — all replayed from the
    // same md5 positions in DuckDB.
    "j_bloom_prefilter" -> QueryDef(
      (s, d) => {
        val bits = 2048
        val k = 2
        val dimKeys = T.orders(s, d)
          .filter(col("o_totalprice") > 490000.0)
          .select(col("o_orderkey").as("key")).distinct()
        val set = Bloom.buildBits(dimKeys, col("key"), bits, k)
        val fact = T.lineitem(s, d).select(col("l_orderkey").as("key"))
        fact
          .withColumn("p",
            Bloom.mightContain(col("key"), set, bits, k).cast("int").cast("long"))
          .join(broadcast(dimKeys.withColumn("t", lit(1L))), Seq("key"), "left")
          .agg(count(lit(1)).as("n_fact_rows"),
            sum(col("p")).as("n_pass_rows"),
            sum(coalesce(col("t"), lit(0L))).as("n_true_rows"),
            sum(when(col("p") === 1L && col("t").isNull, 1L).otherwise(0L))
              .as("false_positive_rows"),
            sum(when(col("p") === 0L && col("t").isNotNull, 1L).otherwise(0L))
              .as("missed_true_rows"))
      },
      """WITH dim AS (
        |  SELECT DISTINCT o_orderkey AS key FROM orders
        |  WHERE o_totalprice > 490000.0),
        |pos AS (
        |  SELECT DISTINCT CAST(('0x' || substr(
        |      md5('b' || r.i || '|' || CAST(key AS VARCHAR)), 1, 15))
        |      AS BIGINT) & 2047 AS pos
        |  FROM dim, range(0, 2) r(i)),
        |fact AS (SELECT l_orderkey AS key FROM lineitem),
        |fk AS (SELECT DISTINCT key FROM fact),
        |fpos AS (
        |  SELECT fk.key, r.i,
        |    CAST(('0x' || substr(
        |      md5('b' || r.i || '|' || CAST(fk.key AS VARCHAR)), 1, 15))
        |      AS BIGINT) & 2047 AS pos
        |  FROM fk, range(0, 2) r(i)),
        |fpass AS (
        |  SELECT fpos.key FROM fpos LEFT JOIN pos ON pos.pos = fpos.pos
        |  GROUP BY fpos.key HAVING COUNT(pos.pos) = 2)
        |SELECT COUNT(*) AS n_fact_rows,
        |  CAST(SUM(CASE WHEN fp.key IS NOT NULL THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_pass_rows,
        |  CAST(SUM(CASE WHEN d.key IS NOT NULL THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_true_rows,
        |  CAST(SUM(CASE WHEN fp.key IS NOT NULL AND d.key IS NULL
        |    THEN 1 ELSE 0 END) AS BIGINT) AS false_positive_rows,
        |  CAST(SUM(CASE WHEN fp.key IS NULL AND d.key IS NOT NULL
        |    THEN 1 ELSE 0 END) AS BIGINT) AS missed_true_rows
        |FROM fact f
        |LEFT JOIN (SELECT key FROM fpass) fp ON fp.key = f.key
        |LEFT JOIN dim d ON d.key = f.key""".stripMargin),

    // ---- joins ----------------------------------------------------------
    // SURVEY §2.3 J1-J3: tiny-dimension lookups as broadcast hash joins.
    "j1_broadcast_dims" -> QueryDef(
      (s, d) => T.customer(s, d)
        .join(broadcast(T.nation(s, d)), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(T.region(s, d)), col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("r_name"))
        .agg(count(lit(1)).as("n_customers"),
          T.decAvg(col("c_acctbal")).as("avg_acctbal"))
        .orderBy(col("r_name")),
      s"""SELECT r_name, COUNT(*) AS n_customers,
         |  ${T.sqlDecAvg("c_acctbal")} AS avg_acctbal
         |FROM customer
         |JOIN nation ON c_nationkey = n_nationkey
         |JOIN region ON n_regionkey = r_regionkey
         |GROUP BY r_name ORDER BY r_name""".stripMargin),

    // SURVEY §2.3 J4-analog: multi-way fact join, revenue per nation
    // (TPC-H Q5 shape). Facts shuffle on keys, dims broadcast.
    "j5_join_revenue" -> QueryDef(
      (s, d) => T.lineitem(s, d)
        .join(T.orders(s, d), col("l_orderkey") === col("o_orderkey"))
        .join(T.customer(s, d), col("o_custkey") === col("c_custkey"))
        .join(broadcast(T.nation(s, d)), col("c_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name"))
        .agg(round(sum(col("l_extendedprice").cast(DecimalType(12, 4)) *
            (lit(1).cast(DecimalType(6, 4)) - col("l_discount").cast(DecimalType(6, 4)))), 4)
          .cast("double").as("revenue"))
        .orderBy(col("revenue").desc, col("n_name")),
      s"""SELECT n_name,
         |  CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(12,4)) * (1 - CAST(l_discount AS DECIMAL(6,4)))), 4) AS DOUBLE) AS revenue
         |FROM lineitem
         |JOIN orders ON l_orderkey = o_orderkey
         |JOIN customer ON o_custkey = c_custkey
         |JOIN nation ON c_nationkey = n_nationkey
         |GROUP BY n_name ORDER BY revenue DESC, n_name""".stripMargin),

    // Anti-join: customers that never ordered (NOT EXISTS semantics).
    "j_anti_no_orders" -> QueryDef(
      (s, d) => T.customer(s, d)
        .join(T.orders(s, d), col("c_custkey") === col("o_custkey"), "left_anti")
        .agg(count(lit(1)).as("n_customers_no_orders")),
      """SELECT COUNT(*) AS n_customers_no_orders FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)""".stripMargin),

    // ---- dedup / upsert machinery --------------------------------------
    // SURVEY §2.12 D1: in-batch first-wins dedup (insertion order ≈
    // monotonically-increasing event_id).
    "d1_first_wins_dedup" -> QueryDef(
      (s, d) => {
        val w = Window.partitionBy(col("user_id"), col("event_type")).orderBy(col("event_id"))
        T.events(s, d)
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") === 1)
          .select(col("user_id"), col("event_type"), col("event_id"), col("value"))
          .orderBy(col("user_id"), col("event_type"))
      },
      """SELECT user_id, event_type, event_id, value FROM (
        |  SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id, event_type
        |                               ORDER BY event_id) AS rn
        |  FROM events) WHERE rn = 1
        |ORDER BY user_id, event_type""".stripMargin),

    // SURVEY §2.1 K1 + §2.12 D2: latest-wins keyed upsert resolution.
    "k1_latest_wins" -> QueryDef(
      (s, d) => {
        val w = Window.partitionBy(col("user_id")).orderBy(col("event_id").desc)
        T.events(s, d)
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") === 1)
          .select(col("user_id"), col("event_id"), col("event_type"), col("value"))
          .orderBy(col("user_id"))
      },
      """SELECT user_id, event_id, event_type, value FROM (
        |  SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id
        |                               ORDER BY event_id DESC) AS rn
        |  FROM events) WHERE rn = 1
        |ORDER BY user_id""".stripMargin),

    // SURVEY §2.5: running total window (K1 machinery; exact via decimal).
    "w_running_total" -> QueryDef(
      (s, d) => {
        val w = Window.partitionBy(col("user_id")).orderBy(col("event_id"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        T.events(s, d)
          .filter(col("user_id") < 5)
          .select(col("user_id"), col("event_id"), col("value"),
            sum(col("value").cast(dec)).over(w).cast("double").as("running_value"))
          .orderBy(col("user_id"), col("event_id"))
      },
      """SELECT user_id, event_id, value,
        |  CAST(SUM(CAST(value AS DECIMAL(18,4))) OVER (
        |    PARTITION BY user_id ORDER BY event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_value
        |FROM events WHERE user_id < 5
        |ORDER BY user_id, event_id""".stripMargin),

    // Per-group quartile banding via NTILE — the partitioned window
    // form (each o_orderpriority group sorts independently, so the
    // window parallelizes across groups; a GLOBAL ntile would funnel
    // the table through one task and is the anti-pattern at scale).
    // The (o_totalprice, o_orderkey) order is total, so tile
    // boundaries are deterministic in both engines; min/max are
    // arithmetic-free and the sum rides the decSum parity rule.
    "w_ntile" -> QueryDef(
      (s, d) => {
        val w = Window.partitionBy(col("o_orderpriority"))
          .orderBy(col("o_totalprice"), col("o_orderkey"))
        T.orders(s, d)
          .withColumn("quartile", ntile(4).over(w).cast("long"))
          .groupBy(col("o_orderpriority"), col("quartile"))
          .agg(count(lit(1)).as("n"),
            min(col("o_totalprice")).as("lo"),
            max(col("o_totalprice")).as("hi"),
            T.decSum(col("o_totalprice")).as("total"))
          .orderBy(col("o_orderpriority"), col("quartile"))
      },
      s"""WITH t AS (
         |  SELECT o_orderpriority, o_totalprice,
         |    NTILE(4) OVER (PARTITION BY o_orderpriority
         |      ORDER BY o_totalprice, o_orderkey) AS quartile
         |  FROM orders)
         |SELECT o_orderpriority, quartile, COUNT(*) AS n,
         |  MIN(o_totalprice) AS lo, MAX(o_totalprice) AS hi,
         |  ${T.sqlDecSum("o_totalprice")} AS total
         |FROM t GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin),

    // w_ntile's scale-safe sibling: quartile banding from a BOUNDED
    // HISTOGRAM instead of a per-key global sort. w_ntile is exact
    // ntile semantics and keeps its row, but its plan is 5 giant
    // single-task sorts (one per o_orderpriority) — a straggler by
    // construction at 100×. This variant reuses ta_lm_terciles'
    // boundary pattern: bin prices to an integral bounded domain
    // (floor(price/1000) — ~600 cells; IEEE division of the same
    // stored double is bit-identical in both engines, the
    // a7/ev_stream_hist precedent), partial-aggregate the corpus to a
    // per-(priority, bin) histogram, take quartile boundaries from an
    // integer-exact cumulative rule over that tiny table (bk =
    // smallest bin with 4·cum ≥ k·n — cross-multiplied, no division),
    // and assign quartiles at scan speed via a broadcast join. Tiles
    // are approximate at bin granularity — whole bin cells land in
    // one quartile, deterministically, exactly what the oracle
    // replays — in exchange for a plan whose windows only ever see
    // the histogram (PlanAuditSpec pins every Window above an
    // aggregate, and no ntile).
    "w_ntile_hist" -> QueryDef(
      (s, d) => {
        val binned = T.orders(s, d).select(col("o_orderpriority"),
          col("o_totalprice"),
          floor(col("o_totalprice") / 1000).cast("long").as("bin"))
        val wCum = Window.partitionBy(col("o_orderpriority"))
          .orderBy(col("bin"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val hist = binned.groupBy(col("o_orderpriority"), col("bin"))
          .agg(count(lit(1)).as("cnt"))
          .withColumn("cum", sum(col("cnt")).over(wCum))
        val bounds = hist
          .withColumn("n_total", max(col("cum")).over(
            Window.partitionBy(col("o_orderpriority"))))
          .groupBy(col("o_orderpriority"))
          .agg(
            min(when(col("cum") * 4 >= col("n_total"), col("bin")))
              .as("b1"),
            min(when(col("cum") * 4 >= col("n_total") * 2, col("bin")))
              .as("b2"),
            min(when(col("cum") * 4 >= col("n_total") * 3, col("bin")))
              .as("b3"))
        binned.join(broadcast(bounds), Seq("o_orderpriority"))
          .withColumn("quartile",
            (lit(1) + (col("bin") > col("b1")).cast("int")
              + (col("bin") > col("b2")).cast("int")
              + (col("bin") > col("b3")).cast("int")).cast("long"))
          .groupBy(col("o_orderpriority"), col("quartile"))
          .agg(count(lit(1)).as("n"),
            min(col("bin")).as("lo_bin"),
            max(col("bin")).as("hi_bin"),
            T.decSum(col("o_totalprice")).as("total"))
          .orderBy(col("o_orderpriority"), col("quartile"))
      },
      s"""WITH b AS (
         |  SELECT o_orderpriority, o_totalprice,
         |    CAST(FLOOR(o_totalprice / 1000) AS BIGINT) AS bin
         |  FROM orders),
         |hist AS (
         |  SELECT o_orderpriority, bin, COUNT(*) AS cnt
         |  FROM b GROUP BY 1, 2),
         |c AS (
         |  SELECT o_orderpriority, bin,
         |    SUM(cnt) OVER (PARTITION BY o_orderpriority ORDER BY bin
         |                   ROWS UNBOUNDED PRECEDING) AS cum,
         |    SUM(cnt) OVER (PARTITION BY o_orderpriority) AS n_total
         |  FROM hist),
         |bounds AS (
         |  SELECT o_orderpriority,
         |    MIN(CASE WHEN cum * 4 >= n_total THEN bin END) AS b1,
         |    MIN(CASE WHEN cum * 4 >= n_total * 2 THEN bin END) AS b2,
         |    MIN(CASE WHEN cum * 4 >= n_total * 3 THEN bin END) AS b3
         |  FROM c GROUP BY 1)
         |SELECT b.o_orderpriority,
         |  1 + CAST(b.bin > bd.b1 AS BIGINT) + CAST(b.bin > bd.b2 AS BIGINT)
         |    + CAST(b.bin > bd.b3 AS BIGINT) AS quartile,
         |  COUNT(*) AS n, MIN(b.bin) AS lo_bin, MAX(b.bin) AS hi_bin,
         |  ${T.sqlDecSum("o_totalprice")} AS total
         |FROM b JOIN bounds bd USING (o_orderpriority)
         |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin),

    // Grouped top-k via the custom GroupedTopK physical operator
    // (bounded per-key heaps after one hash exchange — no per-group
    // sort; see graft.plans.GroupedTopK). Oracle: the equivalent
    // window formulation. Total order via (value desc, event_id desc)
    // makes results identical.
    "plan_grouped_topk" -> QueryDef(
      (s, d) => graft.plans.GroupedTopK.of(
        T.events(s, d).select(col("user_id"), col("event_id"), col("value")),
        keyCols = Seq("user_id"), orderCols = Seq("value", "event_id"),
        descending = true, k = 3)
        .orderBy(col("user_id"), col("value").desc, col("event_id").desc),
      """SELECT user_id, event_id, value FROM (
        |  SELECT user_id, event_id, value,
        |    ROW_NUMBER() OVER (PARTITION BY user_id
        |                       ORDER BY value DESC, event_id DESC) AS rn
        |  FROM events) WHERE rn <= 3
        |ORDER BY user_id, value DESC, event_id DESC""".stripMargin),

    // ---- set ops --------------------------------------------------------
    // SURVEY §2.7: union-with-dedup across source slices.
    "set_union_distinct" -> QueryDef(
      (s, d) => {
        val e = T.events(s, d)
        e.filter(col("event_type") === "purchase").select(col("user_id"))
          .union(e.filter(col("event_type") === "signup").select(col("user_id")))
          .distinct()
          .orderBy(col("user_id"))
      },
      """SELECT user_id FROM events WHERE event_type = 'purchase'
        |UNION
        |SELECT user_id FROM events WHERE event_type = 'signup'
        |ORDER BY user_id""".stripMargin),

    // §2.7 — the other two set operators in one row: users in BOTH
    // slices (intersect) and purchase-only users (except), counted
    // side by side.
    "set_intersect_except" -> QueryDef(
      (s, d) => {
        val e = T.events(s, d)
        def slice(t: String) =
          e.filter(col("event_type") === t).select(col("user_id"))
        val both = slice("purchase").intersect(slice("signup"))
        val only = slice("purchase").except(slice("signup"))
        both.agg(count(lit(1)).as("n_both"))
          .crossJoin(only.agg(count(lit(1)).as("n_purchase_only")))
      },
      """SELECT
        |  (SELECT COUNT(*) FROM (
        |     SELECT user_id FROM events WHERE event_type = 'purchase'
        |     INTERSECT
        |     SELECT user_id FROM events WHERE event_type = 'signup'))
        |    AS n_both,
        |  (SELECT COUNT(*) FROM (
        |     SELECT user_id FROM events WHERE event_type = 'purchase'
        |     EXCEPT
        |     SELECT user_id FROM events WHERE event_type = 'signup'))
        |    AS n_purchase_only""".stripMargin),

    // ---- time-series / streaming-analog ---------------------------------
    // SURVEY §2.13: tumbling-window aggregate (batch form of the
    // Structured Streaming hourly rollup in graft.streaming).
    "ev_hourly_agg" -> QueryDef(
      (s, d) => T.events(s, d)
        .groupBy(date_format(col("ts"), "yyyy-MM-dd HH").as("hour"))
        .agg(count(lit(1)).as("n"), T.decSum(col("value")).as("total_value"))
        .orderBy(col("hour")),
      s"""SELECT strftime(ts, '%Y-%m-%d %H') AS hour, COUNT(*) AS n,
         |  ${T.sqlDecSum("value")} AS total_value
         |FROM events GROUP BY 1 ORDER BY hour""".stripMargin),

    // HOPPING (sliding) windows — 2 h span every 1 h, so each event
    // lands in exactly two overlapping windows (Spark's built-in
    // `window(ts, "2 hours", "1 hour")` slide semantics, epoch-
    // aligned). The missing window shape beside tumbling
    // (ev_hourly_agg) and session (ev_sessionize): smoothed rate
    // monitoring. The oracle derives both window starts per event
    // from pure epoch integer arithmetic and must reproduce the
    // grouping exactly; window_start is emitted as an epoch-seconds
    // BIGINT (engine-exact).
    "ev_hopping_agg" -> QueryDef(
      (s, d) => T.events(s, d)
        .groupBy(window(col("ts"), "2 hours", "1 hour").as("w"))
        .agg(count(lit(1)).as("n"),
          countDistinct(col("user_id")).as("n_users"))
        .select(unix_timestamp(col("w.start")).as("window_start"),
          col("n"), col("n_users"))
        .orderBy(col("window_start")),
      """WITH e AS (
        |  SELECT user_id, epoch_ms(ts) // 1000 AS sec FROM events),
        |x AS (
        |  SELECT user_id,
        |    unnest([(sec // 3600 - 1) * 3600, (sec // 3600) * 3600])
        |      AS window_start
        |  FROM e)
        |SELECT CAST(window_start AS BIGINT) AS window_start,
        |  COUNT(*) AS n, COUNT(DISTINCT user_id) AS n_users
        |FROM x GROUP BY 1 ORDER BY window_start""".stripMargin),

    // Gap-based sessionization (30-min inactivity) via lag + cumulative
    // flag sum — all-integer arithmetic for cross-engine parity.
    "ev_sessionize" -> QueryDef(
      (s, d) => {
        val byTs = Window.partitionBy(col("user_id")).orderBy(col("event_id"))
        T.events(s, d)
          .withColumn("ms", unix_millis(col("ts")))
          .withColumn("gap_ms", col("ms") - lag(col("ms"), 1).over(byTs))
          .withColumn("new_session",
            when(col("gap_ms").isNull || col("gap_ms") > 1800000L, 1L).otherwise(0L))
          .groupBy(col("user_id"))
          .agg(sum(col("new_session")).as("n_sessions"), count(lit(1)).as("n_events"))
          .orderBy(col("user_id"))
      },
      """WITH g AS (
        |  SELECT user_id, epoch_ms(ts) AS ms,
        |    epoch_ms(ts) - LAG(epoch_ms(ts)) OVER (PARTITION BY user_id ORDER BY event_id) AS gap_ms
        |  FROM events)
        |SELECT user_id,
        |  CAST(SUM(CASE WHEN gap_ms IS NULL OR gap_ms > 1800000 THEN 1 ELSE 0 END) AS BIGINT) AS n_sessions,
        |  COUNT(*) AS n_events
        |FROM g GROUP BY user_id ORDER BY user_id""".stripMargin),

    // Top session paths — the "what do users actually do" census:
    // sessions cut at 30-minute gaps (the ev_sessionize arithmetic,
    // session number = running sum over the SAME user window, so the
    // whole sessionization is still one shuffle + one sort), then the
    // first 5 event types per session in event order become the path
    // string and the top-10 paths rank by count. The per-session
    // collect is bounded by the slice (5), and paths aggregate as a
    // tiny vocabulary — no global sort of sessions.
    "ev_top_paths" -> QueryDef(
      (s, d) => {
        val byUser = Window.partitionBy(col("user_id")).orderBy(col("event_id"))
        T.events(s, d)
          .withColumn("ms", unix_millis(col("ts")))
          .withColumn("gap_ms", col("ms") - lag(col("ms"), 1).over(byUser))
          .withColumn("new_session",
            when(col("gap_ms").isNull || col("gap_ms") > 1800000L, 1L)
              .otherwise(0L))
          .withColumn("session_no", sum(col("new_session")).over(byUser))
          .groupBy(col("user_id"), col("session_no"))
          .agg(expr("concat_ws('>', slice(transform(" +
            "array_sort(collect_list(struct(event_id, event_type))), " +
            "x -> x.event_type), 1, 5))").as("path"))
          .groupBy(col("path")).agg(count(lit(1)).as("n"))
          .orderBy(col("n").desc, col("path")).limit(10)
      },
      """WITH g AS (
        |  SELECT user_id, event_id, event_type,
        |    CASE WHEN epoch_ms(ts) - LAG(epoch_ms(ts)) OVER w IS NULL
        |         OR epoch_ms(ts) - LAG(epoch_ms(ts)) OVER w > 1800000
        |         THEN 1 ELSE 0 END AS new_session
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY event_id)),
        |s AS (
        |  SELECT user_id, event_id, event_type,
        |    SUM(new_session) OVER (PARTITION BY user_id
        |      ORDER BY event_id) AS session_no
        |  FROM g),
        |p AS (
        |  SELECT user_id, session_no,
        |    array_to_string(list_slice(
        |      list(event_type ORDER BY event_id), 1, 5), '>') AS path
        |  FROM s GROUP BY 1, 2)
        |SELECT path, COUNT(*) AS n FROM p
        |GROUP BY 1 ORDER BY n DESC, path LIMIT 10""".stripMargin),

    // SURVEY §2.4 A10/A11: run-metrics accumulators with rate
    // arithmetic (success_rate, avg value per success, events/minute).
    "a11_run_metrics" -> QueryDef(
      (s, d) => T.events(s, d)
        .agg(
          count(lit(1)).as("total"),
          sum(when(col("event_type") =!= "error", 1L).otherwise(0L)).as("successes"),
          sum(when(col("event_type") === "error", 1L).otherwise(0L)).as("failures"),
          sum(when(col("event_type") =!= "error", col("value").cast(dec))
            .otherwise(lit(0).cast(dec))).cast("double").as("success_value"),
          min(unix_millis(col("ts"))).as("t_min"),
          max(unix_millis(col("ts"))).as("t_max"))
        .select(col("total"), col("successes"), col("failures"),
          (col("successes").cast("double") / col("total").cast("double") * 100.0)
            .as("success_rate"),
          (col("success_value") / col("successes").cast("double"))
            .as("avg_success_value"),
          (col("total").cast("double") /
            ((col("t_max") - col("t_min")).cast("double") / 60000.0))
            .as("events_per_minute")),
      """WITH m AS (
        |  SELECT COUNT(*) AS total,
        |    CAST(SUM(CASE WHEN event_type <> 'error' THEN 1 ELSE 0 END) AS BIGINT) AS successes,
        |    CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS failures,
        |    CAST(SUM(CASE WHEN event_type <> 'error' THEN CAST(value AS DECIMAL(18,4)) ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE) AS success_value,
        |    MIN(epoch_ms(ts)) AS t_min, MAX(epoch_ms(ts)) AS t_max
        |  FROM events)
        |SELECT total, successes, failures,
        |  CAST(successes AS DOUBLE) / CAST(total AS DOUBLE) * 100.0 AS success_rate,
        |  success_value / CAST(successes AS DOUBLE) AS avg_success_value,
        |  CAST(total AS DOUBLE) / ((CAST(t_max - t_min AS DOUBLE)) / 60000.0) AS events_per_minute
        |FROM m""".stripMargin),

    // SURVEY §2.2 P11: cache-freshness predicate — rows within a
    // trailing window of the table's max timestamp.
    "p11_freshness" -> QueryDef(
      (s, d) => {
        val ev = T.events(s, d)
        val cutoff = ev.agg(max(unix_millis(col("ts"))).as("mx"))
          .select((col("mx") - 86400000L).as("cutoff"))
        ev.crossJoin(broadcast(cutoff))
          .filter(unix_millis(col("ts")) >= col("cutoff"))
          .groupBy(col("event_type")).agg(count(lit(1)).as("n_fresh"))
          .orderBy(col("event_type"))
      },
      """WITH c AS (SELECT MAX(epoch_ms(ts)) - 86400000 AS cutoff FROM events)
        |SELECT event_type, COUNT(*) AS n_fresh
        |FROM events, c WHERE epoch_ms(ts) >= cutoff
        |GROUP BY event_type ORDER BY event_type""".stripMargin),

    // SURVEY §2.8 F20: display-value fallback chain (coalesce).
    "f20_display_fallback" -> QueryDef(
      (s, d) => T.events(s, d)
        .select(col("event_id"),
          coalesce(nullif(get_json_object(col("props"), "$.k").cast("string"), lit("0")),
            col("event_type")).as("display"))
        .orderBy(col("event_id")).limit(300),
      """SELECT event_id,
        |  COALESCE(NULLIF(json_extract_string(props, '$.k'), '0'), event_type) AS display
        |FROM events ORDER BY event_id LIMIT 300""".stripMargin),

    // ---- scalar-function showcases --------------------------------------
    // SURVEY §2.8 F12: deterministic composite-key hashing (md5 + sha256).
    "f12_hash_keys" -> QueryDef(
      (s, d) => T.events(s, d)
        .select(col("event_id"),
          md5(concat_ws("|", col("user_id"), col("event_type"))).as("k_md5"),
          sha2(concat_ws("|", col("user_id"), col("event_type")), 256).as("k_sha"))
        .orderBy(col("event_id")).limit(100),
      """SELECT event_id,
        |  md5(CAST(user_id AS VARCHAR) || '|' || event_type) AS k_md5,
        |  sha256(CAST(user_id AS VARCHAR) || '|' || event_type) AS k_sha
        |FROM events ORDER BY event_id LIMIT 100""".stripMargin)
  )
}
