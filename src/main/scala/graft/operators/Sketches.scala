package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Sketch aggregates for 100 TB-scale profiling, built DECLARATIVELY
  * so Catalyst plans them as ordinary two-phase aggregations (partial
  * map-side combine, one shuffle on the bucket key) and — unlike
  * `approx_count_distinct`'s opaque binary sketch — an external engine
  * can replay every step bit-for-bit for the oracle.
  *
  * HyperLogLog (Flajolet et al. 2007) from first principles:
  * bucket = low p bits of a 60-bit md5-derived hash, register =
  * max over rows of rho(remaining 52 bits) where rho = leading-zero
  * count + 1 (computed exactly via the binary-string length — integer
  * ops, no float log). The register sum Σ 2^(−rho) is scaled by 2^53
  * into a BIGINT so it is EXACT and order-independent in both engines
  * (each term ≤ 2^52, 256 buckets ⇒ sum < 2^61); the estimate then
  * costs one deterministic double division. Absent buckets contribute
  * 2^53 each (register 0), added from the bucket count — no dense
  * materialization.
  *
  * At 100 TB: one narrow scan + a 2^p-group aggregation whose partial
  * states are (bucket, max) pairs — constant-size reducer input per
  * partition, the textbook distributed-sketch shape. The built-in
  * `approx_count_distinct` remains the production default; this exists
  * where sketch REPLAYABILITY matters (cross-engine audits, the
  * correctness gate).
  */
object Sketches {

  /** HLL registers of a value column: (bucket, rho). NULL values are
    * excluded (matching count-distinct semantics) — without the filter
    * a null hashes to a phantom (bucket=null, rho=null) register row
    * that inflates n_buckets and drops a sum term, silently skewing
    * every downstream estimate.
    */
  def hllRegisters(df: DataFrame, value: Column, p: Int = 8): DataFrame = {
    require(p >= 4 && p <= 16, s"p in [4,16], got $p")
    val m = 1 << p
    df.filter(value.isNotNull)
      .select(Dedup.portableHash(value, 15).as("h"))
      .select(col("h").bitwiseAND(lit((m - 1).toLong)).as("bucket"),
        shiftrightunsigned(col("h"), p).as("w"))
      .groupBy(col("bucket"))
      // 60-p leading bits; rho = (60-p) - floor(log2(w)) computed via
      // the binary string length (exact integer arithmetic); w = 0
      // (all zeros) -> rho = 60-p+1
      .agg(max(when(col("w") === 0, lit(60 - p + 1))
        .otherwise(lit(60 - p + 1) - length(bin(col("w")))))
        .as("rho"))
  }

  /** Standard HLL bias constants (Flajolet et al. 2007 §4): the
    * closed-form 0.7213/(1+1.079/m) holds for m >= 128; smaller
    * register counts use the paper's tabulated alpha_16/32/64.
    */
  private def alphaFor(m: Int): java.math.BigDecimal = {
    val mc = new java.math.MathContext(50)
    m match {
      case 16 => new java.math.BigDecimal("0.673")
      case 32 => new java.math.BigDecimal("0.697")
      case 64 => new java.math.BigDecimal("0.709")
      case _ => new java.math.BigDecimal("0.7213").divide(
        java.math.BigDecimal.ONE.add(
          new java.math.BigDecimal("1.079")
            .divide(new java.math.BigDecimal(m), mc)), mc)
    }
  }

  /** Integer estimate constant K = round(alpha_m · m² · 2^(61-p) · 100):
    * `hll_estimate_x100 = K div sum_int` is ONE integral division of
    * positive integers, so there is ZERO double arithmetic in any
    * compared cell and engines agree by construction (not by IEEE
    * luck). K has ~23 digits — beyond int64 — so Spark divides it as
    * DECIMAL(38,0) `div` and DuckDB as a HUGEINT literal `//`; both
    * truncate toward zero, identical on positives. The quotient stays
    * well inside int64 for every reachable input: estimate_x100 >
    * Long.MaxValue would need ~9·10^16 distincts, which the 60-bit
    * hash space (and any real corpus) rules out long before.
    */
  def estConstant(p: Int): BigInt = {
    val m = 1 << p
    val k = alphaFor(m)
      .multiply(new java.math.BigDecimal((BigInt(1) << (60 - p + 1)).bigInteger))
      .multiply(new java.math.BigDecimal(m.toLong * m))
      .multiply(new java.math.BigDecimal(100))
      .setScale(0, java.math.RoundingMode.HALF_UP)
    BigInt(k.toBigIntegerExact)
  }

  /** Linear-counting lookup floor(m·ln(m/z)·100) for z = 1..m, computed
    * ONCE on the JVM and embedded as the SAME literal table in the
    * Spark plan and the oracle SQL (via [[linearTableSql]]) — the libm
    * `ln` never runs inside either engine's compared cells, closing the
    * last-ulp cross-engine trap documented on Tables.decSum.
    */
  def linearTable(m: Int): IndexedSeq[Long] =
    (1 to m).map(z =>
      math.floor(m.toDouble * math.log(m.toDouble / z) * 100).toLong)

  /** DuckDB list literal of [[linearTable]] — index with
    * `list_extract(..., zeros)` (1-based, matching `element_at`). */
  def linearTableSql(m: Int): String = linearTable(m).mkString("[", ", ", "]")

  /** One-row HLL estimate from a drained (bucket, rho) register frame —
    * shared by the batch and streaming paths so stream == batch is the
    * same code, not a parallel formula. Raw harmonic-mean estimate with
    * the standard linear-counting correction below 2.5m (exercised by
    * the `a13_hll_small` oracle row); every compared cell is integer
    * (see [[estConstant]] / [[linearTable]]).
    */
  def hllEstimateFromRegisters(regs: DataFrame, p: Int = 8): DataFrame = {
    val m = 1 << p
    val wBits = 60 - p
    val scale = 1L << (wBits + 1) // 2^(wBits+1): register 0 term
    val k = estConstant(p)
    val table = linearTable(m)
    regs.agg(
        count(lit(1)).as("n_buckets"),
        sum(expr(s"shiftleft(CAST(1 AS BIGINT), ${wBits + 1} - rho)"))
          .as("present_sum"))
      // empty register frame (no input rows): sum() is NULL, which
      // would propagate to a NULL estimate — coalesce to 0 so the
      // pipeline lands in the linear branch and reports 0 (exact)
      .select(col("n_buckets"),
        (lit(m.toLong) - col("n_buckets")).as("zeros"),
        (coalesce(col("present_sum"), lit(0L)) +
          (lit(m.toLong) - col("n_buckets")) * lit(scale)).as("sum_int"))
      .select(col("n_buckets"), col("zeros"), col("sum_int"),
        expr(s"CAST('$k' AS DECIMAL(38,0)) div sum_int").as("raw_x100"))
      .select(col("n_buckets"), col("zeros"), col("sum_int"),
        when(col("raw_x100") <= lit(250L * m) && col("zeros") > 0,
          element_at(array(table.map(lit): _*), col("zeros").cast("int")))
          .otherwise(col("raw_x100")).as("hll_estimate_x100"))
  }

  /** One-row HLL estimate of a value column (batch path). */
  def hllEstimate(df: DataFrame, value: Column, p: Int = 8): DataFrame =
    hllEstimateFromRegisters(hllRegisters(df, value, p), p)

  /** Shared oracle-SQL body recomputing the identical sketch in DuckDB:
    * same md5-derived 60-bit hash, same integer register sum, same K
    * literal, same linear-counting table. `extraSelect` prepends
    * witness columns (e.g. an exact distinct count) to the final
    * SELECT; `fromSql` names the source relation.
    */
  def hllOracleSql(fromSql: String, valueSql: String, p: Int = 8,
      extraSelect: String = ""): String = {
    val m = 1 << p
    val wBits = 60 - p
    val scale = 1L << (wBits + 1)
    s"""WITH h AS (
       |  SELECT CAST(('0x' || substr(md5(CAST($valueSql AS VARCHAR)), 1, 15))
       |    AS BIGINT) AS h
       |  FROM $fromSql WHERE $valueSql IS NOT NULL),
       |reg AS (
       |  SELECT h & ${m - 1} AS bucket,
       |    MAX(CASE WHEN (h >> $p) = 0 THEN ${wBits + 1}
       |             ELSE ${wBits + 1} - length(bin(h >> $p)) END) AS rho
       |  FROM h GROUP BY 1),
       |agg AS (
       |  SELECT COUNT(*) AS n_buckets,
       |    SUM(CAST(1 AS BIGINT) << (${wBits + 1} - rho)) AS present_sum
       |  FROM reg),
       |s AS (
       |  SELECT n_buckets, $m - n_buckets AS zeros,
       |    COALESCE(present_sum, 0)
       |      + ($m - n_buckets) * CAST($scale AS BIGINT) AS sum_int
       |  FROM agg),
       |e AS (
       |  SELECT n_buckets, zeros, sum_int,
       |    CAST(${estConstant(p)} // sum_int AS BIGINT) AS raw_x100
       |  FROM s)
       |SELECT $extraSelect
       |  n_buckets, zeros, CAST(sum_int AS BIGINT) AS sum_int,
       |  CASE WHEN raw_x100 <= ${250L * m} AND zeros > 0
       |       THEN CAST(list_extract(${linearTableSql(m)},
       |                 CAST(zeros AS INT)) AS BIGINT)
       |       ELSE raw_x100 END AS hll_estimate_x100
       |FROM e""".stripMargin
  }

  /** Per-group HLL register frame (group, bucket, rho) — the
    * materializable sketch state (one row per group×occupied-bucket).
    * Kept separate from [[hllEstimateBy]] so sketches can be STORED
    * per partition/day/shard and merged later ([[hllMergeRegisters]]).
    */
  def hllRegistersBy(df: DataFrame, value: Column, groupCols: Seq[String],
      p: Int = 8): DataFrame = {
    require(p >= 4 && p <= 16, s"p in [4,16], got $p")
    val m = 1 << p
    val wBits = 60 - p
    val gc = groupCols.map(col)
    df.filter(value.isNotNull) // same null-exclusion as hllRegisters
      .select((gc :+ Dedup.portableHash(value, 15).as("h")): _*)
      .select((gc :+ col("h").bitwiseAND(lit((m - 1).toLong)).as("bucket")
        :+ shiftrightunsigned(col("h"), p).as("w")): _*)
      .groupBy((gc :+ col("bucket")): _*)
      .agg(max(when(col("w") === 0, lit(wBits + 1))
        .otherwise(lit(wBits + 1) - length(bin(col("w"))))).as("rho"))
  }

  /** Merge sketch register frames: max(rho) per bucket. THE
    * distributed-sketch property — registers computed per shard /
    * day / executor union into the global sketch losslessly (max is
    * associative, commutative, idempotent), so a 100 TB pipeline
    * stores tiny per-partition register tables and merges on demand
    * instead of re-scanning. merge(per-group regs) == regs(whole
    * input) EXACTLY; a13_hll_merge pins that cross-engine.
    */
  def hllMergeRegisters(regs: DataFrame): DataFrame =
    regs.groupBy(col("bucket")).agg(max(col("rho")).as("rho"))

  /** Per-group HLL estimate — the operational form (distinct users
    * per segment, distinct URLs per domain): one aggregation keyed on
    * (group, bucket) whose state is ≤ groups × 2^p cells, then the
    * same integer-exact estimate per group (K div sum_int, see
    * [[estConstant]]). No correction branch here: callers at the
    * small-cardinality end should count exactly.
    */
  def hllEstimateBy(df: DataFrame, value: Column, groupCols: Seq[String],
      p: Int = 8): DataFrame = {
    val m = 1 << p
    val wBits = 60 - p
    val scale = 1L << (wBits + 1)
    val gc = groupCols.map(col)
    hllRegistersBy(df, value, groupCols, p)
      .groupBy(gc: _*)
      .agg(count(lit(1)).as("n_buckets"),
        sum(expr(s"shiftleft(CAST(1 AS BIGINT), ${wBits + 1} - rho)"))
          .as("present_sum"))
      .select((gc :+ col("n_buckets") :+
        (col("present_sum") +
          (lit(m.toLong) - col("n_buckets")) * lit(scale)).as("sum_int")): _*)
      .select((gc :+ col("n_buckets") :+
        expr(s"CAST('${estConstant(p)}' AS DECIMAL(38,0)) div sum_int")
          .as("hll_estimate_x100")): _*)
  }

  /** Per-group HLL estimate WITH the linear-counting correction —
    * [[hllEstimateBy]] plus the small-range branch, for callers whose
    * groups span the full cardinality spectrum (a column profile has
    * both `event_id` at millions and `event_type` at 4). Emits the
    * full evidence row (n_buckets, zeros, sum_int, estimate); every
    * compared cell is the same integer-exact pipeline as
    * [[hllEstimateFromRegisters]].
    */
  def hllProfileBy(df: DataFrame, value: Column, groupCols: Seq[String],
      p: Int = 8): DataFrame = {
    val m = 1 << p
    val wBits = 60 - p
    val scale = 1L << (wBits + 1)
    val k = estConstant(p)
    val table = linearTable(m)
    val gc = groupCols.map(col)
    hllRegistersBy(df, value, groupCols, p)
      .groupBy(gc: _*)
      .agg(count(lit(1)).as("n_buckets"),
        sum(expr(s"shiftleft(CAST(1 AS BIGINT), ${wBits + 1} - rho)"))
          .as("present_sum"))
      .select((gc :+ col("n_buckets") :+
        (lit(m.toLong) - col("n_buckets")).as("zeros") :+
        (col("present_sum") +
          (lit(m.toLong) - col("n_buckets")) * lit(scale)).as("sum_int")): _*)
      .select((gc :+ col("n_buckets") :+ col("zeros") :+ col("sum_int") :+
        expr(s"CAST('$k' AS DECIMAL(38,0)) div sum_int").as("raw_x100")): _*)
      .select((gc :+ col("n_buckets") :+ col("zeros") :+ col("sum_int") :+
        when(col("raw_x100") <= lit(250L * m) && col("zeros") > 0,
          element_at(array(table.map(lit): _*), col("zeros").cast("int")))
          .otherwise(col("raw_x100")).as("hll_estimate_x100")): _*)
  }

  /** Rolling w-day HLL estimate from a per-day register frame
    * (day, bucket, rho): each register row contributes to the w
    * target days it falls inside (a ×w fan-out over the COMPACT
    * sketch frame — days×2^p rows, never the raw data), then
    * per-(target day, bucket) max and the same integer-exact
    * per-group estimate as [[hllEstimateBy]]. This is the
    * distributed answer to rolling DISTINCT, which does not
    * decompose: store per-day registers once, derive any trailing
    * window by register max — no rescan, no per-day set union.
    * `days` (one `day` column) bounds the emitted target days to
    * days that exist; it is calendar-bounded and broadcasts.
    */
  def hllRollingEstimateBy(regs: DataFrame, days: DataFrame,
      windowDays: Int, p: Int = 8): DataFrame = {
    val m = 1 << p
    val wBits = 60 - p
    val scale = 1L << (wBits + 1)
    regs
      .select(col("bucket"), col("rho"),
        explode(sequence(col("day"), col("day") + lit(windowDays - 1)))
          .as("tday"))
      .join(broadcast(days.select(col("day").as("tday"))), "tday")
      .groupBy(col("tday"), col("bucket"))
      .agg(max(col("rho")).as("rho"))
      .groupBy(col("tday"))
      .agg(count(lit(1)).as("n_buckets"),
        sum(expr(s"shiftleft(CAST(1 AS BIGINT), ${wBits + 1} - rho)"))
          .as("present_sum"))
      .select(col("tday").as("day"), col("n_buckets"),
        (col("present_sum") +
          (lit(m.toLong) - col("n_buckets")) * lit(scale)).as("sum_int"))
      .select(col("day"), col("n_buckets"),
        (lit(m.toLong) - col("n_buckets")).as("zeros"),
        expr(s"CAST('${estConstant(p)}' AS DECIMAL(38,0)) div sum_int")
          .as("raw_x100"))
      // daily actives sit squarely in the linear-counting regime, so
      // unlike hllEstimateBy the correction branch is NOT optional
      // here (same literal table as hllEstimateFromRegisters)
      .select(col("day"), col("n_buckets"),
        when(col("raw_x100") <= lit(250L * m) && col("zeros") > 0,
          element_at(array(linearTable(m).map(lit): _*),
            col("zeros").cast("int")))
          .otherwise(col("raw_x100")).as("hll_estimate_x100"))
  }

  /** Equi-width histogram sketch of a numeric column: nBins counts,
    * values clamped into [lo, lo + nBins·width). The quantile sketch
    * for bounded-range metrics (latencies, scores, prices): state is
    * nBins cells regardless of input size, counts ADD across shards
    * (trivially mergeable — the SUM analog of HLL's max-per-bucket),
    * and every cell is an integer, so estimates replay exactly in any
    * engine. floor(v/width) on IEEE doubles is engine-exact for the
    * same reason Tables.decSum documents floor as safe.
    */
  def histogramCounts(df: DataFrame, value: Column, lo: Double,
      width: Double, nBins: Int): DataFrame = {
    require(nBins >= 1 && width > 0, s"need nBins>=1, width>0")
    // NULLs and NaNs are excluded, not binned: greatest() skips null
    // arguments and floor(NaN) is 0, so either unfiltered would
    // silently land in bin 0. The clamp runs on the LONG floor result
    // BEFORE the int cast — an extreme outlier would otherwise
    // overflow the cast (a crash under ANSI, bin 0 via wraparound
    // without it) instead of clamping to the top bin.
    df.filter(value.isNotNull && !isnan(value.cast("double")))
      .select(least(lit((nBins - 1).toLong), greatest(lit(0L),
        floor((value - lit(lo)) / lit(width)))).cast("int").as("bin"))
      .groupBy(col("bin")).agg(count(lit(1)).as("cnt"))
  }

  /** Per-shard histogram counts (shard cols + bin + cnt) — the
    * STORABLE form: per-day/month/executor count tables SUM-merge into
    * the global histogram losslessly (counts form the additive monoid;
    * `a16_hist_merge` pins merged == direct cross-engine, the SUM
    * analog of a13_hll_merge's max).
    */
  def histogramCountsBy(df: DataFrame, value: Column,
      groupCols: Seq[String], lo: Double, width: Double,
      nBins: Int): DataFrame = {
    require(nBins >= 1 && width > 0, s"need nBins>=1, width>0")
    val gc = groupCols.map(col)
    // same null/NaN/overflow rules as histogramCounts
    df.filter(value.isNotNull && !isnan(value.cast("double")))
      .select((gc :+ least(lit((nBins - 1).toLong), greatest(lit(0L),
        floor((value - lit(lo)) / lit(width)))).cast("int").as("bin")): _*)
      .groupBy((gc :+ col("bin")): _*).agg(count(lit(1)).as("cnt"))
  }

  /** Quantile estimates from a histogram sketch: for each q (per
    * mille), the first bin whose cumulative count reaches
    * ceil(q·n/1000), reported as the bin's UPPER edge — a guaranteed
    * overestimate by at most `width` (the sketch's documented error
    * bound). Rank arithmetic is pure integers; the cumulative window
    * runs over ≤ nBins rows (sketch-sized — never the data), so the
    * single-partition window is free.
    */
  def histogramQuantiles(hist: DataFrame, qsX1000: Seq[Int],
      loX100: Long, widthX100: Long): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window.orderBy(col("bin"))
    val cum = hist.withColumn("cum", sum(col("cnt")).over(w))
    val qs = hist.sparkSession.range(1)
      .select(explode(array(qsX1000.map(lit): _*)).as("q_x1000"))
      .crossJoin(hist.agg(sum(col("cnt")).as("n")))
      .withColumn("target_rank",
        expr("(q_x1000 * n + 999) div 1000"))
    qs.join(cum, col("cum") >= col("target_rank"))
      .groupBy(col("q_x1000"))
      .agg(max(col("n")).as("n"), max(col("target_rank")).as("target_rank"),
        min(col("bin")).as("bin"))
      .select(col("q_x1000"), col("n"), col("target_rank"), col("bin"),
        ((col("bin") + 1).cast("long") * lit(widthX100) + lit(loX100))
          .as("est_hi_x100"))
      .orderBy(col("q_x1000"))
  }

  /** Count-min sketch (Cormode & Muthukrishnan 2005) of a value
    * stream: d salted hash rows × w buckets of plain counts — the
    * frequency oracle for heavy-hitter queries over streams too wide
    * to count exactly. Declarative: explode ×d then ONE (row, bucket)
    * aggregation whose state is d·w cells regardless of stream size;
    * estimates never undercount (min over rows ≥ true count), which
    * the probe query verifies per key.
    */
  def cmsCounts(df: DataFrame, value: Column, d: Int = 4,
      w: Int = 1024): DataFrame =
    // NULLs excluded: a null value hashes to (row, bucket=null) cells
    // that survive the groupBy and crash cmsTable's driver-side
    // getLong at embed time
    df.filter(value.isNotNull)
      .select(posexplode(array((0 until d).map(i =>
        Dedup.portableHash(concat(lit(s"s$i|"), value), 15)
          .bitwiseAND(lit((w - 1).toLong))): _*))
        .as(Seq("row", "bucket")))
      .groupBy(col("row"), col("bucket"))
      .agg(count(lit(1)).as("cnt"))

  /** Per-shard CMS cells (shard cols + row + bucket + cnt) — the
    * storable form of [[cmsCounts]]: cell counts are plain sums, so
    * per-shard sketches SUM-merge into the global sketch exactly
    * (`a14_cms_merge` pins it). Streaming already exploits the same
    * additivity (ev_stream_cms); this is the batch shard-table shape.
    */
  def cmsCountsBy(df: DataFrame, value: Column, groupCols: Seq[String],
      d: Int = 4, w: Int = 1024): DataFrame = {
    val gc = groupCols.map(col)
    df.filter(value.isNotNull) // same null exclusion as cmsCounts
      .select((gc :+ posexplode(array((0 until d).map(i =>
        Dedup.portableHash(concat(lit(s"s$i|"), value), 15)
          .bitwiseAND(lit((w - 1).toLong))): _*))
        .as(Seq("row", "bucket"))): _*)
      .groupBy((gc ++ Seq(col("row"), col("bucket"))): _*)
      .agg(count(lit(1)).as("cnt"))
  }

  /** Point-estimate every candidate key against the sketch: min over
    * the d rows of the key's bucket count (absent bucket = 0). The
    * candidate set is small (heavy-hitter shortlist), so it explodes
    * ×d and broadcast-joins the d·w-cell sketch.
    */
  def cmsEstimate(cms: DataFrame, candidates: DataFrame, value: Column,
      d: Int = 4, w: Int = 1024): DataFrame =
    candidates.select(value.as("key"))
      .select(col("key"), posexplode(array((0 until d).map(i =>
        Dedup.portableHash(concat(lit(s"s$i|"), col("key")), 15)
          .bitwiseAND(lit((w - 1).toLong))): _*))
        .as(Seq("row", "bucket")))
      .join(cms, Seq("row", "bucket"), "left")
      .groupBy(col("key"))
      .agg(min(coalesce(col("cnt"), lit(0L))).as("est"))

  /** The CMS cells as a flat literal table (length d·w, absent cells
    * 0) for embedding the sketch INTO a scan — the [[graft.operators.Bloom]]
    * pattern applied to frequency: the collect is bounded by the
    * sketch dimensions (d·w cells), never by input size, and the
    * resulting array literal rides the fact scan's codegen.
    */
  def cmsTable(cms: DataFrame, d: Int, w: Int): IndexedSeq[Long] = {
    val cells = cms.collect()
      .map(r => (r.getInt(0) * w + r.getLong(1).toInt, r.getLong(2))).toMap
    (0 until d * w).map(i => cells.getOrElse(i, 0L))
  }

  /** Scan-side CMS point estimate of `value` from an embedded
    * [[cmsTable]] literal: min over the d salted rows — zero shuffle,
    * zero join. This is the filter a 100 TB heavy-hitter pass pushes
    * into the fact scan: rows whose estimate clears the threshold are
    * the ONLY rows that reach the exact-count shuffle, and the CMS
    * overestimate-only guarantee means no true heavy key is lost to
    * the filter.
    */
  def cmsEstimateLit(table: IndexedSeq[Long], value: Column, d: Int,
      w: Int): Column = {
    val tbl = array(table.map(lit): _*)
    least((0 until d).map(i =>
      element_at(tbl, (lit(i.toLong * w) +
        Dedup.portableHash(concat(lit(s"s$i|"), value), 15)
          .bitwiseAND(lit((w - 1).toLong))).cast("int") + 1)): _*)
  }

  /** Bottom-k Jaccard estimate between two element sets (Broder's
    * minwise estimator over a shared hash order): among the k smallest
    * hashes of the UNION, the fraction present in both sides estimates
    * |A∩B|/|A∪B|. Deterministic (md5 hash order, no sampling seed), so
    * the estimate — not just the method — is oracle-checkable. Each
    * side reduces to its distinct hash set (one shuffle), the union's
    * bottom-k is a TakeOrdered (never a full sort), and membership
    * flags ride the distinct sets before the limit, so the k-row frame
    * is the only thing that leaves the aggregation.
    *
    * The corpus-overlap use: A = train shingle space, B = eval shingle
    * space; the estimate tracks train/eval contamination CONTINUOUSLY
    * from k-sized sketches where the exact intersection needs a full
    * join of both shingle sets.
    */
  def bottomKJaccard(a: DataFrame, b: DataFrame, hashCol: String,
      k: Int = 256): DataFrame = {
    val ah = a.select(col(hashCol).as("h")).distinct()
      .withColumn("in_a", lit(1L))
    val bh = b.select(col(hashCol).as("h")).distinct()
      .withColumn("in_b", lit(1L))
    val joined = ah.join(bh, Seq("h"), "full_outer")
      .select(col("h"), coalesce(col("in_a"), lit(0L)).as("in_a"),
        coalesce(col("in_b"), lit(0L)).as("in_b"))
    joined.orderBy(col("h")).limit(k)
      .agg(count(lit(1)).as("k_used"),
        sum(col("in_a") * col("in_b")).as("n_in_both"))
      .select(col("k_used"), col("n_in_both"),
        floor(col("n_in_both").cast("double") /
          col("k_used").cast("double") * 10000).cast("long")
          .as("est_jaccard_x10000"))
  }
}
