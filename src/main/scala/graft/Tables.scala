package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Parquet table loaders for the driver-generated testdata
  * (see /root/repo/TESTDATA.md) plus numeric-parity helpers shared by
  * every query that must hash-match the DuckDB oracle.
  */
object Tables {

  /** Input-schema contract, asserted at load time.
    *
    * The round-9 regeneration silently changed events.ts from INT64
    * nanos to TIMESTAMP(MICROS) and zeroed 73 queries with opaque
    * AnalysisExceptions. These one-line-per-table pins make the NEXT
    * drift fail loud, naming the table and column, at the first load.
    * Kinds: L=long I=int D=double S=string T=timestamp (LTZ or NTZ
    * only — no loader adapts a raw-integer shipdate/orderdate, so
    * LongType here must fail loud), N=events.ts specifically
    * (timestamp OR legacy nanos-as-long, which normalizeEventTs
    * adapts), F=float-array. Extra columns are tolerated (additive
    * drift is harmless); missing or retyped columns are not.
    */
  private val contracts: Map[String, Seq[(String, Char)]] = Map(
    "lineitem" -> Seq("l_orderkey" -> 'L', "l_partkey" -> 'L',
      "l_suppkey" -> 'L', "l_linenumber" -> 'I', "l_quantity" -> 'D',
      "l_extendedprice" -> 'D', "l_discount" -> 'D', "l_tax" -> 'D',
      "l_returnflag" -> 'S', "l_linestatus" -> 'S', "l_shipdate" -> 'T'),
    "orders" -> Seq("o_orderkey" -> 'L', "o_custkey" -> 'L',
      "o_orderstatus" -> 'S', "o_totalprice" -> 'D',
      "o_orderdate" -> 'T', "o_orderpriority" -> 'S'),
    "customer" -> Seq("c_custkey" -> 'L', "c_name" -> 'S',
      "c_nationkey" -> 'I', "c_acctbal" -> 'D', "c_mktsegment" -> 'S'),
    "supplier" -> Seq("s_suppkey" -> 'L', "s_name" -> 'S',
      "s_nationkey" -> 'I', "s_acctbal" -> 'D'),
    "part" -> Seq("p_partkey" -> 'L', "p_name" -> 'S', "p_brand" -> 'S',
      "p_type" -> 'S', "p_size" -> 'I', "p_retailprice" -> 'D'),
    "nation" -> Seq("n_nationkey" -> 'I', "n_name" -> 'S',
      "n_regionkey" -> 'I'),
    "region" -> Seq("r_regionkey" -> 'I', "r_name" -> 'S'),
    "events" -> Seq("event_id" -> 'L', "ts" -> 'N', "user_id" -> 'L',
      "event_type" -> 'S', "value" -> 'D', "props" -> 'S'),
    "documents" -> Seq("doc_id" -> 'L', "text" -> 'S', "lang" -> 'S',
      "source" -> 'S', "n_chars" -> 'L'),
    "embeddings" -> Seq("vec_id" -> 'L', "embedding" -> 'F',
      "label" -> 'I'))

  private def kindOk(kind: Char, dt: DataType): Boolean = (kind, dt) match {
    case ('L', LongType) | ('I', IntegerType) | ('D', DoubleType) |
         ('S', StringType) | ('T', TimestampType) |
         ('T', TimestampNTZType) => true
    case ('N', TimestampType) | ('N', TimestampNTZType) |
         ('N', LongType) => true
    case ('F', ArrayType(FloatType, _)) => true
    case _ => false
  }

  /** One verification per (dir, table) per JVM — the check is a
    * driver-side schema walk, but loaders are called per query and the
    * memo keeps the hot path allocation-free.
    */
  private val verified = java.util.concurrent.ConcurrentHashMap.newKeySet[String]()

  private def verifyContract(name: String, df: DataFrame, key: String): DataFrame = {
    if (!verified.contains(key)) {
      contracts.get(name).foreach { cols =>
        val actual = df.schema.map(f => f.name -> f.dataType).toMap
        for ((c, kind) <- cols) actual.get(c) match {
          case None => throw new IllegalStateException(
            s"testdata contract violated: $key lacks column '$c' " +
              s"(schema: ${df.schema.simpleString}) — testdata regenerated?")
          case Some(dt) if !kindOk(kind, dt) => throw new IllegalStateException(
            s"testdata contract violated: $key column '$c' is $dt, " +
              s"expected kind '$kind' — testdata regenerated?")
          case _ => ()
        }
      }
      verified.add(key)
    }
    df
  }

  def t(spark: SparkSession, dir: String, name: String): DataFrame =
    verifyContract(name, spark.read.parquet(s"$dir/$name.parquet"), s"$dir/$name")

  def lineitem(s: SparkSession, d: String): DataFrame = t(s, d, "lineitem")
  def orders(s: SparkSession, d: String): DataFrame   = t(s, d, "orders")
  def customer(s: SparkSession, d: String): DataFrame = t(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = t(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame     = t(s, d, "part")
  def nation(s: SparkSession, d: String): DataFrame   = t(s, d, "nation")
  def region(s: SparkSession, d: String): DataFrame   = t(s, d, "region")
  /** events.parquet's `ts` physical encoding has changed across
    * testdata generations: INT64 TIMESTAMP(NANOS) originally (which
    * Spark reads as LongType only under the legacy nanosAsLong conf),
    * TIMESTAMP(MICROS) without timezone (→ TIMESTAMP_NTZ) since the
    * round-9 regeneration. The conf is set unconditionally because it
    * only affects NANOS-encoded columns — a MICROS file reads
    * identically with or without it — and without it a nanos file
    * fails at scan time, before normalizeEventTs can adapt.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    normalizeEventTs(t(s, d, "events"))
  }

  /** Dtype-adaptive normalization of `ts` to session-zone TimestampType,
    * shared by batch and streaming reads (the streaming source declares
    * its schema and must apply the SAME rule, or stream results would
    * silently diverge from the batch oracles).
    *
    *  - LongType (legacy nanos-as-long): integer-divide to micros —
    *    same floor truncation DuckDB applies at micro grain.
    *  - TIMESTAMP_NTZ (current testdata): cast to TimestampType. All
    *    graft sessions pin spark.sql.session.timeZone=UTC, so the cast
    *    preserves the wall-clock instant and oracle parity (DuckDB
    *    reads the same file as a naive timestamp).
    *  - TimestampType: already what downstream expects.
    *  - anything else: fail loud with the dtype named, so the next
    *    silent testdata regeneration is a one-line diagnosis instead
    *    of 73 opaque AnalysisExceptions.
    */
  /** Min/max of an INT64 column from parquet footer statistics —
    * driver-side metadata reads over `df.inputFiles`, no Spark job.
    * None (→ caller falls back to an agg job) when the frame is not
    * file-backed, any file is unreadable, or any row group's chunk
    * lacks trustworthy INT64 stats; all-null chunks contribute
    * nothing. At 100 TB this is one footer read per file — the same
    * metadata the scan planner already touches — vs a cluster-wide
    * column scan.
    */
  private def footerLongRange(df: DataFrame,
      column: String): Option[(Long, Long)] = {
    import scala.jdk.CollectionConverters._
    import scala.util.control.NonFatal
    try {
      val files = df.inputFiles
      if (files.isEmpty) return None
      val conf = df.sparkSession.sparkContext.hadoopConfiguration
      var lo = Long.MaxValue; var hi = Long.MinValue; var any = false
      for (f <- files) {
        val reader = org.apache.parquet.hadoop.ParquetFileReader.open(
          org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
            new org.apache.hadoop.fs.Path(f), conf))
        try {
          for (bg <- reader.getFooter.getBlocks.asScala;
               cc <- bg.getColumns.asScala
               if cc.getPath.toDotString == column) {
            cc.getStatistics match {
              case st: org.apache.parquet.column.statistics.LongStatistics
                  if !st.isEmpty =>
                if (st.hasNonNullValue) {
                  lo = math.min(lo, st.getMin); hi = math.max(hi, st.getMax)
                  any = true
                } // else: all-null chunk, bounds nothing
              case _ => return None // absent/untyped stats: can't trust
            }
          }
        } finally reader.close()
      }
      if (any) Some((lo, hi)) else None
    } catch { case NonFatal(_) => None }
  }

  def normalizeEventTs(raw: DataFrame): DataFrame =
    raw.schema("ts").dataType match {
      case LongType =>
        // A long ts is ASSUMED nanos — but a raw-INT64 micros/millis
        // regeneration would also read as LongType and then land every
        // event in 1970 SILENTLY (the contract can't tell encodings
        // apart from the schema). Guard with a magnitude check:
        // nanos-of-epoch for 1973-2096 live in [1e17, 4e18];
        // micros/millis/seconds are orders of magnitude below. The
        // range comes from parquet FOOTER STATISTICS (driver-side
        // metadata reads, ZERO Spark jobs — pinned by PlanAuditSpec);
        // only when a chunk lacks INT64 stats does it fall back to a
        // column-pruned min/max agg job. Acceptable either way: this
        // branch is the LEGACY encoding path, dormant on current
        // testdata. Streaming frames can't run jobs and skip the
        // guard; a batch query over the same dir raises it instead.
        if (raw.isStreaming) ()
        else {
          val range = footerLongRange(raw, "ts").orElse {
            val mm = raw.agg(min(col("ts")), max(col("ts"))).head()
            if (mm.isNullAt(0)) None
            else Some((mm.getLong(0), mm.getLong(1)))
          }
          range.foreach { case (lo, hi) =>
            if (lo < 100000000000000000L || hi > 4000000000000000000L)
              throw new IllegalStateException(
                s"events.ts is INT64 with range [$lo, $hi] — not " +
                  "nanos-of-epoch magnitude. A micros/millis LongType " +
                  "regeneration would silently misdate every event; " +
                  "refusing to guess the encoding.")
          }
        }
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType => raw.withColumn("ts", col("ts").cast(TimestampType))
      case TimestampType   => raw
      case other => throw new IllegalStateException(
        s"events.ts has unsupported dtype $other — expected INT64 nanos (LongType " +
          "under nanosAsLong), TIMESTAMP_NTZ, or TIMESTAMP; testdata layout changed?")
    }
  def documents(s: SparkSession, d: String): DataFrame  = t(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = t(s, d, "embeddings")

  /** Oracle-parity numeric discipline.
    *
    * Summing doubles is partition-order dependent in Spark and
    * vectorization-order dependent in DuckDB, so raw `sum(double)` can
    * differ in the last ulps between the two engines and break the
    * driver's hash compare. Instead: compute per-row arithmetic in
    * double (IEEE-deterministic given identical expressions), cast each
    * row to DECIMAL(18,4) (deterministic rounding; exact-halfway ties
    * are unrepresentable in binary doubles), SUM the decimals (exact,
    * order-independent in both engines), and cast the final result back
    * to double (deterministic nearest-even). Averages divide that exact
    * sum by the exact count — one deterministic double division.
    * Mirror in oracle SQL: CAST(SUM(CAST(x AS DECIMAL(18,4))) AS DOUBLE).
    */
  def decSum(c: Column): Column =
    sum(c.cast(DecimalType(18, 4))).cast("double")

  def decAvg(c: Column): Column =
    sum(c.cast(DecimalType(18, 4))).cast("double") / count(lit(1))

  /** SQL-side mirror of decSum for oracle strings. */
  def sqlDecSum(expr: String): String =
    s"CAST(SUM(CAST($expr AS DECIMAL(18,4))) AS DOUBLE)"
  def sqlDecAvg(expr: String): String =
    s"CAST(SUM(CAST($expr AS DECIMAL(18,4))) AS DOUBLE) / COUNT(*)"
}
