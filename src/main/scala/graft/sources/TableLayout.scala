package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._

/** Physical layout for the events table at cluster scale (SURVEY §4).
  *
  * The reference leans on 17 MongoDB secondary indexes
  * (reference: database/fix_schema.py:78-156). Spark has no indexes;
  * the equivalents are:
  *  - partition by month of start_date → partition pruning serves the
  *    start_date range/sort queries (the reference's hottest index);
  *  - sort within partitions by (venue.name, event_id) → parquet
  *    row-group min/max statistics skip files for venue and id point
  *    lookups (the b-tree equivalents);
  *  - one file per partition-month at test scale; at 100 TB,
  *    maxRecordsPerFile bounds file size and months are written
  *    concurrently.
  *
  * Queries that filter on start_date months or venue/event_id then
  * read a fraction of the table instead of all of it — verified by
  * `explain` showing PartitionFilters + PushedFilters.
  */
object TableLayout {

  /** Derived partition column: month of the ISO start_date string
    * (lexicographic substring — no timestamp parse needed).
    */
  private val monthCol = substring(col("datetime.start_date"), 1, 7)

  def writeEventsTable(events: DataFrame, path: String,
      maxRecordsPerFile: Long = 5000000L): Unit =
    events
      .withColumn("start_month", monthCol)
      .repartition(col("start_month"))
      .sortWithinPartitions(col("start_month"), col("venue.name"), col("event_id"))
      .write.mode(SaveMode.Overwrite)
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .partitionBy("start_month")
      .parquet(path)

  /** Read back with partition pruning available on start_month. */
  def readEventsTable(spark: org.apache.spark.sql.SparkSession,
      path: String): DataFrame =
    spark.read.parquet(path)

  /** Month-pruned scan: the physical analog of the reference's
    * start_date index scans.
    */
  def monthSlice(events: DataFrame, yearMonth: String): DataFrame =
    events.filter(col("start_month") === yearMonth)

  /** Bucketed write for co-located fact-fact joins: both sides
    * bucketed by the join key into the same bucket count join with NO
    * exchange — the pre-shuffle is paid once at write time instead of
    * per query. At 100 TB this turns the recurring
    * lineitem⋈orders-class joins from the dominant shuffle into a
    * local zip of buckets. Requires saveAsTable (bucket metadata lives
    * in the catalog).
    */
  def writeBucketed(df: DataFrame, table: String, bucketCol: String,
      buckets: Int, path: Option[String] = None): Unit = {
    // drop first: Overwrite alone keeps the OLD table's location when
    // the path option changes between runs
    df.sparkSession.sql(s"DROP TABLE IF EXISTS $table")
    val w = df.write.mode(SaveMode.Overwrite)
      .bucketBy(buckets, bucketCol)
      .sortBy(bucketCol)
      .format("parquet")
    path.fold(w)(p => w.option("path", p)).saveAsTable(table)
  }
}
