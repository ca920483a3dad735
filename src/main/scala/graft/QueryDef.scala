package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One named query in the driver's correctness inventory: the Spark
  * implementation plus (when SQL-expressible) the equivalent DuckDB
  * oracle SQL over the same parquet table names. Column aliases MUST
  * match between the two — the driver sorts columns by name and hashes
  * values.
  */
final case class QueryDef(
    fn: (SparkSession, String) => DataFrame,
    sql: Option[String])

object QueryDef {
  def apply(fn: (SparkSession, String) => DataFrame, sql: String): QueryDef =
    QueryDef(fn, Some(sql))
}
