package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.expressions.{Ascending, Descending, SortOrder}
import org.apache.spark.sql.classic

/** Bridge for constructing DataFrames from custom logical plans
  * (classic.Dataset.ofRows is private[sql] since the Spark 4
  * refactor).
  */
object PlanBridge {

  def groupedTopK(df: DataFrame, keyCols: Seq[String], orderCols: Seq[String],
      descending: Boolean, k: Int, partial: Boolean = false): DataFrame = {
    require(k > 0, "k must be positive")
    val spark = df.sparkSession
    if (!spark.experimental.extraStrategies.contains(graft.plans.GroupedTopKStrategy)) {
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ graft.plans.GroupedTopKStrategy
    }
    val analyzed = df.queryExecution.analyzed
    def attr(n: String) = analyzed.output.find(_.name == n).getOrElse(
      throw new IllegalArgumentException(
        s"column $n not in ${analyzed.output.map(_.name).mkString(", ")}"))
    val direction = if (descending) Descending else Ascending
    val order = orderCols.map(c => SortOrder(attr(c), direction))
    val plan =
      graft.plans.GroupedTopK(keyCols.map(attr), order, k, analyzed, partial)
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)
  }
}
