package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.scalatest.funsuite.AnyFunSuite
import graft.plans.GroupedTopK

class GroupedTopKSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkTest.session
  import spark.implicits._

  private def data = (1 to 500).map { i =>
    (i % 7L, i.toLong, (i * 37 % 101).toDouble)
  }.toDF("key", "id", "score")

  test("matches the window row_number formulation exactly") {
    val custom = GroupedTopK.of(data, Seq("key"), Seq("score", "id"),
        descending = true, k = 5)
      .orderBy($"key", $"score".desc, $"id".desc).collect().toSeq
    val w = Window.partitionBy($"key").orderBy($"score".desc, $"id".desc)
    val windowed = data.withColumn("rn", row_number().over(w))
      .filter($"rn" <= 5).drop("rn")
      .orderBy($"key", $"score".desc, $"id".desc).collect().toSeq
    assert(custom === windowed)
  }

  test("ascending order and k larger than group size") {
    val custom = GroupedTopK.of(data, Seq("key"), Seq("score", "id"),
        descending = false, k = 1000)
      .orderBy($"key", $"score", $"id").collect().toSeq
    assert(custom.size === 500) // k exceeds group sizes → everything kept
    val bottom = GroupedTopK.of(data, Seq("key"), Seq("score", "id"),
      descending = false, k = 1)
    assert(bottom.count() === 7) // one minimum per key
  }

  test("plan shows the custom exec and a single hash exchange, no sort") {
    val df = GroupedTopK.of(data, Seq("key"), Seq("score"), descending = true, k = 3)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("GroupedTopK "), p.take(600))
    assert(!p.contains("Sort "), "no per-group sort expected:\n" + p.take(600))
  }

  test("unknown column fails fast") {
    intercept[IllegalArgumentException] {
      GroupedTopK.of(data, Seq("nope"), Seq("score"), descending = true, k = 3)
    }
  }
}
