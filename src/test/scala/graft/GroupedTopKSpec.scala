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

  test("windowed formulation matches the heap operator") {
    val a = GroupedTopK.of(data, Seq("key"), Seq("score", "id"),
        descending = true, k = 4)
      .orderBy($"key", $"score".desc, $"id".desc).collect().toSeq
    val b = GroupedTopK.windowed(data, Seq("key"), Seq("score", "id"),
        descending = true, k = 4)
      .orderBy($"key", $"score".desc, $"id".desc).collect().toSeq
    assert(a === b)
  }

  test("high-cardinality partition trips the entry cap loudly, not OOM") {
    // every row its own key → keys·k explodes past a tiny cap
    val wide = (1 to 10000).map(i => (i.toLong, i.toLong, 1.0))
      .toDF("key", "id", "score")
    val prev = spark.conf.getOption(GroupedTopK.maxEntriesKey)
    spark.conf.set(GroupedTopK.maxEntriesKey, "100")
    try {
      val e = intercept[org.apache.spark.SparkException] {
        GroupedTopK.of(wide, Seq("key"), Seq("score"), descending = true, k = 2)
          .collect()
      }
      assert(e.getMessage.contains("GroupedTopK") ||
        Option(e.getCause).exists(_.getMessage.contains("GroupedTopK")))
    } finally prev match {
      case Some(v) => spark.conf.set(GroupedTopK.maxEntriesKey, v)
      case None => spark.conf.unset(GroupedTopK.maxEntriesKey)
    }
  }

  test("ofSafe picks the heap plan for bounded keys, the window plan past the cap") {
    val small = GroupedTopK.ofSafe(data, Seq("key"), Seq("score", "id"),
      descending = true, k = 5, estimatedKeys = 7L)
    assert(small.queryExecution.executedPlan.toString.contains("GroupedTopK "))
    val big = GroupedTopK.ofSafe(data, Seq("key"), Seq("score", "id"),
      descending = true, k = 5, estimatedKeys = 100L * 1000 * 1000 * 1000)
    assert(!big.queryExecution.executedPlan.toString.contains("GroupedTopK "))
    // and both compute the same rows
    assert(small.orderBy($"key", $"score".desc, $"id".desc).collect().toSeq ===
      big.orderBy($"key", $"score".desc, $"id".desc).collect().toSeq)
  }

  test("ofSafe never overflows into the heap plan on extreme estimates") {
    // estimatedKeys × k × headroom used to overflow Long negative and
    // select the heap plan for exactly the worst-case inputs; the
    // division compare must pick the windowed plan instead
    val worst = GroupedTopK.ofSafe(data, Seq("key"), Seq("score", "id"),
      descending = true, k = Int.MaxValue, estimatedKeys = Long.MaxValue / 2)
    assert(!worst.queryExecution.executedPlan.toString.contains("GroupedTopK "),
      "overflowed estimate picked the bounded-heap plan")
  }
}
