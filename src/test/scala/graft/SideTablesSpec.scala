package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.SideTables

class SideTablesSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkTest.session
  import spark.implicits._

  private def attempts(seed: Int, n: Int) = {
    val rng = new scala.util.Random(seed)
    (0 until n).map { _ =>
      (s"m${rng.nextInt(4)}", s"d${rng.nextInt(3)}",
        rng.nextBoolean(), f"2025-06-${rng.nextInt(28) + 1}%02d")
    }.toDF("method", "domain", "success", "used_at")
  }

  test("extraction-methods upsert conserves: upsert(agg(A), B) == agg(A ∪ B)") {
    val a = attempts(1, 500)
    val b = attempts(2, 300)
    val viaUpsert = SideTables
      .extractionMethodsUpsert(SideTables.extractionMethodsAgg(a), b)
      .orderBy($"method", $"domain").collect().toSeq
    val direct = SideTables.extractionMethodsAgg(a.unionByName(b))
      .orderBy($"method", $"domain").collect().toSeq
    assert(viaUpsert === direct)
  }

  test("extraction-methods upsert with keys on only one side keeps both") {
    val a = Seq(("css", "x.com", true, "2025-06-01")).toDF(
      "method", "domain", "success", "used_at")
    val b = Seq(("llm", "y.com", false, "2025-06-02")).toDF(
      "method", "domain", "success", "used_at")
    val merged = SideTables
      .extractionMethodsUpsert(SideTables.extractionMethodsAgg(a), b)
      .orderBy($"method").collect()
    assert(merged.length === 2)
    val css = merged(0)
    assert(css.getAs[Long]("success_count") === 1L &&
      css.getAs[Long]("failure_count") === 0L &&
      css.getAs[String]("last_used") === "2025-06-01")
    val llm = merged(1)
    assert(llm.getAs[Long]("success_count") === 0L &&
      llm.getAs[Long]("failure_count") === 1L &&
      llm.getAs[Double]("success_rate") === 0.0)
  }

  test("score history summary: n_runs conserves the log and latest wins by time") {
    val log = Seq(
      ("ev1", "r1", "2025-06-01T00:00:00Z", 0.5),
      ("ev1", "r2", "2025-06-08T00:00:00Z", 0.7),
      ("ev1", "r3", "2025-06-04T00:00:00Z", 0.9),
      ("ev2", "r1", "2025-06-01T00:00:00Z", 0.2))
      .toDF("event_id", "run_id", "calculated_at", "overall_score")
    val got = SideTables.scoreHistorySummary(log)
      .orderBy($"event_id").collect()
    assert(got.map(_.getAs[Long]("n_runs")).sum === 4L)
    val ev1 = got(0)
    assert(ev1.getAs[Double]("latest_score") === 0.7) // by time, not value
    assert(ev1.getAs[Double]("max_score") === 0.9)
    assert(ev1.getAs[Double]("min_score") === 0.5)
  }

  test("validation summary ties on validated_at break by type, deterministically") {
    val log = Seq(
      ("ev1", "schema", "2025-06-01T00:00:00Z", true),
      ("ev1", "fields", "2025-06-01T00:00:00Z", false))
      .toDF("event_id", "validation_type", "validated_at", "passed")
    val r = SideTables.validationSummary(log).collect()(0)
    assert(r.getAs[Long]("n_checks") === 2L)
    assert(r.getAs[Long]("n_passed") === 1L)
    // tiebreak: validation_type ascending → "fields"
    assert(r.getAs[String]("last_type") === "fields")
  }
}
