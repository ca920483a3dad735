package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Pins every branch of the dtype-adaptive events-ts normalization
  * (the round-9 post-mortem fix) including the refusal paths — the
  * defenses only help if they actually fire.
  */
class TablesContractSpec extends AnyFunSuite {

  lazy val spark = SparkTest.session
  import spark.implicits._

  test("LongType nanos in plausible range converts by floor-division to micros") {
    // 2025-01-01T00:00:00.000000123Z in nanos — the 123 ns truncate away
    val nanos = 1735689600L * 1000000000L + 123L
    val out = Tables.normalizeEventTs(Seq(nanos).toDF("ts"))
    assert(out.schema("ts").dataType === TimestampType)
    val micros = out.select(unix_micros(col("ts"))).head().getLong(0)
    assert(micros === 1735689600L * 1000000L)
  }

  test("LongType at micros magnitude is REFUSED, not silently misdated") {
    val micros2025 = 1735689600L * 1000000L
    val e = intercept[IllegalStateException] {
      Tables.normalizeEventTs(Seq(micros2025).toDF("ts"))
    }
    assert(e.getMessage.contains("not nanos-of-epoch magnitude"))
  }

  test("TIMESTAMP_NTZ casts to session-zone timestamp, instant preserved under UTC") {
    val ntz = Seq("2025-06-01 12:00:00").toDF("raw")
      .select(col("raw").cast(TimestampNTZType).as("ts"))
    val out = Tables.normalizeEventTs(ntz)
    assert(out.schema("ts").dataType === TimestampType)
    assert(out.select(date_format(col("ts"), "yyyy-MM-dd HH:mm:ss"))
      .head().getString(0) === "2025-06-01 12:00:00")
  }

  test("TimestampType passes through untouched") {
    val df = Seq("2025-06-01 12:00:00").toDF("raw")
      .select(col("raw").cast(TimestampType).as("ts"))
    assert(Tables.normalizeEventTs(df) eq df)
  }

  test("any other dtype fails loud naming it") {
    val e = intercept[IllegalStateException] {
      Tables.normalizeEventTs(Seq("x").toDF("ts"))
    }
    assert(e.getMessage.contains("StringType"))
  }
}
