package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.ScalarFunctions._
import graft.sources.TableLayout
import java.nio.file.Files

class ScalarFunctionsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkTest.session
  import spark.implicits._

  private def one(c: org.apache.spark.sql.Column, input: String): Any =
    Seq(Option(input)).toDF("x").select(c).head().get(0)

  test("F2 html unescape covers common entities, &amp; last") {
    val got = Seq(
      "Dance &amp; Techno", "a &lt;b&gt; c", "&quot;hi&quot; &#39;x&#39;",
      "&amp;lt;literal&amp;gt;", "price &euro;50")
      .toDF("x").select(htmlUnescape(col("x"))).collect().map(_.getString(0))
    assert(got(0) === "Dance & Techno")
    assert(got(1) === "a <b> c")
    assert(got(2) === "\"hi\" 'x'")
    assert(got(3) === "&lt;literal&gt;") // double-escaped stays single-escaped
    assert(got(4) === "price €50")
  }

  test("F2 numeric charrefs match Python html.unescape goldens") {
    // goldens computed with CPython html.unescape (WHATWG charref
    // rules); the one documented divergence is &nbsp; → ' ' (Python
    // gives   — our downstream whitespace normalizer treats both
    // as one space)
    val cases = Seq(
      "&#8364;100" -> "€100",
      "&#x2026" -> "…",                   // hex, no semicolon
      "&#X27;ok&#X27;" -> "'ok'",              // uppercase X
      "say&#146;s" -> "say’s",            // cp1252 remap of C1
      "&#65 A" -> "A A",                       // terminator not consumed
      "A&#xD800;B" -> "A�B",              // surrogate → U+FFFD
      "B&#31;C" -> "BC",                       // C0 control → dropped
      "&# end" -> "&# end",                    // no digits → literal
      "&#0;x" -> "�x",
      "&#13;y" -> "\ry",
      "&#1114111;" -> "",                      // 0x10FFFF noncharacter
      "&#1114112;" -> "�",                // beyond Unicode
      "&#xfdd0;z" -> "z",                      // noncharacter block
      "&#65279;" -> "﻿",                  // BOM is valid output
      "&#99999999999999999999;" -> "�",   // parse must not overflow
      "&amp;lt;" -> "&lt;",                    // single-pass semantics
      "&#x41&#x42" -> "AB",
      "tail&" -> "tail&")
    cases.foreach { case (in, want) =>
      assert(one(htmlUnescape(col("x")), in) === want, s"input: $in")
    }
  }

  test("F7 price extraction variants") {
    val cases = Seq(
      "From €50.00 - Tickets available" -> (50.0, "EUR"),
      "free entry" -> (0.0, "EUR"),
      "$25" -> (25.0, "USD"),
      "£15.50" -> (15.5, "GBP"),
      "20,50 EUR" -> (20.5, "EUR"),
      "30 chf" -> (30.0, "CHF"))
    cases.foreach { case (txt, (p, c)) =>
      val r = Seq(txt).toDF("x")
        .select(extractPrice(col("x")).as("p")).select("p.*").head()
      assert(r.getDouble(0) === p, txt)
      assert(r.getString(1) === c, txt)
    }
    val none = Seq("no numbers here").toDF("x")
      .select(extractPrice(col("x")).as("p")).select("p.*").head()
    assert(none.isNullAt(0))
  }

  test("F8 currency normalize strips symbols, validates ISO") {
    val r = Seq(("€1,250.50", "eur")).toDF("a", "c")
      .select(normalizeCurrency(col("a"), col("c")).as("n")).select("n.*").head()
    assert(r.getDouble(0) === 1250.50)
    assert(r.getString(1) === "EUR")
    val bad = Seq(("50", "XYZ")).toDF("a", "c")
      .select(normalizeCurrency(col("a"), col("c")).as("n")).select("n.*").head()
    assert(bad.getString(1) === "EUR")
  }

  test("F14/F16 ticket booleans and cheapest available tier") {
    val tiers = Seq((
      Seq(("GA", 60.0, false), ("VIP", 120.0, false), ("Early", 40.0, true))
        .map(t => (null.asInstanceOf[String], t._1, t._2, "EUR",
          null.asInstanceOf[String], null.asInstanceOf[String], t._3, false))))
      .toDF("tiers")
      .withColumn("tiers", col("tiers").cast(
        "array<struct<tier_id:string,tier_name:string,tier_price:double,currency:string,sale_start:string,sale_end:string,is_sold_out:boolean,is_nearly_sold_out:boolean>>"))
    // cheapest non-sold-out = 60 (40 is sold out)
    assert(tiers.select(cheapestAvailableTier(col("tiers"))).head().getDouble(0) === 60.0)
    val r = Seq(("sold out", "", "")).toDF("status", "txt", "url")
      .select(isSoldOut(col("status")).as("so"),
        hasTicketInfo(lit(null).cast("double"), col("txt"), col("url"),
          lit(null).cast("array<string>")).as("hti")).head()
    assert(r.getBoolean(0) === true)
    assert(r.getBoolean(1) === false)
  }

  test("F3 ibiza date parse formats") {
    val cases = Seq(
      "Friday 15 July 2025" -> "2025-07-15T23:00:00Z",
      "15 Jul 2025" -> "2025-07-15T23:00:00Z",
      "15/7/2025" -> "2025-07-15T23:00:00Z",
      "2025-07-15" -> "2025-07-15T23:00:00Z")
    cases.foreach { case (in, out) =>
      assert(one(parseIbizaDate(col("x")), in) === out, in)
    }
    assert(one(parseIbizaDate(col("x")), "23:00 - 06:00") === null)
  }

  test("F3 universal ladder: shape gates admit every parseable format") {
    // the regex gates ahead of each try_to_timestamp are a pure perf
    // device; this pins that every format the ungated ladder accepted
    // still parses — including single-digit day/month forms, which is
    // where an over-eager gate would bite
    val cases = Seq(
      "2025-07-15T14:30:00+0200" -> "2025-07-15T12:30:00Z",
      "2025-07-15T14:30:00+02:00" -> "2025-07-15T12:30:00Z",
      "2025-07-15T09:15:00Z" -> "2025-07-15T09:15:00Z",
      "2025-07-15 18:45:30" -> "2025-07-15T18:45:30Z",
      "2025-07-15" -> "2025-07-15T00:00:00Z",
      "5/7/2025 22:00" -> "2025-07-05T22:00:00Z",
      "15/7/2025 22:00" -> "2025-07-15T22:00:00Z",
      "5-7-2025 07:30" -> "2025-07-05T07:30:00Z",
      "July 5, 2025 at 2:30 PM" -> "2025-07-05T14:30:00Z",
      "5 July 2025" -> "2025-07-05T00:00:00Z",
      "15 July 2025" -> "2025-07-15T00:00:00Z")
    cases.foreach { case (in, out) =>
      assert(one(parseDateTimeMulti(col("x")), in) === out, in)
    }
    // unparseable / pathological stay null, not mis-gated to a parse
    Seq("sometime soon", "tba", "15 2025", "2025-07-15X10:00",
        null.asInstanceOf[String]).foreach { in =>
      assert(one(parseDateTimeMulti(col("x")), in) === null, s"'$in'")
    }
  }

  test("bucketed tables join without a shuffle") {
    val li = Tables.lineitem(spark, "/root/testdata/sf0.001")
    val o = Tables.orders(spark, "/root/testdata/sf0.001")
    // the in-memory catalog forgets tables between JVMs but the
    // warehouse dirs survive — clear both
    Seq("li_b", "o_b").foreach { t =>
      spark.sql(s"DROP TABLE IF EXISTS $t")
      org.apache.hadoop.fs.FileUtil.fullyDelete(
        new java.io.File(s"spark-warehouse/$t"))
    }
    TableLayout.writeBucketed(li, "li_b", "l_orderkey", 4)
    TableLayout.writeBucketed(o, "o_b", "o_orderkey", 4)
    // force a non-broadcast join so the test proves bucket co-location
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = spark.table("li_b")
        .join(spark.table("o_b"),
          col("l_orderkey") === col("o_orderkey"))
        .select(col("l_orderkey"), col("o_totalprice"))
      joined.collect()
      val p = joined.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
      assert(p.contains("SortMergeJoin"), p.take(800))
      assert(!p.contains("Exchange"),
        "bucketed join must not shuffle:\n" + p.take(1500))
      assert(p.contains("SelectedBucketsCount"), p.take(800))
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("F18: json $type introspection classifies path types") {
    import graft.functions.ScalarFunctions
    val js = """{"s":"hi","n":5,"d":2.5,"b":true,"o":{"x":1},"a":[1,2]}"""
    val df = Seq(js).toDF("j")
    val got = df.select(
      ScalarFunctions.jsonTypeOf(col("j"), "$.s"),
      ScalarFunctions.jsonTypeOf(col("j"), "$.n"),
      ScalarFunctions.jsonTypeOf(col("j"), "$.d"),
      ScalarFunctions.jsonTypeOf(col("j"), "$.b"),
      ScalarFunctions.jsonTypeOf(col("j"), "$.o"),
      ScalarFunctions.jsonTypeOf(col("j"), "$.a"),
      ScalarFunctions.jsonTypeOf(col("j"), "$.nope")).head()
    assert((0 until 7).map(got.getString) ===
      Seq("string", "long", "double", "bool", "object", "array", "missing"))
  }

  test("table layout: month partitioning prunes scans") {
    val ev = spark.read.schema(graft.schema.EventSchema.schema)
      .option("multiLine", true).json("fixtures/events_v2_sample.json")
      .filter(col("datetime.start_date").isNotNull)
    val dir = Files.createTempDirectory("graft_layout").toFile.getAbsolutePath
    TableLayout.writeEventsTable(ev, s"$dir/events")
    val back = TableLayout.readEventsTable(spark, s"$dir/events")
    val sliced = TableLayout.monthSlice(back, "2025-07")
    assert(sliced.count() === 2)
    // partition pruning visible in the physical plan
    val plan = sliced.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") &&
      plan.contains("start_month"), plan.take(500))
  }
}
