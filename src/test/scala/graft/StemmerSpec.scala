package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins the Porter-lite stem rules (TextQueries.stemRules) on
  * hand-derived cases, and proves the JVM-regex path (stemString, used
  * on QUERY terms at plan build) agrees with the Spark-expression path
  * (stemCol, used on DOCUMENT tokens) token-for-token — the invariant
  * t9_text_search_stem relies on for term/document processing parity.
  * (DuckDB's RE2 side of the same chain is proven by the
  * t9_text_search_stem oracle row hash-matching.)
  */
class StemmerSpec extends AnyFunSuite {

  lazy val spark = SparkTest.session

  private val cases = Seq(
    // step 1a
    "caresses" -> "caress",
    "queries"  -> "queri",
    "joins"    -> "join",
    "process"  -> "process",   // ss is not a plural s
    // step 1b (vowel required in the stem)
    "joining"  -> "join",
    "joined"   -> "join",
    "ing"      -> "ing",       // no vowel before the suffix
    // step 1c (vowel required before y)
    "query"    -> "queri",
    "sky"      -> "sky",
    // untouched
    "spark"    -> "spark",
    "the"      -> "the",
    ""         -> "")

  test("stemString matches the hand-derived table") {
    for ((in, want) <- cases)
      assert(graft.operators.TextQueries.stemString(in) === want,
        s"stem('$in')")
  }

  test("query-term path (JVM regex) == document path (Spark expression)") {
    import spark.implicits._
    val words = cases.map(_._1) ++ Seq("mixes", "flies", "trying",
      "stopped", "glass", "carries", "busy", "apply")
    val viaSpark = words.toDF("w")
      .select(graft.operators.TextQueries.stemCol(col("w")).as("s"))
      .collect().map(_.getString(0)).toSeq
    assert(viaSpark === words.map(graft.operators.TextQueries.stemString),
      "JVM replaceAll and Spark regexp_replace disagree on a token")
  }
}
