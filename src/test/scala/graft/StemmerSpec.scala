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

  /** Full-measure chain (stem2Rules): measure-conditioned steps 2–5.
    * Where a case matches reference Porter it says so; the cascade
    * deviations ("element", "agreement" — Porter's one-suffix-per-step
    * vs this chain's fixpoint) are pinned as the frozen semantic. */
  private val cases2 = Seq(
    // 1a/1b/1c carried over, plus the restoration forms
    "caresses"     -> "caress",
    "agreed"       -> "agre",     // (m>0) eed→ee, then 5a (m=1 ∧ ¬*o) e-drop
    "feed"         -> "feed",     // m=0 blocks eed
    "hoping"       -> "hope",     // cvc short-stem e-restore
    "hopping"      -> "hop",      // undoubling
    "falling"      -> "fall",     // l exempt from undoubling
    "sized"        -> "size",     // iz + e-restore
    "troubled"     -> "troubl",   // bl + e-restore, then 5a (¬*o) e-drop
    "conflated"    -> "conflat",  // at + e-restore, then 5a (m>1) e-drop
    "happy"        -> "happi",
    "dying"        -> "dying",    // y-as-consonant: no aeiou stem vowel
    // step 2 (m>0) — all reference-Porter-exact
    "relational"   -> "relat",    // ational→ate, then (m>1) e-drop
    "conditional"  -> "condit",   // tional→tion, then (*t, m>1) ion
    "rational"     -> "ration",   // m("r")=0 blocks ational; step-4 al fires
    "sensational"  -> "sensat",
    "optimization" -> "optim",    // ization→ize, then (m>1) ize
    "optimizer"    -> "optim",    // izer→ize, same convergence
    "optimizing"   -> "optim",    // iz-restore→optimize, same convergence
    "formality"    -> "formal",   // y→i, aliti→al; m("form")=1 blocks step-4 al
    // step 3 (m>0)
    "electrical"   -> "electr",   // ical→ic, then (m>1) ic
    "triplicate"   -> "triplic",
    "hopefulness"  -> "hope",     // fulness→ful, ful→∅, e survives 5a
    "goodness"     -> "good",
    // step 4 (m>1)
    "adjustment"   -> "adjust",
    "replacement"  -> "replac",
    "adoption"     -> "adopt",
    "allowance"    -> "allow",
    "defensible"   -> "defens",
    "effective"    -> "effect",
    "element"      -> "elem",     // cascade deviation: Porter stops at ement
    // step 5
    "probate"      -> "probat",   // (m>1) e-drop
    "rate"         -> "rate",     // m=1 ∧ *o keeps the e
    "cease"        -> "ceas",     // VVC stem is ¬*o
    "use"          -> "us",
    "controlling"  -> "control",  // (m>1) ll→l
    "rolling"      -> "roll",     // m=1 keeps ll
    "sky"          -> "sky",
    ""             -> "")

  test("stem2String matches the hand-derived measure-rule table") {
    for ((in, want) <- cases2)
      assert(graft.operators.TextQueries.stem2String(in) === want,
        s"stem2('$in')")
  }

  test("stem2: query-term path (JVM) == document path (Spark expression)") {
    import spark.implicits._
    val words = cases2.map(_._1) ++ cases.map(_._1) ++ Seq("mixes",
      "generalization", "activate", "demonstrable", "irritant",
      "vietnamization", "predication", "operator", "feudalism",
      "decisiveness", "callousness", "analogousli", "vileli")
    val viaSpark = words.toDF("w")
      .select(graft.operators.TextQueries.stem2Col(col("w")).as("s"))
      .collect().map(_.getString(0)).toSeq
    assert(viaSpark === words.map(graft.operators.TextQueries.stem2String),
      "JVM replaceAll and Spark regexp_replace disagree on a token")
  }
}
