package graft.operators

import graft.{QueryDef, Tables => T}
import org.apache.spark.sql.functions._

/** Text-analysis, dedup, and similarity queries — SURVEY §2.9 text
  * search plus the large-scale training-data-pipeline operators
  * (dedup, ANN similarity, language/quality profiling) over the
  * `documents` and `embeddings` tables.
  *
  * Scale stance: everything here is a scan + narrow transforms + one
  * keyed shuffle. Shingle explosion (jaccard) is bounded per-document;
  * the all-pairs join is shingle-bucketed (inverted index), never a
  * cross join. Cosine similarity against a query vector broadcasts the
  * single query row.
  */
object TextQueries {

  private def words(c: String) = split(trim(col(c)), "\\s+")

  /** floor(ln(1+tf)·1e6) for tf = 0..64, computed once on the JVM and
    * embedded as the SAME literal table in the Spark plan and the
    * oracle SQL — TF saturation without libm in any compared cell. */
  private val tfLnTable: IndexedSeq[Long] =
    (0 to 64).map(tf => math.floor(math.log1p(tf.toDouble) * 1e6).toLong)

  private def tfLnTableSql: String = tfLnTable.mkString("[", ", ", "]")

  /** Porter-lite stemmer as an ordered suffix-rule chain. Each rule is
    * a (pattern, replacement) pair applied once per token in sequence;
    * the SAME rules compile to nested regexp_replace in BOTH engines
    * (Spark/Java regex and DuckDB/RE2), which constrains them to
    * RE2-safe constructs: no lookaround, vowel conditions expressed as
    * captured-prefix character classes. Both engines use Perl-style
    * leftmost-first greedy matching (RE2's default — NOT POSIX
    * leftmost-longest), and each capture group here spans the whole
    * prefix regardless of how the quantifiers split it internally, so
    * the replacements are identical on both sides — an invariant
    * StemmerSpec pins on the JVM pair and the oracle row pins
    * cross-engine. Declared approximation of Porter steps 1a/1b/1c —
    * no measure conditions, no e-restoration — frozen here as the
    * engine's documented stemming semantic (closing the SURVEY §2.9
    * margin: real Mongo $text stems and drops stopwords; the unstemmed
    * variants above keep the frozen equal-weight semantics).
    */
  private[graft] val stemRules: Seq[(String, String)] = Seq(
    "sses$" -> "ss",                          // 1a: caresses -> caress
    "ies$" -> "i",                            // 1a: queries -> queri
    "([a-z]*[^s])s$" -> "$1",                 // 1a: joins -> join, ss kept
    "([a-z]*[aeiou][a-z]*)(ing|ed)$" -> "$1", // 1b: joining/joined -> join
    "([a-z]*[aeiou][a-z]*)y$" -> "$1i")       // 1c: query -> queri, sky -> sky

  private[graft] def stemCol(c: org.apache.spark.sql.Column) =
    stemRules.foldLeft(c) { case (acc, (p, r)) => regexp_replace(acc, p, r) }

  /** The identical chain over a DuckDB expression ($1 → \1 is the only
    * dialect difference; single-quoted SQL strings keep \ literal). */
  private def stemSql(inner: String): String =
    stemRules.foldLeft(inner) { case (acc, (p, r)) =>
      s"regexp_replace($acc, '$p', '${r.replace("$", "\\")}')" }

  /** JVM-side application of the same rules — stems the QUERY terms at
    * plan build so term processing provably matches document
    * processing. */
  private[graft] def stemString(w: String): String =
    stemRules.foldLeft(w) { case (acc, (p, r)) => acc.replaceAll(p, r) }

  private val stopwords = Seq("the", "a", "of", "and", "to", "in")

  /** Full-measure Porter chain (steps 1a–5b) under the same RE2-safe
    * dual-engine compilation as stemRules. Porter's measure conditions
    * compile to prefix patterns: m>0 ⟺ the stem contains a
    * vowel-then-consonant subsequence (`[a-z]*V C [a-z]*`), m>1 ⟺ it
    * contains V C … V C (each V-run→C-run transition is one unit of
    * measure, so a VC…VC subsequence is exactly m≥2). RE2 has no
    * backreferences, so 1b's consonant undoubling is expanded to one
    * rule per letter (all consonants except Porter's l/s/z
    * exclusions), and 1b's e-restoration is fused into the removal
    * rules (`…at|iz|bl + ed|ing → …e`) since a sequential chain cannot
    * see "rule 2/3 fired". Declared deviations from reference Porter,
    * frozen as this engine's semantic and pinned by StemmerSpec:
    * (1) rules cascade — each rule sees the previous rule's output, so
    * where Porter applies one suffix per step, this chain may apply
    * several ("generalize" → "general" → "gener"; reference Porter
    * stops at "general" yet itself maps "general" → "gener" — the
    * cascade is Porter-to-fixpoint-per-word, strictly more
    * normalizing, which is what search recall wants); (2) y is always
    * a consonant in the vowel classes (Porter's position-dependent y
    * needs lookaround); (3) 5a's (m=1 ∧ ¬*o) e-drop enumerates the
    * ¬cvc stem shapes (ends-VV·C, ends-CC, ends-V, V·C, C·V·[wxy])
    * rather than computing *o. Both engines run the IDENTICAL chain,
    * so the oracle hash pins cross-engine parity by construction. */
  private[graft] val stem2Rules: Seq[(String, String)] = {
    val V = "[aeiou]"; val C = "[^aeiou]"
    val m0 = s"[a-z]*$V$C[a-z]*"           // Porter measure > 0
    val m1 = s"[a-z]*$V$C[a-z]*$V$C[a-z]*" // Porter measure > 1
    val undouble = "bcdfghjkmnpqrtvwxy".map(ch =>
      s"([a-z]*$V[a-z]*$ch)$ch(ed|ing)$$" -> "$1")
    Seq(
      // 1a — plurals
      "sses$" -> "ss",
      "ies$"  -> "i",
      "([a-z]*[^s])s$" -> "$1",
      // 1b — eed (m>0), then the fused remove+restore forms, then
      // undoubling, then the plain vowel-stem removal
      s"($m0)eed$$" -> "$1ee",
      s"^($C*$V[^aeiouwxy])(ed|ing)$$" -> "$1e", // cvc short stem: hoping→hope
      s"([a-z]*(at|iz))(ed|ing)$$" -> "$1e",     // conflated→conflate, sized→size
      s"([a-z]*$V[a-z]*bl)(ed|ing)$$" -> "$1e"   // troubled→trouble
    ) ++ undouble ++ Seq(
      s"([a-z]*$V[a-z]*)ing$$" -> "$1",
      // [^e] keeps eed-words out: Porter's longest-suffix scan sends
      // them to the eed rule alone (feed stays feed when m=0)
      s"([a-z]*$V[a-z]*[^e])ed$$" -> "$1",
      // 1c — y→i after a vowel-bearing stem
      s"([a-z]*$V[a-z]*)y$$" -> "$1i",
      // 2 (m>0) — longest suffixes first so e.g. ization beats ation
      s"($m0)ization$$" -> "$1ize",
      s"($m0)ational$$" -> "$1ate",
      s"($m0)tional$$"  -> "$1tion",
      s"($m0)iveness$$" -> "$1ive",
      s"($m0)fulness$$" -> "$1ful",
      s"($m0)ousness$$" -> "$1ous",
      s"($m0)biliti$$"  -> "$1ble",
      s"($m0)iviti$$"   -> "$1ive",
      s"($m0)aliti$$"   -> "$1al",
      s"($m0)ousli$$"   -> "$1ous",
      s"($m0)entli$$"   -> "$1ent",
      s"($m0)alli$$"    -> "$1al",
      s"($m0)abli$$"    -> "$1able",
      s"($m0)ation$$"   -> "$1ate",
      s"($m0)ator$$"    -> "$1ate",
      s"($m0)alism$$"   -> "$1al",
      s"($m0)izer$$"    -> "$1ize",
      s"($m0)enci$$"    -> "$1ence",
      s"($m0)anci$$"    -> "$1ance",
      s"($m0)eli$$"     -> "$1e",
      // 3 (m>0)
      s"($m0)icate$$" -> "$1ic",
      s"($m0)ative$$" -> "$1",
      s"($m0)alize$$" -> "$1al",
      s"($m0)iciti$$" -> "$1ic",
      s"($m0)ical$$"  -> "$1ic",
      s"($m0)ful$$"   -> "$1",
      s"($m0)ness$$"  -> "$1",
      // 4 (m>1) — ion's trailing s/t may itself be the second measure
      // consonant, so its prefix relaxes the second C to the [st]
      s"($m1)ement$$" -> "$1",
      s"($m1)ance$$"  -> "$1",
      s"($m1)ence$$"  -> "$1",
      s"($m1)able$$"  -> "$1",
      s"($m1)ible$$"  -> "$1",
      s"($m1)ment$$"  -> "$1",
      s"($m1)ent$$"   -> "$1",
      s"($m1)ant$$"   -> "$1",
      s"([a-z]*$V$C[a-z]*$V[a-z]*[st])ion$$" -> "$1",
      s"($m1)ism$$"   -> "$1",
      s"($m1)ate$$"   -> "$1",
      s"($m1)iti$$"   -> "$1",
      s"($m1)ous$$"   -> "$1",
      s"($m1)ive$$"   -> "$1",
      s"($m1)ize$$"   -> "$1",
      s"($m1)ou$$"    -> "$1",
      s"($m1)al$$"    -> "$1",
      s"($m1)er$$"    -> "$1",
      s"($m1)ic$$"    -> "$1",
      // 5a — (m>1) e-drop, then the (m=1 ∧ ¬*o) shapes
      s"($m1)e$$" -> "$1",
      s"^($C*$V+$C$C+)e$$" -> "$1",  // ends ≥2 consonants: cease→ceas
      s"^($C*$V+$C+$V+)e$$" -> "$1", // stem ends in a vowel run
      s"^($V+$C)e$$"        -> "$1", // use→us, ice→ic
      s"^($C*$V$V+$C)e$$"   -> "$1", // heate→heat (VVC is not cvc)
      s"^($C+$V[wxy])e$$"   -> "$1", // cvc whose last c is w/x/y is ¬*o
      // 5b — (m>1) ll→l; the first l may be the second measure consonant
      s"([a-z]*$V$C[a-z]*$V[a-z]*l)l$$" -> "$1")
  }

  private[graft] def stem2Col(c: org.apache.spark.sql.Column) =
    stem2Rules.foldLeft(c) { case (acc, (p, r)) => regexp_replace(acc, p, r) }

  private def stem2Sql(inner: String): String =
    stem2Rules.foldLeft(inner) { case (acc, (p, r)) =>
      s"regexp_replace($acc, '$p', '${r.replace("$", "\\")}')" }

  private[graft] def stem2String(w: String): String =
    stem2Rules.foldLeft(w) { case (acc, (p, r)) => acc.replaceAll(p, r) }

  /** The classic public-domain English stopword list (the Lucene
    * StandardAnalyzer 33) — the fuller list the stem2 variant drops
    * before stemming, vs the frozen 6-word subset above. */
  private[graft] val stopwords2 = Seq("a", "an", "and", "are", "as", "at",
    "be", "but", "by", "for", "if", "in", "into", "is", "it", "no", "not",
    "of", "on", "or", "such", "that", "the", "their", "then", "there",
    "these", "they", "this", "to", "was", "will", "with")

  /** Hard cap on the collected stem-dictionary size (the query stems'
    * preimages within the vocab — a bounded driver artifact like the
    * Bloom bits and the CMS literal table). A real vocabulary maps a
    * handful of query stems to at most a few dozen surface forms; a
    * set anywhere near this cap means the corpus is pathological
    * (adversarial tokens, binary soup) and a driver-sized INSET is the
    * wrong plan — fail loudly rather than balloon the driver. */
  private[graft] val stem2DictCap = 100000

  /** Collect the matched-token set for the stem2 dictionary plan,
    * guarded by [[stem2DictCap]]. The limit(cap+1) bounds the driver
    * transfer itself (never materializes more than cap+1 rows), and
    * stays deterministic whenever the guard passes: a result within
    * the cap is the complete matched set. Pinned by RegistrySmokeSpec.
    */
  private[graft] def collectStemDict(
      vocab: org.apache.spark.sql.DataFrame,
      terms: Seq[String], cap: Int = stem2DictCap): Seq[String] = {
    val matched = vocab
      .withColumn("stem", stem2Col(col("tok")))
      .filter(col("stem").isin(terms: _*))
      .limit(cap + 1)
      .collect().map(_.getString(0)).toSeq
    require(matched.size <= cap,
      s"stem2 dictionary exceeded $cap matched tokens — " +
        "vocabulary is pathological; a driver-sized INSET is the wrong " +
        "plan (shard the vocab or fall back to the inline chain)")
    matched
  }

  val registry: Map[String, QueryDef] = Map(

    // SURVEY §2.9: declared text-search semantics — tokenize on
    // whitespace, count case-insensitive whole-token matches across the
    // search terms (equal field weights), sort by score desc.
    "t9_text_search" -> QueryDef(
      (s, d) => {
        // Single tokenize + one filter over the term set: since terms
        // are distinct, count(tokens ∈ terms) ≡ Σ per-term counts —
        // identical result to the oracle's per-term formulation at a
        // third of the scan work.
        val terms = Seq("spark", "query", "join")
        val toks = split(lower(col("text")), "\\s+")
        val score = size(filter(toks, x => x.isin(terms: _*)))
          .cast("long")
        T.documents(s, d)
          .select(col("doc_id"), score.as("score"))
          .filter(col("score") > 0)
          .orderBy(col("score").desc, col("doc_id"))
          .limit(20)
      },
      """SELECT doc_id,
        |  len(list_filter(string_split_regex(lower(text), '\s+'), x -> x = 'spark'))
        |  + len(list_filter(string_split_regex(lower(text), '\s+'), x -> x = 'query'))
        |  + len(list_filter(string_split_regex(lower(text), '\s+'), x -> x = 'join')) AS score
        |FROM documents
        |WHERE len(list_filter(string_split_regex(lower(text), '\s+'), x -> x = 'spark'))
        |  + len(list_filter(string_split_regex(lower(text), '\s+'), x -> x = 'query'))
        |  + len(list_filter(string_split_regex(lower(text), '\s+'), x -> x = 'join')) > 0
        |ORDER BY score DESC, doc_id LIMIT 20""".stripMargin),

    // TF-weighted text search — the variant that mirrors Mongo's
    // textScore SHAPE (reference: database/query_examples.py:227-244
    // sorts on {$meta: "textScore"}; database/fix_schema.py:142-148
    // indexes five fields at equal weight): per term, the
    // contribution grows as ln(1+tf) rather than linearly, so a
    // document repeating one term 50 times no longer drowns one
    // matching all terms once. The frozen equal-weight variant above
    // stays as SURVEY §2.9's declared approximation; COVERAGE.md
    // records which semantic each row mirrors. Scoring is integer-
    // exact cross-engine: ln never runs in either engine — the score
    // is Σ table[min(tf,64)] from a floor(ln(1+tf)·1e6) literal table
    // computed once on the JVM and embedded in both plans
    // (the Sketches.linearTable pattern).
    "t9_text_search_tf" -> QueryDef(
      (s, d) => {
        val terms = Seq("spark", "query", "join")
        val toks = split(lower(col("text")), "\\s+")
        val score = terms.map { t =>
          val tf = size(filter(toks, x => x === lit(t)))
          element_at(array(tfLnTable.map(lit): _*),
            least(tf, lit(64)) + 1)
        }.reduce(_ + _)
        T.documents(s, d)
          .select(col("doc_id"), score.as("score_x1e6"))
          .filter(col("score_x1e6") > 0)
          .orderBy(col("score_x1e6").desc, col("doc_id"))
          .limit(20)
      },
      s"""WITH t AS (
         |  SELECT doc_id,
         |    string_split_regex(lower(text), '\\s+') AS w
         |  FROM documents),
         |sc AS (
         |  SELECT doc_id,
         |    list_extract($tfLnTableSql,
         |      least(len(list_filter(w, x -> x = 'spark')), 64) + 1)
         |    + list_extract($tfLnTableSql,
         |      least(len(list_filter(w, x -> x = 'query')), 64) + 1)
         |    + list_extract($tfLnTableSql,
         |      least(len(list_filter(w, x -> x = 'join')), 64) + 1)
         |      AS score_x1e6
         |  FROM t)
         |SELECT doc_id, CAST(score_x1e6 AS BIGINT) AS score_x1e6
         |FROM sc WHERE score_x1e6 > 0
         |ORDER BY score_x1e6 DESC, doc_id LIMIT 20""".stripMargin),

    // BM25 ranking — the industry-standard relevance function the
    // rest of the t9 family approximates pieces of: per term,
    // idf · tf·(k1+1) / (tf + k1·(1−b + b·dl/avgdl)) with k1=1.2,
    // b=0.75 — TF saturation (like the ln(1+tf) variant) PLUS
    // doc-length normalization (long documents stop winning on bulk).
    // Exactness discipline: the whole formula runs in BIGINT
    // fixed-point — idf as floor(log2(n_docs div df)) via
    // length(bin)−1, k1/b as ×1e3 integer constants, every division
    // integral — so both engines produce identical cells with no
    // float in the pipeline. Scale shape: corpus stats (n_docs,
    // avgdl, per-term df) partial-aggregate to ONE broadcast row;
    // scoring is then a scan-speed projection into the top-k — no
    // shuffle touches per-doc data.
    "t9_bm25" -> QueryDef(
      (s, d) => {
        // "dup" is the corpus's one discriminative term (df ~5% —
        // idf 4 bits); query/join sit in ~78% of docs, so the integral
        // floor-log2 idf correctly zeroes them as stopword-grade —
        // the ranking shows idf weighting AND length normalization
        // doing their jobs on a mixed query.
        val terms = Seq("dup", "query", "join")
        val toks = split(lower(col("text")), "\\s+")
        def tf(t: String) = size(filter(toks, x => x === lit(t))).cast("long")
        val stats = T.documents(s, d).agg(
          count(lit(1)).as("n_docs"),
          sum(size(toks).cast("long")).as("total_toks") +:
            terms.zipWithIndex.map { case (t, i) =>
              sum(when(tf(t) > 0, 1L).otherwise(0L)).as(s"df_$i") }: _*)
        val withCols = terms.zipWithIndex.foldLeft(
          T.documents(s, d)
            .select(col("doc_id"), toks.as("w"))
            .crossJoin(broadcast(stats))
            .withColumn("avgdl", expr("total_toks div n_docs"))
            .withColumn("dl", size(col("w")).cast("long"))) {
          case (df, (t, i)) => df
            .withColumn(s"tfc_$i",
              size(filter(col("w"), x => x === lit(t))).cast("long"))
            .withColumn(s"idf_$i", (length(bin(
              expr(s"n_docs div greatest(df_$i, 1)"))) - 1).cast("long"))
        }
        // all-BIGINT fixed point: den_x1e3 = tf·1e3 + k1·(1−b+b·dl/avgdl)·1e3
        val score = expr(terms.indices.map(i =>
          s"idf_$i * (tfc_$i * 2200 * 1000) div (tfc_$i * 1000 + " +
            "1200 * (250 + (750 * dl * 1000 div avgdl) div 1000) div 1000)")
          .mkString(" + "))
        withCols.select(col("doc_id"), score.as("bm25_x1e3"))
          .filter(col("bm25_x1e3") > 0)
          .orderBy(col("bm25_x1e3").desc, col("doc_id"))
          .limit(20)
      },
      """WITH d0 AS (
        |  SELECT doc_id, string_split_regex(lower(text), '\s+') AS w
        |  FROM documents),
        |tfs AS (
        |  SELECT doc_id, len(w) AS dl,
        |    len(list_filter(w, x -> x = 'dup')) AS tf0,
        |    len(list_filter(w, x -> x = 'query')) AS tf1,
        |    len(list_filter(w, x -> x = 'join')) AS tf2
        |  FROM d0),
        |st AS (
        |  SELECT COUNT(*) AS n_docs, SUM(dl) // COUNT(*) AS avgdl,
        |    SUM(CASE WHEN tf0 > 0 THEN 1 ELSE 0 END) AS df0,
        |    SUM(CASE WHEN tf1 > 0 THEN 1 ELSE 0 END) AS df1,
        |    SUM(CASE WHEN tf2 > 0 THEN 1 ELSE 0 END) AS df2
        |  FROM tfs),
        |sc AS (
        |  SELECT doc_id,
        |    (length(bin(n_docs // greatest(df0, 1))) - 1)
        |      * (tf0 * 2200 * 1000)
        |      // (tf0 * 1000 + 1200 * (250 + (750 * dl * 1000 // avgdl) // 1000) // 1000)
        |    + (length(bin(n_docs // greatest(df1, 1))) - 1)
        |      * (tf1 * 2200 * 1000)
        |      // (tf1 * 1000 + 1200 * (250 + (750 * dl * 1000 // avgdl) // 1000) // 1000)
        |    + (length(bin(n_docs // greatest(df2, 1))) - 1)
        |      * (tf2 * 2200 * 1000)
        |      // (tf2 * 1000 + 1200 * (250 + (750 * dl * 1000 // avgdl) // 1000) // 1000)
        |    AS bm25_x1e3
        |  FROM tfs CROSS JOIN st)
        |SELECT doc_id, CAST(bm25_x1e3 AS BIGINT) AS bm25_x1e3
        |FROM sc WHERE bm25_x1e3 > 0
        |ORDER BY bm25_x1e3 DESC, doc_id LIMIT 20""".stripMargin),

    // Stemmed + stopword-dropped text search — the closest variant to
    // real Mongo $text semantics (which stems terms and ignores
    // language stopwords; reference: database/fix_schema.py:142-148
    // declares the text index, database/query_examples.py:227-244
    // consumes it): tokens are lowercased, stopwords removed, then
    // Porter-lite-stemmed (rule chain above, identical in both
    // engines), and the score counts stem matches against the STEMMED
    // query terms — so "queries", "query", "joining", "joins" all hit.
    // Same scan-shape as t9_text_search: one pass, no shuffle before
    // the top-k.
    "t9_text_search_stem" -> QueryDef(
      (s, d) => {
        val terms = Seq("spark", "query", "join").map(stemString)
        val toks = split(lower(col("text")), "\\s+")
        val stems = transform(
          filter(toks, x => !x.isin(stopwords: _*)), x => stemCol(x))
        val score = size(filter(stems, x => x.isin(terms: _*)))
          .cast("long")
        T.documents(s, d)
          .select(col("doc_id"), score.as("score"))
          .filter(col("score") > 0)
          .orderBy(col("score").desc, col("doc_id"))
          .limit(20)
      },
      {
        val termsSql = Seq("spark", "query", "join").map(stemString)
          .map(t => s"'$t'").mkString(", ")
        val stopSql = stopwords.map(t => s"'$t'").mkString(", ")
        s"""WITH t AS (
           |  SELECT doc_id, list_transform(
           |    list_filter(string_split_regex(lower(text), '\\s+'),
           |      x -> x NOT IN ($stopSql)),
           |    x -> ${stemSql("x")}) AS st
           |  FROM documents)
           |SELECT doc_id,
           |  len(list_filter(st, x -> x IN ($termsSql))) AS score
           |FROM t
           |WHERE len(list_filter(st, x -> x IN ($termsSql))) > 0
           |ORDER BY score DESC, doc_id LIMIT 20""".stripMargin
      }),

    // Full-measure Porter search — the stem chain above upgraded with
    // Porter's measure-conditioned steps 2–5 (stem2Rules) and the full
    // 33-word English stopword list, closing the remaining declared
    // gap to real Mongo $text stemming (reference:
    // database/fix_schema.py:142-148 declares the text index;
    // query_examples.py:227-244 consumes it). Derivational variants
    // now converge ("optimization", "optimizing", "optimizer" → one
    // stem) where the lite chain only folds inflections. Query terms
    // go through the identical JVM chain at plan build (stem2String),
    // so term/document processing parity holds by construction; the
    // oracle runs the same 70-rule chain compiled to DuckDB
    // regexp_replace.
    //
    // Unlike the lite variant's inline scan (cheap chain, applied per
    // token occurrence), the 70-rule chain is DICTIONARY-applied: the
    // distinct vocab is collected via one token-keyed partial-agg
    // shuffle, the chain runs once per DISTINCT token (vocab-bounded —
    // r11 measured the inline form at 10.9 s warm on sf0.1, ~7× the
    // next-slowest registry query, because 70 regexes × every token
    // occurrence is corpus-sized work), and the matched-token set
    // (the query stems' preimages within the vocab) broadcast-joins
    // back to the token stream. This is also how a real engine ships
    // Porter at 100 TB: a stem dictionary, not a per-occurrence chain.
    //
    // The vocab is localCheckpointed and the matched set COLLECTED,
    // both deliberately. Without the vocab barrier Catalyst pushes the
    // stem-match filter BELOW the distinct (stem is a deterministic
    // function of tok), running the chain per occurrence (measured
    // 24.5 s). A broadcast-join formulation doesn't help either:
    // localCheckpoint PRESERVES origin constraints on the LogicalRDD,
    // so InferFiltersFromConstraints re-derives the 70-regex predicate
    // onto the probe side of the join (measured 12.7 s). Collecting
    // the matched tokens — the query stems' preimages within the
    // vocab, a bounded driver artifact like the Bloom bits and the CMS
    // literal table — yields the plan a search engine actually wants:
    // a literal INSET filter at scan speed, zero regex at execution.
    // The collect itself is capped (collectStemDict / stem2DictCap) so
    // a pathological vocabulary fails loudly instead of ballooning the
    // driver INSET.
    "t9_text_search_stem2" -> QueryDef(
      (s, d) => {
        val terms =
          Seq("optimization", "query", "joined").map(stem2String).distinct
        val toks = split(lower(col("text")), "\\s+")
        val tokens = T.documents(s, d)
          .select(col("doc_id"), explode(toks).as("tok"))
        // stopwords are dropped on the VOCAB branch only: matched is a
        // subset of the stopword-filtered vocab, so re-probing the
        // 33-word set per token occurrence on the scoring scan would
        // be a redundant second INSET
        val vocab = tokens.filter(!col("tok").isin(stopwords2: _*))
          .select(col("tok")).distinct().localCheckpoint()
        val matched = collectStemDict(vocab, terms)
        tokens.filter(col("tok").isin(matched: _*))
          .groupBy(col("doc_id"))
          .agg(count(lit(1)).as("score"))
          .orderBy(col("score").desc, col("doc_id"))
          .limit(20)
      },
      {
        val termsSql = Seq("optimization", "query", "joined")
          .map(stem2String).distinct.map(t => s"'$t'").mkString(", ")
        val stopSql = stopwords2.map(t => s"'$t'").mkString(", ")
        s"""WITH t AS (
           |  SELECT doc_id, list_transform(
           |    list_filter(string_split_regex(lower(text), '\\s+'),
           |      x -> x NOT IN ($stopSql)),
           |    x -> ${stem2Sql("x")}) AS st
           |  FROM documents)
           |SELECT doc_id,
           |  len(list_filter(st, x -> x IN ($termsSql))) AS score
           |FROM t
           |WHERE len(list_filter(st, x -> x IN ($termsSql))) > 0
           |ORDER BY score DESC, doc_id LIMIT 20""".stripMargin
      }),

    // Inverted-index probe == direct scan: postings (token, doc_id,
    // tf) are what a 100 TB search surface STORES (partitioned by
    // token bucket, built in one scan + one token-keyed partial-agg
    // shuffle); a query then reads ONLY its terms' postings — the
    // corpus is never rescanned per query. This row builds the
    // postings, answers the standing 3-term query from the index
    // alone, and joins the direct scan-scored result in-row: the two
    // score columns must agree on every row (index == scan, the
    // merge==direct pattern applied to search). Postings tf is the
    // same whole-token count as t9_text_search, so the frozen
    // equal-weight semantic carries over unchanged.
    "t9_index_probe" -> QueryDef(
      (s, d) => {
        val terms = Seq("spark", "query", "join")
        val toks = split(lower(col("text")), "\\s+")
        val postings = T.documents(s, d)
          .select(col("doc_id"), explode(toks).as("tok"))
          .groupBy(col("tok"), col("doc_id"))
          .agg(count(lit(1)).as("tf"))
        val probed = postings.filter(col("tok").isin(terms: _*))
          .groupBy(col("doc_id"))
          .agg(sum(col("tf")).as("idx_score"))
        val direct = T.documents(s, d)
          .select(col("doc_id"),
            size(filter(toks, x => x.isin(terms: _*))).cast("long")
              .as("scan_score"))
          .filter(col("scan_score") > 0)
        probed.join(direct, "doc_id")
          .select(col("doc_id"), col("idx_score"), col("scan_score"))
          .orderBy(col("idx_score").desc, col("doc_id"))
          .limit(20)
      },
      """WITH p AS (
        |  SELECT doc_id, unnest(string_split_regex(lower(text), '\s+'))
        |    AS tok
        |  FROM documents),
        |postings AS (
        |  SELECT tok, doc_id, COUNT(*) AS tf FROM p GROUP BY 1, 2),
        |probed AS (
        |  SELECT doc_id, CAST(SUM(tf) AS BIGINT) AS idx_score
        |  FROM postings WHERE tok IN ('spark', 'query', 'join')
        |  GROUP BY 1),
        |direct AS (
        |  SELECT doc_id,
        |    len(list_filter(string_split_regex(lower(text), '\s+'),
        |      x -> x IN ('spark', 'query', 'join'))) AS scan_score
        |  FROM documents)
        |SELECT pr.doc_id, pr.idx_score, CAST(d.scan_score AS BIGINT)
        |  AS scan_score
        |FROM probed pr JOIN direct d ON d.doc_id = pr.doc_id
        |WHERE d.scan_score > 0
        |ORDER BY pr.idx_score DESC, pr.doc_id LIMIT 20""".stripMargin),

    // Token counting (whitespace tokenizer) — training-data pipeline op.
    "ta_token_count" -> QueryDef(
      (s, d) => T.documents(s, d)
        .select(col("doc_id"), col("lang"),
          size(words("text")).cast("long").as("n_tokens"))
        .orderBy(col("doc_id")),
      """SELECT doc_id, lang,
        |  len(string_split_regex(trim(text), '\s+')) AS n_tokens
        |FROM documents ORDER BY doc_id""".stripMargin),

    // Heuristic document quality scoring: token count, mean token
    // length, stopword ratio — all integer-derived, bit-exact.
    "ta_quality_score" -> QueryDef(
      (s, d) => {
        val w = words("text")
        val nTok = size(w).cast("long")
        val nStop = Seq("the", "a", "of")
          .map(t => size(filter(w, x => x === lit(t))).cast("long"))
          .reduce(_ + _)
        T.documents(s, d)
          .select(col("doc_id"), nTok.as("n_tokens"),
            (length(regexp_replace(col("text"), "\\s+", "")).cast("double") /
              nTok.cast("double")).as("avg_token_len"),
            (nStop.cast("double") / nTok.cast("double")).as("stopword_ratio"))
          .orderBy(col("doc_id"))
      },
      """WITH t AS (SELECT doc_id, text,
        |    string_split_regex(trim(text), '\s+') AS w FROM documents)
        |SELECT doc_id, len(w) AS n_tokens,
        |  CAST(length(regexp_replace(text, '\s+', '', 'g')) AS DOUBLE)
        |    / CAST(len(w) AS DOUBLE) AS avg_token_len,
        |  CAST(len(list_filter(w, x -> x = 'the'))
        |     + len(list_filter(w, x -> x = 'a'))
        |     + len(list_filter(w, x -> x = 'of')) AS DOUBLE)
        |    / CAST(len(w) AS DOUBLE) AS stopword_ratio
        |FROM t ORDER BY doc_id""".stripMargin),

    // Corpus language profile (grouping over the language column; the
    // n-gram language-ID heuristic itself lives in TextAnalysis and is
    // spec-tested).
    "ta_lang_profile" -> QueryDef(
      (s, d) => T.documents(s, d)
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"),
          T.decAvg(col("n_chars")).as("avg_chars"),
          sum(col("n_chars")).as("total_chars"))
        .orderBy(col("lang")),
      s"""SELECT lang, COUNT(*) AS n_docs,
         |  ${T.sqlDecAvg("n_chars")} AS avg_chars,
         |  CAST(SUM(n_chars) AS BIGINT) AS total_chars
         |FROM documents GROUP BY lang ORDER BY lang""".stripMargin),

    // Exact near-dup fingerprinting: md5 over whitespace-normalized
    // text; groups sized >1 are exact duplicates (SURVEY §2.12 analog
    // at corpus scale: hash-groupBy dedup).
    "dd_exact_fingerprint" -> QueryDef(
      (s, d) => T.documents(s, d)
        .select(col("doc_id"),
          md5(trim(regexp_replace(col("text"), "\\s+", " "))).as("fp"))
        .groupBy(col("fp"))
        .agg(count(lit(1)).as("n"), min(col("doc_id")).as("first_doc"))
        .orderBy(col("n").desc, col("fp"))
        .limit(50),
      """SELECT md5(trim(regexp_replace(text, '\s+', ' ', 'g'))) AS fp,
        |  COUNT(*) AS n, MIN(doc_id) AS first_doc
        |FROM documents GROUP BY 1
        |ORDER BY n DESC, fp LIMIT 50""".stripMargin),

    // Incremental corpus-growth dedup: a NEW batch admitted against
    // the fingerprints of the already-ingested corpus (the operation
    // every continuously-growing training corpus runs on arrival —
    // batch-internal first-wins per fingerprint, then an anti-join
    // against the corpus fingerprint table, which at 100 TB is the
    // stored side table keyed by fp, one hash join, never a rescan of
    // corpus text). Summary row pins counts AND which docs were
    // admitted (id checksum).
    "dd_incremental_novel" -> QueryDef(
      (s, d) => {
        val fp = md5(trim(regexp_replace(col("text"), "\\s+", " ")))
        val docs = T.documents(s, d).select(col("doc_id"), fp.as("fp"))
        val corpus = docs.filter(col("doc_id") < 400)
          .select(col("fp")).distinct()
        val batch = docs.filter(col("doc_id") >= 400)
        val firstPerFp = batch.groupBy(col("fp"))
          .agg(min(col("doc_id")).as("doc_id"))
        val admitted = firstPerFp.join(corpus, Seq("fp"), "left_anti")
        batch.agg(count(lit(1)).as("batch_rows"))
          .crossJoin(firstPerFp.agg(count(lit(1)).as("batch_distinct")))
          .crossJoin(admitted.agg(count(lit(1)).as("n_novel"),
            sum(col("doc_id")).as("novel_id_sum")))
          .withColumn("dup_vs_corpus",
            col("batch_distinct") - col("n_novel"))
      },
      """WITH f AS (
        |  SELECT doc_id,
        |    md5(trim(regexp_replace(text, '\s+', ' ', 'g'))) AS fp
        |  FROM documents),
        |corpus AS (SELECT DISTINCT fp FROM f WHERE doc_id < 400),
        |batch AS (SELECT * FROM f WHERE doc_id >= 400),
        |firstfp AS (
        |  SELECT fp, MIN(doc_id) AS doc_id FROM batch GROUP BY fp),
        |adm AS (
        |  SELECT * FROM firstfp
        |  WHERE NOT EXISTS (SELECT 1 FROM corpus c WHERE c.fp = firstfp.fp))
        |SELECT
        |  (SELECT COUNT(*) FROM batch) AS batch_rows,
        |  (SELECT COUNT(*) FROM firstfp) AS batch_distinct,
        |  (SELECT COUNT(*) FROM adm) AS n_novel,
        |  (SELECT CAST(SUM(doc_id) AS BIGINT) FROM adm) AS novel_id_sum,
        |  (SELECT COUNT(*) FROM firstfp) - (SELECT COUNT(*) FROM adm)
        |    AS dup_vs_corpus""".stripMargin),

    // dd_incremental_novel generalized from exact fingerprints to
    // MinHash NEAR-dup: each batch doc probes the corpus band index
    // one-sided (batch broadcast — incremental cost ∝ batch, never
    // corpus²). Integer outputs only: best signature agreement out of
    // 32 and a >= 16 (est 0.5) flag. Oracle replays the portable
    // md5-base signatures and the same one-sided band join.
    "dd_incremental_neardup" -> QueryDef(
      (s, d) => {
        val docs = T.documents(s, d)
        Dedup.nearDupAgainstCorpus(
          docs.filter(col("doc_id") < 400),
          docs.filter(col("doc_id") >= 400),
          "doc_id", "text", numHashes = 32, bands = 16,
          shingleSize = 1, minEq = 16, portable = true)
          .orderBy(col("id"))
      },
      {
        val coeffs = Dedup.portableCoeffs(32)
          .zipWithIndex
          .map { case ((a, b), i) => s"($i, ${a}, ${b})" }
          .mkString(", ")
        s"""WITH coeffs(i, a, b) AS (VALUES $coeffs),
           |sh AS (
           |  SELECT doc_id,
           |    list_distinct(string_split_regex(trim(text), '\\s+')) AS shingles
           |  FROM documents),
           |vals AS (
           |  SELECT doc_id, i,
           |    list_min(list_transform(shingles,
           |      s -> (CAST(('0x' || substr(md5(s), 1, 7)) AS BIGINT) * a + b)
           |           % 2147483647)) AS v
           |  FROM sh, coeffs),
           |sig AS (SELECT doc_id, list(v ORDER BY i) AS sig
           |        FROM vals GROUP BY doc_id),
           |bands AS (
           |  SELECT doc_id, b, sig[2*b + 1 : 2*b + 2] AS sl
           |  FROM sig, range(0, 16) r(b)),
           |cand AS (
           |  SELECT DISTINCT q.doc_id AS id, c.doc_id AS cid
           |  FROM bands q JOIN bands c ON q.b = c.b AND q.sl = c.sl
           |  WHERE q.doc_id >= 400 AND c.doc_id < 400),
           |eq AS (
           |  SELECT cand.id, cand.cid,
           |    len(list_filter(range(1, 33), i -> s1.sig[i] = s2.sig[i]))
           |      AS n_eq
           |  FROM cand
           |  JOIN sig s1 ON s1.doc_id = cand.id
           |  JOIN sig s2 ON s2.doc_id = cand.cid),
           |agg AS (SELECT id, COUNT(*) AS n_corpus_cands,
           |               MAX(n_eq) AS best_eq FROM eq GROUP BY id)
           |SELECT d.doc_id AS id,
           |  COALESCE(a.n_corpus_cands, 0) AS n_corpus_cands,
           |  CAST(COALESCE(a.best_eq, 0) AS BIGINT) AS best_eq,
           |  CAST(COALESCE(a.best_eq, 0) >= 16 AS INTEGER) AS is_neardup
           |FROM (SELECT doc_id FROM documents WHERE doc_id >= 400) d
           |LEFT JOIN agg a ON a.id = d.doc_id
           |ORDER BY id""".stripMargin
      }),

    // Span-level duplication census (the "Deduplicating Training Data
    // Makes Language Models Better" pattern, Lee et al. 2022: doc-level
    // dedup misses repeated SPANS — boilerplate, licenses, templated
    // headers — inside otherwise-unique documents). Each document
    // shingles into word-8-grams; a shingle occurring in >= 2 distinct
    // documents marks its instances as duplicated span mass; the
    // output is each doc's duplicated-instance fraction (×1e6,
    // integral) — the signal a span-removal pass cuts on. Scale shape:
    // the shingle explode is the known 8× token-volume cost of span
    // dedup; both aggregations partial-combine map-side on the shingle
    // key, and the doc-frequency table (distinct shingles, far smaller
    // than instances) joins back on that same key — two keyed
    // shuffles, never all-pairs. At 100 TB the shingle column is
    // hashed to 8 bytes first; strings stay here for oracle
    // readability at test scale.
    "dd_dup_span_fraction" -> QueryDef(
      (s, d) => {
        val docs = T.documents(s, d)
          .select(col("doc_id"), words("text").as("t"))
          .filter(size(col("t")) >= 8)
        val inst = docs.select(col("doc_id"), explode(expr(
          "transform(sequence(0, size(t)-8), " +
            "i -> array_join(slice(t, i+1, 8), ' '))")).as("s"))
        val perDoc = inst.groupBy(col("doc_id"), col("s"))
          .agg(count(lit(1)).as("inst"))
        val docFreq = perDoc.groupBy(col("s"))
          .agg(count(lit(1)).as("n_docs"))
        perDoc.join(docFreq, "s")
          .groupBy(col("doc_id"))
          .agg(sum(col("inst")).as("n_shingles"),
            sum(when(col("n_docs") >= 2, col("inst")).otherwise(0L))
              .as("n_dup"))
          .withColumn("dup_frac_x1e6",
            expr("n_dup * 1000000 div n_shingles"))
          .orderBy(col("dup_frac_x1e6").desc, col("doc_id"))
          .limit(100)
      },
      """WITH d0 AS (
        |  SELECT doc_id, string_split_regex(trim(text), '\s+') AS t
        |  FROM documents),
        |inst AS (
        |  SELECT doc_id, unnest(list_transform(range(0, len(t)-7),
        |    i -> array_to_string(t[i+1:i+8], ' '))) AS s
        |  FROM d0 WHERE len(t) >= 8),
        |perdoc AS (
        |  SELECT doc_id, s, COUNT(*) AS inst FROM inst GROUP BY 1, 2),
        |docfreq AS (SELECT s, COUNT(*) AS n_docs FROM perdoc GROUP BY 1),
        |agg AS (
        |  SELECT doc_id, CAST(SUM(inst) AS BIGINT) AS n_shingles,
        |    CAST(SUM(CASE WHEN n_docs >= 2 THEN inst ELSE 0 END)
        |      AS BIGINT) AS n_dup
        |  FROM perdoc JOIN docfreq USING (s) GROUP BY 1)
        |SELECT doc_id, n_shingles, n_dup,
        |  CAST(n_dup * 1000000 // n_shingles AS BIGINT) AS dup_frac_x1e6
        |FROM agg ORDER BY dup_frac_x1e6 DESC, doc_id LIMIT 100""".stripMargin),

    // N-gram (word-bigram) Jaccard near-dup pairs over a bounded id
    // slice, via an inverted shingle index join (no cross join) —
    // integer intersection/union then one deterministic division.
    "dd_ngram_jaccard" -> QueryDef(
      (s, d) => {
        // Bigrams via zip_with against the shifted slice — O(W) per
        // row; element_at-indexed transform is O(W²) because
        // CollapseProject inlines the tokenizer alias per element.
        // Result is identical to the oracle's index formulation.
        val docs = T.documents(s, d).filter(col("doc_id") < 40)
          .select(col("doc_id"), words("text").as("w"))
        val sh = docs.select(col("doc_id"),
          array_distinct(filter(
            zip_with(col("w"), slice(col("w"), lit(2), size(col("w"))),
              (a, b) => concat(a, lit(" "), b)),
            x => x.isNotNull)).as("shingles"))
        val sizes = sh.select(col("doc_id"), size(col("shingles")).cast("long").as("n"))
        val inv = sh.select(col("doc_id"), explode(col("shingles")).as("s"))
        val a = inv.as("a"); val b = inv.as("b")
        val inter = a.join(b,
            col("a.s") === col("b.s") && col("a.doc_id") < col("b.doc_id"))
          .groupBy(col("a.doc_id").as("id1"), col("b.doc_id").as("id2"))
          .agg(count(lit(1)).as("n_inter"))
        inter
          .join(sizes.withColumnRenamed("doc_id", "id1").withColumnRenamed("n", "n1"), "id1")
          .join(sizes.withColumnRenamed("doc_id", "id2").withColumnRenamed("n", "n2"), "id2")
          .select(col("id1"), col("id2"),
            (col("n_inter").cast("double") /
              (col("n1") + col("n2") - col("n_inter")).cast("double")).as("jaccard"))
          .filter(col("jaccard") >= 0.1)
          .orderBy(col("jaccard").desc, col("id1"), col("id2"))
      },
      """WITH sh AS (
        |  SELECT doc_id, unnest(list_distinct(list_transform(
        |    range(1, len(string_split_regex(trim(text), '\s+'))),
        |    i -> string_split_regex(trim(text), '\s+')[i] || ' ' ||
        |         string_split_regex(trim(text), '\s+')[i+1]))) AS s
        |  FROM documents WHERE doc_id < 40),
        |sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
        |inter AS (
        |  SELECT a.doc_id AS id1, b.doc_id AS id2, COUNT(*) AS n_inter
        |  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2)
        |SELECT id1, id2,
        |  CAST(n_inter AS DOUBLE) / CAST(s1.n + s2.n - n_inter AS DOUBLE) AS jaccard
        |FROM inter
        |JOIN sizes s1 ON s1.doc_id = id1
        |JOIN sizes s2 ON s2.doc_id = id2
        |WHERE CAST(n_inter AS DOUBLE) / CAST(s1.n + s2.n - n_inter AS DOUBLE) >= 0.1
        |ORDER BY jaccard DESC, id1, id2""".stripMargin),

    // Brute-force cosine top-k against a query vector (vec_id = 0) —
    // the ANN baseline. Elements are quantized to round(x·1e7) longs
    // first (|x| < 1 → every product, square, and 64-element sum stays
    // under 2^53), making dot products and norms exact integers in both
    // engines — fully deterministic ordering, no float-summation drift.
    // The query row broadcasts; the per-element explode shuffles only
    // vec_id-keyed longs.
    "sim_cosine_topk" -> QueryDef(
      (s, d) => {
        // Per-row integer folds (sums of quantized products are exact
        // longs, order-independent — same values as the oracle's
        // unnest+SUM) instead of explode+groupBy: no shuffle at all
        // except the final TakeOrderedAndProject.
        val quant = (c: org.apache.spark.sql.Column) =>
          transform(c, x => round(x.cast("double") * 1e7).cast("long"))
        val emb = T.embeddings(s, d)
        val q = emb.filter(col("vec_id") === 0)
          .select(quant(col("embedding")).as("qv"))
        val lsum = (c: org.apache.spark.sql.Column) =>
          aggregate(c, lit(0L), (acc, x) => acc + x)
        emb.filter(col("vec_id") =!= 0)
          .crossJoin(broadcast(q))
          .select(col("vec_id"),
            lsum(zip_with(quant(col("embedding")), col("qv"), (x, y) => x * y)).as("dot"),
            lsum(transform(quant(col("embedding")), x => x * x)).as("nx"),
            lsum(transform(col("qv"), y => y * y)).as("ny"))
          .select(col("vec_id"),
            (col("dot").cast("double") /
              (sqrt(col("nx").cast("double")) * sqrt(col("ny").cast("double")))).as("cosine"))
          .orderBy(col("cosine").desc, col("vec_id"))
          .limit(10)
      },
      """WITH q AS (
        |  SELECT list_transform(embedding,
        |    x -> CAST(round(CAST(x AS DOUBLE) * 1e7, 0) AS BIGINT)) AS qv
        |  FROM embeddings WHERE vec_id = 0),
        |z AS (
        |  SELECT vec_id, unnest(list_zip(list_transform(embedding,
        |    x -> CAST(round(CAST(x AS DOUBLE) * 1e7, 0) AS BIGINT)), qv)) AS u
        |  FROM embeddings, q WHERE vec_id <> 0),
        |sums AS (
        |  SELECT vec_id,
        |    CAST(SUM(u[1] * u[2]) AS BIGINT) AS dot,
        |    CAST(SUM(u[1] * u[1]) AS BIGINT) AS nx,
        |    CAST(SUM(u[2] * u[2]) AS BIGINT) AS ny
        |  FROM z GROUP BY vec_id)
        |SELECT vec_id, CAST(dot AS DOUBLE) / (sqrt(CAST(nx AS DOUBLE)) * sqrt(CAST(ny AS DOUBLE))) AS cosine
        |FROM sums ORDER BY cosine DESC, vec_id LIMIT 10""".stripMargin),

    // SURVEY §2.8 F1/F19: whitespace-normalize + snippet truncation.
    "f19_snippet" -> QueryDef(
      (s, d) => T.documents(s, d)
        .select(col("doc_id"),
          concat(substring(trim(regexp_replace(col("text"), "\\s+", " ")), 1, 50),
            lit("...")).as("snippet"))
        .orderBy(col("doc_id")).limit(100),
      """SELECT doc_id,
        |  substring(trim(regexp_replace(text, '\s+', ' ', 'g')), 1, 50) || '...' AS snippet
        |FROM documents ORDER BY doc_id LIMIT 100""".stripMargin)
  )
}
