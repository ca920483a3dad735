package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Text profiling for training-data pipelines: language ID, quality
  * scoring, token counting, document fingerprinting. All per-row
  * column algebra — runs at scan speed, no shuffles.
  */
object TextAnalysis {

  def tokens(text: Column): Column = split(trim(lower(text)), "\\s+")

  /** Whitespace token count. */
  def tokenCount(text: Column): Column = size(Dedup.tokens(text)).cast("long")

  /** BPE-ish subword count estimate — the documented FALLBACK for when
    * no merges table exists (raw crawl triage before a tokenizer is
    * trained, or budgeting against an unknown downstream tokenizer).
    * Anywhere a merges table IS available, use [[subwordCountBpe]]:
    * pack budgets and mixture quotas should count the tokens the
    * trainer actually consumes (etl_pack_sequences / etl_pack_bpe do).
    *
    * The estimate: word-piece segments (maximal runs of letters/digits
    * or of punctuation) + an extra piece per 8 chars of long words.
    * Run-MATCHING (`regexp_extract_all`) rather than boundary-splitting
    * with lookarounds — the same segments, but the pattern is
    * RE2-compatible, so DuckDB can replay it for the oracle (and
    * match-all is cheaper than split-at-lookaround in Java too).
    */
  def subwordCountEstimate(text: Column): Column =
    size(regexp_extract_all(text,
      lit("[\\p{L}\\p{N}]+|[^\\p{L}\\p{N}\\s]+"), lit(0))).cast("long") +
      aggregate(Dedup.tokens(text), lit(0L),
        (acc, w) => acc + greatest(lit(0L), (length(w) / 8).cast("long")))

  /** Rank-ordered BPE merges table for [[subwordCountBpe]]. WELL-FORMED
    * (every composite operand — "th", "an", "in", "ow", "ind", "wind",
    * "va", "val", "valu", "ey", "ta", "tab", "tabl" — is the output of
    * an earlier-ranked rule), which is the property that makes
    * rank-order application identical to the standard min-rank BPE
    * loop (see graft.functions.BpeCount). At production scale this Seq
    * is loaded from a learned merges file; the table itself is data,
    * not code — the engine applies any well-formed table.
    */
  val defaultBpeMerges: Seq[(String, String)] = Seq(
    "t" -> "h", "e" -> "r", "a" -> "n", "i" -> "n", "o" -> "w",
    "th" -> "e", "a" -> "t", "o" -> "r", "s" -> "c", "an" -> "d",
    "in" -> "d", "d" -> "ow", "w" -> "ind", "wind" -> "ow",
    "v" -> "a", "va" -> "l", "val" -> "u", "valu" -> "e",
    "q" -> "u", "e" -> "y", "k" -> "ey",
    "t" -> "a", "ta" -> "b", "tab" -> "l", "tabl" -> "e")

  /** Real merges-table-driven BPE token count (replaces the length
    * heuristic wherever a pack budget or mixture quota needs actual
    * token counts). Codegen'd per-row loop — scan speed, no shuffle.
    */
  def subwordCountBpe(text: Column,
      merges: Seq[(String, String)] = defaultBpeMerges): Column =
    graft.functions.BpeCount.bpe_count(text, merges)

  /** The BPE tokens themselves (ordered, word by word) — vocab
    * profiling and downstream token-id mapping.
    */
  def subwordTokensBpe(text: Column,
      merges: Seq[(String, String)] = defaultBpeMerges): Column =
    graft.functions.BpeCount.bpe_tokens(text, merges)

  /** Deterministic corpus shuffle for training: every row gets a
    * (shard, pos) coordinate that is a pure function of (seed, id) —
    * reproducible across runs, engines, and cluster sizes, unlike
    * `orderBy(rand())`. Shard = md5-hash mod numShards; pos = rank of
    * the hash WITHIN the shard, so each shard's order is independent
    * and the window never sees more than one shard (the scale path: a
    * global shuffle order would funnel the corpus through one sort —
    * per-shard order is what data loaders actually consume). Change
    * `seed` to get a fresh epoch permutation.
    */
  def shuffleShards(df: DataFrame, idCol: String, seed: String,
      numShards: Int): DataFrame = {
    require(numShards >= 1, s"numShards must be >= 1, got $numShards")
    val keyed = df.withColumn("_sk",
      Dedup.portableHash(concat(lit(seed + "|"), col(idCol).cast("string")), 15))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(pmod(col("_sk"), lit(numShards.toLong)))
      .orderBy(col("_sk"), col(idCol))
    keyed
      .withColumn("shard", pmod(col("_sk"), lit(numShards.toLong)).cast("int"))
      .withColumn("pos", row_number().over(w).cast("long"))
      .drop("_sk")
  }

  /** Dense contiguous row ids 0..n-1 following a total key order,
    * WITHOUT the global sort: `row_number() OVER (ORDER BY key)` is
    * the classic 100 TB trap — every row funnels through one sort
    * partition. Instead the key space splits into monotone range
    * buckets (`key div bucketWidth` — order-preserving by
    * construction), per-bucket counts roll into prefix offsets with a
    * window over the BUCKET-sized count frame (sketch-sized, like
    * histogramQuantiles — never the data), and each bucket numbers
    * its own rows in parallel; global id = bucket offset + local
    * rank − 1. One data shuffle on the bucket key (vs the sort's
    * single-partition funnel); `bucketWidth` sizes per-partition work
    * and AQE splits stragglers. Keys need not be dense or start at 0 —
    * only the per-bucket counts matter. For non-integer keys, map
    * through any monotone integer derivation first (epoch seconds,
    * dictionary rank from a sampled range index).
    */
  def stableRowIds(df: DataFrame, keyCol: String,
      bucketWidth: Long = 4096L): DataFrame = {
    require(bucketWidth >= 1, s"bucketWidth must be >= 1, got $bucketWidth")
    val bucketed = df.withColumn("_bkt", expr(s"$keyCol div $bucketWidth"))
    val offs = bucketed.groupBy(col("_bkt")).agg(count(lit(1)).as("_cnt"))
      .withColumn("_off", coalesce(
        sum(col("_cnt")).over(org.apache.spark.sql.expressions.Window
          .orderBy(col("_bkt"))
          .rowsBetween(Long.MinValue, -1)), lit(0L)))
      .select(col("_bkt"), col("_off"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("_bkt")).orderBy(col(keyCol))
    bucketed.join(broadcast(offs), "_bkt")
      .withColumn("row_id",
        col("_off") + row_number().over(w).cast("long") - 1)
      .drop("_bkt", "_off")
  }

  /** LEARN a BPE merges table from a corpus — the training side of
    * [[subwordCountBpe]]/[[subwordTokensBpe]], closing the tokenizer
    * loop in-engine: each iteration merges the most frequent adjacent
    * symbol pair (ties broken by (left, right) string order, so the
    * table is deterministic and oracle-replayable).
    *
    * Scale shape: the corpus is scanned ONCE into a (distinct word,
    * count) table — zipfian text collapses to a vocab-sized frame —
    * and every iteration re-tokenizes only the distinct words under
    * the merges learned so far (the codegen'd BpeTokens expression),
    * counts pairs weighted by word frequency, and collects exactly ONE
    * row (the argmax). Cost: one corpus shuffle + numMerges
    * vocab-sized aggregations, independent of corpus row count. At
    * 100 TB, train on a sample (trainIvfCentroids' contract) — merge
    * statistics converge long before the full corpus is needed.
    *
    * Pair counting is positional (a word [a,a,a] contributes (a,a)
    * twice), matching the oracle's definition; the learned table is
    * WELL-FORMED by construction (a pair can only be observed after
    * its operands exist), which is what [[subwordCountBpe]]'s
    * rank-fixpoint application requires.
    */
  def trainBpeMerges(docs: DataFrame, textCol: String,
      numMerges: Int): Seq[(String, String)] = {
    val wordCounts = docs
      .select(explode(split(trim(lower(col(textCol))), "\\s+")).as("w"))
      .filter(col("w") =!= "")
      .groupBy(col("w")).agg(count(lit(1)).as("cnt"))
      .cache()
    try {
      var merges = Vector.empty[(String, String)]
      var exhausted = false
      while (merges.size < numMerges && !exhausted) {
        val toks = wordCounts
          .select(col("cnt"),
            graft.functions.BpeCount.bpe_tokens(col("w"), merges).as("t"))
          .filter(size(col("t")) >= 2)
          .select(col("cnt"),
            slice(col("t"), lit(1), size(col("t")) - 1).as("la"),
            slice(col("t"), lit(2), size(col("t")) - 1).as("lb"))
        val best = toks
          .select(col("cnt"), explode(arrays_zip(col("la"), col("lb"))).as("p"))
          .groupBy(col("p.la").as("a"), col("p.lb").as("b"))
          .agg(sum(col("cnt")).as("c"))
          .orderBy(col("c").desc, col("a"), col("b"))
          .limit(1).collect()
        if (best.isEmpty) exhausted = true
        else merges :+= ((best(0).getString(0), best(0).getString(1)))
      }
      merges
    } finally wordCounts.unpersist()
  }

  /** Language-ID heuristic: score each language by distinctive
    * marker-token hits (stopword n-gram profile), take the argmax;
    * "und" (undetermined) when nothing matches.
    */
  private val langMarkers: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "and", "of", "is", "to", "in", "that", "with"),
    "es" -> Seq("el", "la", "de", "que", "los", "las", "una", "por"),
    "de" -> Seq("der", "die", "das", "und", "ist", "mit", "für", "nicht"),
    "fr" -> Seq("le", "la", "les", "des", "est", "une", "dans", "pour"),
    "it" -> Seq("il", "la", "che", "di", "per", "con", "una", "sono"))

  private val langsSorted = langMarkers.keys.toSeq.sorted

  /** Marker-hit vote counts per language — one codegen'd pass with a
    * token→language-bitmask lookup (graft.functions.LangVotes); the
    * HOF formulation below is its bit-equality spec oracle.
    */
  def langVotes(text: Column): Column =
    graft.functions.LangVotes.lang_votes(text,
      langsSorted.map(langMarkers))

  /** The composed-built-ins formulation LangVotes replaced — ONE fold
    * over the tokens (a per-marker filter() formulation re-splits the
    * text for every language×marker combination: 40 splits per row),
    * but the fold builds a boxed langs-wide array per token in
    * interpreted evaluation. Kept as the expression's test oracle.
    */
  private[graft] def langVotesHof(text: Column): Column =
    aggregate(
      tokens(text),
      array_repeat(lit(0L), langsSorted.length),
      (acc, t) => zip_with(acc,
        array(langsSorted.map(l =>
          when(t.isin(langMarkers(l): _*), 1L).otherwise(0L)): _*),
        (a, v) => a + v))

  def langScores(text: Column): Column = {
    val votes = langVotes(text)
    map(langsSorted.zipWithIndex.flatMap { case (lang, i) =>
      Seq(lit(lang), element_at(votes, i + 1))
    }: _*)
  }

  /** Predicted language code by marker-hit argmax (ties → alphabetical
    * first, deterministic).
    */
  def langId(text: Column): Column = {
    val votes = langVotes(text)
    val names = typedLit(langsSorted)
    val best = aggregate(
      zip_with(names, votes, (n, v) => struct(n.as("key"), v.as("value"))),
      struct(lit("und").as("key"), lit(0L).as("value")),
      (acc, e) => when(e.getField("value") > acc.getField("value"), e)
        .otherwise(acc))
    best.getField("key")
  }

  /** Document quality heuristics: token count, mean token length,
    * stopword ratio, punctuation ratio, digit ratio — the fields a
    * filtering pipeline thresholds on.
    */
  def qualityProfile(text: Column): Column = {
    val toks = Dedup.tokens(text)
    val nTok = size(toks).cast("long")
    val chars = length(text).cast("double")
    val nonSpace = length(regexp_replace(text, "\\s+", "")).cast("double")
    val stop = langMarkers("en")
    val nStop = stop.map(m =>
      size(filter(tokens(text), t => t === lit(m))).cast("long")).reduce(_ + _)
    struct(
      nTok.as("n_tokens"),
      (nonSpace / nTok.cast("double")).as("avg_token_len"),
      (nStop.cast("double") / nTok.cast("double")).as("stopword_ratio"),
      (length(regexp_replace(text, "[\\p{L}\\p{N}\\s]", "")).cast("double") / chars)
        .as("punct_ratio"),
      (length(regexp_replace(text, "[^0-9]", "")).cast("double") / chars)
        .as("digit_ratio"))
  }

  /** Stratified (quota) sampling for corpus curation: at most `quota`
    * rows per stratum, chosen by deterministic hash order — the
    * per-language / per-source cap a training-data mix needs. Hash
    * order (md5 of the id, id tiebreak) makes the sample reproducible
    * across runs, partitionings, and engines — no RNG state. Cost: one
    * shuffle (window partitioned by stratum); quota bounds per-task
    * memory, and a hot stratum is exactly the salting case SkewOps
    * covers if it ever dominates a task.
    */
  def stratifiedSample(df: DataFrame, strataCol: String, idCol: String,
      quota: Int): DataFrame =
    quotaSample(df, strataCol, idCol, lit(quota))

  /** Shared mechanism for [[stratifiedSample]] and [[weightedMix]]:
    * keep the hash-ordered first `quota` rows per stratum (quota may
    * depend on the stratum; ≤ 0 drops the stratum entirely).
    */
  private def quotaSample(df: DataFrame, strataCol: String, idCol: String,
      quota: Column): DataFrame = {
    val w = Window.partitionBy(col(strataCol))
      .orderBy(md5(col(idCol).cast("string")), col(idCol))
    df.withColumn("_rn", row_number().over(w))
      .filter(col("_rn") <= quota)
      .drop("_rn")
  }

  /** Deterministic hash split — train/val/test assignment that is a
    * pure function of the id and seed: stable across runs, engines, and
    * cluster sizes (no RNG state, no partition order dependence, docs
    * keep their split when the corpus grows). Buckets by the first 8
    * hex chars of md5(seed || id) modulo 100; fractions are integer
    * percents that must sum to ≤ 100 (the remainder becomes "test").
    * Pure per-row algebra — scan speed, no shuffle.
    */
  def hashSplit(df: DataFrame, idCol: String, seed: String,
      trainPct: Int, valPct: Int): DataFrame = {
    require(trainPct >= 0 && valPct >= 0 && trainPct + valPct <= 100,
      s"percents must be 0..100 and sum <= 100, got $trainPct/$valPct")
    val bucket = Dedup.portableHash(
      concat(lit(seed), col(idCol).cast("string")), 8) % 100
    df.withColumn("split",
      when(bucket < trainPct, "train")
        .when(bucket < trainPct + valPct, "val")
        .otherwise("test"))
  }

  /** Line-repetition profile — the "remove boilerplate/repeated lines"
    * quality signal: distinct-line ratio and the share of characters in
    * duplicated lines. Everything is per-row list algebra at scan
    * speed.
    */
  def repetitionProfile(text: Column): Column = {
    val lines = filter(transform(split(text, "\n"), l => trim(l)),
      l => l =!= "")
    val nLines = size(lines).cast("long")
    val nDistinct = size(array_distinct(lines)).cast("long")
    // duplicated-char total via SORTED NEIGHBORS: in array_sort order a
    // line is part of a duplicate run iff it equals its predecessor or
    // successor. One O(L log L) sort + linear zips — never a nested
    // filter(lines, ...) per line, which would re-evaluate the whole
    // split/trim pipeline per element (the CollapseProject O(L²) trap,
    // see Dedup.shingles).
    val lsort = array_sort(lines)
    val nullS = array(lit(null).cast("string"))
    val eqPrev = slice(
      zip_with(lsort, concat(nullS, lsort),
        (c, p) => coalesce(c === p, lit(false))),
      lit(1), size(lsort))
    val eqNext = zip_with(lsort, slice(concat(lsort, nullS), lit(2), size(lsort)),
      (c, nx) => coalesce(c === nx, lit(false)))
    val dupChars = aggregate(
      zip_with(lsort, zip_with(eqPrev, eqNext, (a, b) => a || b),
        (l, isDup) => when(isDup, length(l).cast("long")).otherwise(0L)),
      lit(0L), (acc, x) => acc + x)
    val totChars = aggregate(lines, lit(0L),
      (acc, l) => acc + length(l).cast("long"))
    struct(
      nLines.as("n_lines"),
      nDistinct.as("n_distinct_lines"),
      when(nLines > 0, nDistinct.cast("double") / nLines.cast("double"))
        .otherwise(lit(null).cast("double")).as("distinct_ratio"),
      when(totChars > 0, dupChars.cast("double") / totChars.cast("double"))
        .otherwise(lit(null).cast("double")).as("dup_char_ratio"))
  }

  /** PII patterns — deliberately RE2-compatible (no \b, no
    * lookarounds) so external engines can replay the same scrub.
    */
  val emailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val ipv4Pattern = "([0-9]{1,3}\\.){3}[0-9]{1,3}"

  /** PII scrub: replace emails/IPv4s with typed placeholders, count
    * the redactions — the privacy pass before a corpus ships.
    */
  def piiScrub(text: Column): Column = {
    // IPs are counted AFTER the email replacement so an IPv4-shaped
    // local part inside an email (1.2.3.4@x.co) — replaced once —
    // is not double-counted.
    val afterEmail = regexp_replace(text, emailPattern, "<EMAIL>")
    val n = size(regexp_extract_all(text, lit(emailPattern), lit(0))) +
      size(regexp_extract_all(afterEmail, lit(ipv4Pattern), lit(0)))
    val cleaned = regexp_replace(afterEmail, ipv4Pattern, "<IP>")
    struct(cleaned.as("text"), n.cast("long").as("n_redacted"))
  }

  /** Token-window document chunking — the "split long documents into
    * overlapping context windows" step that precedes embedding or
    * packing in a training pipeline. Chunk i covers tokens
    * [i·stride, i·stride + chunkSize) with stride = chunkSize −
    * overlap; every document yields ≥1 chunk (short docs → one chunk of
    * everything). Pure per-row generation (transform + posexplode) —
    * scan speed, no shuffle, no state.
    */
  def chunkDocuments(df: DataFrame, idCol: String, textCol: String,
      chunkSize: Int, overlap: Int): DataFrame = {
    require(chunkSize > 0 && overlap >= 0 && overlap < chunkSize,
      s"need 0 <= overlap < chunkSize, got chunkSize=$chunkSize overlap=$overlap")
    val stride = chunkSize - overlap
    // Tokenize ONCE per row into a real column; the chunk lambda then
    // slices the materialized array. Inlining the split expression into
    // the lambda body would re-run the tokenizer per chunk (the O(W²)
    // trap documented on Dedup.shingles). The alias survives
    // CollapseProject because it is non-cheap and multi-referenced
    // (collapseProjectAlwaysInline is false by default).
    val toks = col("_toks")
    val nChunks = greatest(lit(1),
      ceil((size(toks) - lit(overlap)).cast("double") / stride).cast("int"))
    df.select(col(idCol), Dedup.tokens(col(textCol)).as("_toks"))
      .select(col(idCol),
        posexplode(transform(sequence(lit(0), nChunks - 1),
          i => array_join(slice(toks, i * stride + 1, lit(chunkSize)), " ")))
          .as(Seq("chunk_id", "chunk_text")))
  }

  /** Sequence packing for training: assign documents (in a stable
    * declared order) to contiguous bins of at most `maxTokens`, the
    * "fill the context window" step before tokenization. Fill-in-order
    * semantics: bin = floor(tokens-before-this-doc / maxTokens), so a
    * document may straddle a boundary (truncation/continuation is the
    * tokenizer's concern). One window over a running sum — linear, and
    * the window partitions by the REQUIRED shard key so no single task
    * ever sees the full corpus. Bins restart per shard; at training
    * time shards map to data-loader streams.
    */
  def packSequences(df: DataFrame, idCol: String, tokenCol: String,
      maxTokens: Long, shardCol: String): DataFrame =
    packSeq(df, idCol, tokenCol, maxTokens, Some(shardCol))

  /** Sequence packing with ONE global bin sequence: the running sum is
    * a single-partition window, so the ENTIRE input funnels through one
    * task. Only for bounded slices (a shard already isolated, a debug
    * sample) — at corpus scale use [[packSequences]] with a shard
    * column. The name is the warning label; it exists so the O(corpus)
    * single-task plan is impossible to pick by accident (it used to be
    * the default via shardCol = None).
    */
  def packSequencesGlobal(df: DataFrame, idCol: String, tokenCol: String,
      maxTokens: Long): DataFrame =
    packSeq(df, idCol, tokenCol, maxTokens, None)

  private def packSeq(df: DataFrame, idCol: String, tokenCol: String,
      maxTokens: Long, shardCol: Option[String]): DataFrame = {
    val w0 = shardCol match {
      case Some(sc) => Window.partitionBy(col(sc))
      case None => Window.partitionBy()
    }
    val w = w0.orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("_cum", sum(col(tokenCol)).over(w))
      .withColumn("bin",
        ((col("_cum") - col(tokenCol)) / maxTokens).cast("long"))
      .drop("_cum")
  }

  /** Weighted mixture quotas: at most `quotas(stratum)` rows per
    * stratum (strata absent from the map are dropped) in deterministic
    * hash order — the per-source mixing-weights step of a training-data
    * recipe, reproducible across runs and engines.
    */
  def weightedMix(df: DataFrame, strataCol: String, idCol: String,
      quotas: Map[String, Int]): DataFrame =
    quotaSample(df, strataCol, idCol,
      quotas.foldLeft(lit(0)) {
        case (acc, (k, q)) => when(col(strataCol) === k, q).otherwise(acc)
      })

  /** Rolling-hash document fingerprint: the k smallest distinct shingle
    * hashes (bottom-k sketch) — stable under small edits, unioned for
    * corpus-level containment estimates.
    */
  def bottomKFingerprint(text: Column, shingleSize: Int = 5, k: Int = 8): Column =
    slice(array_sort(array_distinct(
      transform(Dedup.shingles(text, shingleSize), s => xxhash64(s)))), 1, k)

  /** Portable bottom-k fingerprint: md5-hex shingle hashes ordered
    * lexicographically. Same sketch semantics as [[bottomKFingerprint]]
    * (any uniform hash works for a bottom-k sketch); md5 hex strings
    * are engine-portable, so this variant is oracle-checkable against
    * DuckDB bit-for-bit. Prefer the xxhash64 variant in hot paths —
    * ~4× cheaper per shingle.
    */
  def bottomKFingerprintHex(text: Column, shingleSize: Int = 5, k: Int = 8): Column =
    slice(array_sort(Dedup.md5Shingles(text, shingleSize)), 1, k)
}
