package graft.operators

import graft.{QueryDef, Tables => T}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Training-data-pipeline operator queries over documents/embeddings —
  * MinHash LSH, SimHash, ANN (inline and persisted-index), language
  * ID, fingerprints. Every row registers WITH oracle SQL: the seeded
  * families (permutations, hyperplanes, quantizers) are replayed in
  * DuckDB from the same pinned literals / integer-hash arithmetic, so
  * the driver's hash gate covers the full pipeline — semantics are
  * additionally pinned in DedupSimilaritySpec against hand-built
  * near-duplicate corpora.
  */
object PipelineQueries {

  // Cluster labels over the bounded corpus slice, computed once per sf
  // dir and shared by dd_dup_clusters / dd_canonical_docs — the
  // production pattern: the pair-generation + label-propagation output
  // is a table both the cluster report and the canonical selection
  // read, not something each query re-derives. The labels are
  // localCheckpointed inside duplicateClusters, so the cached plan is
  // a leaf scan.
  private val clusterCache =
    scala.collection.concurrent.TrieMap[String, org.apache.spark.sql.DataFrame]()

  // keyed by (applicationId, dir): a cached DataFrame is bound to the
  // SparkContext that built it — reusing it from a NEW session in the
  // same JVM would fail with "SparkContext has been shut down". Stale
  // apps' entries are evicted on insert so cycling sessions can't
  // accumulate dead plans.
  private def clustersFor(s: org.apache.spark.sql.SparkSession,
      d: String): org.apache.spark.sql.DataFrame = {
    val prefix = s.sparkContext.applicationId + ":"
    clusterCache.keys.filterNot(_.startsWith(prefix))
      .foreach(clusterCache.remove)
    clusterCache.getOrElseUpdate(prefix + d, {
      Dedup.duplicateClusters(Dedup.ngramJaccardPairs(
        T.documents(s, d).filter(col("doc_id") < 500), "doc_id", "text",
        n = 2, minJaccard = 0.5))
    })
  }

  // Shared DuckDB mirror of the cluster-label computation (2-gram
  // jaccard >= 0.5 pairs over doc_id < 500 → min-reachable-id labels),
  // used by both dd_dup_clusters and dd_canonical_docs. The
  // single-token fallback mirrors Dedup.shingles: a doc with fewer
  // than n tokens contributes its whole text as one shingle.
  private val clusterOracleCte: String =
    """WITH RECURSIVE sh AS (
      |  SELECT doc_id, unnest(
      |    CASE WHEN len(w) < 2 THEN [array_to_string(w, ' ')]
      |         ELSE list_distinct(list_transform(range(1, len(w)),
      |           i -> w[i] || ' ' || w[i+1])) END) AS s
      |  FROM (SELECT doc_id, string_split_regex(trim(text), '\s+') AS w
      |        FROM documents WHERE doc_id < 500)),
      |sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
      |pairs AS (
      |  SELECT a.doc_id AS id1, b.doc_id AS id2, COUNT(*) AS n_inter
      |  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
      |  GROUP BY 1, 2),
      |jp AS (
      |  SELECT id1, id2 FROM pairs
      |  JOIN sizes s1 ON s1.doc_id = id1 JOIN sizes s2 ON s2.doc_id = id2
      |  WHERE CAST(n_inter AS DOUBLE) / CAST(s1.n + s2.n - n_inter AS DOUBLE) >= 0.5),
      |edges AS (SELECT id1 AS a, id2 AS b FROM jp
      |          UNION SELECT id2, id1 FROM jp),
      |reach(n, m) AS (
      |  SELECT a, a FROM edges
      |  UNION
      |  SELECT r.n, e.b FROM reach r JOIN edges e ON r.m = e.a),
      |labels AS (SELECT n AS doc_id, MIN(m) AS cluster_id
      |           FROM reach GROUP BY n)
      |""".stripMargin

  /** The `sim_knn_join_ivfpq` oracle — the full quantization pipeline
    * (pinned centroids/codebooks → cell assignment → PQ encode →
    * per-query LUT → ordered ADC fold → shortlist → exact rerank)
    * replayed in DuckDB. Shared VERBATIM by `sim_index_probe`: the
    * same SQL passing for both rows is the proof that the persisted
    * index ([[AnnIndex]]) answers bit-identically to the inline join.
    * `extraCols` appends constant proof columns to the final SELECT.
    */
  /** `embExpr` swaps the raw embedding for a transformed one (the
    * latest-wins update row reverses a slice of the corpus — queries
    * must stay guarded to `vec_id % 50 <> 0` inside the expression);
    * `nprobe` widens the query-side probe set (the update row scans
    * every cell so no cross-cell shadow can mask the dedup under
    * test). Defaults reproduce the original oracle byte-for-byte. */
  private def ivfPqOracle(extraCols: String,
      embExpr: String = "embedding", nprobe: Int = 2): String =
    s"""WITH cen(i, c) AS (VALUES ${IvfCentroids.sqlValues}),
       |cn AS (
       |  SELECT i, c, list_reduce(list_transform(c, x -> x * x),
       |    (a, b) -> a + b) AS cnorm FROM cen),
       |pq(j, cc, pc) AS (VALUES ${PqCodebooks.sqlValues}),
       |pqn AS (
       |  SELECT j, cc, pc, list_reduce(list_transform(pc, x -> x * x),
       |    (a, b) -> a + b) AS pnorm FROM pq),
       |emb AS (
       |  SELECT vec_id,
       |    list_transform($embExpr, x -> CAST(x AS DOUBLE)) AS v
       |  FROM embeddings),
       |n AS (
       |  SELECT vec_id, v, sqrt(list_reduce(list_transform(v, t -> t * t),
       |    (a, b) -> a + b)) AS nrm FROM emb),
       |assign AS (
       |  SELECT vec_id, i AS cell FROM (
       |    SELECT e.vec_id, cn.i, row_number() OVER (PARTITION BY e.vec_id
       |      ORDER BY cn.cnorm - 2.0 * list_reduce(
       |        list_transform(range(1, ${IvfCentroids.dim + 1}),
       |          j -> e.v[j] * cn.c[j]), (a, b) -> a + b), cn.i) AS rn
       |    FROM emb e, cn WHERE e.vec_id % 50 <> 0) WHERE rn = 1),
       |codes AS (
       |  SELECT vec_id, j, cc FROM (
       |    SELECT e.vec_id, p.j, p.cc, row_number() OVER (
       |      PARTITION BY e.vec_id, p.j
       |      ORDER BY p.pnorm - 2.0 * list_reduce(
       |        list_transform(range(1, ${PqCodebooks.dsub + 1}),
       |          t -> e.v[p.j * ${PqCodebooks.dsub} + t] * p.pc[t]),
       |        (a, b) -> a + b), p.cc) AS rn
       |    FROM emb e, pqn p WHERE e.vec_id % 50 <> 0) WHERE rn = 1),
       |qprobe AS (
       |  SELECT vec_id, cell FROM (
       |    SELECT e.vec_id, cn.i AS cell, row_number() OVER (
       |      PARTITION BY e.vec_id
       |      ORDER BY cn.cnorm - 2.0 * list_reduce(
       |        list_transform(range(1, ${IvfCentroids.dim + 1}),
       |          j -> e.v[j] * cn.c[j]), (a, b) -> a + b), cn.i) AS rn
       |    FROM emb e, cn WHERE e.vec_id % 50 = 0) WHERE rn <= $nprobe),
       |lut AS (
       |  SELECT e.vec_id, p.j, p.cc, list_reduce(
       |    list_transform(range(1, ${PqCodebooks.dsub + 1}),
       |      t -> e.v[p.j * ${PqCodebooks.dsub} + t] * p.pc[t]),
       |    (a, b) -> a + b) AS d
       |  FROM emb e, pq p WHERE e.vec_id % 50 = 0),
       |adc AS (
       |  SELECT q.vec_id AS query_id, c.vec_id AS corpus_id,
       |    list_reduce(list(l.d ORDER BY l.j), (a, b) -> a + b)
       |      / (any_value(cv.nrm) * any_value(qv.nrm)) AS adc_cosine
       |  FROM qprobe q JOIN assign c ON c.cell = q.cell
       |  JOIN codes cd ON cd.vec_id = c.vec_id
       |  JOIN lut l ON l.vec_id = q.vec_id AND l.j = cd.j
       |    AND l.cc = cd.cc
       |  JOIN n cv ON cv.vec_id = c.vec_id
       |  JOIN n qv ON qv.vec_id = q.vec_id
       |  GROUP BY q.vec_id, c.vec_id),
       |short AS (
       |  SELECT query_id, corpus_id FROM (
       |    SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
       |      ORDER BY adc_cosine DESC, corpus_id DESC) AS rn
       |    FROM adc) WHERE rn <= 9),
       |rr AS (
       |  SELECT s.query_id, s.corpus_id,
       |    list_reduce(list_transform(range(1, ${IvfCentroids.dim + 1}),
       |      t -> cv.v[t] * qv.v[t]), (a, b) -> a + b)
       |      / (cv.nrm * qv.nrm) AS cosine
       |  FROM short s JOIN n cv ON cv.vec_id = s.corpus_id
       |  JOIN n qv ON qv.vec_id = s.query_id)
       |SELECT query_id, corpus_id, cosine$extraCols FROM (
       |  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
       |    ORDER BY cosine DESC, corpus_id DESC) AS rn FROM rr)
       |WHERE rn <= 3
       |ORDER BY query_id, cosine DESC, corpus_id""".stripMargin

  /** Shared fixture of the persisted-index rows: fresh index under
    * `root` for this sf dir, BUILT from the `%7 != 3` corpus slab and
    * APPENDED with the `%7 == 3` slab (pinned quantizer). One place
    * owns the slab split — the build/compact censuses and the probe
    * row must exercise the same incremental shape or their oracles
    * drift. Returns the index path. */
  private def annIndexFixture(s: org.apache.spark.sql.SparkSession,
      d: String, root: String): String = {
    val dir = new java.io.File(root + "/" +
      d.replaceAll("[^A-Za-z0-9.]", "_") + "/idx").getAbsolutePath
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(s.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(dir).getParent, true)
    val emb = T.embeddings(s, d)
    AnnIndex.build(s, dir,
      emb.filter(col("vec_id") % 50 =!= 0 && col("vec_id") % 7 =!= 3),
      "vec_id", "embedding", IvfCentroids.pinned, PqCodebooks.pinned)
    AnnIndex.append(s, dir,
      emb.filter(col("vec_id") % 50 =!= 0 && col("vec_id") % 7 === 3),
      "vec_id", "embedding")
    dir
  }

  /** The corpus-side IVF cell assignment replayed in DuckDB from the
    * pinned centroids (strict-less argmin, index tiebreak) — the
    * shared prefix of both index-census oracles; `finalSelect` reads
    * from the `assign(vec_id, cell)` CTE. */
  private def ivfAssignCensusOracle(finalSelect: String): String =
    s"""WITH cen(i, c) AS (VALUES ${IvfCentroids.sqlValues}),
       |cn AS (
       |  SELECT i, c, list_reduce(list_transform(c, x -> x * x),
       |    (a, b) -> a + b) AS cnorm FROM cen),
       |emb AS (
       |  SELECT vec_id,
       |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
       |  FROM embeddings),
       |assign AS (
       |  SELECT vec_id, i AS cell FROM (
       |    SELECT e.vec_id, cn.i, row_number() OVER (PARTITION BY e.vec_id
       |      ORDER BY cn.cnorm - 2.0 * list_reduce(
       |        list_transform(range(1, ${IvfCentroids.dim + 1}),
       |          j -> e.v[j] * cn.c[j]), (a, b) -> a + b), cn.i) AS rn
       |    FROM emb e, cn WHERE e.vec_id % 50 <> 0) WHERE rn = 1)
       |$finalSelect""".stripMargin

  /** The `sim_knn_join_pq_recall90` oracle — ADC ranking at the
    * largest shortlist, rank-prefix curve, smallest qualifying
    * shortlist, pairs + measured recall — shared VERBATIM by
    * `sim_index_probe_recall90`: the same SQL passing for both rows
    * proves the persisted index's recall dial is bit-identical to
    * the inline join's. */
  private def pqRecall90Oracle: String =
    s"""WITH cen(i, c) AS (VALUES ${IvfCentroids.sqlValues}),
       |cn AS (
       |  SELECT i, c, list_reduce(list_transform(c, x -> x * x),
       |    (a, b) -> a + b) AS cnorm FROM cen),
       |pq(j, cc, pc) AS (VALUES ${PqCodebooks.sqlValues}),
       |pqn AS (
       |  SELECT j, cc, pc, list_reduce(list_transform(pc, x -> x * x),
       |    (a, b) -> a + b) AS pnorm FROM pq),
       |emb AS (
       |  SELECT vec_id,
       |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
       |  FROM embeddings),
       |n AS (
       |  SELECT vec_id, v, sqrt(list_reduce(list_transform(v, t -> t * t),
       |    (a, b) -> a + b)) AS nrm FROM emb),
       |assign AS (
       |  SELECT vec_id, i AS cell FROM (
       |    SELECT e.vec_id, cn.i, row_number() OVER (PARTITION BY e.vec_id
       |      ORDER BY cn.cnorm - 2.0 * list_reduce(
       |        list_transform(range(1, ${IvfCentroids.dim + 1}),
       |          j -> e.v[j] * cn.c[j]), (a, b) -> a + b), cn.i) AS rn
       |    FROM emb e, cn WHERE e.vec_id % 50 <> 0) WHERE rn = 1),
       |codes AS (
       |  SELECT vec_id, j, cc FROM (
       |    SELECT e.vec_id, p.j, p.cc, row_number() OVER (
       |      PARTITION BY e.vec_id, p.j
       |      ORDER BY p.pnorm - 2.0 * list_reduce(
       |        list_transform(range(1, ${PqCodebooks.dsub + 1}),
       |          t -> e.v[p.j * ${PqCodebooks.dsub} + t] * p.pc[t]),
       |        (a, b) -> a + b), p.cc) AS rn
       |    FROM emb e, pqn p WHERE e.vec_id % 50 <> 0) WHERE rn = 1),
       |qprobe AS (
       |  SELECT vec_id, cell FROM (
       |    SELECT e.vec_id, cn.i AS cell, row_number() OVER (
       |      PARTITION BY e.vec_id
       |      ORDER BY cn.cnorm - 2.0 * list_reduce(
       |        list_transform(range(1, ${IvfCentroids.dim + 1}),
       |          j -> e.v[j] * cn.c[j]), (a, b) -> a + b), cn.i) AS rn
       |    FROM emb e, cn WHERE e.vec_id % 50 = 0) WHERE rn <= 2),
       |lut AS (
       |  SELECT e.vec_id, p.j, p.cc, list_reduce(
       |    list_transform(range(1, ${PqCodebooks.dsub + 1}),
       |      t -> e.v[p.j * ${PqCodebooks.dsub} + t] * p.pc[t]),
       |    (a, b) -> a + b) AS d
       |  FROM emb e, pq p WHERE e.vec_id % 50 = 0),
       |adc AS (
       |  SELECT q.vec_id AS query_id, c.vec_id AS corpus_id,
       |    list_reduce(list(l.d ORDER BY l.j), (a, b) -> a + b)
       |      / (any_value(cv.nrm) * any_value(qv.nrm)) AS adc_cosine
       |  FROM qprobe q JOIN assign c ON c.cell = q.cell
       |  JOIN codes cd ON cd.vec_id = c.vec_id
       |  JOIN lut l ON l.vec_id = q.vec_id AND l.j = cd.j
       |    AND l.cc = cd.cc
       |  JOIN n cv ON cv.vec_id = c.vec_id
       |  JOIN n qv ON qv.vec_id = q.vec_id
       |  GROUP BY q.vec_id, c.vec_id),
       |cand AS (
       |  SELECT query_id, corpus_id, rn AS adc_rank FROM (
       |    SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
       |      ORDER BY adc_cosine DESC, corpus_id DESC) AS rn
       |    FROM adc) WHERE rn <= 24),
       |scored AS (
       |  SELECT s.query_id, s.corpus_id, s.adc_rank,
       |    list_reduce(list_transform(range(1, ${IvfCentroids.dim + 1}),
       |      t -> cv.v[t] * qv.v[t]), (a, b) -> a + b)
       |      / (cv.nrm * qv.nrm) AS cosine
       |  FROM cand s JOIN n cv ON cv.vec_id = s.corpus_id
       |  JOIN n qv ON qv.vec_id = s.query_id),
       |sx(s) AS (VALUES (3), (6), (12), (24)),
       |topk AS (
       |  SELECT s, query_id, corpus_id, cosine FROM (
       |    SELECT sx.s, sc.*, ROW_NUMBER() OVER (
       |      PARTITION BY sx.s, sc.query_id
       |      ORDER BY sc.cosine DESC, sc.corpus_id DESC) AS rn2
       |    FROM sx, scored sc WHERE sc.adc_rank <= sx.s)
       |  WHERE rn2 <= 3),
       |scoredx AS (
       |  SELECT q.vec_id AS query_id, c.vec_id AS corpus_id,
       |    list_reduce(list_transform(range(1, ${IvfCentroids.dim + 1}),
       |      j -> c.v[j] * q.v[j]), (a, b) -> a + b)
       |      / (c.nrm * q.nrm) AS cosine
       |  FROM n c, n q
       |  WHERE c.vec_id % 50 <> 0 AND q.vec_id % 50 = 0),
       |exactk AS (
       |  SELECT query_id, corpus_id FROM (
       |    SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
       |      ORDER BY cosine DESC, corpus_id DESC) AS rn
       |    FROM scoredx) WHERE rn <= 3),
       |nex AS (SELECT COUNT(*) AS n_exact FROM exactk),
       |hits AS (
       |  SELECT s, COUNT(*) AS hits
       |  FROM topk JOIN exactk USING (query_id, corpus_id) GROUP BY s),
       |chosen AS (
       |  SELECT COALESCE(MIN(s), 24) AS s
       |  FROM hits, nex WHERE hits * 100 >= 90 * n_exact)
       |SELECT t.query_id, t.corpus_id, t.cosine,
       |  CAST(t.s AS INT) AS shortlist,
       |  CAST(COALESCE(h.hits, 0) * 1000 // nex.n_exact AS BIGINT)
       |    AS recall_x1000
       |FROM topk t
       |JOIN chosen ch ON t.s = ch.s
       |LEFT JOIN hits h ON h.s = t.s, nex
       |ORDER BY t.query_id, t.cosine DESC, t.corpus_id""".stripMargin

  val registry: Map[String, QueryDef] = Map(

    // The engine's central capability, benched at scale: raw
    // scraped-shaped records (derived deterministically from the
    // documents corpus — V2Fixtures.raw) → unify (alias coalescing,
    // venue/genre lookups, date parse, uuid5 ids, lineup processing) →
    // quality scoring. One scan, zero shuffles until the final
    // order+limit. Unlike the V2 serving queries this does NOT use the
    // cached fixture table: it re-runs the whole adapter, which is the
    // thing being benched. Oracle: the fixture's DuckDB mirror
    // recomputes title/venue/start_date/score from documents.parquet.
    "etl_unify_score" -> QueryDef(
      (s, d) => {
        // repartition narrow rows before the wide adapter projection —
        // the parquet is one split locally, and the projection (uuid5
        // sha1s, regex soup, scorer) is the cost, so spread it before
        // computing, not after.
        Unify.unify(
            V2Fixtures.raw(s, d)
              .repartition(s.sparkContext.defaultParallelism),
            "ibiza-spotlight",
            lit(V2Fixtures.nowTs).cast("timestamp"), keep = Seq("doc_id"))
          .select(col("doc_id"), col("title"),
            col("venue.name").as("venue_name"),
            col("datetime.start_date").as("start_date"),
            col("data_quality.overall_score").as("quality"))
          .orderBy(col("doc_id")).limit(500)
      },
      s"""${V2Fixtures.oracleCte} SELECT doc_id, title, venue_name,
         |  start_date, overall_score AS quality
         |FROM v2ev ORDER BY doc_id LIMIT 500""".stripMargin),

    // MinHash signatures — the dedup sketch materialization (one scan,
    // no shuffle; at 100 TB this is the table you write bucketed by
    // band_hash). Oracle-checked bit-for-bit via the PORTABLE base
    // hash (md5 hex prefix): DuckDB replays the identical affine
    // family over the identical shingle hashes — the coefficient table
    // is embedded in the SQL from the same seeded generator. The
    // comma-joined string carries the full 64-long signature (array
    // cells are unsortable in the driver compare).
    "dd_minhash_signature" -> QueryDef(
      (s, d) => T.documents(s, d)
        .select(col("doc_id"),
          concat_ws(",",
            Dedup.minhashSignaturePortable(col("text"), numHashes = 64,
              shingleSize = 3)).as("sig"))
        .orderBy(col("doc_id")).limit(200),
      {
        val coeffs = Dedup.portableCoeffs(64)
          .zipWithIndex
          .map { case ((a, b), i) => s"($i, ${a}, ${b})" }
          .mkString(", ")
        s"""WITH coeffs(i, a, b) AS (VALUES $coeffs),
           |sh AS (
           |  SELECT doc_id,
           |    CASE WHEN len(w) < 3 THEN [array_to_string(w, ' ')]
           |         ELSE list_distinct(list_transform(range(1, len(w) - 1),
           |           i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) END AS shingles
           |  FROM (SELECT doc_id, string_split_regex(trim(text), '\\s+') AS w
           |        FROM documents)),
           |vals AS (
           |  SELECT doc_id, i,
           |    list_min(list_transform(shingles,
           |      s -> (CAST(('0x' || substr(md5(s), 1, 7)) AS BIGINT) * a + b)
           |           % 2147483647)) AS v
           |  FROM sh, coeffs)
           |SELECT doc_id,
           |  string_agg(CAST(v AS VARCHAR), ',' ORDER BY i) AS sig
           |FROM vals GROUP BY doc_id ORDER BY doc_id LIMIT 200""".stripMargin
      }),

    // MinHash LSH candidate pairs over a bounded corpus slice. The
    // synthetic corpus draws from a ~50-word vocabulary, so at 1-gram
    // shingles nearly EVERY doc pair is a candidate — quadratic by
    // construction. Real corpora hit the same wall via boilerplate;
    // the operator's maxBucketSize cap is the control. Here the slice
    // is bounded instead so the check stays meaningful. Oracle: with
    // the portable md5-base signatures, DuckDB recomputes the same
    // 32-long sigs, joins on band-SLICE equality (band-hash equality
    // is slice equality — the hash only compresses the shuffle key),
    // and replays the match-fraction estimate exactly (n/32 doubles).
    "dd_minhash_pairs" -> QueryDef(
      (s, d) => Dedup.minhashCandidatePairs(
        T.documents(s, d).filter(col("doc_id") < 500), "doc_id", "text",
        numHashes = 32, bands = 16, shingleSize = 1,
        maxBucketSize = Int.MaxValue, portable = true)
        .orderBy(col("est_jaccard").desc, col("id1"), col("id2"))
        .limit(100),
      {
        val coeffs = Dedup.portableCoeffs(32)
          .zipWithIndex
          .map { case ((a, b), i) => s"($i, ${a}, ${b})" }
          .mkString(", ")
        s"""WITH coeffs(i, a, b) AS (VALUES $coeffs),
           |sh AS (
           |  SELECT doc_id,
           |    list_distinct(string_split_regex(trim(text), '\\s+')) AS shingles
           |  FROM documents WHERE doc_id < 500),
           |vals AS (
           |  SELECT doc_id, i,
           |    list_min(list_transform(shingles,
           |      s -> (CAST(('0x' || substr(md5(s), 1, 7)) AS BIGINT) * a + b)
           |           % 2147483647)) AS v
           |  FROM sh, coeffs),
           |sig AS (
           |  SELECT doc_id, list(v ORDER BY i) AS sig
           |  FROM vals GROUP BY doc_id),
           |bands AS (
           |  SELECT doc_id, b, sig[2*b + 1 : 2*b + 2] AS sl
           |  FROM sig, range(0, 16) r(b)),
           |cand AS (
           |  SELECT DISTINCT x.doc_id AS id1, y.doc_id AS id2
           |  FROM bands x JOIN bands y
           |    ON x.b = y.b AND x.sl = y.sl AND x.doc_id < y.doc_id)
           |SELECT c.id1, c.id2,
           |  CAST(len(list_filter(range(1, 33), i -> s1.sig[i] = s2.sig[i]))
           |       AS DOUBLE) / CAST(32 AS DOUBLE) AS est_jaccard
           |FROM cand c
           |JOIN sig s1 ON s1.doc_id = c.id1
           |JOIN sig s2 ON s2.doc_id = c.id2
           |ORDER BY est_jaccard DESC, id1, id2 LIMIT 100""".stripMargin
      }),

    // SimHash: signature + distance-to-reference ranking. Oracle-checked
    // via the PORTABLE 60-bit variant (md5 token hashes): DuckDB replays
    // the same majority-vote bits ((h >> j) & 1 over 60 bits, bit set
    // when ones outnumber zeros) and bit_count(xor) hamming. The
    // xxhash64-based SimHash64 expression stays the hot path for
    // banding; its semantics are pinned by the expression==HOF spec.
    "dd_simhash" -> QueryDef(
      (s, d) => {
        val docs = T.documents(s, d)
          .select(col("doc_id"),
            Dedup.simhash60Portable(col("text")).as("simhash"))
        val ref = docs.filter(col("doc_id") === 0)
          .select(col("simhash").as("ref_hash"))
        docs.crossJoin(broadcast(ref))
          .select(col("doc_id"), col("simhash"),
            Dedup.hammingDistance(col("simhash"), col("ref_hash")).as("hamming"))
          .filter(col("doc_id") =!= 0)
          .orderBy(col("hamming"), col("doc_id")).limit(20)
      },
      """WITH t AS (
        |  SELECT doc_id,
        |    list_transform(string_split_regex(trim(text), '\s+'),
        |      w -> CAST(('0x' || substr(md5(w), 1, 15)) AS BIGINT)) AS hs
        |  FROM documents),
        |sh AS (
        |  SELECT doc_id,
        |    CAST((SELECT COALESCE(SUM(CASE
        |        WHEN 2 * len(list_filter(hs, h -> (h >> j) & 1 = 1)) > len(hs)
        |        THEN (CAST(1 AS BIGINT) << j) ELSE 0 END), 0)
        |     FROM range(0, 60) r(j)) AS BIGINT) AS simhash
        |  FROM t),
        |ref AS (SELECT simhash AS ref_hash FROM sh WHERE doc_id = 0)
        |SELECT doc_id, simhash,
        |  CAST(bit_count(xor(simhash, ref_hash)) AS INT) AS hamming
        |FROM sh, ref WHERE doc_id <> 0
        |ORDER BY hamming, doc_id LIMIT 20""".stripMargin),

    // ANN via random-hyperplane LSH: probe the query vector's bucket.
    // Oracle: the 4 seeded hyperplanes are embedded as literals, DuckDB
    // replays the sign-pattern bucketing (sum of disjoint powers ==
    // the bit OR), the bucket probe, and the left-to-right cosine fold
    // — all bit-exact (see sim_cosine_fast for the fold-parity
    // argument). Embedding dim is pinned at 64 by the testdata
    // generator at every sf.
    "sim_ann_lsh" -> QueryDef(
      (s, d) => {
        val q = T.embeddings(s, d).filter(col("vec_id") === 0)
          .select(col("embedding")).head().getSeq[Float](0).map(_.toDouble)
        Similarity.annTopK(T.embeddings(s, d), "vec_id", "embedding",
          q, k = 10, bits = 4)
      },
      s"""WITH hp(i, h) AS (VALUES ${Similarity.hyperplaneSqlValues(4, 64)}),
         |emb AS (
         |  SELECT vec_id,
         |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
         |  FROM embeddings),
         |buck AS (
         |  SELECT e.vec_id, CAST(SUM(CASE
         |      WHEN list_reduce(list_transform(range(1, 65),
         |        j -> e.v[j] * hp.h[j]), (a, b) -> a + b) >= 0
         |      THEN (1 << hp.i) ELSE 0 END) AS INT) AS bucket
         |  FROM emb e, hp GROUP BY e.vec_id),
         |q AS (SELECT v AS qv FROM emb WHERE vec_id = 0),
         |qn AS (
         |  SELECT qv, sqrt(list_reduce(list_transform(qv, x -> x * x),
         |    (a, b) -> a + b)) AS qnorm FROM q),
         |qb AS (SELECT bucket AS qbucket FROM buck WHERE vec_id = 0)
         |SELECT e.vec_id,
         |  list_reduce(list_transform(range(1, 65), j -> e.v[j] * qn.qv[j]),
         |    (a, b) -> a + b)
         |  / (sqrt(list_reduce(list_transform(e.v, x -> x * x),
         |      (a, b) -> a + b)) * qn.qnorm) AS cosine,
         |  b.bucket
         |FROM emb e JOIN buck b ON b.vec_id = e.vec_id, qn, qb
         |WHERE b.bucket = qb.qbucket
         |ORDER BY cosine DESC, e.vec_id LIMIT 10""".stripMargin),

    // Embedding-cosine near-duplicate pairs: sign-pattern LSH buckets
    // (6 hyperplanes → 64 cells) generate candidates, exact cosine
    // verifies within cells — one shuffle, never an all-pairs join.
    // Oracle: embedded hyperplane literals + bucket-equality self-join
    // + left-to-right cosine folds, bit-exact like sim_cosine_fast.
    // Exact k-NN JOIN (retrieval-eval / cross-corpus audit shape):
    // every 50th vector is a query, the rest are the corpus; top-3
    // neighbors per query by cosine. Broadcast queries, partial+final
    // GroupedTopK — the exchange moves candidates, not scored pairs.
    "sim_knn_join" -> QueryDef(
      (s, d) => {
        val emb = T.embeddings(s, d)
        Similarity.knnJoinExact(
            emb.filter(col("vec_id") % 50 =!= 0),
            emb.filter(col("vec_id") % 50 === 0),
            "vec_id", "embedding", k = 3)
          .orderBy(col("query_id"), col("cosine").desc, col("corpus_id"))
      },
      """WITH emb AS (
        |  SELECT vec_id,
        |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        |  FROM embeddings),
        |n AS (
        |  SELECT vec_id, v,
        |    sqrt(list_reduce(list_transform(v, t -> t * t),
        |      (a, b) -> a + b)) AS nrm
        |  FROM emb),
        |scored AS (
        |  SELECT q.vec_id AS query_id, c.vec_id AS corpus_id,
        |    list_reduce(list_transform(range(1, 65),
        |      j -> c.v[j] * q.v[j]), (a, b) -> a + b)
        |      / (c.nrm * q.nrm) AS cosine
        |  FROM n c, n q
        |  WHERE c.vec_id % 50 <> 0 AND q.vec_id % 50 = 0),
        |r AS (
        |  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
        |    ORDER BY cosine DESC, corpus_id DESC) AS rn
        |  FROM scored)
        |SELECT query_id, corpus_id, cosine FROM r WHERE rn <= 3
        |ORDER BY query_id, cosine DESC, corpus_id""".stripMargin),

    // LSH-bucketed k-NN join — the 100 TB path: corpus scored only
    // against queries sharing its hyperplane bucket. Deterministic
    // hyperplanes → DuckDB replays buckets, candidates, and ranking
    // exactly (single-probe recall is part of the contract).
    "sim_knn_join_lsh" -> QueryDef(
      (s, d) => {
        val emb = T.embeddings(s, d)
        Similarity.knnJoinLsh(
            emb.filter(col("vec_id") % 50 =!= 0),
            emb.filter(col("vec_id") % 50 === 0),
            "vec_id", "embedding", dim = 64, k = 3, bits = 4)
          .orderBy(col("query_id"), col("cosine").desc, col("corpus_id"))
      },
      s"""WITH hp(i, h) AS (VALUES ${Similarity.hyperplaneSqlValues(4, 64)}),
         |emb AS (
         |  SELECT vec_id,
         |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
         |  FROM embeddings),
         |buck AS (
         |  SELECT e.vec_id, CAST(SUM(CASE
         |      WHEN list_reduce(list_transform(range(1, 65),
         |        j -> e.v[j] * hp.h[j]), (a, b) -> a + b) >= 0
         |      THEN (1 << hp.i) ELSE 0 END) AS INT) AS bucket
         |  FROM emb e, hp GROUP BY e.vec_id),
         |n AS (
         |  SELECT e.vec_id, e.v, b.bucket,
         |    sqrt(list_reduce(list_transform(e.v, t -> t * t),
         |      (a, b) -> a + b)) AS nrm
         |  FROM emb e JOIN buck b ON b.vec_id = e.vec_id),
         |scored AS (
         |  SELECT q.vec_id AS query_id, c.vec_id AS corpus_id,
         |    list_reduce(list_transform(range(1, 65),
         |      j -> c.v[j] * q.v[j]), (a, b) -> a + b)
         |      / (c.nrm * q.nrm) AS cosine
         |  FROM n c JOIN n q ON c.bucket = q.bucket
         |  WHERE c.vec_id % 50 <> 0 AND q.vec_id % 50 = 0),
         |r AS (
         |  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
         |    ORDER BY cosine DESC, corpus_id DESC) AS rn
         |  FROM scored)
         |SELECT query_id, corpus_id, cosine FROM r WHERE rn <= 3
         |ORDER BY query_id, cosine DESC, corpus_id""".stripMargin),

    // Quantized-corpus LSH k-NN join: the int8 storage lever wired
    // into the join path — corpus scored from its dequantized int8
    // reconstruction (4× less scan volume at 100 TB), queries stay
    // float, buckets from the original floats (write-time
    // materialization). Oracle replays quantize → dequantize →
    // bucket-join → rank; every step exact IEEE arithmetic.
    "sim_knn_join_q8" -> QueryDef(
      (s, d) => {
        val emb = T.embeddings(s, d)
        Similarity.knnJoinLshQ8(
            emb.filter(col("vec_id") % 50 =!= 0),
            emb.filter(col("vec_id") % 50 === 0),
            "vec_id", "embedding", dim = 64, k = 3, bits = 4)
          .orderBy(col("query_id"), col("cosine").desc, col("corpus_id"))
      },
      s"""WITH hp(i, h) AS (VALUES ${Similarity.hyperplaneSqlValues(4, 64)}),
         |emb AS (
         |  SELECT vec_id,
         |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
         |  FROM embeddings),
         |buck AS (
         |  SELECT e.vec_id, CAST(SUM(CASE
         |      WHEN list_reduce(list_transform(range(1, 65),
         |        j -> e.v[j] * hp.h[j]), (a, b) -> a + b) >= 0
         |      THEN (1 << hp.i) ELSE 0 END) AS INT) AS bucket
         |  FROM emb e, hp GROUP BY e.vec_id),
         |sc AS (
         |  SELECT vec_id, v,
         |    CASE WHEN list_max(list_transform(v, x -> abs(x))) = 0.0
         |      THEN 1.0
         |      ELSE list_max(list_transform(v, x -> abs(x))) END AS scale
         |  FROM emb),
         |dq AS (
         |  SELECT vec_id,
         |    list_transform(v, x -> CAST(GREATEST(-127.0, LEAST(127.0,
         |      FLOOR(x / scale * 127.0 + 0.5))) AS INT) * scale / 127.0)
         |      AS v
         |  FROM sc),
         |cq AS (
         |  SELECT d.vec_id, d.v, b.bucket,
         |    sqrt(list_reduce(list_transform(d.v, t -> t * t),
         |      (a, b) -> a + b)) AS nrm
         |  FROM dq d JOIN buck b ON b.vec_id = d.vec_id
         |  WHERE d.vec_id % 50 <> 0),
         |qf AS (
         |  SELECT e.vec_id, e.v, b.bucket,
         |    sqrt(list_reduce(list_transform(e.v, t -> t * t),
         |      (a, b) -> a + b)) AS nrm
         |  FROM emb e JOIN buck b ON b.vec_id = e.vec_id
         |  WHERE e.vec_id % 50 = 0),
         |scored AS (
         |  SELECT q.vec_id AS query_id, c.vec_id AS corpus_id,
         |    list_reduce(list_transform(range(1, 65),
         |      j -> c.v[j] * q.v[j]), (a, b) -> a + b)
         |      / (c.nrm * q.nrm) AS cosine
         |  FROM cq c JOIN qf q ON c.bucket = q.bucket),
         |r AS (
         |  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
         |    ORDER BY cosine DESC, corpus_id DESC) AS rn
         |  FROM scored)
         |SELECT query_id, corpus_id, cosine FROM r WHERE rn <= 3
         |ORDER BY query_id, cosine DESC, corpus_id""".stripMargin),

    // int8 embedding quantization (4× smaller embedding tables — the
    // storage/scan lever at 100 TB): per-vector max-abs scale,
    // floor(x+0.5) grid (exact in both engines, unlike decimal
    // round), clamp to ±127. The oracle recomputes the full quantize →
    // dequantize → reconstruction-error chain; every step is exact
    // IEEE arithmetic so no output rounding is needed.
    "sim_quantize_int8" -> QueryDef(
      (s, d) => {
        val qz = Similarity.quantizeInt8(col("embedding"))
        T.embeddings(s, d)
          .select(col("vec_id"), col("embedding"), qz.as("qz"))
          .select(col("vec_id"),
            col("qz.scale").as("scale"),
            aggregate(col("qz.q"), lit(0L),
              (a, x) => a + x.cast("long")).as("q_sum"),
            array_min(col("qz.q")).cast("long").as("q_min"),
            array_max(col("qz.q")).cast("long").as("q_max"),
            array_max(zip_with(col("embedding"),
              Similarity.dequantizeInt8(col("qz")),
              (x, y) => abs(x.cast("double") - y))).as("recon_err"))
          .orderBy(col("vec_id"))
      },
      """WITH emb AS (
        |  SELECT vec_id,
        |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        |  FROM embeddings),
        |sc AS (
        |  SELECT vec_id, v,
        |    CASE WHEN list_max(list_transform(v, x -> abs(x))) = 0.0
        |      THEN 1.0
        |      ELSE list_max(list_transform(v, x -> abs(x))) END AS scale
        |  FROM emb),
        |qz AS (
        |  SELECT vec_id, v, scale,
        |    list_transform(v, x -> CAST(GREATEST(-127.0, LEAST(127.0,
        |      FLOOR(x / scale * 127.0 + 0.5))) AS INT)) AS q
        |  FROM sc)
        |SELECT vec_id, scale,
        |  list_reduce(list_transform(q, x -> CAST(x AS BIGINT)),
        |    (a, b) -> a + b) AS q_sum,
        |  CAST(list_min(q) AS BIGINT) AS q_min,
        |  CAST(list_max(q) AS BIGINT) AS q_max,
        |  list_max(list_transform(range(1, 65),
        |    j -> abs(v[j] - q[j] * scale / 127.0))) AS recon_err
        |FROM qz ORDER BY vec_id""".stripMargin),

    // Multi-probe LSH k-NN join: each query also probes its
    // single-bit-flip neighbor buckets — recall rises to P(≤1 sign
    // differs) with the join shape unchanged. The oracle replays the
    // probe-set expansion (own bucket + bits XOR flips) exactly.
    "sim_knn_join_multiprobe" -> QueryDef(
      (s, d) => {
        val emb = T.embeddings(s, d)
        Similarity.knnJoinLshMultiProbe(
            emb.filter(col("vec_id") % 50 =!= 0),
            emb.filter(col("vec_id") % 50 === 0),
            "vec_id", "embedding", dim = 64, k = 3, bits = 4)
          .orderBy(col("query_id"), col("cosine").desc, col("corpus_id"))
      },
      s"""WITH hp(i, h) AS (VALUES ${Similarity.hyperplaneSqlValues(4, 64)}),
         |emb AS (
         |  SELECT vec_id,
         |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
         |  FROM embeddings),
         |buck AS (
         |  SELECT e.vec_id, CAST(SUM(CASE
         |      WHEN list_reduce(list_transform(range(1, 65),
         |        j -> e.v[j] * hp.h[j]), (a, b) -> a + b) >= 0
         |      THEN (1 << hp.i) ELSE 0 END) AS INT) AS bucket
         |  FROM emb e, hp GROUP BY e.vec_id),
         |n AS (
         |  SELECT e.vec_id, e.v, b.bucket,
         |    sqrt(list_reduce(list_transform(e.v, t -> t * t),
         |      (a, b) -> a + b)) AS nrm
         |  FROM emb e JOIN buck b ON b.vec_id = e.vec_id),
         |qprobe AS (
         |  SELECT vec_id, v, nrm,
         |    unnest([bucket] || list_transform(range(0, 4),
         |      j -> xor(bucket, CAST(1 << j AS INT)))) AS bucket
         |  FROM n WHERE vec_id % 50 = 0),
         |scored AS (
         |  SELECT q.vec_id AS query_id, c.vec_id AS corpus_id,
         |    list_reduce(list_transform(range(1, 65),
         |      j -> c.v[j] * q.v[j]), (a, b) -> a + b)
         |      / (c.nrm * q.nrm) AS cosine
         |  FROM n c JOIN qprobe q ON c.bucket = q.bucket
         |  WHERE c.vec_id % 50 <> 0),
         |r AS (
         |  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
         |    ORDER BY cosine DESC, corpus_id DESC) AS rn
         |  FROM scored)
         |SELECT query_id, corpus_id, cosine FROM r WHERE rn <= 3
         |ORDER BY query_id, cosine DESC, corpus_id""".stripMargin),

    // IVF k-NN join — the partition-pruned ANN join (corpus rows in
    // exactly one cell each, queries exploded to their nprobe nearest
    // cells; at scale the corpus side is a cell-partitioned table and
    // each probe is a pruned scan). Oracle replays cell assignment
    // (strict-less argmin), the per-query probe ranking, and the
    // cosine fold bit-exactly, same patterns as sim_ann_ivf.
    "sim_knn_join_ivf" -> QueryDef(
      (s, d) => {
        val emb = T.embeddings(s, d)
        Similarity.knnJoinIvf(
            emb.filter(col("vec_id") % 50 =!= 0),
            emb.filter(col("vec_id") % 50 === 0),
            "vec_id", "embedding", k = 3, IvfCentroids.pinned, nprobe = 2)
          .orderBy(col("query_id"), col("cosine").desc, col("corpus_id"))
      },
      s"""WITH cen(i, c) AS (VALUES ${IvfCentroids.sqlValues}),
         |cn AS (
         |  SELECT i, c, list_reduce(list_transform(c, x -> x * x),
         |    (a, b) -> a + b) AS cnorm FROM cen),
         |emb AS (
         |  SELECT vec_id,
         |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
         |  FROM embeddings),
         |n AS (
         |  SELECT vec_id, v, sqrt(list_reduce(list_transform(v, t -> t * t),
         |    (a, b) -> a + b)) AS nrm FROM emb),
         |assign AS (
         |  SELECT vec_id, i AS cell FROM (
         |    SELECT e.vec_id, cn.i, row_number() OVER (PARTITION BY e.vec_id
         |      ORDER BY cn.cnorm - 2.0 * list_reduce(
         |        list_transform(range(1, ${IvfCentroids.dim + 1}),
         |          j -> e.v[j] * cn.c[j]), (a, b) -> a + b), cn.i) AS rn
         |    FROM emb e, cn WHERE e.vec_id % 50 <> 0) WHERE rn = 1),
         |qprobe AS (
         |  SELECT vec_id, cell FROM (
         |    SELECT e.vec_id, cn.i AS cell, row_number() OVER (
         |      PARTITION BY e.vec_id
         |      ORDER BY cn.cnorm - 2.0 * list_reduce(
         |        list_transform(range(1, ${IvfCentroids.dim + 1}),
         |          j -> e.v[j] * cn.c[j]), (a, b) -> a + b), cn.i) AS rn
         |    FROM emb e, cn WHERE e.vec_id % 50 = 0) WHERE rn <= 2),
         |scored AS (
         |  SELECT q.vec_id AS query_id, c.vec_id AS corpus_id,
         |    list_reduce(list_transform(range(1, ${IvfCentroids.dim + 1}),
         |      j -> cv.v[j] * qv.v[j]), (a, b) -> a + b)
         |      / (cv.nrm * qv.nrm) AS cosine
         |  FROM assign c JOIN qprobe q ON q.cell = c.cell
         |  JOIN n cv ON cv.vec_id = c.vec_id
         |  JOIN n qv ON qv.vec_id = q.vec_id),
         |r AS (
         |  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
         |    ORDER BY cosine DESC, corpus_id DESC) AS rn
         |  FROM scored)
         |SELECT query_id, corpus_id, cosine FROM r WHERE rn <= 3
         |ORDER BY query_id, cosine DESC, corpus_id""".stripMargin),

    // IVF-PQ k-NN join (Jégou et al., TPAMI'11 — the 100 TB ANN
    // memory path): candidates are scored in the COMPRESSED domain
    // (per corpus row: m=8 LUT lookups, never a 64-dim dot; the
    // encoded table is ~(4·dim)/m× smaller than the float corpus and
    // is all the candidate scan reads), then the ADC shortlist
    // reranks with exact cosine over full vectors joined back for
    // shortlist ids only. Oracle replays cell assignment, PQ encode
    // (strict-less argmin per sub-space), the per-query LUT, the
    // ORDERED ADC fold (list ORDER BY j — addition order is the bit
    // contract), shortlist, and rerank from the same pinned literals.
    "sim_knn_join_ivfpq" -> QueryDef(
      (s, d) => {
        val emb = T.embeddings(s, d)
        Similarity.knnJoinIvfPq(
            emb.filter(col("vec_id") % 50 =!= 0),
            emb.filter(col("vec_id") % 50 === 0),
            "vec_id", "embedding", k = 3, IvfCentroids.pinned,
            PqCodebooks.pinned, nprobe = 2, shortlist = 9)
          .orderBy(col("query_id"), col("cosine").desc, col("corpus_id"))
      },
      ivfPqOracle("")),

    // Persisted IVF-PQ index, BUILD + incremental APPEND (the
    // build-once / probe-many lifecycle — at 100 TB the inline joins'
    // per-call corpus encode dominates every query; AnnIndex
    // materializes codes+cells once and appends encode only the new
    // batch). The row builds from one corpus slab, appends the other,
    // and returns the maintenance census: per (component, cell)
    // vector counts. The oracle recomputes both components' cell
    // assignments from the pinned centroids — a build that dropped,
    // duplicated, or re-binned a vector, or an append that leaked
    // into the base, shifts a count. (The no-re-encode FILE census
    // lives in AnnIndexSpec; a query result can't carry mtimes.)
    "sim_index_build" -> QueryDef(
      (s, d) => {
        val dir = annIndexFixture(s, d, "target/ann_index_build")
        AnnIndex.census(s, dir)
          .orderBy(col("component"), col("cell"))
      },
      ivfAssignCensusOracle(
        """SELECT CASE WHEN vec_id % 7 <> 3 THEN 'base'
          |            ELSE 'delta-000001' END AS component,
          |  CAST(cell AS INT) AS cell, COUNT(*) AS n_vectors
          |FROM assign GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)),

    // Persisted-index COMPACT: the floor-sweep that bounds a probe's
    // component count — build one slab, append the other, fold. The
    // census must show ONE component ('base') carrying the union's
    // per-cell counts (the oracle recomputes them from the pinned
    // centroids over the full corpus slice), with the fold count and
    // the second compact's no-op pinned in-row: a compact that
    // dropped rows, re-binned a vector (it must carry stored cells,
    // never re-encode), left a delta behind, or kept folding on an
    // already-compact index shifts a column.
    "sim_index_compact" -> QueryDef(
      (s, d) => {
        val dir = annIndexFixture(s, d, "target/ann_index_compact")
        val folded = AnnIndex.compact(s, dir)
        val again = AnnIndex.compact(s, dir)
        AnnIndex.census(s, dir)
          .withColumn("n_folded", lit(folded.toLong))
          .withColumn("recompact_noop", lit(again == 0))
          .orderBy(col("component"), col("cell"))
      },
      ivfAssignCensusOracle(
        """SELECT 'base' AS component, CAST(cell AS INT) AS cell,
          |  COUNT(*) AS n_vectors,
          |  CAST(1 AS BIGINT) AS n_folded,
          |  TRUE AS recompact_noop
          |FROM assign GROUP BY 2 ORDER BY 1, 2""".stripMargin)),

    // Persisted-index PROBE: k-NN answered FROM the artifact (base +
    // committed deltas, partition-pruned to the probed cells, ADC in
    // the compressed domain, exact rerank) — the oracle is the SAME
    // full-quantization-pipeline SQL as sim_knn_join_ivfpq, so a pass
    // IS the probe-equals-inline-join proof over build ∪ append. The
    // in-row booleans pin the incremental posture the file census in
    // AnnIndexSpec proves byte-exactly: the append committed one
    // delta and left every base file untouched.
    "sim_index_probe" -> QueryDef(
      (s, d) => {
        val dir = new java.io.File("target/ann_index_probe/" +
          d.replaceAll("[^A-Za-z0-9.]", "_") + "/idx").getAbsolutePath
        val fs = new org.apache.hadoop.fs.Path(dir)
          .getFileSystem(s.sparkContext.hadoopConfiguration)
        fs.delete(new org.apache.hadoop.fs.Path(dir).getParent, true)
        val emb = T.embeddings(s, d)
        AnnIndex.build(s, dir,
          emb.filter(col("vec_id") % 50 =!= 0 && col("vec_id") % 7 =!= 3),
          "vec_id", "embedding", IvfCentroids.pinned, PqCodebooks.pinned)
        val gen = AnnIndex.currentGeneration(s, dir)
        def baseCensus() = AnnIndex.fileCensus(s, s"$dir/$gen/base")
        val before = baseCensus()
        AnnIndex.append(s, dir,
          emb.filter(col("vec_id") % 50 =!= 0 && col("vec_id") % 7 === 3),
          "vec_id", "embedding")
        // the delta lands in the SAME generation (appends never swap)
        val baseUntouched = before.nonEmpty && baseCensus() == before &&
          AnnIndex.currentGeneration(s, dir) == gen
        val deltaCommitted = fs.exists(
          new org.apache.hadoop.fs.Path(dir, s"$gen/delta-000001"))
        AnnIndex.probe(s, dir, emb.filter(col("vec_id") % 50 === 0),
            "vec_id", "embedding", k = 3, nprobe = 2, shortlist = 9)
          .withColumn("base_untouched", lit(baseUntouched))
          .withColumn("delta_committed", lit(deltaCommitted))
          .orderBy(col("query_id"), col("cosine").desc, col("corpus_id"))
      },
      ivfPqOracle(
        ", TRUE AS base_untouched, TRUE AS delta_committed")),

    // Persisted-index READER LIVENESS: probes keep answering — with
    // FULL, identical results — while build and compact run. Both
    // maintenance ops stage a complete new generation and commit by
    // publishing a versioned pointer (one-version reader grace), the
    // month table's availability contract applied to the index; this
    // row fires a fingerprint probe from a hook at EVERY maintenance
    // commit point (staged / published / swept, compact then full
    // rebuild — 6 points) and pins that each returned the same pairs
    // as before the op (compact preserves results by contract; the
    // rebuild covers the same corpus + quantizer). The final probe's
    // pairs are oracle-replayed — the same SQL as sim_index_probe.
    // r19's build/compact blanked probes between their two renames;
    // reference contract analog: the read API serves during ETL
    // (database/api_server.py:252-295).
    "sim_index_probe_live" -> QueryDef(
      (s, d) => {
        val dir = annIndexFixture(s, d, "target/ann_index_live")
        val emb = T.embeddings(s, d)
        val qs = emb.filter(col("vec_id") % 50 === 0)
        def fp() = AnnIndex.probe(s, dir, qs, "vec_id", "embedding",
            k = 3, nprobe = 2, shortlist = 9)
          .select(xxhash64(col("query_id"), col("corpus_id"),
            col("cosine").cast("string"))
            .cast("decimal(38,0)").as("h"))
          .agg(coalesce(sum(col("h")), lit(0)).as("f"),
            count(lit(1)).as("n"))
          .head()
        val pre = fp()
        var liveOk = true
        var points = 0
        val probeHook: String => Unit = _ => {
          points += 1
          liveOk &&= fp() == pre
        }
        AnnIndex.compact(s, dir, hook = probeHook)
        AnnIndex.build(s, dir,
          emb.filter(col("vec_id") % 50 =!= 0), "vec_id", "embedding",
          IvfCentroids.pinned, PqCodebooks.pinned, hook = probeHook)
        AnnIndex.probe(s, dir, qs, "vec_id", "embedding",
            k = 3, nprobe = 2, shortlist = 9)
          .withColumn("live_ok", lit(liveOk))
          .withColumn("probe_points", lit(points))
          .orderBy(col("query_id"), col("cosine").desc, col("corpus_id"))
      },
      ivfPqOracle(
        ", TRUE AS live_ok, CAST(6 AS INT) AS probe_points")),

    // Persisted-index LATEST-WINS UPDATE: re-appending an id replaces
    // it — every component carries an implicit commit number (base 0,
    // delta-N = N) and probes keep only each id's highest-commit row
    // among the scanned cells; compact folds the dedup permanently.
    // The row re-appends every %11==0 corpus id with a REVERSED
    // vector (bit-exact transform) and probes at nprobe = nlist so no
    // cross-cell shadow can mask a stale row; the oracle replays the
    // full quantization pipeline over the UPDATED corpus — a probe
    // returning a stale vector, a duplicate id, or a dropped update
    // hash-mismatches. In-row booleans pin the fold: post-compact
    // probe identical, storage deduped to one row per id. Reference
    // analog: upsert-by-key is the reference's core write
    // (database/etl_sqlite_to_mongo.py:99-104).
    "sim_index_append_update" -> QueryDef(
      (s, d) => {
        val dir = annIndexFixture(s, d, "target/ann_index_update")
        val emb = T.embeddings(s, d)
        val corpusN = emb.filter(col("vec_id") % 50 =!= 0).count()
        AnnIndex.append(s, dir,
          emb.filter(col("vec_id") % 50 =!= 0 && col("vec_id") % 11 === 0)
            .withColumn("embedding", reverse(col("embedding"))),
          "vec_id", "embedding")
        val qs = emb.filter(col("vec_id") % 50 === 0)
        def run() = AnnIndex.probe(s, dir, qs, "vec_id", "embedding",
          k = 3, nprobe = 4, shortlist = 9)
        def fpOf(df: DataFrame) = df
          .select(xxhash64(col("query_id"), col("corpus_id"),
            col("cosine").cast("string"))
            .cast("decimal(38,0)").as("h"))
          .agg(coalesce(sum(col("h")), lit(0)).as("f"),
            count(lit(1)).as("n"))
          .head()
        val pre = fpOf(run())
        AnnIndex.compact(s, dir)
        val postIdentical = fpOf(run()) == pre
        val deduped = AnnIndex.census(s, dir)
          .agg(sum(col("n_vectors"))).head().getLong(0) == corpusN
        run()
          .withColumn("post_compact_identical", lit(postIdentical))
          .withColumn("storage_deduped", lit(deduped))
          .orderBy(col("query_id"), col("cosine").desc, col("corpus_id"))
      },
      ivfPqOracle(
        ", TRUE AS post_compact_identical, TRUE AS storage_deduped",
        embExpr = "CASE WHEN vec_id % 50 <> 0 AND vec_id % 11 = 0 " +
          "THEN list_reverse(embedding) ELSE embedding END",
        nprobe = 4)),

    // IVF-PQ at a DECLARED recall target (>= 0.9): the shortlist dial
    // turned automatically — ONE ADC ranking at the largest shortlist,
    // every smaller curve point derived from rank prefixes (no
    // re-scoring), smallest qualifying shortlist chosen in-plan.
    // Oracle replays ranking, prefix rerank, curve, pick, and pairs.
    "sim_knn_join_pq_recall90" -> QueryDef(
      (s, d) => {
        val emb = T.embeddings(s, d)
        Similarity.knnJoinIvfPqAtRecall(
            emb.filter(col("vec_id") % 50 =!= 0),
            emb.filter(col("vec_id") % 50 === 0),
            "vec_id", "embedding", k = 3, IvfCentroids.pinned,
            PqCodebooks.pinned, nprobe = 2,
            shortlists = Seq(3, 6, 12, 24), targetX100 = 90)
          .orderBy(col("query_id"), col("cosine").desc, col("corpus_id"))
      },
      pqRecall90Oracle),

    // Persisted-index probe at a DECLARED recall target — feature
    // parity between the artifact and the inline joins' last knob:
    // the shortlist dial calibrates against the exact baseline (both
    // read FROM the index — codes/vectors for the pruned scans, all
    // cells' vectors for the baseline) through the SAME core as the
    // inline join (Similarity.ivfPqAtRecallCore), so this row shares
    // sim_knn_join_pq_recall90's oracle VERBATIM: the shared pass is
    // the bit-identity proof over build ∪ append.
    "sim_index_probe_recall90" -> QueryDef(
      (s, d) => {
        val dir = annIndexFixture(s, d, "target/ann_index_recall")
        AnnIndex.probeAtRecall(s, dir,
            T.embeddings(s, d).filter(col("vec_id") % 50 === 0),
            "vec_id", "embedding", k = 3, nprobe = 2,
            shortlists = Seq(3, 6, 12, 24), targetX100 = 90)
          .orderBy(col("query_id"), col("cosine").desc, col("corpus_id"))
      },
      pqRecall90Oracle),

    // Residual-encoded IVF-PQ (TPAMI'11 §IV — the production form):
    // codes quantize v − centroid(cell), so each codebook models the
    // low-variance within-cell displacement; ADC reconstructs
    // dot(q,v) ≈ dot(q, centroid(cell)) + Σ_j lut[code_j], the
    // centroid term one lookup into the query's precomputed
    // centroid-dot array. Oracle replays the residual subtraction,
    // encode, and the PREPENDED ADC fold (list_prepend(qc, ...) —
    // matching Spark's fold-from-qc order bit for bit).
    "sim_knn_join_ivfpq_res" -> QueryDef(
      (s, d) => {
        val emb = T.embeddings(s, d)
        Similarity.knnJoinIvfPqResidual(
            emb.filter(col("vec_id") % 50 =!= 0),
            emb.filter(col("vec_id") % 50 === 0),
            "vec_id", "embedding", k = 3, IvfCentroids.pinned,
            PqCodebooks.residualPinned, nprobe = 2, shortlist = 9)
          .orderBy(col("query_id"), col("cosine").desc, col("corpus_id"))
      },
      s"""WITH cen(i, c) AS (VALUES ${IvfCentroids.sqlValues}),
         |cn AS (
         |  SELECT i, c, list_reduce(list_transform(c, x -> x * x),
         |    (a, b) -> a + b) AS cnorm FROM cen),
         |pq(j, cc, pc) AS (VALUES ${PqCodebooks.sqlValuesResidual}),
         |pqn AS (
         |  SELECT j, cc, pc, list_reduce(list_transform(pc, x -> x * x),
         |    (a, b) -> a + b) AS pnorm FROM pq),
         |emb AS (
         |  SELECT vec_id,
         |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
         |  FROM embeddings),
         |n AS (
         |  SELECT vec_id, v, sqrt(list_reduce(list_transform(v, t -> t * t),
         |    (a, b) -> a + b)) AS nrm FROM emb),
         |assign AS (
         |  SELECT vec_id, i AS cell FROM (
         |    SELECT e.vec_id, cn.i, row_number() OVER (PARTITION BY e.vec_id
         |      ORDER BY cn.cnorm - 2.0 * list_reduce(
         |        list_transform(range(1, ${IvfCentroids.dim + 1}),
         |          j -> e.v[j] * cn.c[j]), (a, b) -> a + b), cn.i) AS rn
         |    FROM emb e, cn WHERE e.vec_id % 50 <> 0) WHERE rn = 1),
         |res AS (
         |  SELECT a.vec_id, a.cell,
         |    list_transform(range(1, ${IvfCentroids.dim + 1}),
         |      t -> e.v[t] - cen.c[t]) AS r
         |  FROM assign a JOIN emb e ON e.vec_id = a.vec_id
         |  JOIN cen ON cen.i = a.cell),
         |codes AS (
         |  SELECT vec_id, cell, j, cc FROM (
         |    SELECT r.vec_id, r.cell, p.j, p.cc, row_number() OVER (
         |      PARTITION BY r.vec_id, p.j
         |      ORDER BY p.pnorm - 2.0 * list_reduce(
         |        list_transform(range(1, ${PqCodebooks.dsub + 1}),
         |          t -> r.r[p.j * ${PqCodebooks.dsub} + t] * p.pc[t]),
         |        (a, b) -> a + b), p.cc) AS rn
         |    FROM res r, pqn p) WHERE rn = 1),
         |qprobe AS (
         |  SELECT vec_id, cell FROM (
         |    SELECT e.vec_id, cn.i AS cell, row_number() OVER (
         |      PARTITION BY e.vec_id
         |      ORDER BY cn.cnorm - 2.0 * list_reduce(
         |        list_transform(range(1, ${IvfCentroids.dim + 1}),
         |          j -> e.v[j] * cn.c[j]), (a, b) -> a + b), cn.i) AS rn
         |    FROM emb e, cn WHERE e.vec_id % 50 = 0) WHERE rn <= 2),
         |qc AS (
         |  SELECT e.vec_id, cen.i AS cell, list_reduce(
         |    list_transform(range(1, ${IvfCentroids.dim + 1}),
         |      t -> e.v[t] * cen.c[t]), (a, b) -> a + b) AS qdotc
         |  FROM emb e, cen WHERE e.vec_id % 50 = 0),
         |lut AS (
         |  SELECT e.vec_id, p.j, p.cc, list_reduce(
         |    list_transform(range(1, ${PqCodebooks.dsub + 1}),
         |      t -> e.v[p.j * ${PqCodebooks.dsub} + t] * p.pc[t]),
         |    (a, b) -> a + b) AS d
         |  FROM emb e, pq p WHERE e.vec_id % 50 = 0),
         |adc AS (
         |  SELECT q.vec_id AS query_id, c.vec_id AS corpus_id,
         |    list_reduce(list_prepend(any_value(qc.qdotc),
         |      list(l.d ORDER BY l.j)), (a, b) -> a + b)
         |      / (any_value(cv.nrm) * any_value(qv.nrm)) AS adc_cosine
         |  FROM qprobe q JOIN assign c ON c.cell = q.cell
         |  JOIN qc ON qc.vec_id = q.vec_id AND qc.cell = c.cell
         |  JOIN codes cd ON cd.vec_id = c.vec_id
         |  JOIN lut l ON l.vec_id = q.vec_id AND l.j = cd.j
         |    AND l.cc = cd.cc
         |  JOIN n cv ON cv.vec_id = c.vec_id
         |  JOIN n qv ON qv.vec_id = q.vec_id
         |  GROUP BY q.vec_id, c.vec_id),
         |short AS (
         |  SELECT query_id, corpus_id FROM (
         |    SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
         |      ORDER BY adc_cosine DESC, corpus_id DESC) AS rn
         |    FROM adc) WHERE rn <= 9),
         |rr AS (
         |  SELECT s.query_id, s.corpus_id,
         |    list_reduce(list_transform(range(1, ${IvfCentroids.dim + 1}),
         |      t -> cv.v[t] * qv.v[t]), (a, b) -> a + b)
         |      / (cv.nrm * qv.nrm) AS cosine
         |  FROM short s JOIN n cv ON cv.vec_id = s.corpus_id
         |  JOIN n qv ON qv.vec_id = s.query_id)
         |SELECT query_id, corpus_id, cosine FROM (
         |  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
         |    ORDER BY cosine DESC, corpus_id DESC) AS rn FROM rr)
         |WHERE rn <= 3
         |ORDER BY query_id, cosine DESC, corpus_id""".stripMargin),

    // IVF join at a DECLARED recall target (>= 0.9): the recall curve
    // at nprobe 1..nlist vs the exact join, the smallest qualifying
    // nprobe chosen IN-PLAN (broadcast 1-row pick, construction
    // job-free), pairs returned with the chosen config and measured
    // recall x1000 on every row. The oracle replays curve, pick, and
    // final pairs — the auto-tuned dial is an oracle-checked number.
    "sim_knn_join_recall90" -> QueryDef(
      (s, d) => {
        val emb = T.embeddings(s, d)
        Similarity.knnJoinIvfAtRecall(
            emb.filter(col("vec_id") % 50 =!= 0),
            emb.filter(col("vec_id") % 50 === 0),
            "vec_id", "embedding", k = 3, IvfCentroids.pinned,
            targetX100 = 90)
          .orderBy(col("query_id"), col("cosine").desc, col("corpus_id"))
      },
      s"""WITH cen(i, c) AS (VALUES ${IvfCentroids.sqlValues}),
         |cn AS (
         |  SELECT i, c, list_reduce(list_transform(c, x -> x * x),
         |    (a, b) -> a + b) AS cnorm FROM cen),
         |emb AS (
         |  SELECT vec_id,
         |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
         |  FROM embeddings),
         |n AS (
         |  SELECT vec_id, v, sqrt(list_reduce(list_transform(v, t -> t * t),
         |    (a, b) -> a + b)) AS nrm FROM emb),
         |assign AS (
         |  SELECT vec_id, i AS cell FROM (
         |    SELECT e.vec_id, cn.i, row_number() OVER (PARTITION BY e.vec_id
         |      ORDER BY cn.cnorm - 2.0 * list_reduce(
         |        list_transform(range(1, ${IvfCentroids.dim + 1}),
         |          j -> e.v[j] * cn.c[j]), (a, b) -> a + b), cn.i) AS rn
         |    FROM emb e, cn WHERE e.vec_id % 50 <> 0) WHERE rn = 1),
         |qrank AS (
         |  SELECT vec_id, cell, rn FROM (
         |    SELECT e.vec_id, cn.i AS cell, row_number() OVER (
         |      PARTITION BY e.vec_id
         |      ORDER BY cn.cnorm - 2.0 * list_reduce(
         |        list_transform(range(1, ${IvfCentroids.dim + 1}),
         |          j -> e.v[j] * cn.c[j]), (a, b) -> a + b), cn.i) AS rn
         |    FROM emb e, cn WHERE e.vec_id % 50 = 0)),
         |np(np) AS (VALUES (1), (2), (3), (4)),
         |scored AS (
         |  SELECT np.np, q.vec_id AS query_id, c.vec_id AS corpus_id,
         |    list_reduce(list_transform(range(1, ${IvfCentroids.dim + 1}),
         |      j -> cv.v[j] * qv.v[j]), (a, b) -> a + b)
         |      / (cv.nrm * qv.nrm) AS cosine
         |  FROM np, qrank q
         |  JOIN assign c ON c.cell = q.cell
         |  JOIN n cv ON cv.vec_id = c.vec_id
         |  JOIN n qv ON qv.vec_id = q.vec_id
         |  WHERE q.rn <= np.np),
         |ivfk AS (
         |  SELECT np, query_id, corpus_id, cosine FROM (
         |    SELECT *, ROW_NUMBER() OVER (PARTITION BY np, query_id
         |      ORDER BY cosine DESC, corpus_id DESC) AS rn
         |    FROM scored) WHERE rn <= 3),
         |scoredx AS (
         |  SELECT q.vec_id AS query_id, c.vec_id AS corpus_id,
         |    list_reduce(list_transform(range(1, ${IvfCentroids.dim + 1}),
         |      j -> c.v[j] * q.v[j]), (a, b) -> a + b)
         |      / (c.nrm * q.nrm) AS cosine
         |  FROM n c, n q
         |  WHERE c.vec_id % 50 <> 0 AND q.vec_id % 50 = 0),
         |exactk AS (
         |  SELECT query_id, corpus_id FROM (
         |    SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
         |      ORDER BY cosine DESC, corpus_id DESC) AS rn
         |    FROM scoredx) WHERE rn <= 3),
         |nex AS (SELECT COUNT(*) AS n_exact FROM exactk),
         |hits AS (
         |  SELECT np, COUNT(*) AS hits
         |  FROM ivfk JOIN exactk USING (query_id, corpus_id) GROUP BY np),
         |chosen AS (
         |  SELECT COALESCE(MIN(np), 4) AS np
         |  FROM hits, nex WHERE hits * 100 >= 90 * n_exact)
         |SELECT i.query_id, i.corpus_id, i.cosine,
         |  CAST(i.np AS INT) AS nprobe,
         |  CAST(COALESCE(h.hits, 0) * 1000 // nex.n_exact AS BIGINT)
         |    AS recall_x1000
         |FROM ivfk i
         |JOIN chosen ch ON i.np = ch.np
         |LEFT JOIN hits h ON h.np = i.np, nex
         |ORDER BY i.query_id, i.cosine DESC, i.corpus_id""".stripMargin),

    // Projection-prefilter rerank k-NN join (Similarity.knnJoinRerank)
    // — the compressed-domain pattern: shortlist by cosine in the
    // 16-dim JL space (the 4×-smaller table a 100 TB tier keeps hot),
    // exact-rerank only the shortlist in full width. No hard bucket
    // boundary to lose a neighbor over — recall degrades smoothly
    // with the MEASURED projection error, and sim_recall_report shows
    // it beating every bucketed variant. The oracle replays the
    // 16-plane projection, the shortlist ranking, and the rerank.
    "sim_knn_join_rerank" -> QueryDef(
      (s, d) => {
        val emb = T.embeddings(s, d)
        Similarity.knnJoinRerank(
            emb.filter(col("vec_id") % 50 =!= 0),
            emb.filter(col("vec_id") % 50 === 0),
            "vec_id", "embedding", k = 3)
          .orderBy(col("query_id"), col("cosine").desc, col("corpus_id"))
      },
      s"""WITH hp16(i, h) AS (VALUES ${Similarity.hyperplaneSqlValues(16, 64)}),
         |emb AS (
         |  SELECT vec_id,
         |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
         |  FROM embeddings),
         |pl AS (
         |  SELECT e.vec_id, hp16.i,
         |    list_reduce(list_transform(range(1, 65), j -> e.v[j] * hp16.h[j]),
         |      (a, b) -> a + b) AS p
         |  FROM emb e, hp16),
         |pr AS (
         |  SELECT vec_id, list(p ORDER BY i) AS proj FROM pl GROUP BY vec_id),
         |pn AS (
         |  SELECT pr.vec_id, pr.proj, e.v,
         |    sqrt(list_reduce(list_transform(range(1, 17),
         |      j -> pr.proj[j] * pr.proj[j]), (a, b) -> a + b)) AS pnrm,
         |    sqrt(list_reduce(list_transform(range(1, 65),
         |      j -> e.v[j] * e.v[j]), (a, b) -> a + b)) AS nrm
         |  FROM pr JOIN emb e ON e.vec_id = pr.vec_id),
         |scored AS (
         |  SELECT q.vec_id AS query_id, c.vec_id AS corpus_id,
         |    list_reduce(list_transform(range(1, 17),
         |      j -> c.proj[j] * q.proj[j]), (a, b) -> a + b)
         |      / (c.pnrm * q.pnrm) AS pc,
         |    list_reduce(list_transform(range(1, 65),
         |      j -> c.v[j] * q.v[j]), (a, b) -> a + b)
         |      / (c.nrm * q.nrm) AS cosine
         |  FROM pn c, pn q
         |  WHERE c.vec_id % 50 <> 0 AND q.vec_id % 50 = 0),
         |short AS (
         |  SELECT query_id, corpus_id, cosine FROM (
         |    SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
         |      ORDER BY pc DESC, corpus_id DESC) AS prn
         |    FROM scored)
         |  WHERE prn <= 50),
         |r AS (
         |  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
         |    ORDER BY cosine DESC, corpus_id DESC) AS rn
         |  FROM short)
         |SELECT query_id, corpus_id, cosine FROM r WHERE rn <= 3
         |ORDER BY query_id, cosine DESC, corpus_id""".stripMargin),

    // IVF nprobe sweep — the recall-vs-scan lever as a measured CURVE:
    // recall@10 of ivfTopK at nprobe 1/2/4/8 against the exact top-10,
    // plus how many corpus rows each probe set scanned (the cost side
    // of the lever — at scale, scanned/corpus ≈ nprobe/nlist of the
    // cell-partitioned table). Monotone non-decreasing in nprobe by
    // construction; with the pinned nlist=4 quantizer, nprobe=4 is
    // already exhaustive (the 8 row documents saturation: same scan,
    // same recall). Fixture curve: 0.2 @ 115 rows → 0.5 @ 255 →
    // 1.0 @ 499. The oracle replays every probe set.
    "sim_ivf_nprobe_sweep" -> QueryDef(
      (s, d) => {
        val emb = T.embeddings(s, d)
        val q = emb.filter(col("vec_id") === 0)
          .select(col("embedding")).head().getSeq[Float](0).map(_.toDouble)
        val corpus0 = emb.filter(col("vec_id") =!= 0)
        val exactT = Similarity.cosineTopK(corpus0, "vec_id", "embedding",
          q, 10).select("vec_id")
        val withCell = corpus0.withColumn("_cell",
          Similarity.ivfAssignment(col("embedding"), IvfCentroids.pinned))
        Seq(1, 2, 4, 8).map { np =>
          val ivfT = Similarity.ivfTopK(corpus0, "vec_id", "embedding",
            q, 10, IvfCentroids.pinned, nprobe = np).select("vec_id")
          ivfT.join(exactT, "vec_id").agg(count(lit(1)).as("hits"))
            .crossJoin(withCell.filter(col("_cell").isin(
                Similarity.probeCells(q, IvfCentroids.pinned, np): _*))
              .agg(count(lit(1)).as("rows_scanned")))
            .select(lit(np).as("nprobe"), col("hits"), col("rows_scanned"))
        }.reduce(_ unionByName _).orderBy(col("nprobe"))
      },
      ivfNprobeSweepOracleSql(Seq(1, 2, 4, 8))),

    // ANN recall measurement — turns the "recall lever" scaladocs into
    // measured numbers: recall@10 of the LSH and IVF top-k probes and
    // recall@3 of the single/multi-probe LSH k-NN joins, each against
    // the exact answer on the same corpus. Everything is deterministic
    // (fixed hyperplanes, pinned centroids), so DuckDB replays the
    // full approx-vs-exact comparison and the recall fractions are
    // oracle-checked numbers, not claims. Engine side reuses the
    // registered operators unchanged; hits are set intersections via
    // joins; the one-row denominators ride broadcast one-row aggs.
    "sim_recall_report" -> QueryDef(
      (s, d) => {
        val emb = T.embeddings(s, d)
        val q = emb.filter(col("vec_id") === 0)
          .select(col("embedding")).head().getSeq[Float](0).map(_.toDouble)
        val corpus0 = emb.filter(col("vec_id") =!= 0)
        val exactT = Similarity.cosineTopK(corpus0, "vec_id", "embedding",
          q, 10).select("vec_id")
        val lshT = Similarity.annTopK(corpus0, "vec_id", "embedding",
          q, 10, bits = 4).select("vec_id")
        val ivfT = Similarity.ivfTopK(corpus0, "vec_id", "embedding",
          q, 10, IvfCentroids.pinned, nprobe = 2).select("vec_id")
        val corpusJ = emb.filter(col("vec_id") % 50 =!= 0)
        val queriesJ = emb.filter(col("vec_id") % 50 === 0)
        val ePairs = Similarity.knnJoinExact(corpusJ, queriesJ,
          "vec_id", "embedding", k = 3).select("query_id", "corpus_id")
        val lPairs = Similarity.knnJoinLsh(corpusJ, queriesJ,
          "vec_id", "embedding", dim = 64, k = 3, bits = 4)
          .select("query_id", "corpus_id")
        val mPairs = Similarity.knnJoinLshMultiProbe(corpusJ, queriesJ,
          "vec_id", "embedding", dim = 64, k = 3, bits = 4)
          .select("query_id", "corpus_id")
        val iPairs = Similarity.knnJoinIvf(corpusJ, queriesJ,
          "vec_id", "embedding", k = 3, IvfCentroids.pinned, nprobe = 2)
          .select("query_id", "corpus_id")
        val rPairs = Similarity.knnJoinRerank(corpusJ, queriesJ,
          "vec_id", "embedding", k = 3)
          .select("query_id", "corpus_id")
        def topkRow(name: String, approx: DataFrame) =
          approx.join(exactT, "vec_id").agg(count(lit(1)).as("hits"))
            .select(lit(name).as("method"), lit(10L).as("k"), col("hits"))
        def pairRow(name: String, approx: DataFrame) =
          approx.join(ePairs, Seq("query_id", "corpus_id"))
            .agg(count(lit(1)).as("hits"))
            .crossJoin(ePairs.agg(count(lit(1)).as("k")))
            .select(lit(name).as("method"), col("k"), col("hits"))
        topkRow("ivf_topk", ivfT)
          .unionByName(pairRow("knn_ivf", iPairs))
          .unionByName(pairRow("knn_lsh", lPairs))
          .unionByName(pairRow("knn_multiprobe", mPairs))
          .unionByName(pairRow("knn_rerank", rPairs))
          .unionByName(topkRow("lsh_topk", lshT))
          .withColumn("recall",
            col("hits").cast("double") / col("k").cast("double"))
          .orderBy(col("method"))
      },
      s"""WITH hp(i, h) AS (VALUES ${Similarity.hyperplaneSqlValues(4, 64)}),
         |cen(i, c) AS (VALUES ${IvfCentroids.sqlValues}),
         |cn AS (
         |  SELECT i, c, list_reduce(list_transform(c, x -> x * x),
         |    (a, b) -> a + b) AS cnorm FROM cen),
         |emb AS (
         |  SELECT vec_id,
         |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
         |  FROM embeddings),
         |n AS (
         |  SELECT vec_id, v, sqrt(list_reduce(list_transform(v, t -> t * t),
         |    (a, b) -> a + b)) AS nrm FROM emb),
         |buck AS (
         |  SELECT e.vec_id, CAST(SUM(CASE
         |      WHEN list_reduce(list_transform(range(1, 65),
         |        j -> e.v[j] * hp.h[j]), (a, b) -> a + b) >= 0
         |      THEN (1 << hp.i) ELSE 0 END) AS INT) AS bucket
         |  FROM emb e, hp GROUP BY e.vec_id),
         |qn AS (SELECT v AS qv, nrm AS qnorm FROM n WHERE vec_id = 0),
         |sc0 AS (
         |  SELECT e.vec_id,
         |    list_reduce(list_transform(range(1, 65), j -> e.v[j] * qn.qv[j]),
         |      (a, b) -> a + b) / (e.nrm * qn.qnorm) AS cosine
         |  FROM n e, qn WHERE e.vec_id <> 0),
         |exact10 AS (
         |  SELECT vec_id FROM sc0 ORDER BY cosine DESC, vec_id LIMIT 10),
         |qb AS (SELECT bucket AS qbucket FROM buck WHERE vec_id = 0),
         |lsh10 AS (
         |  SELECT s.vec_id FROM sc0 s JOIN buck b ON b.vec_id = s.vec_id, qb
         |  WHERE b.bucket = qb.qbucket
         |  ORDER BY s.cosine DESC, s.vec_id LIMIT 10),
         |assign AS (
         |  SELECT vec_id, i AS cell FROM (
         |    SELECT e.vec_id, cn.i, row_number() OVER (PARTITION BY e.vec_id
         |      ORDER BY cn.cnorm - 2.0 * list_reduce(
         |        list_transform(range(1, ${IvfCentroids.dim + 1}),
         |          j -> e.v[j] * cn.c[j]), (a, b) -> a + b), cn.i) AS rn
         |    FROM emb e, cn) WHERE rn = 1),
         |probes AS (
         |  SELECT cn.i FROM cn, qn
         |  ORDER BY cn.cnorm - 2.0 * list_reduce(
         |    list_transform(range(1, ${IvfCentroids.dim + 1}),
         |      j -> qn.qv[j] * cn.c[j]), (a, b) -> a + b), cn.i LIMIT 2),
         |ivf10 AS (
         |  SELECT s.vec_id FROM sc0 s JOIN assign a ON a.vec_id = s.vec_id
         |  WHERE a.cell IN (SELECT i FROM probes)
         |  ORDER BY s.cosine DESC, s.vec_id LIMIT 10),
         |scored AS (
         |  SELECT q.vec_id AS query_id, c.vec_id AS corpus_id,
         |    list_reduce(list_transform(range(1, 65), j -> c.v[j] * q.v[j]),
         |      (a, b) -> a + b) / (c.nrm * q.nrm) AS cosine
         |  FROM n c, n q WHERE c.vec_id % 50 <> 0 AND q.vec_id % 50 = 0),
         |epairs AS (
         |  SELECT query_id, corpus_id FROM (
         |    SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
         |      ORDER BY cosine DESC, corpus_id DESC) AS rn FROM scored)
         |  WHERE rn <= 3),
         |nb AS (
         |  SELECT nn.vec_id, nn.v, nn.nrm, b.bucket
         |  FROM n nn JOIN buck b ON b.vec_id = nn.vec_id),
         |lscored AS (
         |  SELECT q.vec_id AS query_id, c.vec_id AS corpus_id,
         |    list_reduce(list_transform(range(1, 65), j -> c.v[j] * q.v[j]),
         |      (a, b) -> a + b) / (c.nrm * q.nrm) AS cosine
         |  FROM nb c JOIN nb q ON c.bucket = q.bucket
         |  WHERE c.vec_id % 50 <> 0 AND q.vec_id % 50 = 0),
         |lpairs AS (
         |  SELECT query_id, corpus_id FROM (
         |    SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
         |      ORDER BY cosine DESC, corpus_id DESC) AS rn FROM lscored)
         |  WHERE rn <= 3),
         |qprobe AS (
         |  SELECT vec_id, v, nrm,
         |    unnest([bucket] || list_transform(range(0, 4),
         |      j -> xor(bucket, CAST(1 << j AS INT)))) AS bucket
         |  FROM nb WHERE vec_id % 50 = 0),
         |mscored AS (
         |  SELECT q.vec_id AS query_id, c.vec_id AS corpus_id,
         |    list_reduce(list_transform(range(1, 65), j -> c.v[j] * q.v[j]),
         |      (a, b) -> a + b) / (c.nrm * q.nrm) AS cosine
         |  FROM nb c JOIN qprobe q ON c.bucket = q.bucket
         |  WHERE c.vec_id % 50 <> 0),
         |mpairs AS (
         |  SELECT query_id, corpus_id FROM (
         |    SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
         |      ORDER BY cosine DESC, corpus_id DESC) AS rn FROM mscored)
         |  WHERE rn <= 3),
         |iqprobe AS (
         |  SELECT vec_id, cell FROM (
         |    SELECT e.vec_id, cn.i AS cell, row_number() OVER (
         |      PARTITION BY e.vec_id
         |      ORDER BY cn.cnorm - 2.0 * list_reduce(
         |        list_transform(range(1, ${IvfCentroids.dim + 1}),
         |          j -> e.v[j] * cn.c[j]), (a, b) -> a + b), cn.i) AS rn
         |    FROM emb e, cn WHERE e.vec_id % 50 = 0) WHERE rn <= 2),
         |iscored AS (
         |  SELECT q.vec_id AS query_id, c.vec_id AS corpus_id,
         |    list_reduce(list_transform(range(1, 65), j -> cv.v[j] * qv.v[j]),
         |      (a, b) -> a + b) / (cv.nrm * qv.nrm) AS cosine
         |  FROM assign c JOIN iqprobe q ON q.cell = c.cell
         |  JOIN n cv ON cv.vec_id = c.vec_id
         |  JOIN n qv ON qv.vec_id = q.vec_id
         |  WHERE c.vec_id % 50 <> 0),
         |ipairs AS (
         |  SELECT query_id, corpus_id FROM (
         |    SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
         |      ORDER BY cosine DESC, corpus_id DESC) AS rn FROM iscored)
         |  WHERE rn <= 3),
         |hp16(i, h) AS (VALUES ${Similarity.hyperplaneSqlValues(16, 64)}),
         |pl AS (
         |  SELECT e.vec_id, hp16.i,
         |    list_reduce(list_transform(range(1, 65), j -> e.v[j] * hp16.h[j]),
         |      (a, b) -> a + b) AS p
         |  FROM emb e, hp16),
         |pr AS (
         |  SELECT vec_id, list(p ORDER BY i) AS proj FROM pl GROUP BY vec_id),
         |pn AS (
         |  SELECT vec_id, proj,
         |    sqrt(list_reduce(list_transform(range(1, 17),
         |      j -> proj[j] * proj[j]), (a, b) -> a + b)) AS pnrm
         |  FROM pr),
         |rproj AS (
         |  SELECT q.vec_id AS query_id, c.vec_id AS corpus_id,
         |    list_reduce(list_transform(range(1, 17),
         |      j -> c.proj[j] * q.proj[j]), (a, b) -> a + b)
         |      / (c.pnrm * q.pnrm) AS pc
         |  FROM pn c, pn q
         |  WHERE c.vec_id % 50 <> 0 AND q.vec_id % 50 = 0),
         |rshort AS (
         |  SELECT query_id, corpus_id FROM (
         |    SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
         |      ORDER BY pc DESC, corpus_id DESC) AS prn FROM rproj)
         |  WHERE prn <= 50),
         |rpairs AS (
         |  SELECT query_id, corpus_id FROM (
         |    SELECT s.query_id, s.corpus_id, s.cosine,
         |      ROW_NUMBER() OVER (PARTITION BY s.query_id
         |        ORDER BY s.cosine DESC, s.corpus_id DESC) AS rn
         |    FROM scored s JOIN rshort r
         |      ON r.query_id = s.query_id AND r.corpus_id = s.corpus_id)
         |  WHERE rn <= 3),
         |sel(method, k, hits) AS (
         |  SELECT 'ivf_topk', CAST(10 AS BIGINT),
         |    (SELECT COUNT(*) FROM ivf10 i JOIN exact10 x
         |       ON x.vec_id = i.vec_id)
         |  UNION ALL
         |  SELECT 'knn_ivf', (SELECT COUNT(*) FROM epairs),
         |    (SELECT COUNT(*) FROM ipairs i JOIN epairs e
         |       ON e.query_id = i.query_id AND e.corpus_id = i.corpus_id)
         |  UNION ALL
         |  SELECT 'knn_lsh', (SELECT COUNT(*) FROM epairs),
         |    (SELECT COUNT(*) FROM lpairs l JOIN epairs e
         |       ON e.query_id = l.query_id AND e.corpus_id = l.corpus_id)
         |  UNION ALL
         |  SELECT 'knn_multiprobe', (SELECT COUNT(*) FROM epairs),
         |    (SELECT COUNT(*) FROM mpairs m JOIN epairs e
         |       ON e.query_id = m.query_id AND e.corpus_id = m.corpus_id)
         |  UNION ALL
         |  SELECT 'knn_rerank', (SELECT COUNT(*) FROM epairs),
         |    (SELECT COUNT(*) FROM rpairs r JOIN epairs e
         |       ON e.query_id = r.query_id AND e.corpus_id = r.corpus_id)
         |  UNION ALL
         |  SELECT 'lsh_topk', CAST(10 AS BIGINT),
         |    (SELECT COUNT(*) FROM lsh10 l JOIN exact10 x
         |       ON x.vec_id = l.vec_id))
         |SELECT method, k, hits,
         |  CAST(hits AS DOUBLE) / CAST(k AS DOUBLE) AS recall
         |FROM sel ORDER BY method""".stripMargin),

    "dd_embedding_neardup" -> QueryDef(
      (s, d) => {
        val dim = T.embeddings(s, d).select(size(col("embedding")))
          .head().getInt(0)
        Similarity.embeddingNearDupPairs(T.embeddings(s, d), "vec_id",
          "embedding", dim, minCosine = 0.1, bits = 6)
          .orderBy(col("cosine").desc, col("id1"), col("id2"))
          .limit(100)
      },
      s"""WITH hp(i, h) AS (VALUES ${Similarity.hyperplaneSqlValues(6, 64)}),
         |emb AS (
         |  SELECT vec_id,
         |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
         |  FROM embeddings),
         |buck AS (
         |  SELECT e.vec_id, CAST(SUM(CASE
         |      WHEN list_reduce(list_transform(range(1, 65),
         |        j -> e.v[j] * hp.h[j]), (a, b) -> a + b) >= 0
         |      THEN (1 << hp.i) ELSE 0 END) AS INT) AS bucket
         |  FROM emb e, hp GROUP BY e.vec_id),
         |bv AS (
         |  SELECT e.vec_id, e.v, b.bucket
         |  FROM emb e JOIN buck b ON b.vec_id = e.vec_id),
         |pairs AS (
         |  SELECT x.vec_id AS id1, y.vec_id AS id2,
         |    list_reduce(list_transform(range(1, 65),
         |      j -> x.v[j] * y.v[j]), (a, b) -> a + b)
         |    / (sqrt(list_reduce(list_transform(x.v, t -> t * t),
         |        (a, b) -> a + b))
         |       * sqrt(list_reduce(list_transform(y.v, t -> t * t),
         |         (a, b) -> a + b))) AS cosine
         |  FROM bv x JOIN bv y
         |    ON x.bucket = y.bucket AND x.vec_id < y.vec_id)
         |SELECT id1, id2, cosine FROM pairs
         |WHERE cosine >= CAST(0.1 AS DOUBLE)
         |ORDER BY cosine DESC, id1, id2 LIMIT 100""".stripMargin),

    // SemDeDup (cluster-then-prune) census: the coarse quantizer is
    // the same pinned-literal centroid table sim_ann_ivf replays, so
    // DuckDB re-derives the identical cluster assignment (strict-less
    // argmin), the identical within-cluster near-dup pairs (left-fold
    // cosine, bit-exact per sim_cosine_fast), and hence the identical
    // kept set — pinned by the kept_id_sum checksum, not just counts.
    "dd_semantic_prune" -> QueryDef(
      (s, d) =>
        Similarity.semanticPruneCensus(T.embeddings(s, d), "vec_id",
          "embedding", IvfCentroids.pinned, minCosine = 0.3),
      s"""WITH cen(i, c) AS (VALUES ${IvfCentroids.sqlValues}),
         |cn AS (
         |  SELECT i, c, list_reduce(list_transform(c, x -> x * x),
         |    (a, b) -> a + b) AS cnorm
         |  FROM cen),
         |emb AS (
         |  SELECT vec_id,
         |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
         |  FROM embeddings),
         |assign AS (
         |  SELECT vec_id, v, i AS cell FROM (
         |    SELECT e.vec_id, e.v, cn.i, row_number() OVER (
         |      PARTITION BY e.vec_id
         |      ORDER BY cn.cnorm - 2.0 * list_reduce(
         |        list_transform(range(1, ${IvfCentroids.dim + 1}),
         |          j -> e.v[j] * cn.c[j]), (a, b) -> a + b), cn.i) AS rn
         |    FROM emb e, cn)
         |  WHERE rn = 1),
         |csz AS (SELECT cell, COUNT(*) AS n FROM assign GROUP BY cell),
         |nrm AS (
         |  SELECT a.vec_id, a.cell, a.v,
         |    sqrt(list_reduce(list_transform(a.v, t -> t * t),
         |      (a, b) -> a + b)) AS nrm
         |  FROM assign a JOIN csz ON csz.cell = a.cell
         |  WHERE csz.n <= 100000),
         |pruned AS (
         |  SELECT DISTINCT y.cell, y.vec_id
         |  FROM nrm x JOIN nrm y
         |    ON x.cell = y.cell AND x.vec_id < y.vec_id
         |  WHERE list_reduce(list_transform(range(1, ${IvfCentroids.dim + 1}),
         |      j -> x.v[j] * y.v[j]), (a, b) -> a + b)
         |    / (x.nrm * y.nrm) >= CAST(0.3 AS DOUBLE))
         |SELECT a.cell AS cell,
         |  CAST(COUNT(*) AS BIGINT) AS cluster_size,
         |  CAST(CASE WHEN COUNT(*) > 100000 THEN 1 ELSE 0 END AS BIGINT)
         |    AS capped,
         |  CAST(SUM(CASE WHEN p.vec_id IS NOT NULL THEN 1 ELSE 0 END)
         |    AS BIGINT) AS pruned,
         |  CAST(SUM(CASE WHEN p.vec_id IS NULL THEN 1 ELSE 0 END)
         |    AS BIGINT) AS kept,
         |  CAST(SUM(CASE WHEN p.vec_id IS NULL THEN a.vec_id ELSE 0 END)
         |    AS BIGINT) AS kept_id_sum
         |FROM assign a LEFT JOIN pruned p
         |  ON p.cell = a.cell AND p.vec_id = a.vec_id
         |GROUP BY a.cell ORDER BY a.cell""".stripMargin),

    // IVF ANN: probe the 2 cells nearest the query vector, exact
    // cosine within them. The coarse quantizer was trained ONCE
    // offline (graft.tools.PinIvfCentroids — the same bounded-sample
    // Lloyd path the recall spec exercises) and its centroids frozen
    // as literals, because the oracle SQL is static and k-means
    // training itself is not SQL-replayable. DuckDB then replays the
    // strict-less argmin assignment (cnorm − 2·dot, earliest index
    // wins ties), the nprobe selection, and the left-to-right cosine
    // fold — all bit-exact (see sim_cosine_fast). At scale the
    // assignment column is materialized once via withIvfCell
    // (partitioned by cell) so probes are partition-pruned scans.
    "sim_ann_ivf" -> QueryDef(
      (s, d) => {
        val emb = T.embeddings(s, d)
        val q = emb.filter(col("vec_id") === 0)
          .select(col("embedding")).head().getSeq[Float](0).map(_.toDouble)
        Similarity.ivfTopK(emb.filter(col("vec_id") =!= 0), "vec_id",
          "embedding", q, k = 10, IvfCentroids.pinned, nprobe = 2)
      },
      s"""WITH cen(i, c) AS (VALUES ${IvfCentroids.sqlValues}),
         |cn AS (
         |  SELECT i, c, list_reduce(list_transform(c, x -> x * x),
         |    (a, b) -> a + b) AS cnorm
         |  FROM cen),
         |emb AS (
         |  SELECT vec_id,
         |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
         |  FROM embeddings),
         |q AS (SELECT v AS qv FROM emb WHERE vec_id = 0),
         |qn AS (
         |  SELECT qv, sqrt(list_reduce(list_transform(qv, x -> x * x),
         |    (a, b) -> a + b)) AS qnorm FROM q),
         |probes AS (
         |  SELECT cn.i FROM cn, q
         |  ORDER BY cn.cnorm - 2.0 * list_reduce(
         |    list_transform(range(1, ${IvfCentroids.dim + 1}),
         |      j -> q.qv[j] * cn.c[j]), (a, b) -> a + b), cn.i
         |  LIMIT 2),
         |assign AS (
         |  SELECT vec_id, i AS cell FROM (
         |    SELECT e.vec_id, cn.i, row_number() OVER (
         |      PARTITION BY e.vec_id
         |      ORDER BY cn.cnorm - 2.0 * list_reduce(
         |        list_transform(range(1, ${IvfCentroids.dim + 1}),
         |          j -> e.v[j] * cn.c[j]), (a, b) -> a + b), cn.i) AS rn
         |    FROM emb e, cn)
         |  WHERE rn = 1)
         |SELECT e.vec_id,
         |  list_reduce(list_transform(range(1, ${IvfCentroids.dim + 1}),
         |    j -> e.v[j] * qn.qv[j]), (a, b) -> a + b)
         |  / (sqrt(list_reduce(list_transform(e.v, x -> x * x),
         |      (a, b) -> a + b)) * qn.qnorm) AS cosine,
         |  a.cell
         |FROM emb e JOIN assign a ON a.vec_id = e.vec_id, qn
         |WHERE e.vec_id <> 0 AND a.cell IN (SELECT i FROM probes)
         |ORDER BY cosine DESC, e.vec_id LIMIT 10""".stripMargin),

    // Brute-force cosine, scale-path formulation: per-row fold for the
    // dot product (no explode, no per-element shuffle rows) + top-k as
    // TakeOrderedAndProject. Oracle-checked BIT-FOR-BIT on the float
    // path: Spark's aggregate() fold and DuckDB's list_reduce are both
    // strict left-to-right IEEE double accumulation (and 0.0 + x == x
    // exactly, so the differing inits don't matter) — same products,
    // same order, same sqrt, same division.
    "sim_cosine_fast" -> QueryDef(
      (s, d) => {
        val q = T.embeddings(s, d).filter(col("vec_id") === 0)
          .select(col("embedding")).head().getSeq[Float](0).map(_.toDouble)
        Similarity.cosineTopK(
          T.embeddings(s, d).filter(col("vec_id") =!= 0),
          "vec_id", "embedding", q, 10)
      },
      """WITH q AS (
        |  SELECT list_transform(embedding, x -> CAST(x AS DOUBLE)) AS qv
        |  FROM embeddings WHERE vec_id = 0),
        |qn AS (
        |  SELECT sqrt(list_reduce(list_transform(qv, x -> x * x),
        |    (a, b) -> a + b)) AS qnorm, qv FROM q),
        |scored AS (
        |  SELECT vec_id,
        |    list_reduce(list_transform(range(1, len(embedding) + 1),
        |      i -> CAST(embedding[i] AS DOUBLE) * qv[i]), (a, b) -> a + b)
        |    / (sqrt(list_reduce(list_transform(embedding,
        |         x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)),
        |         (a, b) -> a + b)) * qnorm) AS cosine
        |  FROM embeddings, qn WHERE vec_id <> 0)
        |SELECT vec_id, cosine FROM scored
        |ORDER BY cosine DESC, vec_id LIMIT 10""".stripMargin),

    // Language-ID heuristic vs the labeled lang column (accuracy
    // profile per language). The oracle replays the marker-vote argmax
    // with DuckDB list functions: strict-greater fold over languages in
    // alphabetical order means a tie keeps the EARLIER language, and
    // all-zero votes yield 'und' — the CASE chain mirrors exactly that.
    "ta_langid" -> QueryDef(
      (s, d) => T.documents(s, d)
        .select(col("lang"), TextAnalysis.langId(col("text")).as("pred"))
        .groupBy(col("lang"), col("pred"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("lang"), col("pred")),
      """WITH toks AS (
        |  SELECT lang, string_split_regex(trim(lower(text)), '\s+') AS w
        |  FROM documents),
        |votes AS (
        |  SELECT lang,
        |    len(list_filter(w, x -> x IN ('der','die','das','und','ist','mit','für','nicht'))) AS v_de,
        |    len(list_filter(w, x -> x IN ('the','and','of','is','to','in','that','with'))) AS v_en,
        |    len(list_filter(w, x -> x IN ('el','la','de','que','los','las','una','por'))) AS v_es,
        |    len(list_filter(w, x -> x IN ('le','la','les','des','est','une','dans','pour'))) AS v_fr,
        |    len(list_filter(w, x -> x IN ('il','la','che','di','per','con','una','sono'))) AS v_it
        |  FROM toks),
        |pred AS (
        |  SELECT lang,
        |    CASE WHEN v_de=0 AND v_en=0 AND v_es=0 AND v_fr=0 AND v_it=0 THEN 'und'
        |         WHEN v_de >= v_en AND v_de >= v_es AND v_de >= v_fr AND v_de >= v_it THEN 'de'
        |         WHEN v_en >= v_es AND v_en >= v_fr AND v_en >= v_it THEN 'en'
        |         WHEN v_es >= v_fr AND v_es >= v_it THEN 'es'
        |         WHEN v_fr >= v_it THEN 'fr'
        |         ELSE 'it' END AS pred
        |  FROM votes)
        |SELECT lang, pred, COUNT(*) AS n FROM pred
        |GROUP BY lang, pred ORDER BY lang, pred""".stripMargin),

    // Duplicate clusters: n-gram Jaccard pairs → connected components
    // (min-label propagation) → (doc, cluster) labels — the step that
    // turns LSH candidate pairs into canonical-document groups. Oracle:
    // DuckDB recursive CTE computes the same min-reachable-id labels
    // over the same pair set.
    "dd_dup_clusters" -> QueryDef(
      (s, d) => clustersFor(s, d)
        .select(col("node").as("doc_id"), col("cluster_id"))
        .orderBy(col("doc_id")),
      s"""$clusterOracleCte
         |SELECT doc_id, cluster_id FROM labels ORDER BY doc_id""".stripMargin),

    // Degree-capped (sampled-edge) clustering — the bound that holds
    // when one document is duplicated a million times and maxBucketSize
    // can't help (the clique spans every band's buckets): each node
    // keeps its maxDegree smallest-id neighbors, edge volume becomes
    // linear in nodes, and the clusters touching a capped node are
    // REPORTED, not silently approximated. maxDegree=1 here (the
    // fixture's max observed degree is 2) so capping actually fires;
    // the oracle replays rank,
    // cap, connected components over kept edges, and the capped-
    // cluster census — every cell integer.
    "dd_degree_cap" -> QueryDef(
      (s, d) => {
        // the census fans out over pairs/kept/capped several times;
        // localCheckpoint materializes each ONCE instead of re-deriving
        // the shingle-join pipeline per aggregate (construction-time
        // job, the o6_keyset_pagination precedent; clustering itself
        // checkpoints its rounds the same way)
        val pairs = Dedup.ngramJaccardPairs(
          T.documents(s, d).filter(col("doc_id") < 500), "doc_id", "text",
          n = 2, minJaccard = 0.5).localCheckpoint()
        val (kept0, capped0) = Dedup.capDegree(pairs, maxDegree = 1)
        val kept = kept0.localCheckpoint()
        val cappedNodes = capped0.localCheckpoint()
        val labels = Dedup.duplicateClusters(kept)
        pairs.agg(count(lit(1)).as("n_pairs_in"))
          .crossJoin(kept.agg(count(lit(1)).as("n_pairs_kept"),
            coalesce(sum(col("id1") * 1000000L + col("id2")), lit(0L))
              .as("pair_checksum")))
          .crossJoin(cappedNodes.agg(count(lit(1)).as("n_capped_nodes")))
          .crossJoin(labels
            .join(cappedNodes.select(col("node")), Seq("node"))
            .agg(countDistinct(col("cluster_id")).as("capped_clusters")))
          .select(col("n_pairs_in"), col("n_pairs_kept"),
            col("pair_checksum"), col("n_capped_nodes"),
            col("capped_clusters"))
      },
      s"""$clusterOracleCte,
         |directed AS (
         |  SELECT id1 AS node, id2 AS nbr FROM jp
         |  UNION ALL SELECT id2, id1 FROM jp),
         |ranked AS (
         |  SELECT node, nbr,
         |    row_number() OVER (PARTITION BY node ORDER BY nbr) AS rn
         |  FROM directed),
         |kept AS (
         |  SELECT DISTINCT least(node, nbr) AS id1,
         |    greatest(node, nbr) AS id2
         |  FROM ranked WHERE rn <= 1),
         |cappedn AS (
         |  SELECT node FROM directed GROUP BY node HAVING COUNT(*) > 1),
         |kedges AS (SELECT id1 AS a, id2 AS b FROM kept
         |           UNION SELECT id2, id1 FROM kept),
         |kreach(n, m) AS (
         |  SELECT a, a FROM kedges
         |  UNION
         |  SELECT r.n, e.b FROM kreach r JOIN kedges e ON r.m = e.a),
         |klabels AS (SELECT n AS doc_id, MIN(m) AS cluster_id
         |            FROM kreach GROUP BY n)
         |SELECT
         |  (SELECT COUNT(*) FROM jp) AS n_pairs_in,
         |  (SELECT COUNT(*) FROM kept) AS n_pairs_kept,
         |  (SELECT CAST(COALESCE(SUM(id1 * 1000000 + id2), 0) AS BIGINT)
         |   FROM kept) AS pair_checksum,
         |  (SELECT COUNT(*) FROM cappedn) AS n_capped_nodes,
         |  (SELECT COUNT(DISTINCT l.cluster_id) FROM klabels l
         |   JOIN cappedn c ON c.node = l.doc_id) AS capped_clusters""".stripMargin),

    // Canonical-document selection: clusters → one representative each
    // (longest text, smallest id tiebreak) + all singletons — the
    // deduplicated corpus, oracle-checked end to end.
    "dd_canonical_docs" -> QueryDef(
      (s, d) => Dedup.canonicalDocuments(
          T.documents(s, d).filter(col("doc_id") < 500),
          clustersFor(s, d), "doc_id", "n_chars")
        .select(col("doc_id"), col("cluster_id"))
        .orderBy(col("doc_id")),
      s"""$clusterOracleCte,
         |clustered AS (
         |  SELECT d.doc_id, l.cluster_id,
         |    row_number() OVER (PARTITION BY l.cluster_id
         |      ORDER BY d.n_chars DESC, d.doc_id) AS rk
         |  FROM documents d JOIN labels l ON d.doc_id = l.doc_id
         |  WHERE d.doc_id < 500)
         |SELECT doc_id, doc_id AS cluster_id FROM documents
         |WHERE doc_id < 500 AND doc_id NOT IN (SELECT doc_id FROM labels)
         |UNION ALL
         |SELECT doc_id, cluster_id FROM clustered WHERE rk = 1
         |ORDER BY doc_id""".stripMargin),

    // End-to-end corpus curation — the canonical "build a training
    // mix" pipeline as ONE query: language filter → token floor →
    // exact-fingerprint first-wins dedup → per-language quota sample.
    "etl_curate_corpus" -> QueryDef(
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val nTokens = size(split(trim(col("text")), "\\s+")).cast("long")
        val fp = md5(trim(regexp_replace(col("text"), "\\s+", " ")))
        val w = Window.partitionBy(col("fp")).orderBy(col("doc_id"))
        val deduped = T.documents(s, d)
          .filter(col("lang").isin("en", "es"))
          .withColumn("n_tokens", nTokens).filter(col("n_tokens") >= 10)
          .withColumn("fp", fp)
          .withColumn("_rn", row_number().over(w))
          .filter(col("_rn") === 1).drop("_rn", "fp")
        TextAnalysis.stratifiedSample(deduped, "lang", "doc_id", quota = 30)
          .select(col("lang"), col("doc_id"), col("n_tokens"))
          .orderBy(col("lang"), col("doc_id"))
      },
      """WITH filtered AS (
        |  SELECT lang, doc_id,
        |    len(string_split_regex(trim(text), '\s+')) AS n_tokens,
        |    md5(trim(regexp_replace(text, '\s+', ' ', 'g'))) AS fp
        |  FROM documents
        |  WHERE lang IN ('en', 'es')
        |    AND len(string_split_regex(trim(text), '\s+')) >= 10),
        |deduped AS (
        |  SELECT lang, doc_id, n_tokens FROM (
        |    SELECT *, row_number() OVER (PARTITION BY fp ORDER BY doc_id) AS rn
        |    FROM filtered) WHERE rn = 1)
        |SELECT lang, doc_id, n_tokens FROM (
        |  SELECT *, row_number() OVER (
        |    PARTITION BY lang
        |    ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS qrn
        |  FROM deduped)
        |WHERE qrn <= 30 ORDER BY lang, doc_id""".stripMargin),

    // Dataset card: the one-row corpus summary a release ships —
    // volume, token mass, language spread, exact-duplicate rate, and
    // short-doc share. ONE scan feeding independent aggregates (the
    // fingerprint distinct is the only second pass); all integers +
    // one exact division, so the card is engine-exact.
    "ta_dataset_card" -> QueryDef(
      (s, d) => {
        val docs = T.documents(s, d)
        val nTok = size(split(trim(col("text")), "\\s+")).cast("long")
        val base = docs.agg(
          count(lit(1)).as("n_docs"),
          sum(nTok).as("total_tokens"),
          countDistinct(col("lang")).as("n_langs"),
          sum(when(col("lang") === "en", 1L).otherwise(0L)).as("n_en"),
          sum(when(nTok < 10, 1L).otherwise(0L)).as("n_short"))
        val dups = docs.agg((count(lit(1)) -
          countDistinct(md5(trim(regexp_replace(col("text"), "\\s+", " ")))))
          .as("n_exact_dups"))
        base.crossJoin(dups)
          .withColumn("en_share",
            col("n_en").cast("double") / col("n_docs").cast("double"))
      },
      """SELECT
        |  (SELECT COUNT(*) FROM documents) AS n_docs,
        |  (SELECT CAST(SUM(len(string_split_regex(trim(text), '\s+'))) AS BIGINT)
        |   FROM documents) AS total_tokens,
        |  (SELECT COUNT(DISTINCT lang) FROM documents) AS n_langs,
        |  (SELECT CAST(SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT)
        |   FROM documents) AS n_en,
        |  (SELECT CAST(SUM(CASE WHEN len(string_split_regex(trim(text), '\s+')) < 10
        |     THEN 1 ELSE 0 END) AS BIGINT) FROM documents) AS n_short,
        |  (SELECT COUNT(*) - COUNT(DISTINCT md5(trim(
        |     regexp_replace(text, '\s+', ' ', 'g')))) FROM documents)
        |    AS n_exact_dups,
        |  (SELECT CAST(SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS DOUBLE)
        |     / CAST(COUNT(*) AS DOUBLE) FROM documents) AS en_share""".stripMargin),

    // Vocabulary profile: top-10 tokens per language by frequency,
    // THROUGH the custom GroupedTopK physical operator (bounded
    // per-key heaps, no per-group sort) — the custom plan applied to a
    // real text workload: explode → partial-agg counts → grouped
    // top-k. Ties break on the token for determinism.
    "ta_vocab_topk" -> QueryDef(
      (s, d) => {
        val counts = T.documents(s, d)
          .select(col("lang"),
            explode(TextAnalysis.tokens(col("text"))).as("token"))
          .filter(col("token") =!= "")
          .groupBy(col("lang"), col("token"))
          .agg(count(lit(1)).as("n"))
        graft.plans.GroupedTopK.of(counts,
            keyCols = Seq("lang"), orderCols = Seq("n", "token"),
            descending = true, k = 10)
          .orderBy(col("lang"), col("n").desc, col("token").desc)
      },
      """SELECT lang, token, n FROM (
        |  SELECT lang, token, n, ROW_NUMBER() OVER (
        |    PARTITION BY lang ORDER BY n DESC, token DESC) AS rn
        |  FROM (
        |    SELECT lang, token, COUNT(*) AS n FROM (
        |      SELECT lang, unnest(string_split_regex(
        |        trim(lower(text)), '\s+')) AS token
        |      FROM documents)
        |    WHERE token <> '' GROUP BY lang, token))
        |WHERE rn <= 10
        |ORDER BY lang, n DESC, token DESC""".stripMargin),

    // Bigram language-model census — the count tables an n-gram LM
    // (or a KN-smoothing pass) is built from, all INTEGRAL: bigram
    // count n, left-context mass c1 = Σ_w2 n(w1,w2), continuation
    // count cont(w2) = |{w1}| (the Kneser-Ney numerator), and the
    // ×1e6 div probabilities. Scale shape: bigrams explode in place
    // (no shuffle), ONE partial-agg shuffle builds the (w1,w2) count
    // table, and c1/cont derive from THAT table (vocab²-bounded, far
    // smaller than the corpus) — the 1-row type count broadcasts.
    "ta_bigram_lm" -> QueryDef(
      (s, d) => {
        val docs = T.documents(s, d)
          .select(TextAnalysis.tokens(col("text")).as("t"))
          .filter(size(col("t")) >= 2)
        val pairs = docs.select(explode(expr(
            "transform(sequence(0, size(t)-2), " +
              "i -> struct(t[i] AS w1, t[i+1] AS w2))")).as("b"))
          .select(col("b.w1").as("w1"), col("b.w2").as("w2"))
          .filter(col("w1") =!= "" && col("w2") =!= "")
        // the count table is consumed FOUR times (join probe, c1,
        // cont, d_types): localCheckpoint materializes it once so the
        // corpus is tokenized/exploded once, not per consumer (the
        // dd_degree_cap precedent)
        val n = pairs.groupBy(col("w1"), col("w2"))
          .agg(count(lit(1)).as("n"))
          .localCheckpoint()
        val c1 = n.groupBy(col("w1")).agg(sum(col("n")).as("c1"))
        val cont = n.groupBy(col("w2")).agg(count(lit(1)).as("cont"))
        val dt = n.agg(count(lit(1)).as("d_types"))
        n.join(c1, "w1").join(cont, "w2").crossJoin(broadcast(dt))
          .withColumn("p_mle_x1e6", expr("n * 1000000 div c1"))
          .withColumn("p_cont_x1e6", expr("cont * 1000000 div d_types"))
          .select(col("w1"), col("w2"), col("n"), col("c1"), col("cont"),
            col("p_mle_x1e6"), col("p_cont_x1e6"))
          .orderBy(col("n").desc, col("w1"), col("w2")).limit(50)
      },
      """WITH d0 AS (
        |  SELECT string_split_regex(trim(lower(text)), '\s+') AS t
        |  FROM documents),
        |bg AS (
        |  SELECT unnest(list_transform(range(1, len(t)),
        |    i -> struct_pack(w1 := t[i], w2 := t[i+1]))) AS b
        |  FROM d0 WHERE len(t) >= 2),
        |p AS (
        |  SELECT b.w1 AS w1, b.w2 AS w2 FROM bg
        |  WHERE b.w1 <> '' AND b.w2 <> ''),
        |n AS (SELECT w1, w2, COUNT(*) AS n FROM p GROUP BY 1, 2),
        |c1 AS (SELECT w1, CAST(SUM(n) AS BIGINT) AS c1 FROM n GROUP BY 1),
        |cont AS (SELECT w2, COUNT(*) AS cont FROM n GROUP BY 1),
        |dt AS (SELECT COUNT(*) AS d_types FROM n)
        |SELECT n.w1, n.w2, n.n, c1.c1, cont.cont,
        |  CAST(n.n * 1000000 // c1.c1 AS BIGINT) AS p_mle_x1e6,
        |  CAST(cont.cont * 1000000 // dt.d_types AS BIGINT) AS p_cont_x1e6
        |FROM n JOIN c1 USING (w1) JOIN cont USING (w2) CROSS JOIN dt
        |ORDER BY n.n DESC, n.w1, n.w2 LIMIT 50""".stripMargin),

    // LM-perplexity quality filter (the CCNet/KenLM pattern every
    // web-scale corpus pipeline runs: score each document under a
    // reference language model, drop the worst tail). Train: bigram
    // count table n(w1,w2) + context mass c1(w1) from the even-id
    // half of the corpus — one partial-agg shuffle, vocab²-bounded,
    // localCheckpointed once. Score: each odd-id document's bigrams
    // LEFT-join the table on the (w1,w2) key (keyed shuffle join, the
    // scoring cost every CCNet pass pays; at 100 TB the table is the
    // broadcast/bucketed side); per-bigram cost is the INTEGRAL
    // -log2 p̂ = floor(log2(c1 div n)) via length(bin(x))-1 (no libm
    // in any compared cell), unseen bigrams pay a flat 20-bit OOV
    // cost (stupid-backoff simplified to a declared constant). Doc
    // score = total bits and bits-per-bigram ×1e3 (integral division);
    // kept = below the 12.000 bits/bigram line. Output: the worst 100
    // eval docs — the tail a filter would drop first.
    "ta_lm_quality_filter" -> QueryDef(
      (s, d) => {
        val docs = T.documents(s, d)
          .select(col("doc_id"), TextAnalysis.tokens(col("text")).as("t"))
          .filter(size(col("t")) >= 2)
        val lm = LmScore.trainBigramTable(
          LmScore.bigrams(docs.filter(col("doc_id") % 2 === 0)))
        LmScore.scoreDocs(
            LmScore.bigrams(docs.filter(col("doc_id") % 2 === 1)), lm)
          .withColumn("bits_per_bigram_x1e3",
            expr("total_bits * 1000 div n_bigrams"))
          .withColumn("kept",
            (col("bits_per_bigram_x1e3") < 12000).cast("int"))
          .orderBy(col("bits_per_bigram_x1e3").desc, col("doc_id"))
          .limit(100)
      },
      """WITH d0 AS (
        |  SELECT doc_id,
        |    string_split_regex(trim(lower(text)), '\s+') AS t
        |  FROM documents),
        |bg AS (
        |  SELECT doc_id, b.w1 AS w1, b.w2 AS w2 FROM (
        |    SELECT doc_id, unnest(list_transform(range(1, len(t)),
        |      i -> struct_pack(w1 := t[i], w2 := t[i+1]))) AS b
        |    FROM d0 WHERE len(t) >= 2)
        |  WHERE b.w1 <> '' AND b.w2 <> ''),
        |n AS (
        |  SELECT w1, w2, COUNT(*) AS n
        |  FROM bg WHERE doc_id % 2 = 0 GROUP BY 1, 2),
        |lm AS (
        |  SELECT w1, w2, n,
        |    CAST(SUM(n) OVER (PARTITION BY w1) AS BIGINT) AS c1
        |  FROM n),
        |costs AS (
        |  SELECT bg.doc_id,
        |    CASE WHEN lm.n IS NULL THEN 20
        |         ELSE length(bin(lm.c1 // lm.n)) - 1 END AS bits
        |  FROM bg LEFT JOIN lm USING (w1, w2)
        |  WHERE bg.doc_id % 2 = 1),
        |sc AS (
        |  SELECT doc_id, COUNT(*) AS n_bigrams,
        |    CAST(SUM(bits) AS BIGINT) AS total_bits
        |  FROM costs GROUP BY 1)
        |SELECT doc_id, n_bigrams, total_bits,
        |  CAST(total_bits * 1000 // n_bigrams AS BIGINT)
        |    AS bits_per_bigram_x1e3,
        |  CAST(total_bits * 1000 // n_bigrams < 12000 AS INTEGER) AS kept
        |FROM sc
        |ORDER BY bits_per_bigram_x1e3 DESC, doc_id LIMIT 100""".stripMargin),

    // CCNet head/middle/tail perplexity bucketing (Wenzek et al. 2020
    // §4.3 — the production form of the LM filter: the corpus is cut
    // at the perplexity TERCILES, not a fixed threshold, so the gate
    // self-calibrates to the corpus). Scale-right boundary
    // computation: a global ntile would funnel every scored doc
    // through ONE sorted partition; instead the scored frame
    // partial-aggregates into a bits-per-bigram histogram (the
    // domain is integral and bounded — ≤ oovBits·1000 distinct cells),
    // boundaries come from a cumulative sum over that tiny table, and
    // bucket assignment is a broadcast-join comparison at scan speed.
    // Boundary rule, integer-exact: b1 = smallest bpb with cum ≥
    // ceil(n/3), b2 = smallest with cum ≥ ceil(2n/3); bucket = head
    // (best) if bpb ≤ b1, tail if > b2. Ties land whole bpb cells in
    // one bucket — deterministic, and exactly what the oracle replays.
    "ta_lm_terciles" -> QueryDef(
      (s, d) => {
        val docs = T.documents(s, d)
          .select(col("doc_id"), TextAnalysis.tokens(col("text")).as("t"))
          .filter(size(col("t")) >= 2)
        val lm = LmScore.trainBigramTable(
          LmScore.bigrams(docs.filter(col("doc_id") % 2 === 0)))
        val scored = LmScore.scoreDocs(
            LmScore.bigrams(docs.filter(col("doc_id") % 2 === 1)), lm)
          .withColumn("bpb", expr("total_bits * 1000 div n_bigrams"))
        // two-pass by design: pass 1 reduces the scored frame to the
        // bounded histogram (checkpointed — bounds and total both read
        // it), pass 2 re-scores for the assignment. The single-
        // partition cum window runs over the TINY histogram only.
        val hist = scored.groupBy(col("bpb"))
          .agg(count(lit(1)).as("cnt"))
          .withColumn("cum", sum(col("cnt")).over(
            Window.orderBy(col("bpb"))
              .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
          .localCheckpoint()
        val n = hist.agg(max(col("cum")).as("n_total"))
        val bounds = hist.crossJoin(broadcast(n)).agg(
          min(when(col("cum") * 3 >= col("n_total"), col("bpb")))
            .as("b1"),
          min(when(col("cum") * 3 >= col("n_total") * 2, col("bpb")))
            .as("b2"))
        scored.crossJoin(broadcast(bounds))
          .withColumn("bucket",
            when(col("bpb") <= col("b1"), "head")
              .when(col("bpb") <= col("b2"), "middle")
              .otherwise("tail"))
          .groupBy(col("bucket"))
          .agg(count(lit(1)).as("n_docs"),
            min(col("bpb")).as("min_bpb"), max(col("bpb")).as("max_bpb"),
            sum(col("total_bits")).as("sum_bits"),
            sum(col("doc_id")).as("id_checksum"))
          .orderBy(col("bucket"))
      },
      """WITH d0 AS (
        |  SELECT doc_id,
        |    string_split_regex(trim(lower(text)), '\s+') AS t
        |  FROM documents),
        |bg AS (
        |  SELECT doc_id, b.w1 AS w1, b.w2 AS w2 FROM (
        |    SELECT doc_id, unnest(list_transform(range(1, len(t)),
        |      i -> struct_pack(w1 := t[i], w2 := t[i+1]))) AS b
        |    FROM d0 WHERE len(t) >= 2)
        |  WHERE b.w1 <> '' AND b.w2 <> ''),
        |n AS (
        |  SELECT w1, w2, COUNT(*) AS n
        |  FROM bg WHERE doc_id % 2 = 0 GROUP BY 1, 2),
        |lm AS (
        |  SELECT w1, w2, n,
        |    CAST(SUM(n) OVER (PARTITION BY w1) AS BIGINT) AS c1
        |  FROM n),
        |costs AS (
        |  SELECT bg.doc_id,
        |    CASE WHEN lm.n IS NULL THEN 20
        |         ELSE length(bin(lm.c1 // lm.n)) - 1 END AS bits
        |  FROM bg LEFT JOIN lm USING (w1, w2)
        |  WHERE bg.doc_id % 2 = 1),
        |sc AS (
        |  SELECT doc_id, COUNT(*) AS n_bigrams,
        |    CAST(SUM(bits) AS BIGINT) AS total_bits
        |  FROM costs GROUP BY 1),
        |scored AS (
        |  SELECT doc_id, total_bits,
        |    total_bits * 1000 // n_bigrams AS bpb
        |  FROM sc),
        |hist AS (
        |  SELECT bpb, COUNT(*) AS cnt FROM scored GROUP BY bpb),
        |cum AS (
        |  SELECT bpb, SUM(cnt) OVER (ORDER BY bpb
        |    ROWS UNBOUNDED PRECEDING) AS cum
        |  FROM hist),
        |nn AS (SELECT COUNT(*) AS n_total FROM scored),
        |bounds AS (
        |  SELECT MIN(CASE WHEN cum * 3 >= n_total THEN bpb END) AS b1,
        |    MIN(CASE WHEN cum * 3 >= n_total * 2 THEN bpb END) AS b2
        |  FROM cum, nn),
        |lab AS (
        |  SELECT s.doc_id, s.total_bits, s.bpb,
        |    CASE WHEN s.bpb <= b.b1 THEN 'head'
        |         WHEN s.bpb <= b.b2 THEN 'middle'
        |         ELSE 'tail' END AS bucket
        |  FROM scored s CROSS JOIN bounds b)
        |SELECT bucket, COUNT(*) AS n_docs,
        |  CAST(MIN(bpb) AS BIGINT) AS min_bpb,
        |  CAST(MAX(bpb) AS BIGINT) AS max_bpb,
        |  CAST(SUM(total_bits) AS BIGINT) AS sum_bits,
        |  CAST(SUM(doc_id) AS BIGINT) AS id_checksum
        |FROM lab GROUP BY bucket ORDER BY bucket""".stripMargin),

    // Gopher-style rule filter (Rae et al. 2021 §A1.1, the heuristic
    // gate every web corpus passes before model-based filtering; the
    // FineWeb pipeline keeps the same rule family). Five rules, all in
    // EXACT integer arithmetic (ratio thresholds cleared by
    // cross-multiplication — no float division in any compared cell):
    // word count in [50, 100k], mean word length in [3, 10] chars
    // (sum_len vs 3n/10n), >=80% words containing an alphabetic char
    // (5·n_alpha >= 4·n), <=10% symbol-soup words ('#' or '...'),
    // and >=2 distinct hits from an 8-word English stopword set.
    // Reported per language as per-rule fail counts plus the all-rules
    // pass count — the profile a corpus owner reads before committing
    // thresholds. Scale shape: one narrow map over the corpus (all
    // rule inputs are per-row array folds, no explode) into a
    // lang-keyed partial agg — a single shuffle of ~|langs| rows.
    "ta_gopher_filter" -> QueryDef(
      (s, d) => TextClassify.gopherCensus(T.documents(s, d)),
      """WITH t AS (
        |  SELECT lang, list_filter(
        |    COALESCE(string_split_regex(trim(lower(text)), '\s+'), []),
        |    x -> x <> '') AS w
        |  FROM documents),
        |m AS (
        |  SELECT lang, CAST(len(w) AS BIGINT) AS n,
        |    CAST(COALESCE(list_sum(list_transform(w, x -> length(x))), 0)
        |      AS BIGINT) AS sum_len,
        |    CAST(len(list_filter(w, x -> regexp_matches(x, '[a-z]')))
        |      AS BIGINT) AS n_alpha,
        |    CAST(len(list_filter(w,
        |      x -> contains(x, '#') OR contains(x, '...')))
        |      AS BIGINT) AS n_sym,
        |    (CASE WHEN list_contains(w, 'the') THEN 1 ELSE 0 END
        |     + CASE WHEN list_contains(w, 'be') THEN 1 ELSE 0 END
        |     + CASE WHEN list_contains(w, 'to') THEN 1 ELSE 0 END
        |     + CASE WHEN list_contains(w, 'of') THEN 1 ELSE 0 END
        |     + CASE WHEN list_contains(w, 'and') THEN 1 ELSE 0 END
        |     + CASE WHEN list_contains(w, 'that') THEN 1 ELSE 0 END
        |     + CASE WHEN list_contains(w, 'have') THEN 1 ELSE 0 END
        |     + CASE WHEN list_contains(w, 'with') THEN 1 ELSE 0 END)
        |      AS stop_hits
        |  FROM t)
        |SELECT lang, COUNT(*) AS n_docs,
        |  CAST(SUM(CASE WHEN NOT (n >= 50 AND n <= 100000)
        |    THEN 1 ELSE 0 END) AS BIGINT) AS fail_word_count,
        |  CAST(SUM(CASE WHEN NOT (sum_len >= n * 3 AND sum_len <= n * 10)
        |    THEN 1 ELSE 0 END) AS BIGINT) AS fail_mean_word_len,
        |  CAST(SUM(CASE WHEN NOT (n_alpha * 5 >= n * 4)
        |    THEN 1 ELSE 0 END) AS BIGINT) AS fail_alpha_ratio,
        |  CAST(SUM(CASE WHEN NOT (n_sym * 10 <= n)
        |    THEN 1 ELSE 0 END) AS BIGINT) AS fail_symbol_ratio,
        |  CAST(SUM(CASE WHEN NOT (stop_hits >= 2)
        |    THEN 1 ELSE 0 END) AS BIGINT) AS fail_stopwords,
        |  CAST(SUM(CASE WHEN n >= 50 AND n <= 100000
        |      AND sum_len >= n * 3 AND sum_len <= n * 10
        |      AND n_alpha * 5 >= n * 4 AND n_sym * 10 <= n
        |      AND stop_hits >= 2
        |    THEN 1 ELSE 0 END) AS BIGINT) AS n_pass
        |FROM m GROUP BY lang ORDER BY lang""".stripMargin),

    // Distributed Naive Bayes text classifier (the fastText-style
    // model-based quality/language gate — the GPT-3 and CCNet
    // pipelines both train exactly this shape on a reference corpus
    // and score the crawl with it). Train on the even-id half
    // (label: lang = 'en'): per-token class counts are ONE
    // token-keyed partial-agg shuffle collapsing the corpus to a
    // vocab-bounded (token, n1, n0) table, localCheckpointed because
    // both the totals aggregate and the scoring join consume it.
    // Score the odd-id half: tokens LEFT-join the count table on the
    // token key, Laplace-smoothed per-token cost in INTEGRAL bits
    // (floor(log2((N_c+V) div (n+1))) via length(bin(x))-1 — no libm
    // in any compared cell), per-doc partial agg, class priors as
    // floor-log2 bits from the broadcast 1-row doc census, argmin
    // class (ties → negative). Output: the confusion-matrix census.
    // NOTE the synthetic corpus shares one 31-token vocab across all
    // langs, so the measured accuracy is prior-dominated — the fixture
    // has no lexical signal; what the oracle pins is the distributed
    // train/score machinery and its exact arithmetic. Scale shape:
    // nothing grows with the train corpus at fixed vocab; scoring is
    // linear in eval tokens with a vocab-bounded build side.
    // Assumes both classes occur in the train half (the div-by-d1
    // prior is undefined otherwise — a one-class corpus needs no
    // classifier).
    "ta_nb_classifier" -> QueryDef(
      (s, d) => {
        // when/otherwise, not a bare cast of the equality: a NULL lang
        // must label 0 (the oracle's CASE semantics), never NULL —
        // a NULL y silently drops the doc from priors and confusion
        // cells while still counting in n_eval (latent on this
        // fixture, which has no NULL langs, but the arithmetic must
        // not depend on that).
        val docs = T.documents(s, d).select(col("doc_id"),
          when(col("lang") === "en", 1).otherwise(0).as("y"),
          TextAnalysis.tokens(col("text")).as("t"))
        val tok = docs
          .select(col("doc_id"), col("y"), explode(col("t")).as("token"))
          .filter(col("token") =!= "")
        val counts = TextClassify.nbTrainCounts(
          tok.filter(col("doc_id") % 2 === 0))
        val priors = docs.filter(col("doc_id") % 2 === 0)
          .agg(sum("y").as("d1"), sum(lit(1) - col("y")).as("d0"))
        TextClassify.confusionCensus(TextClassify.nbPredict(
          tok.filter(col("doc_id") % 2 === 1), counts, priors))
      },
      """WITH docs AS (
        |  SELECT doc_id, CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y,
        |    string_split_regex(trim(lower(text)), '\s+') AS t
        |  FROM documents),
        |tk AS (
        |  SELECT doc_id, y, token FROM (
        |    SELECT doc_id, y, unnest(t) AS token FROM docs)
        |  WHERE token <> ''),
        |counts AS (
        |  SELECT token, CAST(SUM(y) AS BIGINT) AS n1,
        |    CAST(SUM(1 - y) AS BIGINT) AS n0
        |  FROM tk WHERE doc_id % 2 = 0 GROUP BY token),
        |totals AS (
        |  SELECT CAST(SUM(n1) AS BIGINT) AS tn1,
        |    CAST(SUM(n0) AS BIGINT) AS tn0, COUNT(*) AS v
        |  FROM counts),
        |priors AS (
        |  SELECT CAST(SUM(y) AS BIGINT) AS d1,
        |    CAST(SUM(1 - y) AS BIGINT) AS d0
        |  FROM docs WHERE doc_id % 2 = 0),
        |b AS (
        |  SELECT t.doc_id, t.y,
        |    length(bin((tt.tn1 + tt.v) // (COALESCE(c.n1, 0) + 1))) - 1
        |      AS b1,
        |    length(bin((tt.tn0 + tt.v) // (COALESCE(c.n0, 0) + 1))) - 1
        |      AS b0
        |  FROM tk t LEFT JOIN counts c USING (token) CROSS JOIN totals tt
        |  WHERE t.doc_id % 2 = 1),
        |sc AS (
        |  SELECT doc_id, y, CAST(SUM(b1) AS BIGINT) AS bits1,
        |    CAST(SUM(b0) AS BIGINT) AS bits0
        |  FROM b GROUP BY 1, 2),
        |pred AS (
        |  SELECT y,
        |    CASE WHEN bits1 + (length(bin((p.d1 + p.d0) // p.d1)) - 1)
        |            < bits0 + (length(bin((p.d1 + p.d0) // p.d0)) - 1)
        |      THEN 1 ELSE 0 END AS pred
        |  FROM sc CROSS JOIN priors p)
        |SELECT
        |  CAST(SUM(CASE WHEN y = 1 AND pred = 1 THEN 1 ELSE 0 END)
        |    AS BIGINT) AS tp,
        |  CAST(SUM(CASE WHEN y = 0 AND pred = 1 THEN 1 ELSE 0 END)
        |    AS BIGINT) AS fp,
        |  CAST(SUM(CASE WHEN y = 1 AND pred = 0 THEN 1 ELSE 0 END)
        |    AS BIGINT) AS fn,
        |  CAST(SUM(CASE WHEN y = 0 AND pred = 0 THEN 1 ELSE 0 END)
        |    AS BIGINT) AS tn,
        |  COUNT(*) AS n_eval,
        |  CAST((SUM(CASE WHEN y = 1 AND pred = 1 THEN 1 ELSE 0 END)
        |      + SUM(CASE WHEN y = 0 AND pred = 0 THEN 1 ELSE 0 END))
        |      * 10000 // COUNT(*) AS BIGINT) AS accuracy_x1e4
        |FROM pred""".stripMargin),

    // TF-IDF top-k terms per document, with an INTEGRAL idf: score =
    // tf · floor(log2(n_docs div df)). floor(log2 x) is exact integer
    // arithmetic in both engines (length(bin(x)) - 1 — no libm), so
    // every compared cell is integral; stopword-grade tokens
    // (df > n_docs/2) score 0 and drop out of the top-k, which is the
    // behavior ln-idf exists to produce. Scale shape: tf is one
    // (doc, token)-keyed partial-agg shuffle, df one token-keyed
    // shuffle over the tf frame (already one row per doc×token — far
    // smaller than the raw explode), the df join rides the token key,
    // and the 1-row corpus count broadcasts. Per-doc top-k runs as
    // GroupedTopK partial+final — no global sort of the scored frame.
    "ta_tfidf_topk" -> QueryDef(
      (s, d) => {
        // tf feeds both the scored join and the df derivation:
        // localCheckpoint tokenizes the corpus ONCE instead of once
        // per consumer (the dd_degree_cap precedent)
        val tf = T.documents(s, d)
          .select(col("doc_id"),
            explode(TextAnalysis.tokens(col("text"))).as("token"))
          .filter(col("token") =!= "")
          .groupBy(col("doc_id"), col("token"))
          .agg(count(lit(1)).as("tf"))
          .localCheckpoint()
        val dfreq = tf.groupBy(col("token")).agg(count(lit(1)).as("df"))
        val n = T.documents(s, d).agg(count(lit(1)).as("n_docs"))
        val scored = tf.join(dfreq, "token")
          .crossJoin(broadcast(n))
          .withColumn("score",
            col("tf") * (length(bin(expr("n_docs div df"))) - 1))
          .select(col("doc_id"), col("token"), col("tf"), col("df"),
            col("score"))
        graft.plans.GroupedTopK.of(scored,
            keyCols = Seq("doc_id"), orderCols = Seq("score", "token"),
            descending = true, k = 5)
          .orderBy(col("doc_id"), col("score").desc, col("token").desc)
      },
      """WITH tok AS (
        |  SELECT doc_id, unnest(string_split_regex(
        |    trim(lower(text)), '\s+')) AS token
        |  FROM documents),
        |tf AS (
        |  SELECT doc_id, token, COUNT(*) AS tf FROM tok
        |  WHERE token <> '' GROUP BY 1, 2),
        |dfreq AS (SELECT token, COUNT(*) AS df FROM tf GROUP BY 1),
        |n AS (SELECT COUNT(*) AS n_docs FROM documents),
        |scored AS (
        |  SELECT t.doc_id, t.token, t.tf, d.df,
        |    t.tf * (length(bin(n.n_docs // d.df)) - 1) AS score
        |  FROM tf t JOIN dfreq d USING (token) CROSS JOIN n)
        |SELECT doc_id, token, tf, df, score FROM (
        |  SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id
        |    ORDER BY score DESC, token DESC) AS rn
        |  FROM scored)
        |WHERE rn <= 5
        |ORDER BY doc_id, score DESC, token DESC""".stripMargin),

    // Corpus length distribution: EXACT per-language quantiles (the
    // "what does this corpus look like" profiling step before choosing
    // filter thresholds). Spark's percentile() and DuckDB's
    // quantile_cont() both linearly interpolate over the sorted values
    // — same arithmetic, bit-identical doubles. At 100 TB swap in
    // approx_percentile and accept the sketch error; the exact form is
    // the oracle-able ground truth.
    "ta_length_quantiles" -> QueryDef(
      (s, d) => T.documents(s, d)
        .groupBy(col("lang"))
        .agg(expr("percentile(n_chars, 0.25)").as("q25"),
          expr("percentile(n_chars, 0.5)").as("q50"),
          expr("percentile(n_chars, 0.75)").as("q75"),
          expr("percentile(n_chars, 0.95)").as("q95"),
          count(lit(1)).as("n"))
        .orderBy(col("lang")),
      """SELECT lang,
        |  quantile_cont(n_chars, 0.25) AS q25,
        |  quantile_cont(n_chars, 0.5) AS q50,
        |  quantile_cont(n_chars, 0.75) AS q75,
        |  quantile_cont(n_chars, 0.95) AS q95,
        |  COUNT(*) AS n
        |FROM documents GROUP BY lang ORDER BY lang""".stripMargin),

    // Line-repetition profile over a derived multi-line doc (first
    // 30-char slice repeated → known duplication) — the boilerplate
    // filter signal, replayed line-for-line in DuckDB list algebra.
    "ta_repetition" -> QueryDef(
      (s, d) => {
        val l1 = substring(col("text"), 1, 30)
        val l2 = substring(col("text"), 31, 30)
        // concat, not concat_ws: null text must propagate (null || x is
        // null in the DuckDB mirror; concat_ws would skip nulls and
        // break parity)
        val raw = concat(l1, lit("\n"), l2, lit("\n"), l1)
        val prof = TextAnalysis.repetitionProfile(raw)
        T.documents(s, d).select(col("doc_id"),
          prof.getField("n_lines").as("n_lines"),
          prof.getField("n_distinct_lines").as("n_distinct"),
          prof.getField("distinct_ratio").as("distinct_ratio"),
          prof.getField("dup_char_ratio").as("dup_char_ratio"))
          .orderBy(col("doc_id")).limit(300)
      },
      """WITH r AS (
        |  SELECT doc_id,
        |    list_filter(list_transform(
        |      string_split(substr(text, 1, 30) || chr(10) ||
        |        substr(text, 31, 30) || chr(10) || substr(text, 1, 30),
        |        chr(10)), l -> trim(l)), l -> l <> '') AS lines
        |  FROM documents)
        |SELECT doc_id,
        |  CAST(len(lines) AS BIGINT) AS n_lines,
        |  CAST(len(list_distinct(lines)) AS BIGINT) AS n_distinct,
        |  CASE WHEN len(lines) > 0 THEN
        |    CAST(len(list_distinct(lines)) AS DOUBLE) / CAST(len(lines) AS DOUBLE)
        |  END AS distinct_ratio,
        |  CASE WHEN list_sum(list_transform(lines, l -> length(l))) > 0 THEN
        |    CAST(list_sum(list_transform(lines,
        |      l -> CASE WHEN len(list_filter(lines, x -> x = l)) > 1
        |           THEN length(l) ELSE 0 END)) AS DOUBLE)
        |    / CAST(list_sum(list_transform(lines, l -> length(l))) AS DOUBLE)
        |  END AS dup_char_ratio
        |FROM r ORDER BY doc_id LIMIT 300""".stripMargin),

    // PII scrub over derived text with injected contacts: emails/IPv4s
    // → typed placeholders + redaction count. Patterns are RE2-safe on
    // purpose (TextAnalysis.emailPattern/ipv4Pattern), so DuckDB
    // replays the identical scrub.
    "ta_pii_scrub" -> QueryDef(
      (s, d) => {
        val id = col("doc_id")
        val raw = concat(substring(col("text"), 1, 40),
          lit(" contact user"), id.cast("string"), lit("@example.com or 10.0."),
          (id % 256).cast("string"), lit(".7 end"))
        val scrub = TextAnalysis.piiScrub(raw)
        T.documents(s, d).select(id.as("doc_id"),
          scrub.getField("n_redacted").as("n_redacted"),
          scrub.getField("text").as("cleaned"))
          .orderBy(col("doc_id")).limit(300)
      },
      s"""WITH r AS (
         |  SELECT doc_id,
         |    substr(text, 1, 40) || ' contact user' || CAST(doc_id AS VARCHAR)
         |      || '@example.com or 10.0.' || CAST(doc_id % 256 AS VARCHAR)
         |      || '.7 end' AS raw
         |  FROM documents)
         |SELECT doc_id,
         |  CAST(len(regexp_extract_all(raw, '${TextAnalysis.emailPattern}'))
         |    + len(regexp_extract_all(raw, '${TextAnalysis.ipv4Pattern}'))
         |    AS BIGINT) AS n_redacted,
         |  regexp_replace(regexp_replace(raw,
         |    '${TextAnalysis.emailPattern}', '<EMAIL>', 'g'),
         |    '${TextAnalysis.ipv4Pattern}', '<IP>', 'g') AS cleaned
         |FROM r ORDER BY doc_id LIMIT 300""".stripMargin),

    // Sequence packing: contiguous fill of ≤ 1024-token bins in doc_id
    // order — the "fill the context window" step; the bin id is a pure
    // window running sum, exact integers in both engines. SHARDED by
    // language (the scale path: each shard's window is local to its
    // partition, so no task ever sees the whole corpus — a global
    // running sum would). Counts REAL BPE tokens by default (what the
    // trainer consumes — TextAnalysis.subwordCountBpe); etl_pack_bpe
    // exercises the same window at the 512 budget, ta_token_count /
    // ta_subword_count keep the whitespace and heuristic counts as
    // their own oracle rows.
    "etl_pack_sequences" -> QueryDef(
      (s, d) => {
        val withTokens = T.documents(s, d).select(col("doc_id"), col("lang"),
          TextAnalysis.subwordCountBpe(col("text")).as("n_tokens"))
        TextAnalysis.packSequences(withTokens, "doc_id", "n_tokens",
            maxTokens = 1024L, shardCol = "lang")
          .groupBy(col("lang"), col("bin"))
          .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("n_tokens"))
          .orderBy(col("lang"), col("bin"))
      },
      s"""$bpeCountCte,
        |t AS (
        |  SELECT d.doc_id, d.lang, b.n_bpe AS n_tokens
        |  FROM documents d JOIN bpecnt b ON b.doc_id = d.doc_id),
        |b AS (
        |  SELECT doc_id, lang, n_tokens,
        |    -- integer division (//): CAST(double AS BIGINT) ROUNDS in
        |    -- DuckDB while Spark's cast truncates
        |    CAST((SUM(n_tokens) OVER (PARTITION BY lang ORDER BY doc_id
        |      ROWS UNBOUNDED PRECEDING) - n_tokens) // 1024 AS BIGINT) AS bin
        |  FROM t)
        |SELECT lang, bin, COUNT(*) AS n_docs,
        |  CAST(SUM(n_tokens) AS BIGINT) AS n_tokens
        |FROM b GROUP BY lang, bin ORDER BY lang, bin""".stripMargin),

    // Weighted mixture quotas: per-language caps from a weights map
    // (langs outside the recipe drop out) in reproducible hash order.
    // Deterministic train/val/test split: assignment is a pure function
    // of (seed, id) — stable across runs/engines/cluster sizes — and
    // the oracle re-derives it from the same md5 arithmetic. Sum of ids
    // per split pins WHICH docs landed where, not just the sizes.
    "etl_split" -> QueryDef(
      (s, d) => TextAnalysis.hashSplit(T.documents(s, d), "doc_id",
          seed = "s42", trainPct = 80, valPct = 10)
        .groupBy(col("split"))
        .agg(count(lit(1)).as("n"), sum(col("doc_id")).as("sum_ids"))
        .orderBy(col("split")),
      """WITH b AS (
        |  SELECT doc_id,
        |    CAST(('0x' || substr(md5('s42' || CAST(doc_id AS VARCHAR)), 1, 8))
        |      AS BIGINT) % 100 AS bk
        |  FROM documents)
        |SELECT CASE WHEN bk < 80 THEN 'train'
        |            WHEN bk < 90 THEN 'val'
        |            ELSE 'test' END AS split,
        |  COUNT(*) AS n, CAST(SUM(doc_id) AS BIGINT) AS sum_ids
        |FROM b GROUP BY 1 ORDER BY split""".stripMargin),

    "etl_weighted_mix" -> QueryDef(
      (s, d) => TextAnalysis.weightedMix(T.documents(s, d), "lang",
          "doc_id", Map("en" -> 40, "es" -> 25, "fr" -> 10))
        .groupBy(col("lang")).agg(count(lit(1)).as("n"))
        .orderBy(col("lang")),
      """SELECT lang, COUNT(*) AS n FROM (
        |  SELECT lang, row_number() OVER (
        |    PARTITION BY lang
        |    ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn
        |  FROM documents WHERE lang IN ('en', 'es', 'fr'))
        |WHERE rn <= CASE lang WHEN 'en' THEN 40 WHEN 'es' THEN 25
        |            ELSE 10 END
        |GROUP BY lang ORDER BY lang""".stripMargin),

    // Temperature-scaled multilingual sampling weights (the
    // multilingual-pretraining mixture rule: p_i ∝ n_i^α with α = 1/2,
    // which upsamples low-resource languages relative to their raw
    // share). Exactness discipline: sqrt is IEEE correctly-rounded in
    // both engines and the input is an exact integer count, so
    // floor(sqrt(n)·1e3) is engine-identical; the normalization and
    // token allocation then run entirely in BIGINT division. One tiny
    // aggregation (langs-bounded) + a 1-row broadcast — the weights
    // table is driver-cheap at any corpus size because it derives
    // from per-group counts, not rows.
    "etl_temperature_mix" -> QueryDef(
      (s, d) => {
        val perLang = T.documents(s, d)
          .groupBy(col("lang"))
          .agg(count(lit(1)).as("n_docs"),
            sum(col("n_chars")).as("n_chars"))
          .withColumn("w",
            floor(sqrt(col("n_docs").cast("double")) * 1e3).cast("long"))
        val tot = perLang.agg(sum(col("w")).as("w_total"))
        perLang.crossJoin(broadcast(tot))
          .select(col("lang"), col("n_docs"), col("n_chars"), col("w"),
            expr("w * 1000000 div w_total").as("p_x1e6"),
            expr("w * 10000000 div w_total").as("alloc_of_10m_budget"))
          .orderBy(col("lang"))
      },
      """WITH g AS (
        |  SELECT lang, COUNT(*) AS n_docs,
        |    CAST(SUM(n_chars) AS BIGINT) AS n_chars,
        |    CAST(floor(sqrt(CAST(COUNT(*) AS DOUBLE)) * 1e3) AS BIGINT) AS w
        |  FROM documents GROUP BY lang),
        |t AS (SELECT CAST(SUM(w) AS BIGINT) AS w_total FROM g)
        |SELECT lang, n_docs, n_chars, w,
        |  CAST(w * 1000000 // w_total AS BIGINT) AS p_x1e6,
        |  CAST(w * 10000000 // w_total AS BIGINT) AS alloc_of_10m_budget
        |FROM g CROSS JOIN t ORDER BY lang""".stripMargin),

    // Stratified quota sample: deterministic hash-ordered top-`quota`
    // per language — the curation cap for a training-data mix.
    "ta_stratified_sample" -> QueryDef(
      (s, d) => TextAnalysis.stratifiedSample(
          T.documents(s, d), "lang", "doc_id", quota = 20)
        .select(col("lang"), col("doc_id"))
        .orderBy(col("lang"), col("doc_id")),
      """SELECT lang, doc_id FROM (
        |  SELECT lang, doc_id, row_number() OVER (
        |    PARTITION BY lang
        |    ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn
        |  FROM documents)
        |WHERE rn <= 20 ORDER BY lang, doc_id""".stripMargin),

    // Multimodal metadata path, oracle-checked: synthetic media blobs
    // (ASCII container magic + utf-8 payload, so DuckDB's VARCHAR md5
    // hashes the identical bytes) → magic-byte mime sniff + byte sizes
    // + content-digest dedup, grouped per container format. The blob
    // column is opaque binary to the engine — this is the
    // metadata-only projection pattern (never drag payloads through
    // an aggregate).
    "mm_media_stats" -> QueryDef(
      (s, d) => {
        val magic = element_at(typedLit(Seq(
          "GIF89a", "RIFF0000WAVE", "ID3", "0000ftypisom", "")),
          (col("doc_id") % 5 + 1).cast("int"))
        val blobs = T.documents(s, d).select(col("doc_id"),
          concat(encode(magic, "UTF-8"), encode(col("text"), "UTF-8"))
            .as("media"))
        Multimodal.mediaStats(Multimodal.withMediaMeta(blobs, "media"))
      },
      """WITH mm AS (
        |  SELECT
        |    CASE doc_id % 5 WHEN 0 THEN 'image/gif' WHEN 1 THEN 'audio/wav'
        |      WHEN 2 THEN 'audio/mpeg' WHEN 3 THEN 'video/mp4'
        |      ELSE 'application/octet-stream' END AS mime,
        |    octet_length(encode(
        |      (CASE doc_id % 5 WHEN 0 THEN 'GIF89a' WHEN 1 THEN 'RIFF0000WAVE'
        |        WHEN 2 THEN 'ID3' WHEN 3 THEN '0000ftypisom' ELSE '' END)
        |      || text)) AS nb,
        |    md5((CASE doc_id % 5 WHEN 0 THEN 'GIF89a' WHEN 1 THEN 'RIFF0000WAVE'
        |        WHEN 2 THEN 'ID3' WHEN 3 THEN '0000ftypisom' ELSE '' END)
        |      || text) AS digest
        |  FROM documents)
        |SELECT mime, COUNT(*) AS n, CAST(SUM(nb) AS BIGINT) AS total_bytes,
        |  COUNT(DISTINCT digest) AS distinct_content
        |FROM mm GROUP BY mime ORDER BY mime""".stripMargin),

    // Frame-sampling PLUMBING oracle: the evenly-spaced byte-window
    // arithmetic of sampleFramesStub (offsets, stride, tail clamp) is
    // checked per frame against DuckDB slicing the same synthetic
    // blobs at byte granularity — the decode inside each window stays
    // a stub (no codecs in this environment), but where the windows
    // land is exactly what a real extractor would receive.
    "mm_frame_sample" -> QueryDef(
      (s, d) => {
        val blobs = T.documents(s, d).filter(col("doc_id") < 300)
          .select(col("doc_id"), encode(col("text"), "UTF-8").as("media"))
        blobs.select(col("doc_id"),
            posexplode(Multimodal.sampleFramesStub(col("media"), n = 4))
              .as(Seq("frame_id", "frame")))
          // compared in HEX space: this DuckDB build cannot slice BLOBs,
          // but hex(blob) is sliceable at exactly 2x the byte offsets
          .select(col("doc_id"), col("frame_id"),
            md5(hex(col("frame"))).as("fp"),
            length(col("frame")).cast("long").as("n_bytes"))
          .orderBy(col("doc_id"), col("frame_id"))
      },
      """WITH b AS (
        |  SELECT doc_id, hex(encode(text)) AS h,
        |    octet_length(encode(text)) AS L
        |  FROM documents WHERE doc_id < 300),
        |f AS (
        |  SELECT doc_id, CAST(i AS INT) AS frame_id,
        |    substring(h,
        |      CAST(1 + 2 * i * greatest(1, (L - 64) // 3) AS INT), 128) AS fh
        |  FROM b, unnest(range(0, 4)) AS u(i))
        |SELECT doc_id, frame_id, md5(fh) AS fp,
        |  CAST(length(fh) // 2 AS BIGINT) AS n_bytes
        |FROM f ORDER BY doc_id, frame_id""".stripMargin),

    // Bottom-k shingle fingerprints (containment sketch), portable
    // md5-hex variant so DuckDB can recompute the identical sketch:
    // word 5-gram shingles → distinct md5 → lexicographic bottom-8,
    // comma-joined (array cells are unsortable in the driver compare;
    // the string form carries identical information).
    "ta_fingerprint" -> QueryDef(
      (s, d) => T.documents(s, d)
        .select(col("doc_id"),
          concat_ws(",",
            TextAnalysis.bottomKFingerprintHex(col("text"))).as("fp"))
        .orderBy(col("doc_id")).limit(200),
      """WITH sh AS (
        |  SELECT doc_id,
        |    CASE WHEN len(w) < 5 THEN [array_to_string(w, ' ')]
        |         ELSE list_distinct(list_transform(range(1, len(w) - 3),
        |           i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2] || ' ' ||
        |                w[i+3] || ' ' || w[i+4])) END AS shingles
        |  FROM (SELECT doc_id, string_split_regex(trim(text), '\s+') AS w
        |        FROM documents))
        |SELECT doc_id,
        |  array_to_string(list_sort(list_distinct(
        |    list_transform(shingles, s -> md5(s))))[1:8], ',') AS fp
        |FROM sh ORDER BY doc_id LIMIT 200""".stripMargin),

    // Winnowing (MOSS) fingerprints over a Rabin-Karp ROLLING hash —
    // the position-robust complement to ta_fingerprint's bottom-k:
    // any shared run of ≥ w+k−1 chars yields a shared fingerprint.
    // The engine rolls the polynomial hash in O(n) and windows with a
    // monotonic deque (functions.WinnowHashes codegen); the oracle
    // recomputes every gram hash DIRECTLY (list_reduce fold per slice
    // — equal values by modular arithmetic, an independent
    // formulation, not a replay of the rolling update) and takes
    // list_min per window. Census pins gram count, fingerprint count,
    // and the exact selected-value sum per doc.
    "ta_winnow_fingerprint" -> QueryDef(
      (s, d) => {
        val fps = graft.functions.WinnowHashes
          .winnow_hashes(col("text"), 4, 16)
        val n = length(col("text")).cast("long")
        T.documents(s, d).filter(col("doc_id") < 200)
          .select(col("doc_id"),
            when(n === 0L, 0L).when(n < 4L, 1L).otherwise(n - 3L)
              .as("n_grams"),
            size(fps).cast("long").as("n_fps"),
            aggregate(fps, lit(0L), (a, x) => a + x).as("fp_sum"))
          .orderBy(col("doc_id"))
      },
      """WITH d AS (
        |  SELECT doc_id, text, length(text) AS n FROM documents
        |  WHERE doc_id < 200),
        |cp AS (
        |  SELECT doc_id, n,
        |    list_transform(range(1, n + 1),
        |      i -> CAST(unicode(text[i]) AS BIGINT)) AS cps
        |  FROM d),
        |h AS (
        |  SELECT doc_id, n,
        |    CASE WHEN n = 0 THEN CAST([] AS BIGINT[])
        |         WHEN n < 4 THEN [list_reduce(cps,
        |           (a, c) -> (a * 257 + c) % 1000000007)]
        |         ELSE list_transform(range(1, n - 2),
        |           i -> list_reduce(cps[i:i+3],
        |             (a, c) -> (a * 257 + c) % 1000000007))
        |    END AS hs
        |  FROM cp),
        |m AS (
        |  SELECT doc_id, len(hs) AS nh,
        |    CASE WHEN len(hs) = 0 THEN CAST([] AS BIGINT[])
        |         WHEN len(hs) <= 16 THEN [list_min(hs)]
        |         ELSE list_sort(list_distinct(
        |           list_transform(range(1, len(hs) - 14),
        |             i -> list_min(hs[i:i+15]))))
        |    END AS fps
        |  FROM h)
        |SELECT doc_id, CAST(nh AS BIGINT) AS n_grams,
        |  CAST(len(fps) AS BIGINT) AS n_fps,
        |  CAST(COALESCE(list_sum(fps), 0) AS BIGINT) AS fp_sum
        |FROM m ORDER BY doc_id""".stripMargin),

    // EXACT 13-gram decontamination — the canonical verbatim-overlap
    // test (any shared 13-token window disqualifies), complementing the
    // sketch-based approximate pass below. Same train/eval split, so
    // the two reports are directly comparable; DuckDB rebuilds the
    // same md5'd gram inverted index.
    "etl_decontaminate_exact" -> QueryDef(
      (s, d) => {
        val docs = T.documents(s, d)
        Dedup.exactNgramContamination(
          docs.filter(col("doc_id") < 400),
          docs.filter(col("doc_id") >= 400 && col("doc_id") < 500),
          "doc_id", "text", n = 13)
          .orderBy(col("train_id"), col("eval_id"))
      },
      """WITH tk AS (
        |  SELECT doc_id, string_split_regex(trim(text), '\s+') AS w
        |  FROM documents WHERE doc_id < 500),
        |g AS (
        |  SELECT doc_id, unnest(list_distinct(
        |    list_transform(range(1, len(w) - 11),
        |      i -> md5(array_to_string(w[i:i+12], ' '))))) AS g
        |  FROM tk)
        |SELECT t.doc_id AS train_id, e.doc_id AS eval_id,
        |  COUNT(*) AS n_shared
        |FROM g t JOIN g e ON t.g = e.g
        |WHERE t.doc_id < 400 AND e.doc_id >= 400
        |GROUP BY 1, 2 ORDER BY train_id, eval_id""".stripMargin),

    // Token-window chunking: overlapping context windows per document
    // (chunk 128 / overlap 16), the pre-embedding step; md5 of each
    // chunk pins the exact token content cross-engine.
    "etl_chunk_documents" -> QueryDef(
      (s, d) => {
        TextAnalysis.chunkDocuments(
          T.documents(s, d).filter(col("doc_id") < 300),
          "doc_id", "text", chunkSize = 128, overlap = 16)
          .select(col("doc_id"), col("chunk_id"),
            md5(col("chunk_text")).as("fp"),
            length(col("chunk_text")).cast("long").as("n_chars"))
          .orderBy(col("doc_id"), col("chunk_id"))
      },
      """WITH tk AS (
        |  SELECT doc_id, string_split_regex(trim(text), '\s+') AS toks
        |  FROM documents WHERE doc_id < 300),
        |ch AS (
        |  SELECT doc_id, CAST(i AS INT) AS chunk_id,
        |    array_to_string(toks[CAST(i*112+1 AS INT):CAST(i*112+128 AS INT)],
        |      ' ') AS chunk_text
        |  FROM tk, unnest(range(0, greatest(1,
        |    CAST(ceil((len(toks) - 16) / CAST(112 AS DOUBLE)) AS BIGINT))))
        |    AS u(i))
        |SELECT doc_id, chunk_id, md5(chunk_text) AS fp,
        |  length(chunk_text) AS n_chars
        |FROM ch ORDER BY doc_id, chunk_id""".stripMargin),

    // Span-REMOVAL dedup (Lee et al. 2022): the transform the span
    // census (dd_dup_span_fraction) exists to feed — every word
    // covered by a word-8-gram occurring in >= 2 distinct documents is
    // cut. Oracle compares the full cleaned-corpus census per doc
    // (word counts before/after + md5 of the surviving text), so the
    // cut itself — not just its mass — is pinned cross-engine.
    "etl_span_dedup" -> QueryDef(
      (s, d) => Dedup.removeDupSpans(
          T.documents(s, d), "doc_id", "text", n = 8, minDocFreq = 2)
        .select(col("id").as("doc_id"), col("n_words"), col("n_kept"),
          md5(col("cleaned")).as("fp"))
        .orderBy(col("doc_id")),
      """WITH d0 AS (
        |  SELECT doc_id, string_split_regex(trim(text), '\s+') AS t
        |  FROM documents),
        |inst AS (
        |  SELECT doc_id, CAST(i AS INT) AS i,
        |    array_to_string(t[CAST(i+1 AS INT):CAST(i+8 AS INT)], ' ') AS s
        |  FROM d0, unnest(range(0, len(t)-7)) AS u(i)
        |  WHERE len(t) >= 8),
        |dup AS (
        |  SELECT s FROM (SELECT DISTINCT doc_id, s FROM inst)
        |  GROUP BY s HAVING COUNT(*) >= 2),
        |covered AS (
        |  SELECT DISTINCT inst.doc_id, inst.i + CAST(off AS INT) AS j
        |  FROM inst JOIN dup USING (s), range(0, 8) r2(off)),
        |pos AS (
        |  SELECT doc_id, CAST(i AS INT) AS i, t[CAST(i+1 AS INT)] AS w
        |  FROM d0, unnest(range(0, len(t))) AS u(i)),
        |kept AS (
        |  SELECT p.doc_id, p.i, p.w
        |  FROM pos p LEFT JOIN covered c
        |    ON c.doc_id = p.doc_id AND c.j = p.i
        |  WHERE c.j IS NULL),
        |agg AS (
        |  SELECT doc_id, COUNT(*) AS n_kept,
        |    string_agg(w, ' ' ORDER BY i) AS cleaned
        |  FROM kept GROUP BY doc_id)
        |SELECT d0.doc_id, CAST(len(t) AS BIGINT) AS n_words,
        |  CAST(COALESCE(a.n_kept, 0) AS BIGINT) AS n_kept,
        |  md5(COALESCE(a.cleaned, '')) AS fp
        |FROM d0 LEFT JOIN agg a ON a.doc_id = d0.doc_id
        |ORDER BY d0.doc_id""".stripMargin),

    // Decontamination: training docs sharing >= 2 bottom-k sketch
    // hashes with the held-out slice — the benchmark-overlap pass a
    // training-data pipeline runs before every mix. Portable md5
    // sketches, so DuckDB replays the inverted-index overlap exactly.
    "etl_decontaminate" -> QueryDef(
      (s, d) => {
        val docs = T.documents(s, d)
        Dedup.contaminationReport(
          docs.filter(col("doc_id") < 400),
          docs.filter(col("doc_id") >= 400 && col("doc_id") < 500),
          "doc_id", "text")
          .orderBy(col("train_id"))
      },
      """WITH sh AS (
        |  SELECT doc_id,
        |    CASE WHEN len(w) < 5 THEN [array_to_string(w, ' ')]
        |         ELSE list_distinct(list_transform(range(1, len(w) - 3),
        |           i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2] || ' ' ||
        |                w[i+3] || ' ' || w[i+4])) END AS shingles
        |  FROM (SELECT doc_id, string_split_regex(trim(text), '\s+') AS w
        |        FROM documents WHERE doc_id < 500)),
        |fp AS (
        |  SELECT doc_id, unnest(list_sort(list_distinct(
        |    list_transform(shingles, s -> md5(s))))[1:8]) AS h
        |  FROM sh),
        |ov AS (
        |  SELECT t.doc_id AS train_id, e.doc_id AS eval_id,
        |    COUNT(*) AS n_shared
        |  FROM fp t JOIN fp e ON t.h = e.h
        |  WHERE t.doc_id < 400 AND e.doc_id >= 400
        |  GROUP BY 1, 2 HAVING COUNT(*) >= 2),
        |best AS (
        |  SELECT train_id, eval_id, n_shared, row_number() OVER (
        |    PARTITION BY train_id ORDER BY n_shared DESC, eval_id) AS rk
        |  FROM ov)
        |SELECT train_id, eval_id, n_shared FROM best
        |WHERE rk = 1 ORDER BY train_id""".stripMargin),

    // BPE-ish subword count estimate — the documented no-merges-table
    // FALLBACK (TextAnalysis.subwordCountEstimate scaladoc): segment-run
    // matching + long-word extras, replayed by DuckDB with the same
    // RE2-compatible pattern (integer arithmetic throughout —
    // order-independent). Budget-bearing queries (etl_pack_sequences,
    // etl_pack_bpe) count real BPE tokens instead.
    "ta_subword_count" -> QueryDef(
      (s, d) => T.documents(s, d)
        .select(col("doc_id"),
          TextAnalysis.subwordCountEstimate(col("text")).as("subwords"))
        .orderBy(col("doc_id")).limit(200),
      """SELECT doc_id,
        |  CAST(CAST(len(regexp_extract_all(text, '[\p{L}\p{N}]+|[^\p{L}\p{N}\s]+'))
        |    AS BIGINT)
        |  + list_sum(list_transform(string_split_regex(trim(text), '\s+'),
        |      w -> greatest(0, length(w) // 8))) AS BIGINT) AS subwords
        |FROM documents ORDER BY doc_id LIMIT 200""".stripMargin),

    // Deterministic training shuffle (TextAnalysis.shuffleShards):
    // every doc gets a (shard, pos) coordinate as a pure function of
    // (seed, doc_id) — the reproducible epoch permutation a data
    // loader consumes, vs orderBy(rand())'s run-dependent order. The
    // oracle re-derives shard AND the exact within-shard permutation
    // from the same md5 arithmetic; sum(doc_id·pos) pins the full
    // ordering per shard, not just membership.
    "etl_shuffle_shards" -> QueryDef(
      (s, d) => TextAnalysis.shuffleShards(
          T.documents(s, d).select(col("doc_id")), "doc_id",
          seed = "epoch1", numShards = 8)
        .groupBy(col("shard"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("doc_id")).as("sum_ids"),
          sum(col("doc_id") * col("pos")).as("perm_checksum"))
        .orderBy(col("shard")),
      """WITH k AS (
        |  SELECT doc_id,
        |    CAST(('0x' || substr(md5('epoch1|' || CAST(doc_id AS VARCHAR)),
        |      1, 15)) AS BIGINT) AS sk
        |  FROM documents),
        |p AS (
        |  SELECT doc_id, CAST(sk % 8 AS INT) AS shard,
        |    row_number() OVER (PARTITION BY sk % 8 ORDER BY sk, doc_id)
        |      AS pos
        |  FROM k)
        |SELECT shard, COUNT(*) AS n_docs,
        |  CAST(SUM(doc_id) AS BIGINT) AS sum_ids,
        |  CAST(SUM(doc_id * pos) AS BIGINT) AS perm_checksum
        |FROM p GROUP BY shard ORDER BY shard""".stripMargin),

    // Deterministic weighted priority sample: top-k documents by
    // priority = h div weight over a portable 60-bit hash — higher
    // weight ⇒ stochastically smaller priority ⇒ higher inclusion
    // odds, reproducible across runs/engines/cluster sizes (no rand()
    // seed state), and the ENTIRE selection replays in the oracle.
    // This is the weight-MONOTONE deterministic variant, not exact
    // Efraimidis–Spirakis (whose u^(1/w) keys need libm pow/ln — the
    // cross-engine trap the integral pipeline exists to avoid);
    // inclusion odds scale ∝ weight only to first order, which is
    // what corpus curation needs from "prefer longer/higher-quality
    // docs". Scale shape: per-row arithmetic + TakeOrdered (partial
    // top-k per partition, k-row final) — never a global sort; the
    // WeightedSampleSpec pins the bias direction (sample mean weight
    // above corpus mean).
    "etl_weighted_sample" -> QueryDef(
      (s, d) => T.documents(s, d)
        .select(col("doc_id"),
          greatest(col("n_chars"), lit(1L)).as("weight"),
          Dedup.portableHash(
            concat(lit("wsample1|"), col("doc_id").cast("string")), 15)
            .as("h"))
        .selectExpr("doc_id", "weight", "h div weight AS priority")
        .orderBy(col("priority"), col("doc_id"))
        .limit(100),
      """WITH t AS (
        |  SELECT doc_id, GREATEST(n_chars, 1) AS weight,
        |    CAST(('0x' || substr(md5('wsample1|' || CAST(doc_id AS VARCHAR)),
        |      1, 15)) AS BIGINT) AS h
        |  FROM documents)
        |SELECT doc_id, weight, h // weight AS priority
        |FROM t ORDER BY priority, doc_id LIMIT 100""".stripMargin),

    // Dense contiguous row ids without the global sort
    // (TextAnalysis.stableRowIds): the classic scale trap is
    // row_number() OVER (ORDER BY key) funneling 100 TB through ONE
    // sort partition. Here the key space range-buckets monotonically
    // (doc_id div 4096), bucket counts roll into prefix offsets over
    // the bucket-sized count frame, and buckets number their rows in
    // parallel. The census pins the FULL assignment, not just the
    // range: sum(row_id · doc_id) differs if any single id lands on
    // the wrong row; n_distinct == n_rows == max−min+1 pins density
    // and contiguity. Oracle computes ids with the very operator the
    // engine refuses to run (fine over sf0.01's 60k rows).
    "etl_stable_row_ids" -> QueryDef(
      (s, d) => TextAnalysis.stableRowIds(
          T.documents(s, d).select(col("doc_id")), "doc_id",
          bucketWidth = 4096L)
        .agg(count(lit(1)).as("n_rows"),
          min(col("row_id")).as("min_rid"),
          max(col("row_id")).as("max_rid"),
          sum(col("row_id")).as("sum_rid"),
          sum(col("row_id") * col("doc_id")).as("key_checksum"),
          countDistinct(col("row_id")).as("n_distinct")),
      """WITH ids AS (
        |  SELECT doc_id,
        |    row_number() OVER (ORDER BY doc_id) - 1 AS rid
        |  FROM documents)
        |SELECT COUNT(*) AS n_rows,
        |  CAST(MIN(rid) AS BIGINT) AS min_rid,
        |  CAST(MAX(rid) AS BIGINT) AS max_rid,
        |  CAST(SUM(rid) AS BIGINT) AS sum_rid,
        |  CAST(SUM(rid * doc_id) AS BIGINT) AS key_checksum,
        |  CAST(COUNT(DISTINCT rid) AS BIGINT) AS n_distinct
        |FROM ids""".stripMargin),

    // BPE merge-table TRAINING in-engine (TextAnalysis.trainBpeMerges)
    // — the learning side of the tokenizer loop: one corpus scan into
    // a (distinct word, count) vocab frame, then 8 vocab-sized
    // iterations each merging the most frequent adjacent pair
    // ((count DESC, lhs, rhs) tie-break — deterministic) and
    // collecting exactly ONE argmax row. The oracle re-learns the
    // table from scratch in DuckDB (unrolled chained-recursive CTEs)
    // and must produce the IDENTICAL 8 rules in the identical order.
    "ta_bpe_train" -> QueryDef(
      (s, d) => {
        import s.implicits._
        val merges = TextAnalysis.trainBpeMerges(
          T.documents(s, d), "text", numMerges = 8)
        merges.zipWithIndex
          .map { case ((a, b), i) => (i + 1, a, b) }
          .toDF("rank", "lhs", "rhs")
          .orderBy(col("rank"))
      },
      bpeTrainOracleSql(8)),

    // REAL merges-table BPE token count (graft.functions.BpeCount).
    // The oracle replays the exact algorithm in DuckDB: each doc is
    // encoded as |-delimited code-point symbols (spaces stay as
    // never-merged word-boundary symbols), then a recursive CTE
    // applies each rank's '|a|b|'→'|ab|' replace to fixpoint before
    // advancing — the same rank-order-fixpoint semantics the engine
    // implements, with the VALUES list GENERATED from the same Scala
    // merges table so the two can never drift. Token count = symbols
    // minus space symbols.
    "ta_subword_bpe" -> QueryDef(
      (s, d) => T.documents(s, d)
        .select(col("doc_id"),
          TextAnalysis.subwordCountBpe(col("text")).as("n_bpe"))
        .orderBy(col("doc_id")),
      s"""$bpeCountCte
         |SELECT doc_id, n_bpe FROM bpecnt ORDER BY doc_id""".stripMargin),

    // Token-rarity profile — the OOV/noise curation signal (ccnet-
    // style rarity filtering without the log-perplexity float-parity
    // trap): per doc, token count, count of tokens whose CORPUS
    // frequency is under the threshold, and the frequency sum — all
    // integer cells, so the filter ratio derives exactly downstream.
    // One vocab aggregation + one token↔vocab join (vocab is tiny and
    // broadcasts; at 100 TB it is the stored frequency side table).
    "ta_rarity_profile" -> QueryDef(
      (s, d) => {
        val tok = T.documents(s, d)
          .select(col("doc_id"), explode(Dedup.tokens(col("text"))).as("t"))
        val freq = tok.groupBy(col("t")).agg(count(lit(1)).as("f"))
        tok.join(freq, "t")
          .groupBy(col("doc_id"))
          .agg(count(lit(1)).as("n_tokens"),
            sum(when(col("f") < 500, 1L).otherwise(0L)).as("n_rare"),
            sum(col("f")).as("freq_sum"))
          .orderBy(col("doc_id")).limit(300)
      },
      """WITH tok AS (
        |  SELECT doc_id, unnest(string_split_regex(trim(text), '\s+')) AS t
        |  FROM documents),
        |freq AS (SELECT t, COUNT(*) AS f FROM tok GROUP BY t)
        |SELECT doc_id, COUNT(*) AS n_tokens,
        |  CAST(SUM(CASE WHEN f < 500 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_rare,
        |  CAST(SUM(f) AS BIGINT) AS freq_sum
        |FROM tok JOIN freq USING (t)
        |GROUP BY doc_id ORDER BY doc_id LIMIT 300""".stripMargin),

    // Bottom-k corpus-overlap estimate (Broder minwise over the
    // deterministic md5 hash order): train-vs-eval shingle-space
    // Jaccard from a 256-hash sketch, with the EXACT Jaccard computed
    // alongside as the accuracy witness — the continuous contamination
    // monitor where the exact intersection needs a full join of both
    // shingle sets and the sketch needs k rows.
    "etl_overlap_sketch" -> QueryDef(
      (s, d) => {
        val docs = T.documents(s, d)
        def hs(df: DataFrame) = df.select(
          explode(Dedup.shingleHashesPortable(col("text"), 3)).as("h"))
        val train = hs(docs.filter(col("doc_id") < 400))
        val evalH = hs(docs.filter(col("doc_id") >= 400))
        val sketch = Sketches.bottomKJaccard(train, evalH, "h", k = 256)
        val exact = train.distinct().withColumn("a", lit(1L))
          .join(evalH.distinct().withColumn("b", lit(1L)), Seq("h"),
            "full_outer")
          .select(coalesce(col("a"), lit(0L)).as("a"),
            coalesce(col("b"), lit(0L)).as("b"))
          .agg(count(lit(1)).as("exact_union"),
            sum(col("a") * col("b")).as("exact_inter"))
          .withColumn("exact_jaccard_x10000",
            floor(col("exact_inter").cast("double") /
              col("exact_union").cast("double") * 10000).cast("long"))
        sketch.crossJoin(exact)
      },
      """WITH sh AS (
        |  SELECT doc_id,
        |    CASE WHEN len(w) < 3 THEN [array_to_string(w, ' ')]
        |         ELSE list_distinct(list_transform(range(1, len(w) - 1),
        |           i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) END
        |      AS shingles
        |  FROM (SELECT doc_id, string_split_regex(trim(text), '\s+') AS w
        |        FROM documents)),
        |hx AS (
        |  SELECT doc_id,
        |    unnest(list_transform(shingles,
        |      s -> CAST(('0x' || substr(md5(s), 1, 7)) AS BIGINT))) AS h
        |  FROM sh),
        |ta AS (SELECT DISTINCT h FROM hx WHERE doc_id < 400),
        |eb AS (SELECT DISTINCT h FROM hx WHERE doc_id >= 400),
        |j AS (
        |  SELECT COALESCE(ta.h, eb.h) AS h,
        |    CASE WHEN ta.h IS NULL THEN 0 ELSE 1 END AS a,
        |    CASE WHEN eb.h IS NULL THEN 0 ELSE 1 END AS b
        |  FROM ta FULL OUTER JOIN eb ON ta.h = eb.h),
        |bk AS (SELECT * FROM j ORDER BY h LIMIT 256),
        |sk AS (
        |  SELECT COUNT(*) AS k_used, CAST(SUM(a * b) AS BIGINT) AS n_in_both
        |  FROM bk),
        |ex AS (
        |  SELECT COUNT(*) AS exact_union,
        |    CAST(SUM(a * b) AS BIGINT) AS exact_inter
        |  FROM j)
        |SELECT sk.k_used, sk.n_in_both,
        |  CAST(FLOOR(CAST(sk.n_in_both AS DOUBLE) / CAST(sk.k_used AS DOUBLE)
        |    * 10000) AS BIGINT) AS est_jaccard_x10000,
        |  ex.exact_union, ex.exact_inter,
        |  CAST(FLOOR(CAST(ex.exact_inter AS DOUBLE)
        |    / CAST(ex.exact_union AS DOUBLE) * 10000) AS BIGINT)
        |    AS exact_jaccard_x10000
        |FROM sk, ex""".stripMargin),

    // Subword vocabulary profile over REAL BPE tokens: top-50 tokens
    // by corpus frequency (what the trainer's embedding table actually
    // sees, vs the word-level ta_vocab_topk). Engine: codegen'd
    // BpeTokens explode → two-phase count → TakeOrdered; oracle:
    // unnest the delimited symbols of the shared BPE CTE's final
    // state, dropping the word-boundary space symbols.
    "ta_bpe_vocab" -> QueryDef(
      (s, d) => T.documents(s, d)
        .select(explode(TextAnalysis.subwordTokensBpe(col("text")))
          .as("token"))
        .groupBy(col("token")).agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("token")).limit(50),
      s"""$bpeCountCte,
         |tok AS (
         |  SELECT unnest(string_split(s, chr(1))) AS token FROM bpefin),
         |cnt AS (
         |  SELECT token, COUNT(*) AS n FROM tok
         |  WHERE token <> '' AND token <> ' '
         |  GROUP BY token)
         |SELECT token, n FROM cnt
         |ORDER BY n DESC, token LIMIT 50""".stripMargin),

    // Sequence packing over REAL BPE token counts — the pack budget
    // measured in the tokens the trainer actually consumes, not the
    // whitespace estimate (the divergence the heuristic-count scaladoc
    // warns about, closed end-to-end). Same fill-in-order window as
    // etl_pack_sequences; the oracle chains the verified BPE CTE into
    // the verified packing arithmetic.
    "etl_pack_bpe" -> QueryDef(
      (s, d) => {
        val withTokens = T.documents(s, d).select(col("doc_id"), col("lang"),
          TextAnalysis.subwordCountBpe(col("text")).as("n_bpe"))
        TextAnalysis.packSequences(withTokens, "doc_id", "n_bpe",
            maxTokens = 512L, shardCol = "lang")
          .groupBy(col("lang"), col("bin"))
          .agg(count(lit(1)).as("n_docs"), sum(col("n_bpe")).as("n_bpe"))
          .orderBy(col("lang"), col("bin"))
      },
      s"""$bpeCountCte,
         |t AS (
         |  SELECT d.doc_id, d.lang, b.n_bpe
         |  FROM documents d JOIN bpecnt b ON b.doc_id = d.doc_id),
         |binned AS (
         |  SELECT doc_id, lang, n_bpe,
         |    CAST((SUM(n_bpe) OVER (PARTITION BY lang ORDER BY doc_id
         |      ROWS UNBOUNDED PRECEDING) - n_bpe) // 512 AS BIGINT) AS bin
         |  FROM t)
         |SELECT lang, bin, COUNT(*) AS n_docs,
         |  CAST(SUM(n_bpe) AS BIGINT) AS n_bpe
         |FROM binned GROUP BY lang, bin ORDER BY lang, bin""".stripMargin),

    // One Lloyd k-means iteration as a census
    // (Similarity.kmeansStepCensus): nearest-centroid assignment over
    // the pinned IVF centroids (the coarse quantizer's own training
    // step, run in-engine), per-(cell, dim) mean recompute, and the
    // L1 centroid shift a k-means loop watches for convergence. The
    // oracle replays the assignment argmin AND the mean/shift
    // arithmetic from the same integer cells — id_sum pins WHICH
    // vectors landed in each cell, not just how many. Scale shape:
    // per-row fold assignment (no shuffle) + one (cell, dim)
    // partial-agg shuffle with k·dim cells of state; an iteration at
    // 100 TB is one scan regardless of k.
    "sim_kmeans_step" -> QueryDef(
      (s, d) => Similarity.kmeansStepCensus(T.embeddings(s, d),
        "vec_id", "embedding", IvfCentroids.pinned),
      s"""WITH cen(i, c) AS (VALUES ${IvfCentroids.sqlValues}),
         |cn AS (
         |  SELECT i, c, list_reduce(list_transform(c, x -> x * x),
         |    (a, b) -> a + b) AS cnorm
         |  FROM cen),
         |emb AS (
         |  SELECT vec_id,
         |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
         |  FROM embeddings),
         |assign AS (
         |  SELECT vec_id, v, i AS cell FROM (
         |    SELECT e.vec_id, e.v, cn.i, row_number() OVER (
         |      PARTITION BY e.vec_id
         |      ORDER BY cn.cnorm - 2.0 * list_reduce(
         |        list_transform(range(1, ${IvfCentroids.dim + 1}),
         |          j -> e.v[j] * cn.c[j]), (a, b) -> a + b), cn.i) AS rn
         |    FROM emb e, cn)
         |  WHERE rn = 1),
         |old(i, o4) AS (VALUES ${IvfCentroids.sqlValuesX1e4}),
         |pairs AS (
         |  SELECT cell, unnest(list_zip(v,
         |    ${(1 to IvfCentroids.dim).mkString("[", ", ", "]")})) AS p
         |  FROM assign),
         |dm AS (
         |  SELECT cell, CAST(p[2] AS INT) AS dim,
         |    CAST(floor(p[1] * 10000) AS BIGINT) + 100000 AS y
         |  FROM pairs),
         |pd AS (
         |  SELECT cell, dim, COUNT(*) AS n, CAST(SUM(y) AS BIGINT) AS sy
         |  FROM dm GROUP BY 1, 2),
         |m AS (
         |  SELECT cell, dim, n, sy // n - 100000 AS mean_x1e4 FROM pd),
         |st AS (
         |  SELECT m.cell, MAX(n) AS n_members,
         |    CAST(SUM(mean_x1e4) AS BIGINT) AS sum_mean_x1e4,
         |    CAST(SUM(ABS(mean_x1e4 - list_extract(o.o4, dim))) AS BIGINT)
         |      AS l1_shift_x1e4
         |  FROM m JOIN old o ON o.i = m.cell GROUP BY 1),
         |ids AS (
         |  SELECT cell, CAST(SUM(vec_id) AS BIGINT) AS id_sum
         |  FROM assign GROUP BY 1)
         |SELECT st.cell, st.n_members, st.sum_mean_x1e4, st.l1_shift_x1e4,
         |  ids.id_sum
         |FROM st JOIN ids ON ids.cell = st.cell
         |ORDER BY st.cell""".stripMargin),

    // Johnson–Lindenstrauss random projection 64→16 dims
    // (Similarity.randomProjection) with a MEASURED distance-
    // preservation census over the consecutive-id pair sample: for
    // each pair, ratio = ‖Δproj‖² / (16·‖Δv‖²) — 1.0 in expectation —
    // floored to an integral ×1e6 cell. Both squared distances use the
    // polarization form (v·v − 2·u·v) + u·u over the SAME codegen'd
    // left-fold dot the LSH family uses, so the oracle replays every
    // double bit-for-bit: per-plane dots → ordered 16-element list →
    // identical fold. n_preserved counts pairs within [0.5×, 2×];
    // ratio_checksum pins every cell. Scan-speed, one narrow
    // pair-join shuffle — the 4×-byte-reduction stage a 100 TB
    // embedding pipeline runs before any distance-heavy operator.
    "sim_random_projection" -> QueryDef(
      (s, d) => {
        val emb = T.embeddings(s, d).select(col("vec_id"), col("embedding"))
        val prj = Similarity.randomProjection(emb, "embedding", 16, 64)
        val a = prj.filter(pmod(col("vec_id"), lit(2)) === 0)
          .select(col("vec_id").as("pid"), col("embedding").as("va"),
            col("proj").as("pa"))
        val b = prj.filter(pmod(col("vec_id"), lit(2)) === 1)
          .select((col("vec_id") - 1).as("pid"), col("embedding").as("vb"),
            col("proj").as("pb"))
        def dist2(x: String, y: String) =
          Similarity.dot(col(x), col(x)) -
            lit(2.0) * Similarity.dot(col(x), col(y)) +
            Similarity.dot(col(y), col(y))
        val ratios = a.join(b, "pid")
          .select(col("pid"), dist2("va", "vb").as("od"),
            dist2("pa", "pb").as("pd"))
          .select(col("pid"),
            when(col("od") > 0,
              floor(lit(1000000.0) * col("pd") / (lit(16.0) * col("od")))
                .cast("long"))
              .otherwise(lit(1000000L)).as("ratio"))
        ratios.agg(count(lit(1)).as("n_pairs"),
          sum(when(col("ratio").between(500000L, 2000000L), 1L)
            .otherwise(0L)).as("n_preserved"),
          sum(col("ratio")).as("ratio_checksum"),
          min(col("ratio")).as("ratio_min"),
          max(col("ratio")).as("ratio_max"))
      },
      s"""WITH hp(i, h) AS (VALUES ${Similarity.hyperplaneSqlValues(16, 64)}),
         |emb AS (
         |  SELECT vec_id,
         |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
         |  FROM embeddings),
         |pl AS (
         |  SELECT e.vec_id, hp.i,
         |    list_reduce(list_transform(range(1, 65), j -> e.v[j] * hp.h[j]),
         |      (a, b) -> a + b) AS p
         |  FROM emb e, hp),
         |pr AS (
         |  SELECT vec_id, list(p ORDER BY i) AS proj
         |  FROM pl GROUP BY vec_id),
         |pairs AS (
         |  SELECT a.vec_id AS pid,
         |    ea.v AS va, eb.v AS vb, a.proj AS pa, b.proj AS pb
         |  FROM pr a JOIN pr b ON b.vec_id = a.vec_id + 1
         |  JOIN emb ea ON ea.vec_id = a.vec_id
         |  JOIN emb eb ON eb.vec_id = b.vec_id
         |  WHERE a.vec_id % 2 = 0),
         |d AS (
         |  SELECT pid,
         |    list_reduce(list_transform(range(1, 65), j -> va[j] * va[j]),
         |      (a, b) -> a + b)
         |    - 2.0 * list_reduce(list_transform(range(1, 65),
         |        j -> va[j] * vb[j]), (a, b) -> a + b)
         |    + list_reduce(list_transform(range(1, 65), j -> vb[j] * vb[j]),
         |      (a, b) -> a + b) AS od,
         |    list_reduce(list_transform(range(1, 17), j -> pa[j] * pa[j]),
         |      (a, b) -> a + b)
         |    - 2.0 * list_reduce(list_transform(range(1, 17),
         |        j -> pa[j] * pb[j]), (a, b) -> a + b)
         |    + list_reduce(list_transform(range(1, 17), j -> pb[j] * pb[j]),
         |      (a, b) -> a + b) AS pd
         |  FROM pairs),
         |r AS (
         |  SELECT pid, CASE WHEN od > 0
         |    THEN CAST(floor(1000000.0 * pd / (16.0 * od)) AS BIGINT)
         |    ELSE 1000000 END AS ratio
         |  FROM d)
         |SELECT COUNT(*) AS n_pairs,
         |  CAST(SUM(CASE WHEN ratio BETWEEN 500000 AND 2000000
         |    THEN 1 ELSE 0 END) AS BIGINT) AS n_preserved,
         |  CAST(SUM(ratio) AS BIGINT) AS ratio_checksum,
         |  MIN(ratio) AS ratio_min, MAX(ratio) AS ratio_max
         |FROM r""".stripMargin)
  )

  /** Oracle for sim_ivf_nprobe_sweep: centroids ranked once by
    * distance to the query vector, then per nprobe the recall hits
    * against the exact top-10 and the scanned-row cost — the same
    * strict argmin/rank arithmetic sim_ann_ivf already replays.
    */
  private def ivfNprobeSweepOracleSql(nps: Seq[Int]): String = {
    val dim1 = IvfCentroids.dim + 1
    val rows = nps.map(np =>
      s"""  SELECT CAST($np AS INT) AS nprobe,
         |    (SELECT COUNT(*) FROM (
         |       SELECT s.vec_id FROM sc0 s JOIN assign a
         |         ON a.vec_id = s.vec_id
         |       WHERE a.cell IN (SELECT i FROM prank WHERE rk <= $np)
         |       ORDER BY s.cosine DESC, s.vec_id LIMIT 10) t
         |     JOIN exact10 x ON x.vec_id = t.vec_id) AS hits,
         |    (SELECT COUNT(*) FROM assign
         |     WHERE cell IN (SELECT i FROM prank WHERE rk <= $np))
         |      AS rows_scanned""".stripMargin)
      .mkString("\n  UNION ALL\n")
    s"""WITH cen(i, c) AS (VALUES ${IvfCentroids.sqlValues}),
       |cn AS (
       |  SELECT i, c, list_reduce(list_transform(c, x -> x * x),
       |    (a, b) -> a + b) AS cnorm FROM cen),
       |emb AS (
       |  SELECT vec_id,
       |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
       |  FROM embeddings),
       |n AS (
       |  SELECT vec_id, v, sqrt(list_reduce(list_transform(v, t -> t * t),
       |    (a, b) -> a + b)) AS nrm FROM emb),
       |qn AS (SELECT v AS qv, nrm AS qnorm FROM n WHERE vec_id = 0),
       |sc0 AS (
       |  SELECT e.vec_id,
       |    list_reduce(list_transform(range(1, $dim1),
       |      j -> e.v[j] * qn.qv[j]), (a, b) -> a + b)
       |      / (e.nrm * qn.qnorm) AS cosine
       |  FROM n e, qn WHERE e.vec_id <> 0),
       |exact10 AS (
       |  SELECT vec_id FROM sc0 ORDER BY cosine DESC, vec_id LIMIT 10),
       |prank AS (
       |  SELECT cn.i, row_number() OVER (
       |    ORDER BY cn.cnorm - 2.0 * list_reduce(
       |      list_transform(range(1, $dim1),
       |        j -> qn.qv[j] * cn.c[j]), (a, b) -> a + b), cn.i) AS rk
       |  FROM cn, qn),
       |assign AS (
       |  SELECT vec_id, i AS cell FROM (
       |    SELECT e.vec_id, cn.i, row_number() OVER (PARTITION BY e.vec_id
       |      ORDER BY cn.cnorm - 2.0 * list_reduce(
       |        list_transform(range(1, $dim1),
       |          j -> e.v[j] * cn.c[j]), (a, b) -> a + b), cn.i) AS rn
       |    FROM emb e, cn WHERE e.vec_id <> 0) WHERE rn = 1)
       |SELECT nprobe, hits, rows_scanned FROM (
       |$rows
       |) ORDER BY nprobe""".stripMargin
  }

  /** Oracle for ta_bpe_train: replays BPE merge-table LEARNING in
    * DuckDB — `k` unrolled iterations, each one (a) counting adjacent
    * symbol pairs over the distinct-word table weighted by word
    * frequency, (b) picking the (count DESC, left, right) argmax, and
    * (c) applying that merge to fixpoint via a recursive
    * replace-until-unchanged CTE (the bpeCountCte technique, chained k
    * times — chained recursion is one WITH RECURSIVE in DuckDB). The
    * engine's one-corpus-scan + vocab-sized-iterations optimization is
    * replayed exactly: same word counts, same positional pair counts,
    * same tie-break, so the two engines must learn the IDENTICAL
    * table.
    */
  private def bpeTrainOracleSql(k: Int): String = {
    val sb = new StringBuilder
    sb ++= s"""WITH RECURSIVE words AS (
       |  SELECT unnest(string_split_regex(
       |    CASE WHEN contains(text, chr(1))
       |         THEN error('bpe train oracle: text contains chr(1)')
       |         ELSE lower(text) END, '\\s+')) AS w
       |  FROM documents),
       |w0 AS MATERIALIZED (
       |  SELECT w AS word, COUNT(*) AS cnt,
       |    chr(1) || regexp_replace(w, '(.)', '\\1' || chr(1), 'g') AS s
       |  FROM words WHERE w <> '' GROUP BY w),
       |""".stripMargin
    // Two structural choices carry the oracle's wall-time (measured
    // at sf0.01: 560 s → 0.24 s, identical 8 rules): (1) only the
    // words CONTAINING the argmax pattern enter the recursive
    // replace-to-fixpoint — the untouched majority passes through a
    // plain filter, so each level's recursion (whose UNION dedups the
    // whole working set at every step) runs over the pattern's
    // sharers, not the vocab; (2) every wI is MATERIALIZED — the
    // scoped form references w{i-1} twice, and DuckDB inlines
    // non-recursive CTEs by default, so without the hint the chain
    // expands 2^k-fold (measured as an fd-exhaustion blowup, not just
    // slowness).
    for (i <- 1 to k) {
      val prev = s"w${i - 1}"
      sb ++= s"""p$i AS (
         |  SELECT p[1] AS a, p[2] AS b, SUM(cnt) AS c FROM (
         |    SELECT cnt, unnest(list_zip(sy[1:len(sy)-1], sy[2:len(sy)])) AS p
         |    FROM (SELECT cnt, list_filter(string_split(s, chr(1)),
         |            x -> x <> '') AS sy
         |          FROM $prev))
         |  GROUP BY 1, 2),
         |b$i AS (
         |  SELECT a, b, chr(1)||a||chr(1)||b||chr(1) AS pat,
         |    chr(1)||a||b||chr(1) AS rep
         |  FROM p$i ORDER BY c DESC, a, b LIMIT 1),
         |f$i(word, cnt, s) AS (
         |  SELECT f.word, f.cnt, f.s FROM $prev f, b$i b
         |  WHERE contains(f.s, b.pat)
         |  UNION
         |  SELECT f.word, f.cnt, replace(f.s, b.pat, b.rep)
         |  FROM f$i f, b$i b),
         |w$i AS MATERIALIZED (
         |  SELECT f.word, f.cnt, f.s FROM $prev f, b$i b
         |  WHERE NOT contains(f.s, b.pat)
         |  UNION ALL
         |  SELECT f.word, f.cnt, f.s FROM f$i f, b$i b
         |  WHERE replace(f.s, b.pat, b.rep) = f.s),
         |""".stripMargin
    }
    sb ++= (1 to k).map(i =>
      s"SELECT CAST($i AS INTEGER) AS rank, a AS lhs, b AS rhs FROM b$i")
      .mkString("sel AS (\n", "\n  UNION ALL\n", ")\n")
    sb ++= "SELECT rank, lhs, rhs FROM sel ORDER BY rank"
    sb.toString
  }

  /** The BPE-count oracle block shared by ta_subword_bpe and
    * etl_pack_bpe: recursive-CTE replay of the engine's rank-order-
    * fixpoint BPE, merge rules generated from the Scala table. Ends
    * with `bpecnt(doc_id, n_bpe)`.
    *
    * Symbol delimiter is chr(1), NOT a printable char, so literal
    * text cannot collide with it — and docs0 asserts its absence
    * loudly (DuckDB error()) rather than corrupting silently. The
    * engine Java-trims and splits on \\s+; docs0 mirrors that by
    * collapsing every whitespace run to one space BEFORE the per-char
    * split, so tabs/newlines are word boundaries in both engines
    * instead of counted symbols in one.
    */
  private def bpeCountCte: String = {
    val merges = TextAnalysis.defaultBpeMerges
    val values = merges.zipWithIndex.map { case ((a, b), i) =>
      s"(${i + 1}, chr(1)||'$a'||chr(1)||'$b'||chr(1), chr(1)||'$a$b'||chr(1))"
    }.mkString(", ")
    s"""WITH RECURSIVE merges(r, pat, rep) AS (
       |  SELECT * FROM (VALUES $values) m(r, pat, rep)),
       |docs0 AS (
       |  SELECT doc_id,
       |    chr(1) || regexp_replace(
       |      trim(regexp_replace(
       |        CASE WHEN contains(text, chr(1))
       |             THEN error('bpe oracle: text contains chr(1)')
       |             ELSE lower(text) END,
       |        '\\s+', ' ', 'g')),
       |      '(.)', '\\1' || chr(1), 'g') AS s
       |  FROM documents),
       |bpe(doc_id, s, r) AS (
       |  SELECT doc_id, s, 1 FROM docs0
       |  UNION ALL
       |  SELECT b.doc_id, replace(b.s, m.pat, m.rep),
       |    CASE WHEN replace(b.s, m.pat, m.rep) <> b.s
       |         THEN b.r ELSE b.r + 1 END
       |  FROM bpe b JOIN merges m ON m.r = b.r),
       |bpefin AS (
       |  SELECT doc_id, s FROM bpe WHERE r = ${merges.size + 1}),
       |bpecnt AS (
       |  SELECT doc_id,
       |    CAST(length(s) - length(replace(s, chr(1), '')) - 1
       |         - (length(s) - length(replace(s, ' ', ''))) AS BIGINT)
       |      AS n_bpe
       |  FROM bpefin)""".stripMargin
  }
}
