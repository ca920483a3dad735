package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-mining operators a large training-data pipeline leans on once
  * dedup/similarity are in place: an EXACT set-similarity self-join
  * with prefix filtering (the lossless counterpart to MinHash-LSH),
  * market-basket association rules, iterative PageRank over a
  * co-occurrence graph, and an order-exact EWMA smoother.
  *
  * Scale stance (100 TB):
  *  - prefixJaccardPairs generates candidates from the RAREST tokens
  *    only (prefix-filter family of Chaudhuri/Xiao et al. — public
  *    literature): the inverted index covers ~(1-τ)·|x| tokens per
  *    document instead of all of them, and a length filter prunes
  *    incompatible pairs before verification. No global rank
  *    assignment is needed — (document-frequency, token) IS the total
  *    order, so the plan is two keyed shuffles (df join, prefix-token
  *    candidate join), never a row_number over an unpartitioned
  *    window.
  *  - assocRules prunes to frequent pairs BEFORE rule expansion; the
  *    basket self-join shuffles on the basket key, so cost is
  *    Σ basket² — bounded, never O(items²).
  *  - pageRank is the canonical iterate-shuffle loop: one shuffle per
  *    iteration on the destination key, edges materialized once. All
  *    rank arithmetic is integral (scaled BIGINT + `div`), so results
  *    are bit-identical on any partitioning — no float
  *    accumulation-order drift between a 1-executor test and a
  *    1000-executor run, and bit-identical to the DuckDB replay.
  */
object Mining {

  /** Exact Jaccard >= tauNum/tauDen self-join over distinct
    * whitespace-token sets; candidates via the prefix filter under the
    * (document-frequency, token) total order. Returns
    * (id1, id2, n1, n2, n_inter) for qualifying pairs — callers derive
    * similarity as an integral expression (never a float threshold).
    *
    * Completeness: sets with Jaccard >= τ overlap in at least
    * ⌈τ/(1+τ)·(n1+n2)⌉ >= ⌈τ·max(n1,n2)⌉ tokens, so each set's
    * n − ⌈τ·n⌉ + 1 smallest tokens (under ANY shared total order) must
    * hit the overlap; rarest-first minimizes index fan-out. The DuckDB
    * oracle row recomputes via the FULL inverted index — a red row
    * means the filter dropped a pair — and MiningSpec asserts equality
    * with [[Dedup.ngramJaccardPairs]]-style full indexing on fixtures.
    */
  def prefixJaccardPairs(docs: DataFrame, idCol: String, textCol: String,
      tauNum: Int, tauDen: Int): DataFrame = {
    require(tauNum > 0 && tauNum <= tauDen, "need 0 < tau <= 1")
    val toks = Dedup.spread(
        docs.select(col(idCol).as("id"), col(textCol).as("t")))
      .select(col("id"),
        array_distinct(split(trim(col("t")), "\\s+")).as("toks"))
    val dfreq = toks.select(explode(col("toks")).as("w"))
      .groupBy("w").agg(count(lit(1)).as("dfreq"))
    // per-doc tokens in TWO orders from one aggregation: rarest-first
    // (the prefix order) and lexicographic (the verify order — the
    // merge-count kernel needs a plain ascending sort);
    // plen = n - ceil(tau*n) + 1
    val sorted = toks.select(col("id"), explode(col("toks")).as("w"))
      .join(dfreq, "w")
      .groupBy("id")
      .agg(sort_array(collect_list(struct(col("dfreq"), col("w"))))
        .getField("w").as("ord"),
        sort_array(collect_list(col("w"))).as("lex"))
      .select(col("id"), col("ord"), col("lex"),
        size(col("ord")).cast("long").as("n"))
      .withColumn("plen",
        (col("n") - expr(s"($tauNum * n + ${tauDen - 1}) div $tauDen") + 1)
          .cast("int"))
    val prefix = sorted.select(col("id"), col("n"),
      explode(slice(col("ord"), lit(1), col("plen"))).as("w"))
    // candidate pairs: shared prefix token + length compatibility
    // (τ·max <= min), verified exactly on the full sorted token arrays
    val cand = prefix.as("a").join(prefix.as("b"),
        col("a.w") === col("b.w") && col("a.id") < col("b.id") &&
          greatest(col("a.n"), col("b.n")) * tauNum <=
            least(col("a.n"), col("b.n")) * tauDen)
      .select(col("a.id").as("id1"), col("b.id").as("id2"))
      .distinct()
    // verify with the codegen'd sorted-merge intersection count —
    // O(n1+n2) and allocation-free per candidate pair, where
    // array_intersect builds a hash set per call (measured ~10× slower
    // over millions of candidates — BENCH_NOTES `ppjoin` probe)
    val full = sorted.select(col("id"), col("lex"), col("n"))
    cand
      .join(full.toDF("id1", "lex1", "n1"), "id1")
      .join(full.toDF("id2", "lex2", "n2"), "id2")
      .select(col("id1"), col("id2"), col("n1"), col("n2"),
        graft.functions.VecOps.sortedIntersectCount(
          col("lex1"), col("lex2")).cast("long").as("n_inter"))
      .filter(col("n_inter") * (tauNum + tauDen) >=
        (col("n1") + col("n2")) * tauNum)
  }

  /** Market-basket association rules over (basket, item) rows:
    * candidate item pairs co-occurring in >= minPairSupport baskets,
    * expanded to directed rules with integer-exact confidence and lift
    * (scaled by 1e6, integral division — identical in any engine).
    *
    * conf(x→y) = n_xy/n_x; lift = n_xy·N/(n_x·n_y). Emitted as
    * conf_x1e6 / lift_x1e6 BIGINT cells. The lift numerator
    * n_xy·N·1e6 needs headroom: fine up to n_xy·N < 9e12 — at larger
    * scales callers should bucket by antecedent and compute lift as
    * two chained integral divisions.
    */
  def assocRules(baskets: DataFrame, basketCol: String, itemCol: String,
      minPairSupport: Long): DataFrame = {
    val b = baskets.select(col(basketCol).as("bk"), col(itemCol).as("it"))
      .distinct()
    val nBaskets = b.groupBy().agg(
      countDistinct(col("bk")).as("n_baskets"))
    val itemCnt = b.groupBy(col("it")).agg(count(lit(1)).as("n_item"))
    val pairs = b.as("a").join(b.as("bb"),
        col("a.bk") === col("bb.bk") && col("a.it") < col("bb.it"))
      .groupBy(col("a.it").as("p1"), col("bb.it").as("p2"))
      .agg(count(lit(1)).as("n_xy"))
      .filter(col("n_xy") >= minPairSupport)
    val rules = pairs.select(col("p1").as("ante"), col("p2").as("cons"),
        col("n_xy"))
      .unionAll(pairs.select(col("p2").as("ante"), col("p1").as("cons"),
        col("n_xy")))
    rules
      .join(itemCnt.toDF("ante", "n_ante"), "ante")
      .join(itemCnt.toDF("cons", "n_cons"), "cons")
      .crossJoin(broadcast(nBaskets))
      .select(col("ante"), col("cons"), col("n_xy"),
        expr("n_xy * 1000000L div n_ante").as("conf_x1e6"),
        expr("n_xy * n_baskets * 1000000L div (n_ante * n_cons)")
          .as("lift_x1e6"))
  }

  /** Apriori level-3: frequent item triples at `minSupport`, found the
    * candidate-pruned way — frequent pairs (level 2) self-join on the
    * middle item into ordered candidates (p1 < p2 < p3) whose THIRD
    * pair (p1, p3) must also be frequent (the Apriori closure:
    * support is anti-monotone, so every sub-pair of a frequent triple
    * is frequent and pruning by it is lossless). Support counting
    * then runs with the candidate set BROADCAST against basket pairs
    * built from items that survive level 2 — the basket stream
    * shrinks before the expensive join, which is the whole point of
    * Apriori at scale: level k's work is bounded by level k-1's
    * survivors, never by the raw item universe. The oracle
    * brute-force-counts ALL triples with no pruning — a candidate
    * dropped by the closure logic would go red there, proving the
    * prune lossless rather than asserting it.
    */
  def frequentTriples(baskets: DataFrame, basketCol: String,
      itemCol: String, minSupport: Long): DataFrame = {
    val b = baskets.select(col(basketCol).as("bk"), col(itemCol).as("it"))
      .distinct()
    // pinned: f2 feeds the candidate triple join three times plus the
    // frequent-item projection twice, and each un-pinned reference
    // would re-run the basket self-join aggregation above it; the
    // frequent-pair set is minSupport-bounded — small by construction
    val f2 = b.as("a").join(b.as("c"),
        col("a.bk") === col("c.bk") && col("a.it") < col("c.it"))
      .groupBy(col("a.it").as("p1"), col("c.it").as("p2"))
      .agg(count(lit(1)).as("n_xy"))
      .filter(col("n_xy") >= minSupport)
      .select(col("p1"), col("p2"))
      .localCheckpoint()
    val cand = f2.as("x").join(f2.as("y"),
        col("x.p2") === col("y.p1"))
      .select(col("x.p1").as("p1"), col("x.p2").as("p2"),
        col("y.p2").as("p3"))
      .join(f2.toDF("p1", "p3"), Seq("p1", "p3"))
    val fItems = f2.select(col("p1").as("it"))
      .unionAll(f2.select(col("p2").as("it"))).distinct()
    val bf = b.join(fItems, "it").select(col("bk"), col("it"))
    bf.as("a").join(bf.as("c"),
        col("a.bk") === col("c.bk") && col("a.it") < col("c.it"))
      .select(col("a.bk").as("bk"), col("a.it").as("i1"),
        col("c.it").as("i2"))
      .join(broadcast(cand),
        col("i1") === col("p1") && col("i2") === col("p2"))
      .as("pp")
      .join(bf.as("e"),
        col("pp.bk") === col("e.bk") && col("e.it") === col("pp.p3"))
      .groupBy(col("p1").as("i1"), col("p2").as("i2"), col("p3").as("i3"))
      .agg(count(lit(1)).as("n_xyz"))
      .filter(col("n_xyz") >= minSupport)
  }

  /** Integer-exact PageRank over a directed edge list (srcCol, dstCol),
    * fixed iteration count, damping dampNum/dampDen, ranks scaled by
    * `scale`. Classic per-node formulation (ranks average `scale`, not
    * sum to it): pr(v) = (1-d)·scale + d·Σ pr(u) div deg(u).
    *
    * All arithmetic BIGINT + integral `div`: exact and
    * order-independent, so the same numbers fall out of a 1000-executor
    * run and the DuckDB unrolled-CTE replay. Headroom: total rank mass
    * converges to ~n_nodes·scale; with scale=1e12 the 85·Σcontrib
    * intermediate stays < 9.2e18 for graphs up to ~10⁵ nodes — larger
    * graphs should drop scale proportionally.
    *
    * Edges and degrees are localCheckpointed once (they're consumed by
    * all iterations — without this each iteration re-derives the edge
    * subtree); each iteration is one join + one keyed shuffle on dst.
    * Nodes are assumed to all have out-degree >= 1 (symmetrize an
    * undirected graph first); nodes never referenced as dst keep
    * receiving only the teleport mass.
    *
    * `checkpointEvery`: the unrolled loop otherwise grows one
    * join-plan layer per iteration — harmless at 10 iterations, but at
    * convergence-driven counts (50-100 on a real web graph) the
    * lineage depth inflates analysis/AQE replanning and executor task
    * binaries. Truncating `ranks` every k iterations bounds the plan
    * at k layers for a small materialization cost (one n_nodes-row
    * frame); values are integer-exact either way, so the knob cannot
    * change results. 0 disables.
    */
  def pageRank(edges: DataFrame, srcCol: String, dstCol: String,
      iterations: Int, dampNum: Long = 85L, dampDen: Long = 100L,
      scale: Long = 1000000000000L, checkpointEvery: Int = 8): DataFrame = {
    require(iterations >= 1 && dampNum >= 0 && dampNum <= dampDen)
    val e = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
      .localCheckpoint()
    val deg = e.groupBy(col("src")).agg(count(lit(1)).as("d"))
    val nodes = deg.select(col("src").as("node"), col("d"))
      .crossJoin(broadcast(
        deg.groupBy().agg(count(lit(1)).as("n_nodes"))))
      .localCheckpoint()
    require(scale % dampDen == 0, "scale must be a multiple of dampDen")
    val base = scale / dampDen * (dampDen - dampNum) // exact by the require
    var ranks = nodes.select(col("node"), col("d"),
      expr(s"${scale}L div n_nodes").as("pr"))
    for (i <- 1 to iterations) {
      val contrib = e.join(ranks, e("src") === ranks("node"))
        .select(col("dst"), expr("pr div d").as("c"))
        .groupBy(col("dst")).agg(sum(col("c")).as("contrib"))
      ranks = nodes.join(contrib, nodes("node") === contrib("dst"))
        .select(nodes("node"), nodes("d"),
          (lit(base) + expr(s"$dampNum * contrib div $dampDen")).as("pr"))
      if (checkpointEvery > 0 && i % checkpointEvery == 0 && i < iterations)
        ranks = ranks.localCheckpoint()
    }
    ranks.select(col("node"), col("pr"))
  }

  /** Order-exact exponentially-weighted moving average with α = 1/2
    * over a per-group value sequence: s_t = (s_{t-1} + x_t) · 0.5,
    * s_0 = 0. The (acc+x)·0.5 shape is FMA-proof (no a·b+c contraction
    * site) and multiply-by-0.5 is exact, so the fold is bit-identical
    * across JVM and DuckDB (`list_reduce(list_prepend(0.0, xs), ...)`).
    * `xs` must arrive sorted — pair each value with its order key and
    * sort_array upstream.
    */
  def ewmaHalf(xs: Column): Column =
    aggregate(xs, lit(0.0), (acc, x) => (acc + x) * lit(0.5))

  /** Triangle count + global clustering coefficient over an undirected
    * edge list given as (a, b) with a < b, each edge once. Edges are
    * ORIENTED from lower (degree, id) to higher before the wedge join
    * — the standard bound that caps intermediate wedges at O(m^1.5)
    * regardless of hub degree (a naive wedge join explodes
    * quadratically on the hottest node). Two keyed shuffles: wedge
    * build on the pivot, closure probe on the (b, c) pair.
    *
    * Returns one census row: n_edges, n_wedges (open, over the
    * UNDIRECTED degrees — Σ d·(d-1)/2), n_triangles, and the global
    * clustering coefficient as floor(3·Δ·1e6 / wedges) — integral, so
    * the row is engine-exact.
    */
  def triangleCensus(edges: DataFrame, aCol: String, bCol: String)
      : DataFrame = {
    // e is referenced four times in the final census plan (both union
    // branches of `und`, the closure probe, the edge count) and deg
    // three times — only their exchanges would be reused, so without
    // the pins the post-shuffle distinct/aggregation re-executes per
    // reference (the pageRank precedent: edges/degrees pinned once,
    // consumed by every iteration).
    val e = edges.select(col(aCol).as("a"), col(bCol).as("b")).distinct()
      .filter(col("a") < col("b"))
      .localCheckpoint()
    val und = e.select(col("a").as("n"), col("b").as("m"))
      .unionAll(e.select(col("b").as("n"), col("a").as("m")))
    val deg = und.groupBy(col("n")).agg(count(lit(1)).as("d"))
      .localCheckpoint()
    // orient each edge from lower (deg, id) endpoint to higher
    val oriented = und
      .join(deg.toDF("n", "dn"), "n")
      .join(deg.toDF("m", "dm"), "m")
      .filter(col("dn") < col("dm") ||
        (col("dn") === col("dm") && col("n") < col("m")))
      .select(col("n").as("src"), col("m").as("dst"))
    val wedges = oriented.as("e1").join(oriented.as("e2"),
        col("e1.src") === col("e2.src") && col("e1.dst") < col("e2.dst"))
      .select(col("e1.dst").as("x"), col("e2.dst").as("y"))
    // closure: the third edge appears in `e` as (min, max)
    val closed = wedges.join(e,
      least(col("x"), col("y")) === col("a") &&
        greatest(col("x"), col("y")) === col("b"))
    val openWedges = deg.agg(
      sum(expr("d * (d - 1) div 2")).as("n_wedges"))
    e.agg(count(lit(1)).as("n_edges"))
      .crossJoin(broadcast(openWedges))
      .crossJoin(broadcast(closed.agg(count(lit(1)).as("n_triangles"))))
      .select(col("n_edges"), col("n_wedges"), col("n_triangles"),
        expr("CASE WHEN n_wedges = 0 THEN 0L " +
          "ELSE 3 * n_triangles * 1000000L div n_wedges END")
          .as("clustering_x1e6"))
  }

  /** 2-D Pareto frontier (skyline): points with no other point at
    * (x <=, y >=) with one strict — minimize x, maximize y. Two-phase,
    * and NO task ever holds O(survivors) rows — the r17 adversarial
    * bound (diagonal data where y rises with x puts every distinct
    * point on the frontier, so a "global window over survivors" pass
    * is O(input) in one task) is closed by making phase 2 distributed:
    *
    *  - Phase 1: bucket-local frontiers in PARALLEL windows
    *    partitioned by an x-range bucket (a point dominated inside
    *    its bucket is dominated globally — same-bucket dominators
    *    have x <= by the sort). Survival rule: ordered by (x asc,
    *    y desc), keep a point iff its y strictly exceeds every
    *    earlier point's y.
    *  - Phase 2: every point in an EARLIER bucket has strictly
    *    smaller x (buckets are x-range slices), so cross-bucket
    *    domination of p reduces to "some earlier non-empty bucket's
    *    max y >= p.y". That prefix max is computed over the
    *    per-bucket census — ONE row per non-empty bucket, and the
    *    bucket max is always attained by a phase-1 survivor (the
    *    x-earliest max-y point has no earlier same-bucket y >= it) —
    *    in two bounded window levels: within super-buckets of
    *    `superBuckets` consecutive buckets (partitioned, <=
    *    superBuckets rows per task), then a single-partition window
    *    over the super-bucket rows. Super rows are bounded by
    *    x-range / (bucketWidth * superBuckets) — with the defaults,
    *    <= ~9e6 even if x spans the full Long range — so the one
    *    unpartitioned window in the plan is arithmetic-bounded
    *    census data, never point data. Survivors then filter
    *    against the joined prefix max IN PLACE, reusing the bx
    *    hash partitioning phase 1 already established.
    */
  def skyline2d(points: DataFrame, xCol: String, yCol: String,
      bucketWidth: Long = 1000000L, superBuckets: Long = 1L << 20)
      : DataFrame = {
    // div 0 yields NULL keys (silently empty frontier); negative
    // widths invert the bucket order the dominance argument rests on
    require(bucketWidth > 0, s"bucketWidth must be > 0, got $bucketWidth")
    require(superBuckets > 0, s"superBuckets must be > 0, got $superBuckets")
    import org.apache.spark.sql.expressions.Window
    val p = points.select(col(xCol).as("x"), col(yCol).as("y")).distinct()
    val localW = Window.partitionBy(col("bx"))
      .orderBy(col("x").asc, col("y").desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    // pinned: the frontier subtree is referenced three times in the
    // final plan (directly, under census, under census-via-superPrefix)
    // and only the distinct EXCHANGE below it would be reused — the
    // window itself would re-execute per reference. The frontier is
    // orders of magnitude smaller than the input (per bucket it is
    // bounded by the distinct y values), so the pin is cheap at any
    // scale the bucketing handles.
    val local = p.withColumn("bx", expr(s"x div $bucketWidth"))
      .withColumn("pm", max(col("y")).over(localW))
      .filter(col("pm").isNull || col("y") > col("pm"))
      .select(col("bx"), col("x"), col("y"))
      .localCheckpoint()
    // Per-bucket census: (bucket, max y among its survivors) — equal
    // to the bucket's overall max y (see scaladoc), one row per
    // non-empty bucket.
    val census = local.groupBy(col("bx")).agg(max(col("y")).as("by"))
      .withColumn("sb", expr(s"bx div $superBuckets"))
    val innerW = Window.partitionBy(col("sb")).orderBy(col("bx").asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val superW = Window.orderBy(col("sb").asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val superPrefix = census.groupBy(col("sb")).agg(max(col("by")).as("sby"))
      .withColumn("spm", max(col("sby")).over(superW))
      .select(col("sb"), col("spm"))
    // greatest() ignores nulls (null only when BOTH sides are null =
    // the x-least bucket), matching "no earlier bucket" semantics.
    // No broadcast hint on superPrefix: it is usually a handful of
    // rows (AQE will broadcast it), but its arithmetic bound is ~9e6
    // rows — census-sized joins are cheap either way.
    val prefix = census
      .withColumn("ipm", max(col("by")).over(innerW))
      .join(superPrefix, "sb")
      .select(col("bx"), greatest(col("ipm"), col("spm")).as("gpm"))
    local.join(prefix, "bx")
      .filter(col("gpm").isNull || col("y") > col("gpm"))
      .select(col("x"), col("y"))
  }

  /** Exact edit-distance <= k self-join over distinct strings via the
    * q-gram count filter (Gravano et al., VLDB'01 — public
    * literature): one edit destroys at most q q-grams, so ED(s,t) <= k
    * forces bag-intersection >= max(|s|,|t|) - (q-1) - q·k shared
    * grams. Candidates come from an inverted (gram, occurrence) index
    * — bag semantics via per-string occurrence numbering, so repeated
    * grams can't inflate the count — plus the |len diff| <= k length
    * filter; only survivors pay the O(len²) levenshtein verify.
    *
    * Strings shorter than q·(k+1) can pair with LB <= 0 (the filter
    * can't prune them), so the short bucket is joined directly — the
    * split keeps the operator lossless. At 100 TB the refinement path
    * is EDJoin's positional prefix filter (index only the rarest
    * grams); the count filter is the right first cut and the oracle
    * brute-forces all pairs, so losslessness is machine-checked.
    *
    * Returns (s1, s2, ed) with s1 < s2 and ed <= k.
    */
  def editDistancePairs(strs: DataFrame, strCol: String, k: Int, q: Int)
      : DataFrame = {
    require(k >= 1 && q >= 2, "need k >= 1, q >= 2")
    val s = Dedup.spread(strs.select(col(strCol).as("s")).distinct())
      .withColumn("len", length(col("s")))
    val shortLen = q * (k + 1) // max(l1,l2) < this <=> LB <= 0
    val longs = s.filter(col("len") >= shortLen)
    val grams = longs.select(col("s"), col("len"),
        explode(transform(sequence(lit(1), col("len") - (q - 1)),
          i => col("s").substr(i, lit(q)))).as("g"))
      .withColumn("occ", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(col("s"), col("g")).orderBy(lit(1))))
    val longCand = grams.as("a").join(grams.as("b"),
        col("a.g") === col("b.g") && col("a.occ") === col("b.occ") &&
          col("a.s") < col("b.s") &&
          abs(col("a.len") - col("b.len")) <= k)
      .groupBy(col("a.s").as("s1"), col("b.s").as("s2"),
        col("a.len").as("l1"), col("b.len").as("l2"))
      .agg(count(lit(1)).as("shared"))
      .filter(col("shared") >=
        greatest(col("l1"), col("l2")) - (q - 1) - q * k)
      .select(col("s1"), col("s2"))
    // short strings: the filter is vacuous, pair them directly (the
    // bucket is bounded by construction — every member is < q·(k+1)
    // chars); long-short pairs with LB > 0 are covered by the gram
    // path only when the short side HAS grams, so route all
    // short-involving pairs here instead
    val shorts = s.filter(col("len") < shortLen)
    val shortShort = shorts.as("a").join(shorts.as("b"),
        col("a.s") < col("b.s") && abs(col("a.len") - col("b.len")) <= k)
      .select(col("a.s").as("s1"), col("b.s").as("s2"))
    val shortLong = shorts.as("a").join(longs.as("b"),
        abs(col("a.len") - col("b.len")) <= k)
      .select(least(col("a.s"), col("b.s")).as("s1"),
        greatest(col("a.s"), col("b.s")).as("s2"))
    longCand.unionAll(shortShort).unionAll(shortLong).distinct()
      .withColumn("ed", levenshtein(col("s1"), col("s2")))
      .filter(col("ed") <= k)
      .select(col("s1"), col("s2"), col("ed"))
  }
}

/** Oracle-checked instantiations of the mining operators (registry
  * merged into [[graft.SparkEntry]]).
  */
object MiningQueries {
  import graft.{QueryDef, Tables => T}

  /** Distinct (order, part) basket rows — the shared input of the
    * market-basket queries and the co-purchase graph.
    */
  private def baskets(s: org.apache.spark.sql.SparkSession, d: String) =
    T.lineitem(s, d)
      .select(col("l_orderkey").as("bk"), col("l_partkey").as("it"))
      .distinct()

  private val basketSql =
    "SELECT DISTINCT l_orderkey AS bk, l_partkey AS it FROM lineitem"

  /** The DuckDB side of pg_pagerank: the SAME integral recurrence as
    * [[Mining.pageRank]], unrolled into chained CTEs (DuckDB disallows
    * aggregation in a recursive term). Generated by loop so the
    * iteration count provably matches the Spark side.
    */
  private def pageRankOracle(iters: Int, scale: Long, base: Long): String = {
    val head =
      s"""WITH b AS ($basketSql),
         |pairs AS (
         |  SELECT a.it AS p1, bb.it AS p2 FROM b a
         |  JOIN b bb ON a.bk = bb.bk AND a.it < bb.it
         |  GROUP BY 1, 2 HAVING COUNT(*) >= 2),
         |edges AS (SELECT p1 AS src, p2 AS dst FROM pairs
         |          UNION ALL SELECT p2, p1 FROM pairs),
         |deg AS (SELECT src, COUNT(*) AS d FROM edges GROUP BY src),
         |nodes AS (SELECT src AS node, d FROM deg),
         |it0 AS (SELECT node, d,
         |  CAST($scale // (SELECT COUNT(*) FROM nodes) AS BIGINT) AS pr
         |  FROM nodes)""".stripMargin
    val chain = (1 to iters).map { i =>
      s"""it$i AS (
         |  SELECT n.node, n.d,
         |    CAST($base + 85 * CAST(s.contrib AS BIGINT) // 100 AS BIGINT)
         |      AS pr
         |  FROM nodes n JOIN (
         |    SELECT e.dst AS node, SUM(p.pr // p.d) AS contrib
         |    FROM edges e JOIN it${i - 1} p ON p.node = e.src
         |    GROUP BY e.dst) s ON s.node = n.node)""".stripMargin
    }.mkString(",\n")
    s"""$head,
       |$chain
       |SELECT node, pr FROM it$iters
       |ORDER BY pr DESC, node LIMIT 50""".stripMargin
  }

  val registry: Map[String, QueryDef] = Map(

    // EXACT Jaccard >= 1/2 near-dup pairs via the prefix filter —
    // the lossless counterpart to dd_minhash_pairs. The oracle
    // recomputes via the FULL inverted index (a different algorithm):
    // a red row means the prefix filter dropped a pair. Threshold and
    // similarity are integral (3·inter >= n1+n2; x10000 via div) — no
    // float compare anywhere.
    "dd_prefix_jaccard" -> QueryDef(
      (s, d) => Mining.prefixJaccardPairs(
          T.documents(s, d).filter(col("doc_id") < 100),
          "doc_id", "text", 1, 2)
        .select(col("id1"), col("id2"),
          expr("n_inter * 10000L div (n1 + n2 - n_inter)").as("jacc_x10000"))
        .orderBy(col("jacc_x10000").desc, col("id1"), col("id2")),
      """WITH tok AS (
        |  SELECT doc_id, unnest(list_distinct(
        |    string_split_regex(trim(text), '\s+'))) AS w
        |  FROM documents WHERE doc_id < 100),
        |sizes AS (SELECT doc_id, COUNT(*) AS n FROM tok GROUP BY doc_id),
        |inter AS (
        |  SELECT a.doc_id AS id1, b.doc_id AS id2, COUNT(*) AS ni
        |  FROM tok a JOIN tok b ON a.w = b.w AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2)
        |SELECT id1, id2,
        |  CAST(ni * 10000 // (s1.n + s2.n - ni) AS BIGINT) AS jacc_x10000
        |FROM inter
        |JOIN sizes s1 ON s1.doc_id = id1
        |JOIN sizes s2 ON s2.doc_id = id2
        |WHERE 3 * ni >= s1.n + s2.n
        |ORDER BY jacc_x10000 DESC, id1, id2""".stripMargin),

    // Exact edit-distance <= 2 fuzzy self-join over distinct part
    // names via the q-gram count filter; the oracle BRUTE-FORCES all
    // pairs (length filter only), so a missing row proves the filter
    // dropped a true pair. Integer distance cells; both engines'
    // levenshtein is unit-cost insert/delete/substitute.
    "dd_edit_distance_join" -> QueryDef(
      (s, d) => Mining.editDistancePairs(
          T.part(s, d).select(col("p_name")), "p_name", k = 2, q = 2)
        .orderBy(col("s1"), col("s2")),
      """WITH n AS (SELECT DISTINCT p_name AS s FROM part)
        |SELECT a.s AS s1, b.s AS s2,
        |  CAST(levenshtein(a.s, b.s) AS INTEGER) AS ed
        |FROM n a JOIN n b ON a.s < b.s
        |WHERE abs(len(a.s) - len(b.s)) <= 2
        |  AND levenshtein(a.s, b.s) <= 2
        |ORDER BY s1, s2""".stripMargin),

    // Market-basket association rules over (order, part) baskets:
    // frequent co-purchase pairs -> directed rules with integer-exact
    // confidence and lift (x1e6, integral division both engines).
    "mb_assoc_rules" -> QueryDef(
      (s, d) => Mining.assocRules(baskets(s, d), "bk", "it", 3L)
        .orderBy(col("lift_x1e6").desc, col("ante"), col("cons")),
      s"""WITH b AS ($basketSql),
         |nb AS (SELECT COUNT(DISTINCT bk) AS n_baskets FROM b),
         |ic AS (SELECT it, COUNT(*) AS n_item FROM b GROUP BY 1),
         |pairs AS (
         |  SELECT a.it AS p1, bb.it AS p2, COUNT(*) AS n_xy FROM b a
         |  JOIN b bb ON a.bk = bb.bk AND a.it < bb.it
         |  GROUP BY 1, 2 HAVING COUNT(*) >= 3),
         |rules AS (SELECT p1 AS ante, p2 AS cons, n_xy FROM pairs
         |          UNION ALL SELECT p2, p1, n_xy FROM pairs)
         |SELECT r.ante, r.cons, CAST(r.n_xy AS BIGINT) AS n_xy,
         |  CAST(r.n_xy * 1000000 // ia.n_item AS BIGINT) AS conf_x1e6,
         |  CAST(r.n_xy * (SELECT n_baskets FROM nb) * 1000000
         |    // (ia.n_item * ib.n_item) AS BIGINT) AS lift_x1e6
         |FROM rules r
         |JOIN ic ia ON ia.it = r.ante
         |JOIN ic ib ON ib.it = r.cons
         |ORDER BY lift_x1e6 DESC, ante, cons""".stripMargin),

    // Apriori frequent triples (Mining.frequentTriples) over the
    // co-purchase baskets at support >= 2: level-2 survivors generate
    // ordered candidates closed under the third pair, then one
    // broadcast-candidate counting pass over the item-pruned basket
    // stream. The oracle BRUTE-FORCES every triple with no pruning —
    // a different algorithm, so the Apriori closure's losslessness is
    // proven per row, not asserted.
    "mb_frequent_triples" -> QueryDef(
      (s, d) => Mining.frequentTriples(baskets(s, d), "bk", "it", 2L)
        .orderBy(col("i1"), col("i2"), col("i3")),
      s"""WITH b AS ($basketSql)
         |SELECT a.it AS i1, c.it AS i2, e.it AS i3,
         |  COUNT(*) AS n_xyz
         |FROM b a
         |JOIN b c ON a.bk = c.bk AND a.it < c.it
         |JOIN b e ON a.bk = e.bk AND c.it < e.it
         |GROUP BY 1, 2, 3 HAVING COUNT(*) >= 2
         |ORDER BY i1, i2, i3""".stripMargin),

    // Integer-exact PageRank (10 iterations, d=0.85, scale 1e12) over
    // the symmetrized co-purchase graph (pairs co-ordered >= 2 times).
    // Bit-identical across engines and cluster sizes by construction.
    "pg_pagerank" -> QueryDef(
      (s, d) => {
        val b = baskets(s, d)
        // pinned: both symmetrization branches reference pairs, and
        // only its exchange would be reused — the co-purchase
        // aggregation would otherwise run twice
        val pairs = b.as("a").join(b.as("bb"),
            col("a.bk") === col("bb.bk") && col("a.it") < col("bb.it"))
          .groupBy(col("a.it").as("p1"), col("bb.it").as("p2"))
          .agg(count(lit(1)).as("n_xy"))
          .filter(col("n_xy") >= 2)
          .localCheckpoint()
        val edges = pairs.select(col("p1").as("src"), col("p2").as("dst"))
          .unionAll(pairs.select(col("p2").as("src"), col("p1").as("dst")))
        Mining.pageRank(edges, "src", "dst", iterations = 10)
          .orderBy(col("pr").desc, col("node")).limit(50)
      },
      pageRankOracle(iters = 10, scale = 1000000000000L,
        base = 150000000000L)),

    // Triangle census over the co-purchase graph. Spark orients edges
    // by (degree, id) before the wedge join — O(m^1.5) intermediates;
    // the oracle counts via the naive a<b<c three-way join (a
    // DIFFERENT algorithm — orientation bugs turn the row red).
    // All-integral cells including the clustering coefficient.
    "pg_triangles" -> QueryDef(
      (s, d) => {
        val b = baskets(s, d)
        val pairs = b.as("x").join(b.as("y"),
            col("x.bk") === col("y.bk") && col("x.it") < col("y.it"))
          .groupBy(col("x.it").as("a"), col("y.it").as("b"))
          .agg(count(lit(1)).as("n_xy"))
          .filter(col("n_xy") >= 2)
          .select(col("a"), col("b"))
        Mining.triangleCensus(pairs, "a", "b")
      },
      s"""WITH b AS ($basketSql),
         |e AS (
         |  SELECT x.it AS a, y.it AS b FROM b x
         |  JOIN b y ON x.bk = y.bk AND x.it < y.it
         |  GROUP BY 1, 2 HAVING COUNT(*) >= 2),
         |und AS (SELECT a AS n FROM e UNION ALL SELECT b FROM e),
         |deg AS (SELECT n, COUNT(*) AS d FROM und GROUP BY n),
         |tri AS (
         |  SELECT COUNT(*) AS n_triangles
         |  FROM e e1 JOIN e e2 ON e2.a = e1.b
         |  JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b),
         |w AS (SELECT CAST(SUM(d * (d - 1) // 2) AS BIGINT) AS n_wedges
         |      FROM deg)
         |SELECT (SELECT COUNT(*) FROM e) AS n_edges,
         |  (SELECT n_wedges FROM w) AS n_wedges,
         |  (SELECT n_triangles FROM tri) AS n_triangles,
         |  CASE WHEN (SELECT n_wedges FROM w) = 0 THEN 0
         |    ELSE CAST(3 * (SELECT n_triangles FROM tri) * 1000000
         |      // (SELECT n_wedges FROM w) AS BIGINT)
         |  END AS clustering_x1e6""".stripMargin),

    // 2-D skyline (min price cents, max discount basis points) over
    // lineitem — bucketed local frontiers in parallel, cross-bucket
    // pass distributed via the per-bucket census prefix max (no
    // O(survivors) task exists). Oracle: brute-force NOT EXISTS
    // dominance (a different formulation — window tie-handling bugs
    // turn it red).
    "a19_skyline" -> QueryDef(
      (s, d) => Mining.skyline2d(
          T.lineitem(s, d).select(
            floor(col("l_extendedprice") * 100).cast("long")
              .as("price_cents"),
            floor(col("l_discount") * 10000).cast("long").as("disc_bp")),
          "price_cents", "disc_bp", bucketWidth = 100000L)
        .toDF("price_cents", "disc_bp")
        .orderBy(col("price_cents")),
      """WITH p AS (
        |  SELECT DISTINCT CAST(floor(l_extendedprice * 100) AS BIGINT)
        |      AS price_cents,
        |    CAST(floor(l_discount * 10000) AS BIGINT) AS disc_bp
        |  FROM lineitem)
        |SELECT price_cents, disc_bp FROM p a
        |WHERE NOT EXISTS (
        |  SELECT 1 FROM p b
        |  WHERE b.price_cents <= a.price_cents AND b.disc_bp >= a.disc_bp
        |    AND (b.price_cents < a.price_cents OR b.disc_bp > a.disc_bp))
        |ORDER BY price_cents""".stripMargin),

    // Retention cohort matrix over events: cohort = a user's first
    // 7-day activity bucket, offset = buckets since cohort; cell =
    // distinct active users with retention as an integral x1e4 rate.
    // Two keyed shuffles (per-user min, then the matrix roll-up) —
    // the cohort join rides the same user-keyed partitioning.
    "a20_retention_cohorts" -> QueryDef(
      (s, d) => {
        val ev = T.events(s, d).select(col("user_id"),
          expr("unix_millis(ts) div 86400000 div 7").as("mo")).distinct()
        val first = ev.groupBy(col("user_id")).agg(min(col("mo")).as("cohort"))
        val act = ev.join(first, "user_id")
          .select(col("cohort"), (col("mo") - col("cohort")).as("mo_offset"),
            col("user_id"))
        val sizes = first.groupBy(col("cohort"))
          .agg(count(lit(1)).as("cohort_users"))
        act.groupBy(col("cohort"), col("mo_offset"))
          .agg(countDistinct(col("user_id")).as("n_active"))
          .join(sizes, "cohort")
          .select(col("cohort"), col("mo_offset"), col("cohort_users"),
            col("n_active"),
            expr("n_active * 10000L div cohort_users").as("retention_x1e4"))
          .orderBy(col("cohort"), col("mo_offset"))
      },
      """WITH ev AS (
        |  SELECT DISTINCT user_id,
        |    epoch_ms(ts) // 86400000 // 7 AS mo FROM events),
        |f AS (SELECT user_id, MIN(mo) AS cohort FROM ev GROUP BY 1),
        |sizes AS (SELECT cohort, COUNT(*) AS cohort_users FROM f
        |          GROUP BY 1),
        |act AS (
        |  SELECT f.cohort, ev.mo - f.cohort AS mo_offset, ev.user_id
        |  FROM ev JOIN f ON f.user_id = ev.user_id)
        |SELECT a.cohort, a.mo_offset,
        |  CAST(s.cohort_users AS BIGINT) AS cohort_users,
        |  COUNT(DISTINCT a.user_id) AS n_active,
        |  CAST(COUNT(DISTINCT a.user_id) * 10000
        |    // s.cohort_users AS BIGINT) AS retention_x1e4
        |FROM act a JOIN sizes s ON s.cohort = a.cohort
        |GROUP BY a.cohort, a.mo_offset, s.cohort_users
        |ORDER BY a.cohort, a.mo_offset""".stripMargin),

    // First-order Markov transition census over per-user event
    // sequences: one user-keyed shuffle for the lag window (ties
    // broken by event_id — a TOTAL order, so both engines see the
    // same predecessor), then a partial-agg shuffle over the tiny
    // (prev, cur) pair space. Transition probability is integral:
    // p_x1e6 = n·1e6 div n_from. The per-prev normalizer runs as a
    // window over the k² census rows, not the event table.
    "ev_transitions" -> QueryDef(
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy(col("user_id"))
          .orderBy(col("ts"), col("event_id"))
        val pairs = T.events(s, d)
          .select(col("user_id"), col("ts"), col("event_id"),
            col("event_type"))
          .withColumn("prev", lag(col("event_type"), 1).over(w))
          .filter(col("prev").isNotNull)
          .groupBy(col("prev"), col("event_type").as("cur"))
          .agg(count(lit(1)).as("n"))
        pairs
          .withColumn("n_from",
            sum(col("n")).over(Window.partitionBy(col("prev"))))
          .withColumn("p_x1e6", expr("n * 1000000 div n_from"))
          .orderBy(col("prev"), col("cur"))
      },
      """WITH seq AS (
        |  SELECT user_id, event_type,
        |    LAG(event_type) OVER (PARTITION BY user_id
        |      ORDER BY ts, event_id) AS prev
        |  FROM events),
        |p AS (
        |  SELECT prev, event_type AS cur, COUNT(*) AS n FROM seq
        |  WHERE prev IS NOT NULL GROUP BY 1, 2),
        |f AS (
        |  SELECT prev, cur, n,
        |    CAST(SUM(n) OVER (PARTITION BY prev) AS BIGINT) AS n_from
        |  FROM p)
        |SELECT prev, cur, n, n_from,
        |  CAST(n * 1000000 // n_from AS BIGINT) AS p_x1e6
        |FROM f ORDER BY prev, cur""".stripMargin),

    // Time-series gap fill + forward fill over a SPARSE daily series
    // (high-value events): the day grid comes from a sequence()
    // GENERATOR per series (no shuffle — rows fan out in place), the
    // left join lands missing days as 0, and the forward fill is one
    // partitioned window. Grid size is bounded by the series span,
    // never the event volume.
    "ts_gap_fill" -> QueryDef(
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val daily = T.events(s, d).filter(col("value") > 300)
          .groupBy(col("event_type"),
            expr("unix_millis(ts) div 86400000").as("day"))
          .agg(count(lit(1)).as("n"))
        val grid = daily.groupBy(col("event_type"))
          .agg(min(col("day")).as("mn"), max(col("day")).as("mx"))
          .select(col("event_type"),
            explode(sequence(col("mn"), col("mx"))).as("day"))
        val w = Window.partitionBy(col("event_type")).orderBy(col("day"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        grid.join(daily, Seq("event_type", "day"), "left")
          .select(col("event_type"), col("day"),
            coalesce(col("n"), lit(0L)).as("n"),
            coalesce(last(col("n"), ignoreNulls = true).over(w), lit(0L))
              .as("ff"))
          .orderBy(col("event_type"), col("day"))
      },
      """WITH d AS (
        |  SELECT event_type, epoch_ms(ts) // 86400000 AS day,
        |    COUNT(*) AS n
        |  FROM events WHERE value > 300 GROUP BY 1, 2),
        |b AS (SELECT event_type, MIN(day) AS mn, MAX(day) AS mx
        |      FROM d GROUP BY 1),
        |grid AS (SELECT event_type, unnest(range(mn, mx + 1)) AS day
        |         FROM b),
        |j AS (
        |  SELECT g.event_type, g.day, d.n FROM grid g
        |  LEFT JOIN d ON d.event_type = g.event_type AND d.day = g.day)
        |SELECT event_type, CAST(day AS BIGINT) AS day,
        |  COALESCE(n, 0) AS n,
        |  COALESCE(last_value(n IGNORE NULLS) OVER (
        |    PARTITION BY event_type ORDER BY day
        |    ROWS UNBOUNDED PRECEDING), 0) AS ff
        |FROM j ORDER BY event_type, day""".stripMargin),

    // MAD-based anomaly census over daily counts — median and MAD as
    // exact ORDER STATISTICS (lower median at rank (c+1) div 2), so
    // every compared cell is integral: no mean, no stddev, no sqrt.
    // Flag = |n - med| > 3·max(mad, 1). Two partitioned windows.
    "ts_anomaly_mad" -> QueryDef(
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val daily = T.events(s, d)
          .groupBy(col("event_type"),
            expr("unix_millis(ts) div 86400000").as("day"))
          .agg(count(lit(1)).as("n"))
        val byN = Window.partitionBy(col("event_type"))
          .orderBy(col("n"), col("day"))
        val part = Window.partitionBy(col("event_type"))
        val med = daily
          .withColumn("rn", row_number().over(byN))
          .withColumn("c", count(lit(1)).over(part))
          .filter(col("rn") === expr("(c + 1) div 2"))
          .select(col("event_type"), col("n").as("med_n"))
        val dev = daily.join(med, "event_type")
          .withColumn("ad", abs(col("n") - col("med_n")))
        val byAd = Window.partitionBy(col("event_type"))
          .orderBy(col("ad"), col("day"))
        val mad = dev
          .withColumn("rn", row_number().over(byAd))
          .withColumn("c", count(lit(1)).over(part))
          .filter(col("rn") === expr("(c + 1) div 2"))
          .select(col("event_type"), col("ad").as("mad_n"))
        dev.join(mad, "event_type")
          .withColumn("flag",
            (col("ad") > lit(3) * greatest(col("mad_n"), lit(1L)))
              .cast("long"))
          .groupBy(col("event_type"))
          .agg(first(col("med_n")).as("med_n"),
            first(col("mad_n")).as("mad_n"),
            count(lit(1)).as("n_days"),
            sum(col("flag")).as("n_anomalies"),
            sum(when(col("flag") === 1, col("day")).otherwise(0L))
              .as("anomaly_day_sum"))
          .orderBy(col("event_type"))
      },
      """WITH daily AS (
        |  SELECT event_type, epoch_ms(ts) // 86400000 AS day,
        |    COUNT(*) AS n
        |  FROM events GROUP BY 1, 2),
        |med AS (
        |  SELECT event_type, n AS med_n FROM (
        |    SELECT event_type, n,
        |      ROW_NUMBER() OVER (PARTITION BY event_type
        |        ORDER BY n, day) AS rn,
        |      COUNT(*) OVER (PARTITION BY event_type) AS c
        |    FROM daily)
        |  WHERE rn = (c + 1) // 2),
        |dev AS (
        |  SELECT d.event_type, d.day, d.n, m.med_n,
        |    abs(d.n - m.med_n) AS ad
        |  FROM daily d JOIN med m ON m.event_type = d.event_type),
        |mad AS (
        |  SELECT event_type, ad AS mad_n FROM (
        |    SELECT event_type, ad, day,
        |      ROW_NUMBER() OVER (PARTITION BY event_type
        |        ORDER BY ad, day) AS rn,
        |      COUNT(*) OVER (PARTITION BY event_type) AS c
        |    FROM dev)
        |  WHERE rn = (c + 1) // 2)
        |SELECT v.event_type,
        |  CAST(MIN(v.med_n) AS BIGINT) AS med_n,
        |  CAST(MIN(a.mad_n) AS BIGINT) AS mad_n,
        |  COUNT(*) AS n_days,
        |  CAST(SUM(CASE WHEN v.ad > 3 * greatest(a.mad_n, 1)
        |    THEN 1 ELSE 0 END) AS BIGINT) AS n_anomalies,
        |  CAST(SUM(CASE WHEN v.ad > 3 * greatest(a.mad_n, 1)
        |    THEN v.day ELSE 0 END) AS BIGINT) AS anomaly_day_sum
        |FROM dev v JOIN mad a ON a.event_type = v.event_type
        |GROUP BY v.event_type
        |ORDER BY v.event_type""".stripMargin),

    // Order-exact EWMA (alpha = 1/2) of the exact-decimal daily value
    // total per event type. The fold shape (acc+x)*0.5 is FMA-proof
    // and halving-exact, so the double cells hash-match bit-for-bit.
    "ts_ewma" -> QueryDef(
      (s, d) => T.events(s, d)
        .groupBy(col("event_type"),
          expr("unix_millis(ts) div 86400000").as("day"))
        .agg(T.decSum(col("value")).as("x"))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_days"),
          Mining.ewmaHalf(
            sort_array(collect_list(struct(col("day"), col("x"))))
              .getField("x")).as("ewma"))
        .orderBy(col("event_type")),
      """WITH d AS (
        |  SELECT event_type, epoch_ms(ts) // 86400000 AS day,
        |    CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS x
        |  FROM events GROUP BY 1, 2),
        |l AS (
        |  SELECT event_type, COUNT(*) AS n_days, list(x ORDER BY day) AS xs
        |  FROM d GROUP BY 1)
        |SELECT event_type, n_days,
        |  list_reduce(list_prepend(0.0, xs), (acc, x) -> (acc + x) * 0.5)
        |    AS ewma
        |FROM l ORDER BY event_type""".stripMargin))
}
