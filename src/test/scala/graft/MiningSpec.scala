package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Mining

/** Mining operator tests: prefix-filter losslessness proved in-engine
  * against a brute-force all-pairs Jaccard, PageRank against a
  * hand-solved 3-node graph, EWMA against its closed form.
  */
class MiningSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkTest.session
  import spark.implicits._

  test("prefixJaccardPairs equals brute-force all-pairs at tau=1/2") {
    val docs = Seq(
      (0L, "red blue green yellow"),
      (1L, "red blue green purple"),          // J(0,1)=3/5 >= 1/2
      (2L, "red blue cyan magenta lime"),     // J(0,2)=2/7 < 1/2
      (3L, "red blue green yellow"),          // J(0,3)=1 exact dup
      (4L, "solo tokens only here nothing shared"),
      (5L, "green yellow red blue"),          // J(0,5)=1 (order-insensitive)
      (6L, "a b c d e f g h"),
      (7L, "a b c d e f g x")                 // J(6,7)=7/9 >= 1/2
    ).toDF("doc_id", "text")

    val got = Mining.prefixJaccardPairs(docs, "doc_id", "text", 1, 2)
      .select("id1", "id2", "n_inter").as[(Long, Long, Long)]
      .collect().toSet

    // brute force: all C(n,2) pairs, exact distinct-token Jaccard
    val toks = docs.collect().map(r =>
      r.getLong(0) -> r.getString(1).trim.split("\\s+").toSet).toMap
    val want = (for {
      i <- toks.keys; j <- toks.keys if i < j
      inter = (toks(i) & toks(j)).size
      if 3 * inter >= toks(i).size + toks(j).size
    } yield (i, j, inter.toLong)).toSet

    assert(got === want)
    assert(want.contains((0L, 3L, 4L)) && want.contains((6L, 7L, 7L)))
    assert(!want.exists(p => p._1 == 4L || p._2 == 4L))
  }

  test("prefixJaccardPairs handles single-token and identical docs") {
    val docs = Seq((1L, "x"), (2L, "x"), (3L, "y")).toDF("doc_id", "text")
    val got = Mining.prefixJaccardPairs(docs, "doc_id", "text", 1, 2)
      .select("id1", "id2").as[(Long, Long)].collect().toSet
    assert(got === Set((1L, 2L)))
  }

  test("pageRank matches the hand-solved recurrence on a triangle+spoke") {
    // 1<->2, 2<->3, 1<->3 (triangle), 4->1 with 1->4 (spoke): degrees
    // 1:3, 2:2, 3:2, 4:1. Replay the integral recurrence in Scala.
    val pairs = Seq((1L, 2L), (2L, 3L), (1L, 3L), (1L, 4L))
    val edges = (pairs ++ pairs.map(_.swap)).toDF("src", "dst")
    val got = Mining.pageRank(edges, "src", "dst", iterations = 10)
      .as[(Long, Long)].collect().toMap

    val deg = Map(1L -> 3L, 2L -> 2L, 3L -> 2L, 4L -> 1L)
    val out = Map(1L -> Seq(2L, 3L, 4L), 2L -> Seq(1L, 3L),
      3L -> Seq(1L, 2L), 4L -> Seq(1L))
    var pr = deg.map { case (n, _) => n -> 1000000000000L / 4 }
    for (_ <- 1 to 10) {
      val contrib = scala.collection.mutable.Map[Long, Long]()
        .withDefaultValue(0L)
      for ((u, vs) <- out; v <- vs) contrib(v) += pr(u) / deg(u)
      pr = deg.map { case (n, _) =>
        n -> (150000000000L + 85L * contrib(n) / 100L) }
    }
    assert(got === pr)
    // hub 1 ranks highest, leaf 4 lowest
    assert(got(1L) > got(2L) && got(2L) === got(3L) && got(3L) > got(4L))
  }

  test("pageRank symmetric 2-cycle after one iteration") {
    val edges = Seq((1L, 2L), (2L, 1L)).toDF("src", "dst")
    val got = Mining.pageRank(edges, "src", "dst", iterations = 1)
      .as[(Long, Long)].collect().toMap
    // symmetric 2-cycle: each gets base + 85% of the other's full rank
    val expected = 150000000000L + 85L * 500000000000L / 100L
    assert(got === Map(1L -> expected, 2L -> expected))
  }

  test("ewmaHalf equals the closed form sum x_i / 2^(n-i+1)") {
    val xs = Seq(8.0, 4.0, 2.0, 16.0)
    val got = Seq(Tuple1(xs)).toDF("xs")
      .select(Mining.ewmaHalf(col("xs")).as("e")).as[Double].head()
    // s_t = (s_{t-1} + x_t)/2 with s_0 = 0: exact in powers of two
    val want = xs.zipWithIndex.map { case (x, i) =>
      x / math.pow(2, xs.length - i).toLong }.sum
    assert(got === want)
  }

  test("editDistancePairs equals brute force, short strings included") {
    // q=2, k=1: shortLen=4 — "ab"/"ax"/"b" exercise the short bucket,
    // the rest the gram-filtered path; "aaaa"/"aaab" has repeated
    // grams (bag semantics matter: set-intersection would overcount)
    val strs = Seq("ab", "ax", "b", "abcdef", "abcdxf", "abcdefg",
      "zzzzzz", "aaaa", "aaab", "aaaaa").toDF("s")
    val got = Mining.editDistancePairs(strs, "s", k = 1, q = 2)
      .as[(String, String, Int)].collect().toSet

    def ed(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
        if (i == 0) j else if (j == 0) i else 0 }
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    val ss = strs.as[String].collect().distinct
    val want = (for {
      a <- ss; b <- ss if a < b
      e = ed(a, b) if e <= 1
    } yield (a, b, e)).toSet
    assert(got === want)
    assert(want.contains(("aaaa", "aaab", 1)) &&
      want.contains(("aaaa", "aaaaa", 1)) && want.contains(("ab", "ax", 1)))
  }

  test("nearDupAgainstCorpus: exact clone flagged, alien doc novel") {
    val corpus = Seq(
      (1L, "alpha beta gamma delta epsilon zeta"),
      (2L, "one two three four five six seven")).toDF("doc_id", "text")
    val batch = Seq(
      (10L, "alpha beta gamma delta epsilon zeta"), // clone of 1
      (11L, "totally unrelated words nothing here at all")
    ).toDF("doc_id", "text")
    val got = graft.operators.Dedup.nearDupAgainstCorpus(
        corpus, batch, "doc_id", "text",
        numHashes = 32, bands = 16, shingleSize = 1, minEq = 16)
      .as[(Long, Long, Long, Int)].collect()
      .map(r => r._1 -> r).toMap
    assert(got(10L)._3 === 32L && got(10L)._4 === 1) // identical sigs
    assert(got(11L)._2 === 0L && got(11L)._4 === 0)  // no candidates
  }

  test("triangleCensus counts the known triangles of a hand-built graph") {
    // K4 on 1-4 (4 triangles) + pendant 5-1 + disconnected edge 6-7
    val edges = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L),
      (3L, 4L), (1L, 5L), (6L, 7L)).toDF("a", "b")
    val r = Mining.triangleCensus(edges, "a", "b")
      .as[(Long, Long, Long, Long)].head()
    assert(r._1 === 8L)  // edges
    // degrees: 1:4, 2:3, 3:3, 4:3, 5:1, 6:1, 7:1 -> wedges 6+3+3+3=15
    assert(r._2 === 15L)
    assert(r._3 === 4L)  // C(4,3) triangles in K4
    assert(r._4 === 3L * 4L * 1000000L / 15L)
  }

  test("triangleCensus: hub star has zero triangles, many wedges") {
    val star = (2L to 9L).map(i => (1L, i)).toDF("a", "b")
    val r = Mining.triangleCensus(star, "a", "b")
      .as[(Long, Long, Long, Long)].head()
    assert(r._3 === 0L && r._4 === 0L && r._2 === 28L) // C(8,2)
  }

  test("skyline2d equals brute-force dominance, duplicates collapsed") {
    val pts = Seq((1L, 1L), (1L, 5L), (2L, 7L), (2L, 7L), (3L, 7L),
      (3L, 6L), (4L, 9L), (5L, 9L), (5L, 2L), (6L, 1L)).toDF("x", "y")
    val got = Mining.skyline2d(pts, "x", "y", bucketWidth = 2L)
      .as[(Long, Long)].collect().toSet
    val ps = pts.as[(Long, Long)].collect().distinct
    val want = ps.filter { case (x, y) => !ps.exists { case (a, b) =>
      a <= x && b >= y && (a < x || b > y) } }.toSet
    assert(got === want)
    assert(got === Set((1L, 5L), (2L, 7L), (4L, 9L)))
  }

  test("skyline2d anti-correlated worst case: full frontier, bounded tasks") {
    // Every distinct point is on the frontier (x=i, y=i: paying more
    // x always buys strictly more y, so nothing dominates anything) —
    // the case where a "global window over survivors" phase would see
    // all N rows in one task. bucketWidth=1 forces one bucket per
    // point and superBuckets=4 forces the census prefix through BOTH
    // window levels (inner per-super partitions of <=4 rows, the top
    // window over N/4 super rows); the plan's only unpartitioned
    // window runs over census rows, never points.
    val n = 257
    val pts = (0 until n).map(i => (i.toLong, i.toLong)).toDF("x", "y")
    val got = Mining.skyline2d(pts, "x", "y",
        bucketWidth = 1L, superBuckets = 4L)
      .as[(Long, Long)].collect().toSet
    assert(got.size === n)
    assert(got === (0 until n).map(i => (i.toLong, i.toLong)).toSet)
  }

  test("skyline2d cross-super-bucket domination and census ties") {
    // The dominator sits in super-bucket 0 while victims live in
    // later super-buckets (superBuckets=2, bucketWidth=1): proves the
    // top-level prefix carries across super boundaries. y-ties across
    // buckets must be dominated (earlier bucket => strictly smaller
    // x, so y >= suffices).
    val pts = Seq((0L, 9L), (1L, 9L), (3L, 9L), (5L, 8L), (6L, 10L),
      (7L, 10L)).toDF("x", "y")
    val got = Mining.skyline2d(pts, "x", "y",
        bucketWidth = 1L, superBuckets = 2L)
      .as[(Long, Long)].collect().toSet
    assert(got === Set((0L, 9L), (6L, 10L)))
  }

  test("gap-fill forward fill: leading gap stays 0, interior gap carries") {
    // series with a hole at day 2 and nothing before day 1
    import org.apache.spark.sql.expressions.Window
    val daily = Seq(("a", 1L, 5L), ("a", 3L, 7L)).toDF("k", "day", "n")
    val grid = daily.groupBy(col("k"))
      .agg(min(col("day")).as("mn"), max(col("day")).as("mx"))
      .select(col("k"), explode(sequence(col("mn"), col("mx"))).as("day"))
    val w = Window.partitionBy(col("k")).orderBy(col("day"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val got = grid.join(daily, Seq("k", "day"), "left")
      .select(col("day"), coalesce(col("n"), lit(0L)).as("n"),
        coalesce(last(col("n"), ignoreNulls = true).over(w), lit(0L))
          .as("ff"))
      .orderBy(col("day")).as[(Long, Long, Long)].collect().toSeq
    assert(got === Seq((1L, 5L, 5L), (2L, 0L, 5L), (3L, 7L, 7L)))
  }

  test("assocRules: confidence bounded, rules symmetric in pair count") {
    val b = Seq(
      (1L, 10L), (1L, 20L), (2L, 10L), (2L, 20L), (3L, 10L), (3L, 20L),
      (4L, 10L), (5L, 30L)).toDF("bk", "it")
    val rules = Mining.assocRules(b, "bk", "it", 3L)
      .as[(Long, Long, Long, Long, Long)].collect()
    assert(rules.length === 2) // 10->20 and 20->10
    val byAnte = rules.map(r => r._1 -> r).toMap
    // n_10 = 4, n_20 = 3, n_xy = 3, N = 5
    assert(byAnte(10L)._4 === 3L * 1000000L / 4L)   // conf 10->20
    assert(byAnte(20L)._4 === 1000000L)             // conf 20->10 = 1
    assert(byAnte(10L)._5 === byAnte(20L)._5)       // lift symmetric
    assert(byAnte(10L)._5 === 3L * 5L * 1000000L / (4L * 3L))
    assert(rules.forall(_._4 <= 1000000L))
  }
}
