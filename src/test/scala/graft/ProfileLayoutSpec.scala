package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Sketches, Similarity, TextAnalysis}

/** Specs for the profiling / layout batch: stableRowIds (dense
  * numbering without a global sort), kmeansStepCensus (one Lloyd
  * iteration), hllProfileBy (per-group estimate with correction), and
  * the shard-merge identities of the histogram and CMS sketches.
  */
class ProfileLayoutSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkTest.session
  import spark.implicits._

  test("stableRowIds: dense contiguous ids in key order, sparse keys") {
    // keys straddle bucket boundaries (width 10) and are non-dense,
    // unsorted, and include a bucket with a single row
    val keys = Seq(3L, 10L, 4097L, 5000L, 100000L, 7L, 11L, 9L)
    val out = TextAnalysis.stableRowIds(keys.toDF("k"), "k",
        bucketWidth = 10L)
      .orderBy($"k").collect()
    val expected = keys.sorted.zipWithIndex
    assert(out.map(r => (r.getLong(0), r.getLong(1))).toSeq ===
      expected.map { case (k, i) => (k, i.toLong) })
  }

  test("stableRowIds: bucket width does not change the assignment") {
    val keys = (1 to 500).map(_ * 7L).reverse
    val df = keys.toDF("k")
    val a = TextAnalysis.stableRowIds(df, "k", bucketWidth = 1L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val b = TextAnalysis.stableRowIds(df, "k", bucketWidth = 100000L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(a === b)
    assert(a.values.toSeq.sorted === (0L until 500L))
  }

  test("kmeansStepCensus: hand-replayed two-cell fixture") {
    val centroids = Seq(Seq(0.0, 0.0), Seq(10.0, 10.0))
    val vecs = Seq(
      (1L, Array(0.1f, 0.2f)),   // cell 0
      (2L, Array(9.9f, 10.3f)),  // cell 1
      (3L, Array(0.3f, -0.4f)),  // cell 0
      (4L, Array(10.2f, 9.8f)))  // cell 1
    val out = Similarity.kmeansStepCensus(
        vecs.toDF("vec_id", "embedding"), "vec_id", "embedding",
        centroids)
      .collect().map(r => r.getInt(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap

    // independent replay of the documented arithmetic
    def cells(members: Seq[Array[Float]], cell: Int) = {
      val dims = members.head.length
      val means = (0 until dims).map { j =>
        val ys = members.map(v =>
          math.floor(v(j).toDouble * 10000).toLong + 100000L)
        ys.sum / members.size - 100000L
      }
      val olds = centroids(cell).map(x => math.floor(x * 10000).toLong)
      (means.sum, means.zip(olds).map { case (m, o) => math.abs(m - o) }.sum)
    }
    val (sum0, shift0) = cells(Seq(vecs(0)._2, vecs(2)._2), 0)
    val (sum1, shift1) = cells(Seq(vecs(1)._2, vecs(3)._2), 1)
    assert(out(0) === ((2L, sum0, shift0, 4L)))  // ids 1+3
    assert(out(1) === ((2L, sum1, shift1, 6L)))  // ids 2+4
  }

  test("hllProfileBy: small groups hit the correction, matches global") {
    val df = (1 to 5000).map(i => (s"v$i", "wide")).toDF("v", "g")
      .union(Seq.tabulate(40)(i => (s"x${i % 4}", "narrow"))
        .toDF("v", "g"))
    val prof = Sketches.hllProfileBy(df, $"v", Seq("g"), p = 8)
      .collect().map(r => r.getString(0) -> r).toMap
    // narrow group: 4 distincts -> linear-counting regime; the
    // estimate must equal the literal-table value for its zeros
    val narrow = prof("narrow")
    val zeros = narrow.getLong(2).toInt
    assert(zeros > 0)
    assert(narrow.getLong(4) === Sketches.linearTable(256)(zeros - 1))
    // wide group: agrees with the ungrouped estimator on the same data
    val global = Sketches.hllEstimate(
        df.filter($"g" === "wide"), $"v", p = 8)
      .collect().head
    assert(prof("wide").getLong(4) === global.getLong(3))
  }

  test("weighted priority sample: selection is biased toward weight") {
    // 1000 ids, weights 1 or 100 in equal halves: the h div w order
    // must over-select the heavy half decisively
    val df = (1 to 1000).map(i =>
      (i.toLong, if (i % 2 == 0) 100L else 1L)).toDF("id", "w")
    val sample = df
      .select($"id", $"w", graft.operators.Dedup.portableHash(
        concat(lit("wsample1|"), $"id".cast("string")), 15).as("h"))
      .selectExpr("id", "w", "h div w AS priority")
      .orderBy($"priority", $"id").limit(100)
      .collect()
    val heavy = sample.count(_.getLong(1) == 100L)
    assert(heavy > 90, s"heavy-weight rows in sample: $heavy of 100")
  }

  test("histogram and CMS sketches: shard-merge == direct") {
    val rnd = new scala.util.Random(11)
    val rows = (1 to 3000).map(_ =>
      (rnd.nextInt(8), rnd.nextDouble() * 640, s"k${rnd.nextInt(200)}"))
    val df = rows.toDF("shard", "x", "key")

    val histDirect = Sketches.histogramCounts(df, $"x", 0.0, 10.0, 64)
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val histMerged = Sketches.histogramCountsBy(df, $"x", Seq("shard"),
        0.0, 10.0, 64)
      .groupBy($"bin").agg(sum($"cnt").as("cnt"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(histMerged === histDirect)

    val cmsDirect = Sketches.cmsCounts(df, $"key", d = 4, w = 64)
      .collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    val cmsMerged = Sketches.cmsCountsBy(df, $"key", Seq("shard"),
        d = 4, w = 64)
      .groupBy($"row", $"bucket").agg(sum($"cnt").as("cnt"))
      .collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(cmsMerged === cmsDirect)
  }
}
