package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{Bloom, Sketches}

class BloomSketchSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkTest.session
  import spark.implicits._

  test("bloom filter: zero false negatives across configs, fp rate sane") {
    val rnd = new scala.util.Random(7)
    val universe = (1 to 2000).map(_ => rnd.nextLong().abs).distinct
    val members = universe.take(150)
    val dim = members.toDF("key")
    for ((bits, k) <- Seq((1024, 2), (2048, 4), (256, 1))) {
      val set = Bloom.buildBits(dim, $"key", bits, k)
      val flags = universe.toDF("key")
        .select($"key", Bloom.mightContain($"key", set, bits, k).as("p"))
        .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
      members.foreach(m => assert(flags(m),
        s"FALSE NEGATIVE for $m at bits=$bits k=$k"))
      val nonMembers = universe.drop(150)
      val fps = nonMembers.count(flags(_))
      assert(fps < nonMembers.size,
        s"bitmap saturated (all non-members pass) at bits=$bits k=$k")
    }
  }

  test("sketch builders exclude NULL values (count-distinct semantics)") {
    val withNulls = Seq(Some("a"), Some("b"), None, Some("a"), None)
      .toDF("v")
    val clean = Seq("a", "b", "a").toDF("v")
    // HLL: identical register frames and estimate with and without nulls
    assert(Sketches.hllRegisters(withNulls, $"v").collect().toSet ===
      Sketches.hllRegisters(clean, $"v").collect().toSet)
    // CMS: no null cells, so driver-side table embedding can't NPE
    val cms = Sketches.cmsCounts(withNulls, $"v", d = 2, w = 16)
    assert(cms.filter($"bucket".isNull).count() === 0)
    assert(Sketches.cmsTable(cms, d = 2, w = 16).sum === 2L * 3)
    // histogram: nulls are not binned (bin 0 is not inflated)
    val hist = Sketches.histogramCounts(
      Seq(Some(1.0), None, Some(1.5), None).toDF("v"), $"v", 0.0, 1.0, 4)
    assert(hist.collect().map(r => r.getInt(0) -> r.getLong(1)).toMap ===
      Map(1 -> 2L))
  }

  test("HLL estimate of an empty frame is 0, not NULL") {
    val est = Sketches.hllEstimate(Seq.empty[String].toDF("v"), $"v")
      .select($"hll_estimate_x100").head()
    assert(!est.isNullAt(0) && est.getLong(0) === 0L)
  }

  test("histogram clamps extreme outliers to the top bin instead of overflowing") {
    // floor((1e18 - 0)/0.001) is far beyond Int range — must clamp on
    // the long, not crash (ANSI cast) or wrap into bin 0
    val hist = Sketches.histogramCounts(
      Seq(0.5, 1e18).toDF("v"), $"v", 0.0, 0.001, nBins = 8)
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(hist === Map(7 -> 2L)) // 0.5/0.001 = 500 also clamps to top
  }

  test("histogram excludes NaN like NULL instead of binning it at 0") {
    val df = Seq(5.0, Double.NaN, 15.0, Double.NaN).toDF("v")
      .unionByName(Seq.empty[Double].toDF("v")
        .select(lit(null).cast("double").as("v")))
    val hist = Sketches.histogramCounts(df, $"v", lo = 0.0,
      width = 10.0, nBins = 4).orderBy("bin").collect()
      .map(r => (r.getInt(0), r.getLong(1))).toSeq
    assert(hist === Seq(0 -> 1L, 1 -> 1L), s"NaN leaked into a bin: $hist")
    val by = Seq(("a", 5.0), ("a", Double.NaN), ("b", Double.NaN))
      .toDF("g", "v")
    val histBy = Sketches.histogramCountsBy(by, $"v", Seq("g"),
      0.0, 10.0, 4).orderBy("g", "bin").collect()
      .map(r => (r.getString(0), r.getInt(1), r.getLong(2))).toSeq
    assert(histBy === Seq(("a", 0, 1L)))
  }

  test("histogram quantile estimate brackets the true ranked value") {
    val rnd = new scala.util.Random(11)
    val vals = (1 to 5000).map(_ => rnd.nextDouble() * 500.0)
    val df = vals.toDF("v")
    val hist = Sketches.histogramCounts(df, $"v", lo = 0.0, width = 10.0,
      nBins = 64)
    val qs = Seq(500, 900, 990)
    val got = Sketches.histogramQuantiles(hist, qs, loX100 = 0L,
        widthX100 = 1000L)
      .collect().map(r => (r.getInt(0), r.getLong(2), r.getLong(4))).toSeq
    val sorted = vals.sorted
    got.foreach { case (q, target, estHiX100) =>
      val truth = sorted((target - 1).toInt) // rank is 1-based
      val estHi = estHiX100 / 100.0
      assert(truth <= estHi && truth > estHi - 10.0,
        s"q=$q: true ranked value $truth outside (${estHi - 10.0}, $estHi]")
    }
  }

  test("histogram sketch merges additively across shards") {
    val vals = (1 to 4000).map(i => (i % 7, (i * 37 % 5000) / 10.0))
    val df = vals.toDF("shard", "v")
    val direct = Sketches.histogramCounts(df, $"v", 0.0, 10.0, 64)
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val merged = (0 until 7).map(s =>
        Sketches.histogramCounts(df.filter($"shard" === s), $"v",
          0.0, 10.0, 64))
      .reduce(_ unionByName _)
      .groupBy($"bin").agg(sum($"cnt").as("cnt"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(merged === direct)
  }
}
