package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{AnnIndex, Similarity}
import java.nio.file.Files

/** The persisted IVF-PQ index lifecycle: build-once/probe-many
  * equality with the inline join, incremental append that provably
  * re-encodes nothing, and the crash windows of both commits. */
class AnnIndexSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkTest.session
  import spark.implicits._

  private val rng = new scala.util.Random(61)
  private lazy val all = (0 until 400).map(i =>
    (i.toLong, Array.fill(16)(rng.nextGaussian().toFloat)))
    .toDF("vec_id", "embedding").cache()
  private lazy val corpus = all.filter($"vec_id" % 50 =!= 0)
  private lazy val queries = all.filter($"vec_id" % 50 === 0)
  private lazy val cents = Similarity.trainIvfCentroids(corpus,
    "vec_id", "embedding", dim = 16, nlist = 4, iters = 3,
    sampleSize = 400)
  private lazy val books = Similarity.trainPqCodebooks(corpus,
    "vec_id", "embedding", dim = 16, m = 4, ksub = 8, iters = 3,
    sampleSize = 400)

  private def rowsOf(df: org.apache.spark.sql.DataFrame) = df
    .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    .toSeq.sortBy(t => (t._1, -t._3, t._2))

  private def census(fs: org.apache.hadoop.fs.FileSystem,
      dir: String): Seq[(String, Long, Long)] = {
    val root = fs.makeQualified(new org.apache.hadoop.fs.Path(dir))
    if (!fs.exists(root)) return Seq.empty
    val it = fs.listFiles(root, true)
    val buf = scala.collection.mutable.ArrayBuffer
      .empty[(String, Long, Long)]
    while (it.hasNext) {
      val f = it.next()
      buf += ((f.getPath.toString.stripPrefix(root.toString),
        f.getLen, f.getModificationTime))
    }
    buf.sortBy(_._1).toSeq
  }

  test("probe from the built index is bit-identical to the inline " +
      "IVF-PQ join over the same corpus and quantizer") {
    val dir = Files.createTempDirectory("graft_ann_eq").toFile
      .getAbsolutePath + "/idx"
    AnnIndex.build(spark, dir, corpus, "vec_id", "embedding",
      cents, books)
    val fromIndex = AnnIndex.probe(spark, dir, queries, "vec_id",
      "embedding", k = 3, nprobe = 2, shortlist = 12)
    val inline = Similarity.knnJoinIvfPq(corpus, queries, "vec_id",
      "embedding", k = 3, cents, books, nprobe = 2, shortlist = 12)
    assert(rowsOf(fromIndex) === rowsOf(inline))
    // a SECOND probe answers from the same artifact (build-once /
    // probe-many), different k — no rebuild, same equality
    val again = AnnIndex.probe(spark, dir, queries, "vec_id",
      "embedding", k = 5, nprobe = 2, shortlist = 12)
    val inline5 = Similarity.knnJoinIvfPq(corpus, queries, "vec_id",
      "embedding", k = 5, cents, books, nprobe = 2, shortlist = 12)
    assert(rowsOf(again) === rowsOf(inline5))
  }

  test("append encodes ONLY the batch: base and prior deltas are " +
      "byte-identical, probes see the union") {
    val dir = Files.createTempDirectory("graft_ann_app").toFile
      .getAbsolutePath + "/idx"
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val slabA = corpus.filter($"vec_id" % 7 =!= 3)
    val slabB = corpus.filter($"vec_id" % 7 === 3 &&
      $"vec_id" % 2 === 0)
    val slabC = corpus.filter($"vec_id" % 7 === 3 &&
      $"vec_id" % 2 =!= 0)
    AnnIndex.build(spark, dir, slabA, "vec_id", "embedding",
      cents, books)
    val base0 = census(fs, s"$dir/base")
    AnnIndex.append(spark, dir, slabB, "vec_id", "embedding")
    // the no-re-encode proof: every base file untouched (a rewrite
    // changes task-UUID names, lengths, mtimes), one delta committed
    assert(base0.nonEmpty && census(fs, s"$dir/base") === base0,
      "append rewrote base files — the full corpus was re-encoded")
    assert(fs.exists(new org.apache.hadoop.fs.Path(s"$dir/delta-000001")))
    val delta1 = census(fs, s"$dir/delta-000001")
    AnnIndex.append(spark, dir, slabC, "vec_id", "embedding")
    assert(census(fs, s"$dir/base") === base0)
    assert(census(fs, s"$dir/delta-000001") === delta1,
      "second append touched the first delta")
    // probe over base+deltas == inline over the full corpus: the
    // incremental path loses nothing and double-counts nothing
    val fromIndex = AnnIndex.probe(spark, dir, queries, "vec_id",
      "embedding", k = 3, nprobe = 2, shortlist = 12)
    val inline = Similarity.knnJoinIvfPq(corpus, queries, "vec_id",
      "embedding", k = 3, cents, books, nprobe = 2, shortlist = 12)
    assert(rowsOf(fromIndex) === rowsOf(inline))
  }

  test("build swap crash: the index's only copy at _retired is " +
      "restored by the next probe; stray delta staging is swept and " +
      "never visible") {
    val dir = Files.createTempDirectory("graft_ann_cr").toFile
      .getAbsolutePath + "/idx"
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    AnnIndex.build(spark, dir, corpus, "vec_id", "embedding",
      cents, books)
    val expect = rowsOf(AnnIndex.probe(spark, dir, queries, "vec_id",
      "embedding", k = 3, nprobe = 2, shortlist = 12))
    // crash window between build's two renames: only copy at _retired
    assert(fs.rename(new org.apache.hadoop.fs.Path(dir),
      new org.apache.hadoop.fs.Path(dir + "_retired")))
    val healed = rowsOf(AnnIndex.probe(spark, dir, queries, "vec_id",
      "embedding", k = 3, nprobe = 2, shortlist = 12))
    assert(healed === expect, "orphaned index not restored")
    // a crashed append: staged delta written but never renamed —
    // swept by the next op, and its rows never surface
    val stray = corpus.filter($"vec_id" === 1L)
      .withColumn("vec_id", lit(999999L))
    intercept[RuntimeException] {
      // simulate by staging manually: write, then "crash" = no rename
      stray.select(col("vec_id").as("corpus_id"),
          col("embedding").as("vec"))
        .withColumn("cell", Similarity.ivfAssignment(col("vec"), cents))
        .withColumn("codes", Similarity.pqEncode(col("vec"), books))
        .withColumn("cn", Similarity.norm(col("vec")))
        .write.partitionBy("cell")
        .parquet(s"$dir/_delta_staging")
      sys.error("crash before delta rename")
    }
    val after = rowsOf(AnnIndex.probe(spark, dir, queries, "vec_id",
      "embedding", k = 3, nprobe = 2, shortlist = 12))
    assert(after === expect, "uncommitted delta rows leaked into a probe")
    // probes are non-destructive (a reader must never delete what
    // could be a live writer's staging) — the stray dir survives the
    // probe, invisible; the next WRITER sweeps it
    assert(fs.exists(new org.apache.hadoop.fs.Path(s"$dir/_delta_staging")),
      "a probe must not destructively sweep writer staging")
    AnnIndex.append(spark, dir, corpus.filter($"vec_id" < 0),
      "vec_id", "embedding")
    assert(!fs.exists(new org.apache.hadoop.fs.Path(s"$dir/_delta_staging")),
      "the next writer must sweep stray delta staging")
  }

  test("probeAtRecall: dial and pairs bit-identical to the inline " +
      "recall join over the same corpus; sample mode applies the " +
      "dial to all queries") {
    val dir = Files.createTempDirectory("graft_ann_rc").toFile
      .getAbsolutePath + "/idx"
    // split build/append so the calibration also covers the
    // incremental layout (base + one delta)
    AnnIndex.build(spark, dir, corpus.filter($"vec_id" % 7 =!= 3),
      "vec_id", "embedding", cents, books)
    AnnIndex.append(spark, dir, corpus.filter($"vec_id" % 7 === 3),
      "vec_id", "embedding")
    def full(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
        r.getInt(3), r.getLong(4)))
      .toSeq.sortBy(t => (t._1, -t._3, t._2))
    val fromIndex = full(AnnIndex.probeAtRecall(spark, dir, queries,
      "vec_id", "embedding", k = 3, nprobe = 4,
      shortlists = Seq(3, 6, 12), targetX100 = 50))
    val inline = full(Similarity.knnJoinIvfPqAtRecall(corpus, queries,
      "vec_id", "embedding", k = 3, cents, books, nprobe = 4,
      shortlists = Seq(3, 6, 12), targetX100 = 50))
    assert(fromIndex === inline,
      "persisted-index recall dial diverged from the inline join")
    // sample mode: dial from the seeded subset, pairs cover all
    // queries, reported recall constant
    val sampled = full(AnnIndex.probeAtRecall(spark, dir, queries,
      "vec_id", "embedding", k = 3, nprobe = 4,
      shortlists = Seq(3, 6, 12), targetX100 = 50, sampleQueries = 4))
    assert(Seq(3, 6, 12).contains(sampled.head._4))
    assert(sampled.map(_._1).distinct.length === queries.count().toInt)
    assert(sampled.map(_._5).distinct.length === 1)
  }

  test("compact folds deltas into one base without re-encoding: " +
      "probe identical, components bounded, appends continue") {
    val dir = Files.createTempDirectory("graft_ann_cp").toFile
      .getAbsolutePath + "/idx"
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    AnnIndex.build(spark, dir, corpus.filter($"vec_id" % 7 =!= 3),
      "vec_id", "embedding", cents, books)
    AnnIndex.append(spark, dir,
      corpus.filter($"vec_id" % 7 === 3 && $"vec_id" % 2 === 0),
      "vec_id", "embedding")
    AnnIndex.append(spark, dir,
      corpus.filter($"vec_id" % 7 === 3 && $"vec_id" % 2 =!= 0),
      "vec_id", "embedding")
    val expect = rowsOf(AnnIndex.probe(spark, dir, queries, "vec_id",
      "embedding", k = 3, nprobe = 2, shortlist = 12))
    assert(AnnIndex.compact(spark, dir) === 2)
    def components() = fs.listStatus(new org.apache.hadoop.fs.Path(dir))
      .map(_.getPath.getName)
      .filter(n => n == "base" || n.startsWith("delta-")).sorted.toSeq
    assert(components() === Seq("base"),
      "compact must fold every delta into the base")
    assert(rowsOf(AnnIndex.probe(spark, dir, queries, "vec_id",
      "embedding", k = 3, nprobe = 2, shortlist = 12)) === expect,
      "compaction changed probe results")
    // idempotent on an already-compact index
    assert(AnnIndex.compact(spark, dir) === 0)
    // the lifecycle continues: post-compact appends restart the
    // delta chain and probes see them
    AnnIndex.append(spark, dir,
      corpus.filter($"vec_id" === 1L)
        .withColumn("vec_id", lit(777777L)), "vec_id", "embedding")
    assert(components() === Seq("base", "delta-000001"))
    val withNew = AnnIndex.probe(spark, dir,
      corpus.filter($"vec_id" === 1L), "vec_id", "embedding",
      k = 3, nprobe = 2, shortlist = 12)
    assert(withNew.collect().exists(_.getLong(1) === 777777L),
      "a probe must see vectors appended after a compact " +
        "(777777 clones query 1's vector — cosine 1.0)")
  }

  test("empty append is a clean no-op; empty build refuses to commit " +
      "an unreadable artifact") {
    val dir = Files.createTempDirectory("graft_ann_empty").toFile
      .getAbsolutePath + "/idx"
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    // a 0-row corpus must not produce an index that bricks every read
    val e = intercept[IllegalArgumentException] {
      AnnIndex.build(spark, dir, corpus.filter($"vec_id" < 0),
        "vec_id", "embedding", cents, books)
    }
    assert(e.getMessage.contains("EMPTY corpus"))
    assert(!fs.exists(new org.apache.hadoop.fs.Path(dir)))
    // a routine no-new-rows day: append(empty) commits nothing and
    // the index stays fully readable
    AnnIndex.build(spark, dir, corpus, "vec_id", "embedding",
      cents, books)
    val expect = rowsOf(AnnIndex.probe(spark, dir, queries, "vec_id",
      "embedding", k = 3, nprobe = 2, shortlist = 12))
    AnnIndex.append(spark, dir, corpus.filter($"vec_id" < 0),
      "vec_id", "embedding")
    assert(fs.listStatus(new org.apache.hadoop.fs.Path(dir))
      .map(_.getPath.getName).count(_.startsWith("delta-")) === 0,
      "empty append must not commit a delta")
    assert(rowsOf(AnnIndex.probe(spark, dir, queries, "vec_id",
      "embedding", k = 3, nprobe = 2, shortlist = 12)) === expect)
  }

  test("append fails fast on a column-contract mismatch; probe fails " +
      "fast on a missing index") {
    val dir = Files.createTempDirectory("graft_ann_ff").toFile
      .getAbsolutePath + "/idx"
    AnnIndex.build(spark, dir, corpus.limit(50), "vec_id", "embedding",
      cents, books)
    val e = intercept[IllegalArgumentException] {
      AnnIndex.append(spark, dir, corpus.limit(5)
        .withColumnRenamed("vec_id", "other_id"), "other_id", "embedding")
    }
    assert(e.getMessage.contains("was built on"))
    intercept[IllegalArgumentException] {
      AnnIndex.probe(spark, dir + "_nope", queries, "vec_id",
        "embedding", k = 3)
    }
  }
}
