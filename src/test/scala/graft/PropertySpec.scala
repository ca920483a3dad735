package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.operators.{Dedup, MergeOps, QualityScorer}
import graft.functions.ScalarFunctions

/** Property tests (SURVEY §5 upgrade over the reference's example-based
  * suite): invariants that must hold for arbitrary inputs.
  */
class PropertySpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkTest.session
  import spark.implicits._

  // Deterministic sampling from ScalaCheck generators (the scalatest
  // bridge artifact is not in the offline cache).
  private val params = Gen.Parameters.default
  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i => g.apply(params, Seed(42L + i)))
  private def forAll[A](g: Gen[A], n: Int = 8)(f: A => Unit): Unit =
    samples(g, n).foreach(f)
  private def whenever(cond: Boolean)(body: => Unit): Unit =
    if (cond) body

  private val titleGen: Gen[String] = Gen.oneOf(
    Gen.alphaNumStr.map(_.take(40)),
    Gen.listOf(Gen.oneOf("Amnesia", "night", "2025", "DJ", "at", "!!!", "12/05",
      "la", "fiesta", "ALL", "CAPS")).map(_.mkString(" ")),
    Gen.const(""), Gen.const("   "))

  test("property: title score always in [0,1] and flags consistent") {
    forAll(Gen.listOfN(30, titleGen)) { titles =>
      whenever(titles.nonEmpty) {
        val rows = titles.toDF("title")
          .select(QualityScorer.scoreTitle(col("title")).as("s"))
          .select(col("s.score"), col("s.flags")).collect()
        rows.foreach { r =>
          val score = r.getDouble(0)
          assert(score >= 0.0 && score <= 1.0)
        }
      }
    }
  }

  test("property: overall score is the weighted mean, within [0,1]") {
    val g = Gen.chooseNum(0.0, 1.0)
    forAll(Gen.listOfN(20, Gen.zip(g, Gen.zip(g, Gen.zip(g, Gen.zip(g, g)))))) { xs =>
      whenever(xs.nonEmpty) {
        val flat = xs.map { case (t, (v, (d, (a, k)))) => (t, v, d, a, k) }
        val rows = flat.toDF("t", "v", "d", "a", "k")
          .select(QualityScorer.overallScore(col("t"), col("v"), col("d"),
            col("a"), col("k")).as("o"))
          .collect().map(_.getDouble(0))
        rows.zip(flat).foreach { case (o, (t, v, d, a, k)) =>
          val expected = BigDecimal(
            (t * 0.25 + v * 0.20 + d * 0.25 + a * 0.15 + k * 0.15) / 1.0)
            .setScale(3, BigDecimal.RoundingMode.HALF_EVEN).toDouble
          assert(math.abs(o - expected) < 1e-9)
          assert(o >= 0.0 && o <= 1.0)
        }
      }
    }
  }

  test("property: upsert idempotence and key uniqueness") {
    val rowGen = Gen.zip(Gen.chooseNum(1, 10), Gen.chooseNum(1, 100),
      Gen.alphaStr.map(_.take(8)))
    forAll(Gen.zip(Gen.listOfN(25, rowGen), Gen.listOfN(25, rowGen))) { case (ex, in) =>
      val existing = ex.map { case (k, r, p) => (s"k$k", r, p) }
        .toDF("key", "rev", "payload")
      val incoming = in.map { case (k, r, p) => (s"k$k", r, p) }
        .toDF("key", "rev", "payload")
      val once = MergeOps.upsert(existing, incoming, Seq("key"), "rev")
      val twice = MergeOps.upsert(once, incoming, Seq("key"), "rev")
      // key uniqueness
      assert(once.groupBy("key").count().filter(col("count") > 1).isEmpty)
      // idempotence
      assert(twice.orderBy("key", "rev", "payload").collect().toSeq ===
        once.orderBy("key", "rev", "payload").collect().toSeq)
      // every winner has the max revision for its key
      val maxRev = existing.union(incoming).groupBy("key")
        .agg(max("rev").as("mx"))
      val bad = once.join(maxRev, "key").filter(col("rev") =!= col("mx"))
      assert(bad.isEmpty)
    }
  }

  test("property: minhash estimate within 0.3 of exact jaccard") {
    val wordGen = Gen.oneOf("alpha", "beta", "gamma", "delta", "eps", "zeta",
      "eta", "theta", "iota", "kappa")
    val docGen = Gen.listOfN(30, wordGen).map(_.mkString(" "))
    forAll(Gen.listOfN(6, docGen)) { docs =>
      whenever(docs.size >= 2 && docs.forall(_.split("\\s+").length >= 3)) {
        val df = docs.zipWithIndex.map { case (t, i) => (i.toLong, t) }
          .toDF("doc_id", "text")
        val est = Dedup.minhashCandidatePairs(df, "doc_id", "text",
          numHashes = 128, bands = 64, shingleSize = 2).collect()
          .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
        val exact = Dedup.ngramJaccardPairs(df, "doc_id", "text", 2, 0.0)
          .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
        est.foreach { case (pair, e) =>
          val x = exact.getOrElse(pair, 0.0)
          assert(math.abs(e - x) <= 0.3, s"pair $pair est $e exact $x")
        }
      }
    }
  }

  test("property: portable minhash estimates jaccard like the xxhash family") {
    // the md5-base portable variant must be an equally valid MinHash
    // family: signature-position match fraction approximates exact
    // jaccard with the same error bound as the xxhash64 family
    val wordGen = Gen.oneOf("alpha", "beta", "gamma", "delta", "eps", "zeta",
      "eta", "theta", "iota", "kappa")
    val docGen = Gen.listOfN(30, wordGen).map(_.mkString(" "))
    forAll(Gen.listOfN(4, docGen)) { docs =>
      whenever(docs.size >= 2 && docs.forall(_.split("\\s+").length >= 3)) {
        val df = docs.zipWithIndex.map { case (t, i) => (i.toLong, t) }
          .toDF("doc_id", "text")
        val sigs = df.select(col("doc_id"),
          Dedup.minhashSignaturePortable(col("text"), numHashes = 128,
            shingleSize = 2).as("sig")).collect()
          .map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
        val exact = Dedup.ngramJaccardPairs(df, "doc_id", "text", 2, 0.0)
          .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
        for (i <- sigs.keys; j <- sigs.keys if i < j) {
          val est = sigs(i).zip(sigs(j)).count { case (x, y) => x == y } / 128.0
          val x = exact.getOrElse((i, j), 0.0)
          assert(math.abs(est - x) <= 0.3, s"pair ($i,$j) est $est exact $x")
        }
      }
    }
  }

  test("property: text normalize idempotent; entity unescape stable") {
    forAll(Gen.listOfN(20, Gen.asciiPrintableStr.map(_.take(60)))) { texts =>
      whenever(texts.nonEmpty) {
        val df = texts.toDF("t")
        val once = df.select(ScalarFunctions.normalizeText(col("t")).as("n"))
        val twice = once.select(ScalarFunctions.normalizeText(col("n")).as("n"))
        assert(once.collect().map(_.getString(0)).toSeq ===
          twice.collect().map(_.getString(0)).toSeq)
      }
    }
  }

  test("property: merge bookkeeping conserves ids and stays stable on re-merge") {
    val rowGen = Gen.zip(Gen.chooseNum(1, 6), Gen.chooseNum(1, 1000))
    forAll(Gen.zip(Gen.listOfN(12, rowGen), Gen.listOfN(12, rowGen)), n = 5) {
      case (ex, in) =>
        // unique event ids across both sides (real upserts never carry
        // the same event_id twice), arbitrary key/recency collisions
        def docs(rows: Seq[(Int, Int)], tag: String) =
          rows.zipWithIndex.map { case ((k, r), i) => (s"$tag$i", s"k$k", r) }
            .toDF("event_id", "key", "rev")
            .withColumn("deduplication", struct(lit(true).as("is_canonical"),
              array().cast("array<string>").as("merged_from_ids"),
              array().cast("array<string>").as("merge_log")))
        val existing = docs(ex, "e")
        val incoming = docs(in, "i")
        val merged = MergeOps.upsertDocs(existing, incoming, Seq("key"),
          "rev", lit("T"))
        val rows = merged.select(col("event_id"), col("key"),
          col("deduplication.merged_from_ids").as("m"),
          size(col("deduplication.merge_log")).as("nl")).collect()
        // conservation: every input event id is either a winner or in
        // exactly one winner's merged_from_ids
        val winners = rows.map(_.getString(0)).toSet
        val absorbed = rows.flatMap(_.getSeq[String](2))
        assert(absorbed.distinct.length === absorbed.length)
        val all = (ex.indices.map("e" + _) ++ in.indices.map("i" + _)).toSet
        assert(winners ++ absorbed === all)
        assert((winners & absorbed.toSet).isEmpty)
        // one log entry per absorbed id
        rows.foreach(r => assert(r.getInt(3) === r.getSeq[String](2).length))
        // re-merging the merged table with NO new docs changes nothing
        val again = MergeOps.upsertDocs(merged,
          merged.limit(0), Seq("key"), "rev", lit("T2"))
        assert(again.orderBy("event_id").collect().toSeq ===
          merged.orderBy("event_id").collect().toSeq)
    }
  }

  test("property: chunking is a partition plus declared overlap") {
    import graft.operators.TextAnalysis
    val textGen = Gen.chooseNum(0, 40)
      .map(n => (1 to n).map("w" + _).mkString(" "))
    forAll(Gen.listOfN(10, textGen), n = 5) { texts =>
      whenever(texts.nonEmpty) {
        val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
          .toDF("doc_id", "text")
        val chunks = TextAnalysis.chunkDocuments(docs, "doc_id", "text",
            chunkSize = 7, overlap = 2)
          .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2)))
          .groupBy(_._1)
        texts.zipWithIndex.foreach { case (t, i) =>
          val toks = t.trim.split("\\s+").toSeq
          val cs = chunks(i.toLong).sortBy(_._2).map(_._3)
          // dropping the overlap from every chunk after the first
          // reconstructs the document exactly
          val rebuilt = (cs.head.split("\\s+").toSeq ++
            cs.tail.flatMap(_.split("\\s+").toSeq.drop(2)))
          assert(rebuilt === toks, s"doc $i: $cs")
        }
      }
    }
  }

  test("property: the persisted index's latest-wins lifecycle matches " +
      "an in-memory model under arbitrary build/append/update/compact " +
      "sequences") {
    import graft.operators.{AnnIndex, Similarity}
    // fixed quantizer, independent of the generated ops (the lifecycle
    // under test is storage resolution, not quantization quality)
    val dim = 8
    val rng = new scala.util.Random(7)
    lazy val seedCorpus = (0 until 200).map(i =>
      (i.toLong + 1000L, Array.fill(dim)(rng.nextGaussian().toFloat)))
      .toDF("vec_id", "embedding")
    lazy val cents = Similarity.trainIvfCentroids(seedCorpus,
      "vec_id", "embedding", dim = dim, nlist = 4, iters = 2,
      sampleSize = 200)
    lazy val books = Similarity.trainPqCodebooks(seedCorpus,
      "vec_id", "embedding", dim = dim, m = 4, ksub = 4, iters = 2,
      sampleSize = 200)
    val vecGen: Gen[Array[Float]] =
      Gen.listOfN(dim, Gen.chooseNum(-1.0, 1.0).map(_.toFloat))
        .map(_.toArray)
        .map(v => if (v.forall(_ == 0f)) v.updated(0, 1f) else v)
    // a batch: 3-8 rows over a SMALL id space (0..19) so re-appends
    // (updates) are frequent; ids unique within one batch by contract
    val batchGen: Gen[Seq[(Long, Array[Float])]] =
      Gen.chooseNum(3, 8).flatMap(k =>
        Gen.listOfN(k, Gen.zip(Gen.chooseNum(0L, 19L), vecGen)))
        .map(_.groupBy(_._1).map(_._2.head).toSeq)
    val opsGen: Gen[(Seq[Seq[(Long, Array[Float])]], Int)] = for {
      nBatches <- Gen.chooseNum(3, 5)
      batches  <- Gen.listOfN(nBatches, batchGen)
      compactAt <- Gen.chooseNum(1, nBatches - 1)
    } yield (batches.map(_.toSeq), compactAt)
    var run = 0
    forAll(opsGen, n = 3) { case (batches, compactAt) =>
      whenever(batches.nonEmpty && batches.head.nonEmpty) {
        run += 1
        val dir = java.nio.file.Files
          .createTempDirectory(s"graft_ann_prop$run").toFile
          .getAbsolutePath + "/idx"
        val model = scala.collection.mutable.Map.empty[Long, Array[Float]]
        def df(rows: Seq[(Long, Array[Float])]) =
          rows.toDF("vec_id", "embedding")
        AnnIndex.build(spark, dir, df(batches.head), "vec_id",
          "embedding", cents, books)
        batches.head.foreach { case (id, v) => model(id) = v }
        batches.zipWithIndex.drop(1).foreach { case (b, i) =>
          AnnIndex.append(spark, dir, df(b), "vec_id", "embedding")
          b.foreach { case (id, v) => model(id) = v }
          if (i == compactAt) AnnIndex.compact(spark, dir)
        }
        // probe at nprobe = nlist (no cross-cell shadows) must equal
        // the inline join over the MODEL's final state, exactly
        val queries = (0 until 3).map(q =>
          (9000L + q, Array.fill(dim)(rng.nextGaussian().toFloat)))
          .toDF("vec_id", "embedding")
        def rowsOf(d: org.apache.spark.sql.DataFrame) = d.collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
          .toSeq.sortBy(t => (t._1, -t._3, t._2))
        val fromIndex = rowsOf(AnnIndex.probe(spark, dir, queries,
          "vec_id", "embedding", k = 3, nprobe = 4, shortlist = 12))
        val inline = rowsOf(Similarity.knnJoinIvfPq(df(model.toSeq),
          queries, "vec_id", "embedding", k = 3, cents, books,
          nprobe = 4, shortlist = 12))
        assert(fromIndex === inline,
          s"lifecycle diverged from the model (run $run, " +
            s"${batches.size} batches, compact after $compactAt)")
        // a final compact folds storage to exactly the model's ids
        AnnIndex.compact(spark, dir)
        val stored = AnnIndex.census(spark, dir)
          .agg(sum($"n_vectors")).head().getLong(0)
        assert(stored === model.size.toLong,
          s"compact left $stored rows for ${model.size} live ids")
        assert(rowsOf(AnnIndex.probe(spark, dir, queries, "vec_id",
          "embedding", k = 3, nprobe = 4, shortlist = 12)) === inline,
          "post-compact probe diverged")
      }
    }
  }
}
