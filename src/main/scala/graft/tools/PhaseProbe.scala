package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Phase-level timing for the composed curate chain — the guide §1
  * "measure first" magnifier for the bench's most expensive family.
  * Times each piece of ev_stream_curate's work in isolation (model
  * training, each of the five gate stages over the fixture batch,
  * stream-engine overhead) so optimization effort lands where the
  * seconds are, not where the code looks busy.
  *
  * Usage: runMain graft.tools.PhaseProbe [sfDir]
  */
object PhaseProbe {
  private def time[A](label: String)(f: => A): A = {
    val t0 = System.nanoTime()
    val r = f
    println(f"[phase] $label%-36s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
    r
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try graft.SparkEntry.entry(spark).count()
    catch { case scala.util.control.NonFatal(_) => () }

    val docs = graft.Tables.documents(spark, sfDir)
    // model training (paid once per bench by the first curate row)
    val models = time("trainModels") {
      val m = graft.streaming.Curation.trainModels(docs)
      m.nbCounts.count(); m.nbPriors.count(); m.lmTable.count()
      m.evalGrams.count()
      m
    }
    time("trainModels(second)") {
      val m = graft.streaming.Curation.trainModels(docs)
      m.nbCounts.count(); m.nbPriors.count(); m.lmTable.count()
      m.evalGrams.count()
    }

    // the five-gate chain over the full fixture as ONE batch —
    // approximates the single-batch stream's foreachBatch body
    val root = java.nio.file.Files.createTempDirectory("phaseprobe")
      .toString
    val batch = docs.select(col("doc_id"), col("text"))
    for (rep <- 1 to 2) {
      val ngate = new graft.operators.NoveltyGate(s"$root/nov$rep")
      val ndgate = new graft.operators.NearDupGate(s"$root/nd$rep")
      val verdicts = time(s"curateBatch(all five stages) #$rep") {
        graft.streaming.Curation.curateBatch(batch, ngate, ndgate,
            models)
          .localCheckpoint()
      }
      println(s"[phase] verdict rows: ${verdicts.count()}")
    }

    // stage isolation: novelty gate alone, then near-dup gate alone
    val ngate2 = new graft.operators.NoveltyGate(s"$root/nov2")
    time("stage1 noveltyGate.admitScored") {
      ngate2.admitScored(batch, "doc_id", "text").count()
    }
    val ndgate2 = new graft.operators.NearDupGate(s"$root/nd2")
    time("stage2 nearDupGate.admitScored") {
      ndgate2.admitScored(batch, "doc_id", "text").count()
    }
    val ndgate3 = new graft.operators.NearDupGate(s"$root/nd3",
      bandKeyCap = 8)
    time("stage2 nearDupGate(cap=8)") {
      ndgate3.admitScored(batch, "doc_id", "text").count()
    }
    // stages 3-5 measured through the public chain pieces
    time("stage3 gopher+nb") {
      val rules = graft.operators.TextClassify
        .gopherMetrics(batch, keyCols = Seq("doc_id"))
        .select(col("doc_id"),
          graft.operators.TextClassify.gopherPassCol.cast("int").as("gp"))
      val pred = graft.operators.TextClassify.nbPredict(
        batch.select(col("doc_id"), lit(0).as("y"),
          explode(graft.operators.TextAnalysis.tokens(col("text")))
            .as("token"))
          .filter(col("token") =!= ""),
        models.nbCounts, models.nbPriors)
      rules.join(pred, Seq("doc_id"), "left").count()
    }
    time("stage4 decontam join") {
      val gramArr = when(
        size(graft.operators.Dedup.tokens(col("text"))) >= 13,
        array_distinct(transform(
          graft.operators.Dedup.shingles(col("text"), 13), x => md5(x))))
        .otherwise(array().cast("array<string>"))
      batch.select(col("doc_id"), explode(gramArr).as("g"))
        .join(broadcast(models.evalGrams), "g")
        .groupBy(col("doc_id")).agg(count(lit(1))).count()
    }
    time("stage5 lm score") {
      val toks = batch
        .select(col("doc_id"),
          graft.operators.TextAnalysis.tokens(col("text")).as("t"))
        .filter(size(col("t")) >= 2)
      graft.operators.LmScore.scoreDocs(
        graft.operators.LmScore.bigrams(toks), models.lmTable).count()
    }

    // --- sub-phase magnification ---
    // near-dup gate internals: signature cost vs pair volume
    val batchSigs = time("nd: batchSigs (minhash+dedup+LC)") {
      graft.operators.GateOps.dedupAtWidth(
          batch.select(col("doc_id").as("id"), col("text").as("t")), "id")
        .select(col("id"), graft.operators.Dedup.minhashSignaturePortable(
          col("t"), 32, 1).as("sig"))
        .localCheckpoint()
    }
    println(s"[phase] nd sig rows: ${batchSigs.count()}")
    val bands = time("nd: banding") {
      val b2 = graft.operators.Dedup.lshBands(
          batchSigs, "id", "sig", 16)
        .filter(col("band_hash").isNotNull)
        .localCheckpoint()
      println(s"[phase] nd band rows: ${b2.count()}")
      b2
    }
    val pairs = time("nd: self pair join + distinct") {
      val p = bands.as("q").join(broadcast(bands).as("c"),
          col("q.band") === col("c.band") &&
            col("q.band_hash") === col("c.band_hash") &&
            col("c.id") < col("q.id"))
        .select(col("q.id").as("id"), col("c.id").as("cid"))
        .distinct()
        .localCheckpoint()
      println(s"[phase] nd pair rows: ${p.count()}")
      p
    }
    time("nd: score pairs (arrayEqCount+agg)") {
      pairs
        .join(broadcast(batchSigs.toDF("cid", "csig")), "cid")
        .join(broadcast(batchSigs.toDF("id", "qsig")), "id")
        .select(col("id"), col("cid"),
          graft.functions.VecOps.arrayEqCount(col("qsig"), col("csig"))
            .as("n_eq"))
        .groupBy(col("id"))
        .agg(count(lit(1)), max(col("n_eq"))).count()
    }
    // decontam internals: gram build (old HOF chain vs the codegen'd
    // Md5Shingles expression) vs the join
    val gramArrHof = when(
      size(graft.operators.Dedup.tokens(col("text"))) >= 13,
      array_distinct(transform(
        graft.operators.Dedup.shingles(col("text"), 13), x => md5(x))))
      .otherwise(array().cast("array<string>"))
    val gramArrFast = when(
      size(graft.operators.Dedup.tokens(col("text"))) >= 13,
      graft.operators.Dedup.md5Shingles(col("text"), 13))
      .otherwise(array().cast("array<string>"))
    time("decontam: HOF shingles+md5 (noop)") {
      batch.select(gramArrHof.as("g"))
        .write.format("noop").mode("overwrite").save()
    }
    time("decontam: Md5Shingles (noop)") {
      batch.select(gramArrFast.as("g"))
        .write.format("noop").mode("overwrite").save()
    }
    time("decontam: explode+join+agg (fast)") {
      batch.select(col("doc_id"), explode(gramArrFast).as("g"))
        .join(broadcast(models.evalGrams), "g")
        .groupBy(col("doc_id")).agg(count(lit(1))).count()
    }
    // novelty gate internals
    time("nov: fingerprint only (noop)") {
      batch.select(graft.operators.Dedup.exactFingerprint(col("text"))
          .as("fp"))
        .write.format("noop").mode("overwrite").save()
    }

    // stream-engine overhead: trivial stream over the same parquet
    time("trivial stream drain") {
      val fileSchema = spark.read.parquet(sfDir + "/documents.parquet")
        .schema
      val q = spark.readStream.schema(fileSchema)
        .parquet(sfDir + "/documents.parque*")
        .writeStream.queryName("phaseprobe_trivial")
        .option("checkpointLocation", s"$root/_ckpt_trivial")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .foreachBatch { (b: DataFrame, _: Long) =>
          if (!b.isEmpty) { b.count(); () }
        }
        .start()
      q.awaitTermination()
    }
    spark.stop()
  }
}
