package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.{LmScore, TextAnalysis, TextClassify}

/** Stage-by-stage timing of the composed curation chain — a
  * MEASUREMENT mirror of [[graft.streaming.Curation.curateBatch]]
  * (same operators, same stage populations, each stage forced with
  * the checkpoint the real chain takes), kept separate so the
  * production method stays timer-free. Drift risk is accepted and
  * bounded: stage totals are cross-checked against CurateBench's
  * whole-chain `direct` number whenever this is re-run.
  *
  * Usage: runMain graft.tools.CurateProfile [cap] [sfDir]
  */
object CurateProfile {
  def main(args: Array[String]): Unit = {
    val cap = if (args.nonEmpty) args(0).toInt else 8
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.streaming.Curation

    (1 to 2).foreach { rep =>
      val out = new java.io.File(s"target/curate_profile_$cap")
        .getAbsolutePath
      val fs = new org.apache.hadoop.fs.Path(out)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      fs.delete(new org.apache.hadoop.fs.Path(out), true)
      val models = Curation.trainModels(graft.Tables.documents(spark, sfDir))
      val ngate = new graft.operators.NoveltyGate(s"$out/nov")
      val ndgate = new graft.operators.NearDupGate(s"$out/nd",
        bandKeyCap = cap)
      var t = System.nanoTime()
      def lap(tag: String): Unit = {
        val now = System.nanoTime()
        println(f"[curateprofile] rep=$rep%d $tag%-12s ${(now - t) / 1e9}%6.2f s")
        t = now
      }
      val batch = graft.Tables.documents(spark, sfDir)
        .select(col("doc_id"), col("text"))
      val b = graft.operators.GateOps.dedupAtWidth(batch, "doc_id")
        .localCheckpoint()
      // measured-count broadcast discipline, mirroring curateBatch
      val smallBatch =
        b.count() <= graft.operators.GateOps.broadcastRowCap
      def mb(df: DataFrame): DataFrame =
        if (smallBatch) broadcast(df) else df
      lap("batch-pin")
      val nov = ngate.admitScored(b, "doc_id", "text")
      val s1 = b.join(mb(nov.filter(col("is_novel") === 1)
        .select(col("id").as("doc_id"))), Seq("doc_id")).localCheckpoint()
      lap("novelty")
      val nd = ndgate.admitScored(s1, "doc_id", "text")
      val s2 = s1.join(mb(nd.filter(col("is_neardup") === 0)
        .select(col("id").as("doc_id"))), Seq("doc_id")).localCheckpoint()
      lap("neardup")
      val rules = TextClassify.gopherMetrics(s2, keyCols = Seq("doc_id"))
        .select(col("doc_id"),
          TextClassify.gopherPassCol.cast("int").as("gp"))
      val pred = TextClassify.nbPredict(
          s2.select(col("doc_id"), lit(0).as("y"),
            explode(TextAnalysis.tokens(col("text"))).as("token"))
            .filter(col("token") =!= ""),
          models.nbCounts, models.nbPriors)
        .select(col("doc_id"), col("pred"))
      val q3 = rules.join(mb(pred), Seq("doc_id"), "left")
        .select(col("doc_id"),
          (col("gp") === 1 && coalesce(col("pred"), lit(0)) === 1)
            .cast("int").as("quality_kept")).localCheckpoint()
      val s3 = s2.join(mb(q3.filter(col("quality_kept") === 1)
        .select(col("doc_id"))), Seq("doc_id")).localCheckpoint()
      lap("quality")
      def gramArr = when(
        size(graft.operators.Dedup.tokens(col("text"))) >= 13,
        array_distinct(transform(
          graft.operators.Dedup.shingles(col("text"), 13), x => md5(x))))
        .otherwise(array().cast("array<string>"))
      val hits = s3.select(col("doc_id"), explode(gramArr).as("g"))
        .join(broadcast(models.evalGrams), "g")
        .groupBy(col("doc_id")).agg(count(lit(1)).as("n_shared"))
      val dec = s3.select(col("doc_id"))
        .join(mb(hits), Seq("doc_id"), "left")
        .select(col("doc_id"),
          (!(col("doc_id") >= models.evalFrom &&
            col("doc_id") < models.evalUntil) &&
            coalesce(col("n_shared"), lit(0L)) === 0)
            .cast("int").as("decontam_kept")).localCheckpoint()
      val s4 = s3.join(mb(dec.filter(col("decontam_kept") === 1)
        .select(col("doc_id"))), Seq("doc_id")).localCheckpoint()
      lap("decontam")
      def lmToks(df: DataFrame): DataFrame = df
        .select(col("doc_id"), TextAnalysis.tokens(col("text")).as("t"))
        .filter(size(col("t")) >= 2)
      val lmk = LmScore.scoreDocs(LmScore.bigrams(lmToks(s4)),
          models.lmTable)
        .select(col("doc_id"),
          (expr("total_bits * 1000 div n_bigrams") < 12000)
            .cast("int").as("lm_kept"))
      lmk.write.mode("overwrite").parquet(s"$out/lmk")
      lap("lm")
      println(f"[curateprofile] rep=$rep%d populations: " +
        s"s1=${s1.count()} s2=${s2.count()} s3=${s3.count()} s4=${s4.count()}")
    }
    spark.stop()
  }
}
