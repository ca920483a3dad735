package graft.tools

import org.apache.spark.sql.SparkSession

/** Measure the composed curation pipeline (the ev_stream_curate
  * fixture shape: fresh gates, the whole documents table through
  * [[graft.streaming.Curation.start]] in one AvailableNow drain) at a
  * chosen band-key cap — the registry row is pinned to the UNCAPPED
  * exact-oracle semantics, so the capped production configuration
  * needs its own magnifier. Model training is timed separately per
  * rep (the persisted-models decomposition: a production deployment
  * trains on a cadence and [[graft.streaming.Curation.Models.load]]s,
  * so steady-state per-batch cost excludes it).
  *
  * Usage: runMain graft.tools.CurateBench [cap] [reps] [sfDir]
  */
object CurateBench {
  def main(args: Array[String]): Unit = {
    val cap = if (args.nonEmpty) args(0).toInt else 8
    val reps = if (args.length > 1) args(1).toInt else 3
    val sfDir = if (args.length > 2) args(2) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val fileSchema = spark.read.parquet(sfDir + "/documents.parquet").schema
    (1 to reps).foreach { rep =>
      val out = new java.io.File(s"target/curate_bench_$cap")
        .getAbsolutePath
      val fs = new org.apache.hadoop.fs.Path(out)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      fs.delete(new org.apache.hadoop.fs.Path(out), true)
      val t1 = System.nanoTime()
      val models = graft.streaming.Curation.trainModels(
        graft.Tables.documents(spark, sfDir))
      val trainSec = (System.nanoTime() - t1) / 1e9
      val t0 = System.nanoTime()
      graft.streaming.Curation.start(spark, sfDir + "/documents.parque*",
          fileSchema, out, models, bandKeyCap = cap)
        .awaitTermination()
      val sec = (System.nanoTime() - t0) / 1e9
      val kept = spark.read.parquet(s"$out/scored")
        .filter(org.apache.spark.sql.functions.col("kept") === 1).count()
      // the same chain WITHOUT the stream machinery (fresh gates,
      // curateBatch direct) — separates foreachBatch/checkpoint
      // overhead from chain mass
      fs.delete(new org.apache.hadoop.fs.Path(s"$out-direct"), true)
      val ng = new graft.operators.NoveltyGate(s"$out-direct/nov")
      val nd = new graft.operators.NearDupGate(s"$out-direct/nd",
        bandKeyCap = cap)
      val batch = graft.Tables.documents(spark, sfDir)
        .select(org.apache.spark.sql.functions.col("doc_id"),
          org.apache.spark.sql.functions.col("text"))
      val t2 = System.nanoTime()
      graft.streaming.Curation.curateBatch(batch, ng, nd, models)
        .write.mode("overwrite").parquet(s"$out-direct/scored")
      val directSec = (System.nanoTime() - t2) / 1e9
      println(f"[curatebench] cap=$cap%d rep=$rep%d: pipeline $sec%.2f s" +
        f" (train $trainSec%.2f s, direct $directSec%.2f s) kept=$kept%d")
    }
    spark.stop()
  }
}
