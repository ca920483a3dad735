package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.{AnnIndex, IvfCentroids, PqCodebooks}

/** Phase-level timing + job counts for the persisted-index lifecycle
  * rows (sim_index_probe_live / sim_index_append_update) — the guide
  * §1 "measure first" magnifier the r21 verdict asked for: where do
  * the row's seconds go (fixture build, per-probe driver jobs,
  * compact, rebuild), and how many Spark jobs does one probe fire.
  *
  * Usage: runMain graft.tools.AnnPhaseProbe [sfDir]
  */
object AnnPhaseProbe {
  private val jobs = new java.util.concurrent.atomic.AtomicInteger(0)

  private def time[A](label: String)(f: => A): A = {
    val j0 = jobs.get()
    val t0 = System.nanoTime()
    val r = f
    val dt = (System.nanoTime() - t0) / 1e9
    println(f"[annphase] $label%-34s $dt%8.2f s  ${jobs.get() - j0}%3d jobs")
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
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(
            js: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
          jobs.incrementAndGet(); ()
        }
      })
    try graft.SparkEntry.entry(spark).count()
    catch { case scala.util.control.NonFatal(_) => () }

    val reps = 2
    for (rep <- 1 to reps) {
      println(s"=== rep $rep: sim_index_probe_live decomposition ===")
      val dir = new java.io.File("target/annphase_live/" +
        sfDir.replaceAll("[^A-Za-z0-9.]", "_") + "/idx").getAbsolutePath
      val fs = new org.apache.hadoop.fs.Path(dir)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      fs.delete(new org.apache.hadoop.fs.Path(dir).getParent, true)
      val emb = graft.Tables.embeddings(spark, sfDir)
      time("fixture: build") {
        AnnIndex.build(spark, dir,
          emb.filter(col("vec_id") % 50 =!= 0 && col("vec_id") % 7 =!= 3),
          "vec_id", "embedding", IvfCentroids.pinned, PqCodebooks.pinned)
      }
      time("fixture: append") {
        AnnIndex.append(spark, dir,
          emb.filter(col("vec_id") % 50 =!= 0 && col("vec_id") % 7 === 3),
          "vec_id", "embedding")
      }
      val qs = emb.filter(col("vec_id") % 50 === 0)
      def fp(): org.apache.spark.sql.Row =
        AnnIndex.probe(spark, dir, qs, "vec_id", "embedding",
            k = 3, nprobe = 2, shortlist = 9)
          .select(xxhash64(col("query_id"), col("corpus_id"),
            col("cosine").cast("string"))
            .cast("decimal(38,0)").as("h"))
          .agg(coalesce(sum(col("h")), lit(0)).as("f"),
            count(lit(1)).as("n"))
          .head()
      time("probe fp #1 (delta live)")(fp())
      time("probe fp #2 (delta live)")(fp())
      time("compact (3 hooked probes)") {
        AnnIndex.compact(spark, dir, hook = _ => { fp(); () })
      }
      time("probe fp post-compact")(fp())
      time("rebuild (3 hooked probes)") {
        AnnIndex.build(spark, dir,
          emb.filter(col("vec_id") % 50 =!= 0), "vec_id", "embedding",
          IvfCentroids.pinned, PqCodebooks.pinned, hook = _ => { fp(); () })
      }
      time("final probe + count") {
        AnnIndex.probe(spark, dir, qs, "vec_id", "embedding",
          k = 3, nprobe = 2, shortlist = 9).count()
      }
      println(s"=== rep $rep: sim_index_append_update decomposition ===")
      val dir2 = new java.io.File("target/annphase_upd/" +
        sfDir.replaceAll("[^A-Za-z0-9.]", "_") + "/idx").getAbsolutePath
      fs.delete(new org.apache.hadoop.fs.Path(dir2).getParent, true)
      time("fixture: build+append") {
        AnnIndex.build(spark, dir2,
          emb.filter(col("vec_id") % 50 =!= 0 && col("vec_id") % 7 =!= 3),
          "vec_id", "embedding", IvfCentroids.pinned, PqCodebooks.pinned)
        AnnIndex.append(spark, dir2,
          emb.filter(col("vec_id") % 50 =!= 0 && col("vec_id") % 7 === 3),
          "vec_id", "embedding")
      }
      time("corpusN count") {
        emb.filter(col("vec_id") % 50 =!= 0).count()
      }
      time("append reversed (update)") {
        AnnIndex.append(spark, dir2,
          emb.filter(col("vec_id") % 50 =!= 0 && col("vec_id") % 11 === 0)
            .withColumn("embedding", reverse(col("embedding"))),
          "vec_id", "embedding")
      }
      def run2(): DataFrame = AnnIndex.probe(spark, dir2, qs,
        "vec_id", "embedding", k = 3, nprobe = 4, shortlist = 9)
      def fpOf(df: DataFrame) = df
        .select(xxhash64(col("query_id"), col("corpus_id"),
          col("cosine").cast("string"))
          .cast("decimal(38,0)").as("h"))
        .agg(coalesce(sum(col("h")), lit(0)).as("f"),
          count(lit(1)).as("n"))
        .head()
      time("probe pre (2 deltas, np=4)")(fpOf(run2()))
      time("compact")(AnnIndex.compact(spark, dir2))
      time("probe post-compact")(fpOf(run2()))
      time("census sum")(AnnIndex.census(spark, dir2)
        .agg(sum(col("n_vectors"))).head())
      time("final probe + count")(run2().count())
    }
    spark.stop()
  }
}
