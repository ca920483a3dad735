package graft.tools

import org.apache.spark.sql.SparkSession

/** Time individual registry queries in one warmed session — the
  * single-query magnifier Bench (whole-registry, driver-run) is not.
  * Each named query runs `reps` times; per-rep seconds print so cold
  * vs warm separate visually, matching Bench's count()-driven timing.
  *
  * Usage: runMain graft.tools.TimeQuery <q1[,q2,...]> [reps] [sfDir]
  */
object TimeQuery {
  def main(args: Array[String]): Unit = {
    val names = args(0).split(",").toSeq
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
    try graft.SparkEntry.entry(spark).count()
    catch { case scala.util.control.NonFatal(_) => () }
    names.foreach { name =>
      val fn = graft.SparkEntry.queries.getOrElse(name,
        sys.error(s"unknown query $name"))
      val secs = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        fn(spark, sfDir).count()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[timequery] $name%s: " +
        secs.map(s => f"$s%.2f").mkString(" ") + " sec")
    }
    spark.stop()
  }
}
