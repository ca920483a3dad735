package graft.tools

import org.apache.spark.sql.SparkSession
import scala.util.control.NonFatal

/** Targeted A/B lap runner for registry rows: times the named rows
  * with graft.Bench's streaming semantics (teardown before every
  * measurement, single run per lap — the micro-batch engine cost IS
  * the measured capability), one JSON line per measurement. Exists so
  * a cross-commit A/B (throwaway worktree at an old commit vs HEAD)
  * can interleave laps of just the rows under investigation instead
  * of full six-minute bench sweeps — the r15 discipline for
  * separating ambient machine drag from real regressions.
  *
  * Usage: runMain graft.tools.CurateLap <row,row,...> <sfDir> [laps]
  */
object CurateLap {
  def main(args: Array[String]): Unit = {
    val names = args(0).split(",").toSeq
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val laps = if (args.length > 2) args(2).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def teardown(): Unit = {
      spark.streams.active.foreach { q =>
        try q.stop() catch { case NonFatal(_) => () }
      }
      try spark.catalog.listTables().collect()
        .filter(_.isTemporary)
        .foreach(t => spark.catalog.dropTempView(t.name))
      catch { case NonFatal(_) => () }
      spark.catalog.clearCache()
      System.gc()
    }
    // JIT/codegen warmup (Bench's discipline)
    try graft.SparkEntry.entry(spark).count()
    catch { case NonFatal(_) => () }
    for (lap <- 1 to laps; n <- names) {
      teardown()
      val t0 = System.nanoTime()
      val ok =
        try { graft.SparkEntry.queries(n)(spark, sfDir).count(); true }
        catch { case NonFatal(e) =>
          System.err.println(s"[curatelap] $n FAILED: ${e.getMessage}")
          false
        }
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"""CURATELAP {"lap":$lap%d,"q":"$n%s","sec":$sec%.2f,"ok":$ok%b}""")
    }
    teardown()
    spark.stop()
  }
}
