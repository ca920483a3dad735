package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import scala.util.control.NonFatal

/** Registry-construction smoke gate (round-9 post-mortem).
  *
  * A silent testdata regeneration changed events.ts from INT64 nanos
  * to TIMESTAMP(MICROS) and zeroed 73 driver queries with no local
  * signal: every query failed at PLAN CONSTRUCTION, which nothing
  * exercised cheaply. This spec constructs every registry query
  * against each available sf dir and forces analysis ONLY (no jobs,
  * no actions) — seconds of wall-clock — and on failure names the
  * offending query plus the raw parquet dtypes of the events table,
  * so the next input-schema drift is a one-line diagnosis.
  *
  * The streaming family's registry fns drain a real stream when
  * called, so the sweep covers their SOURCE construction instead
  * (StreamingQueries.eventStream, exposed package-private for this):
  * that is exactly the path that broke in round 9.
  */
class RegistrySmokeSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkTest.session
  // batch constructions may run small bounded jobs (keyset cursor
  // fetch, sink roundtrip writes), so the full sweep runs on the
  // smallest SF only; the per-table contract checks in Tables fire on
  // whichever dir a query touches, and the cheap source-level checks
  // below cover every generated dir.
  private val smallSf = "/root/testdata/sf0.001"
  // ALL three driver-generated dirs, asserted present — a missing dir
  // must fail the gate loudly, not silently shrink the sweep (this
  // spec exists because round 9's drift had no local signal; a
  // vacuous pass would recreate that hole).
  private val sfDirs =
    Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01",
        "/root/testdata/sf0.1")

  test("the driver-generated testdata dirs exist (TESTDATA.md contract)") {
    val missing = sfDirs.filterNot(d => new java.io.File(d).isDirectory)
    assert(missing.isEmpty,
      s"testdata dirs missing: ${missing.mkString(", ")} — the smoke " +
        "gate cannot run; was the testdata tree moved or regenerated?")
  }

  private def eventsDtypes(dir: String): String =
    try spark.read.parquet(s"$dir/events.parquet").schema.simpleString
    catch { case NonFatal(e) => s"<unreadable: ${e.getMessage}>" }

  test("every batch registry query analyzes against sf0.001") {
    val skip = (n: String) => n.startsWith("ev_stream_")
    for ((name, qd) <- SparkEntry.registry.toSeq.sortBy(_._1) if !skip(name)) {
      try qd.fn(spark, smallSf).queryExecution.assertAnalyzed()
      catch { case NonFatal(e) =>
        fail(s"query '$name' fails analysis against $smallSf: " +
          s"${e.getMessage}\nevents file schema: ${eventsDtypes(smallSf)}", e)
      }
    }
  }

  test("every testdata table honors the Tables schema contract in each sf dir") {
    for (dir <- sfDirs;
         tbl <- Seq("lineitem", "orders", "customer", "supplier", "part",
                    "nation", "region", "events", "documents", "embeddings")) {
      try {
        if (tbl == "events") Tables.events(spark, dir)
        else Tables.t(spark, dir, tbl)
      } catch { case NonFatal(e) =>
        fail(s"table '$tbl' in $dir violates the schema contract: " +
          e.getMessage, e)
      }
    }
  }

  test("the streaming events source analyzes against each sf dir") {
    for (dir <- sfDirs) {
      try graft.streaming.StreamingQueries.eventStream(spark, dir)
        .queryExecution.assertAnalyzed()
      catch { case NonFatal(e) =>
        fail(s"streaming events source fails analysis against $dir: " +
          s"${e.getMessage}\nevents file schema: ${eventsDtypes(dir)}", e)
      }
    }
  }
}
