package graft

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.QualityScorer
import graft.schema.EventSchema

/** Bulk golden parity: 24 randomized event documents scored by the
  * reference implementation (clock frozen at 2025-06-10T00:00:00Z;
  * generator seed 4242) — overall scores, all five field scores, and
  * the exact flag sequences must match. This is the wide-net
  * complement to the hand-picked cases in QualityScorerSpec.
  */
class GoldenBatchSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkTest.session
  import spark.implicits._

  test("24 randomized reference-scored events match exactly") {
    val lines = scala.io.Source.fromFile("fixtures/golden_quality.jsonl", "UTF-8")
      .getLines().toSeq
    assert(lines.size === 24)
    val now = lit("2025-06-10 00:00:00").cast("timestamp")

    lines.zipWithIndex.foreach { case (line, i) =>
      val parsed = spark.read.json(Seq(line).toDS).head()
      val eventJson = {
        // re-serialize just the event object for schema-typed parsing
        val df = spark.read.json(Seq(line).toDS)
        df.select(to_json(col("event"))).head().getString(0)
      }
      val got = spark.read.schema(EventSchema.schema).json(Seq(eventJson).toDS)
        .select(QualityScorer.dataQuality(col("title"), col("venue"),
          col("datetime"), col("acts"), col("ticketing"), now).as("dq"))
        .select("dq.*").head()

      val expOverall = parsed.getAs[Double]("expected_overall")
      assert(got.getDouble(0) === expOverall, s"record $i overall")

      val expFields = parsed.getAs[Row]("expected_fields")
      val gotFields = got.getStruct(1)
      Seq("title", "venue", "datetime", "acts", "ticketing").foreach { f =>
        assert(math.abs(gotFields.getAs[Double](f) -
          expFields.getAs[Double](f)) < 1e-9, s"record $i field $f")
      }

      val expFlags = parsed.getAs[scala.collection.Seq[scala.collection.Seq[String]]](
        "expected_flags").map(p => (p(0), p(1)))
      val gotFlags = got.getSeq[Row](2).map(r => (r.getString(0), r.getString(1)))
      assert(gotFlags === expFlags, s"record $i flags")
    }
  }
}
