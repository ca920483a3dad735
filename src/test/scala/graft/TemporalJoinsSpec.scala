package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.TemporalJoins

class TemporalJoinsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkTest.session
  import spark.implicits._

  test("asofJoin: latest prior row wins, ties match, no-match is null") {
    val left = Seq(
      (1L, 10L, "p1"), // after r@5 and r@10 -> tie at 10 matches
      (1L, 7L, "p2"),  // between r@5 and r@10 -> r@5
      (1L, 3L, "p3"),  // before any right row -> null
      (2L, 100L, "p4") // key with no right rows at all -> null
    ).toDF("k", "ts", "pid")
    val right = Seq(
      (1L, 5L, "r5"), (1L, 10L, "r10"), (3L, 1L, "unused")
    ).toDF("k", "ts", "payload")
    val got = TemporalJoins.asofJoin(left, right, Seq("k"), "ts",
        Seq("payload"))
      .select($"pid", $"payload").collect()
      .map(r => (r.getString(0), Option(r.getString(1)))).toMap
    assert(got === Map(
      "p1" -> Some("r10"), "p2" -> Some("r5"),
      "p3" -> None, "p4" -> None))
  }

  test("asofJoin carries the matched right row as a unit (no torn rows)") {
    // latest prior right row has a legitimately-NULL payload cell: the
    // join must return THAT row's cells verbatim, not backfill the
    // null from an older right row (a torn row that never existed)
    val right = Seq((1L, 1L, Some("A"), "x"), (1L, 2L, Option.empty[String], "y"))
      .toDF("k", "ts", "a", "b")
    val left = Seq((1L, 3L)).toDF("k", "ts")
    val got = TemporalJoins.asofJoin(left, right, Seq("k"), "ts",
      Seq("a", "b")).select(col("a"), col("b")).collect()
    assert(got.length === 1)
    assert(got(0).isNullAt(0), s"torn row: a = ${got(0).get(0)} leaked from ts=1")
    assert(got(0).getString(1) === "y")
  }

  test("asofJoin: NULL keys and NULL right ts never match (SQL join semantics)") {
    val right = Seq((Option(1L), Some(1L), "P1"),
        (Option.empty[Long], Some(1L), "PNULLKEY"),
        (Option(2L), Option.empty[Long], "PNULLTS"))
      .toDF("k", "ts", "payload")
    val left = Seq((Option.empty[Long], Some(5L)), (Option(2L), Some(5L)),
        (Option(1L), Some(5L)))
      .toDF("k", "ts")
    val got = TemporalJoins.asofJoin(left, right, Seq("k"), "ts",
        Seq("payload"))
      .collect().map(r => (Option(r.get(0)), Option(r.get(2)))).toMap
    assert(got(Some(1L)) === Some("P1"))
    // null-keyed left row matches nothing (null = null is not true)
    assert(got(None) === None)
    // right row with null ts can never satisfy right.ts <= left.ts
    assert(got(Some(2L)) === None)
  }

  test("asofJoin rejects payload columns that exist on the left") {
    val l = Seq((1L, 1L, "x")).toDF("k", "ts", "payload")
    val r = Seq((1L, 1L, "y")).toDF("k", "ts", "payload")
    assertThrows[IllegalArgumentException] {
      TemporalJoins.asofJoin(l, r, Seq("k"), "ts", Seq("payload"))
    }
  }

  test("asofJoin == naive per-row argmax on random data") {
    val rnd = new scala.util.Random(42)
    val left = (1 to 300).map(i =>
      (rnd.nextInt(8).toLong, rnd.nextInt(1000).toLong, i.toLong))
      .toDF("k", "ts", "lid")
    val right = (1 to 200).map(i =>
        (rnd.nextInt(8).toLong, rnd.nextInt(1000).toLong, 1000L + i))
      .toDF("k", "ts", "rid")
      .groupBy($"k", $"ts").agg(max($"rid").as("payload"))
    val got = TemporalJoins.asofJoin(left, right, Seq("k"), "ts",
        Seq("payload"))
      .select($"lid", $"payload").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) -1L else r.getLong(1)))
      .toMap
    // naive reference: inequality left join + per-left argmax by ts
    // (right unique per (k, ts), so the argmax is well-defined)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"lid").orderBy($"rts".desc_nulls_last)
    val naive = left.as("l")
      .join(right.select($"k".as("rk"), $"ts".as("rts"), $"payload"),
        $"l.k" === $"rk" && $"rts" <= $"l.ts", "left")
      .withColumn("rn", row_number().over(w))
      .filter($"rn" === 1)
      .select($"lid", $"payload").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) -1L else r.getLong(1)))
      .toMap
    assert(got === naive)
    assert(got.size === 300)
  }

  test("rangeJoinBucketed == naive containment join, boundaries inclusive") {
    // intervals and points engineered to cross bucket boundaries in
    // every way: spanning multiple cells, exact start/end equality,
    // points just outside
    val intervals = Seq(
      (1L, 100L, 350L, "i1"),  // spans cells 1..3 (bucket 100)
      (1L, 200L, 200L, "i2"),  // degenerate single-point interval
      (2L, 0L, 1000L, "i3")    // other key
    ).toDF("k", "start_sec", "end_sec", "iid")
    val points = Seq(
      (1L, 100L, "a"), (1L, 350L, "b"), (1L, 351L, "c"),
      (1L, 200L, "d"), (1L, 99L, "e"), (2L, 500L, "f"), (3L, 1L, "g")
    ).toDF("k", "pt_sec", "pid")
    val got = TemporalJoins.rangeJoinBucketed(intervals, points,
        Seq("k"), "start_sec", "end_sec", "pt_sec", bucketSeconds = 100)
      .select($"iid", $"pid").collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    val naive = intervals.join(points, Seq("k"))
      .filter($"pt_sec" >= $"start_sec" && $"pt_sec" <= $"end_sec")
      .select($"iid", $"pid").collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    assert(got === naive)
    assert(got === Set(("i1", "a"), ("i1", "b"), ("i1", "d"),
      ("i2", "d"), ("i3", "f")))
  }

  test("rangeJoinBucketed: inverted intervals match nothing") {
    val intervals = Seq((1L, 500L, 100L, "bad")).toDF(
      "k", "start_sec", "end_sec", "iid")
    val points = Seq((1L, 300L, "p")).toDF("k", "pt_sec", "pid")
    assert(TemporalJoins.rangeJoinBucketed(intervals, points, Seq("k"),
      "start_sec", "end_sec", "pt_sec", bucketSeconds = 100).count() === 0L)
  }
}
