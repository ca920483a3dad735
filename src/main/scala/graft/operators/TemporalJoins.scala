package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal joins — as-of and interval-containment — in shapes Spark's
  * built-in strategies don't reach without a cartesian/BNL plan. Both
  * are single-shuffle formulations: the as-of join is a WINDOW, not a
  * join at all, and the range join is an equi-join on a time grid.
  *
  * These are the event-time enrichment primitives a training-data
  * pipeline needs at 100 TB (attach the latest prior dimension
  * snapshot / label window to every event) where a naive `t1.ts <=
  * t2.ts` join condition degenerates to a broadcast-nested-loop over
  * the fact table.
  */
object TemporalJoins {

  /** Backward as-of join: each left row picks up the payload of the
    * LATEST right row with the same keys and `right.ts <= left.ts`
    * (DuckDB/kdb ASOF JOIN semantics, ties match).
    *
    * Not a join: both sides union into one frame (right rows ordered
    * BEFORE left rows at equal ts), and ONE running window per key
    * carries the last non-null right payload into every left row —
    * one hash shuffle on `keys`, no join node, no quadratic per-key
    * blowup however skewed the key is. This is the sort-merge shape a
    * native as-of operator implements, expressed as declarative
    * algebra Catalyst already plans well.
    *
    * Contract: `rightPayload` names columns of `right` absent from
    * `left` (checked); `right` must be unique per (keys, ts) — ties
    * between two RIGHT rows at identical ts have no defined winner, so
    * pre-aggregate the right side (the oracle rows do).
    */
  def asofJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
      tsCol: String, rightPayload: Seq[String]): DataFrame = {
    require(rightPayload.nonEmpty, "rightPayload must name >= 1 column")
    rightPayload.foreach(p => require(!left.columns.contains(p),
      s"left side already has a column named '$p'"))
    val l2 = left.withColumn("_side", lit(1))
    // SQL join-equality semantics: a NULL key or NULL ts on the right
    // can never satisfy `right.keys = left.keys AND right.ts <=
    // left.ts` — but Window.partitionBy groups null keys into one
    // partition and nulls-first ordering would sort a null-ts right
    // row before everything, leaking its payload into every left row.
    // Filter such right rows out; null-keyed / null-ts LEFT rows stay
    // (left-join semantics) and correctly match nothing.
    val r2 = right
      .filter(keys.map(col(_).isNotNull).reduce(_ && _) &&
        col(tsCol).isNotNull)
      .select((keys.map(col) :+ col(tsCol) :+ lit(0).as("_side")) :+
        struct(rightPayload.map(col): _*).as("_rp"): _*)
    val u = l2.unionByName(r2, allowMissingColumns = true)
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(tsCol).asc, col("_side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // the payload travels as ONE struct — non-null exactly on right
    // rows — so the matched right row is carried AS A UNIT. Per-column
    // last(ignoreNulls) would skip a legitimately-null payload cell on
    // the latest right row and backfill it from an older one, emitting
    // a torn row that never existed on the right side.
    val filled =
      u.withColumn("_rp", last(col("_rp"), ignoreNulls = true).over(w))
    rightPayload.foldLeft(filled) { (df, p) =>
        df.withColumn(p, col("_rp").getField(p))
      }
      .filter(col("_side") === 1).drop("_side", "_rp")
  }

  /** Interval-containment (range) join on a time grid: intervals
    * explode to the grid cells they overlap, points map to their ONE
    * cell, and the join is a plain equi-join on (keys, cell) followed
    * by the exact containment filter — candidates per point are the
    * intervals sharing its cell, never the whole table. Because each
    * point lands in exactly one cell, no pair is produced twice and no
    * dedup pass is needed.
    *
    * Columns are epoch-SECOND longs (callers convert once) so cell
    * arithmetic is exact integer division in every engine. Pick
    * `bucketSeconds` near the typical interval length: an interval
    * explodes to ~(len/bucket + 1) cells (fan-out cost), while a
    * too-large bucket packs unrelated intervals into one cell
    * (candidate cost). Skewed hot cells shuffle like any equi-join
    * key — AQE's skew-join split applies.
    */
  def rangeJoinBucketed(intervals: DataFrame, points: DataFrame,
      keys: Seq[String], startSec: String, endSec: String,
      pointSec: String, bucketSeconds: Long): DataFrame = {
    require(bucketSeconds > 0, s"bucketSeconds must be > 0, got $bucketSeconds")
    // an inverted interval (end < start) matches nothing under the
    // containment predicate, but Spark's sequence() would happily
    // explode it DESCENDING — drop empty intervals before the explode
    val iv = intervals.filter(col(endSec) >= col(startSec))
      .withColumn("_cell", explode(
        sequence(expr(s"$startSec div $bucketSeconds"),
          expr(s"$endSec div $bucketSeconds"))))
    val pt = points.withColumn("_cell", expr(s"$pointSec div $bucketSeconds"))
    iv.join(pt, keys :+ "_cell")
      .filter(col(pointSec) >= col(startSec) &&
        col(pointSec) <= col(endSec))
      .drop("_cell")
  }
}
