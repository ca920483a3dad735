package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Replayable Bloom-filter semi-join — the scan-reduction runtime
  * filter for selective fact⋈dim joins at 100 TB: build a bits-wide
  * bitmap from the dim keys once, broadcast it as a literal into the
  * fact scan's filter, and the shuffle/join only ever sees rows whose
  * key MIGHT match (false positives possible and REPORTED, false
  * negatives impossible). Spark's own AQE injects a similar runtime
  * bloom filter opportunistically; this one is deterministic
  * (md5-salted positions) so an external engine rebuilds the
  * IDENTICAL bitmap and the pass/false-positive census is
  * oracle-checkable, and it applies where AQE's heuristics don't fire.
  */
object Bloom {

  /** The set bit positions of the dim-side bitmap: k md5-salted
    * positions per key, distinct — a frame of ≤ bits rows collected
    * to the driver (bounded by the BITMAP size, never by dim rows;
    * the trainIvfCentroids contract). Sorted for a deterministic
    * literal.
    */
  def buildBits(keys: DataFrame, key: Column, bits: Int,
      k: Int): Array[Long] = {
    require(bits >= 2 && (bits & (bits - 1)) == 0,
      s"bits must be a power of two, got $bits")
    require(k >= 1, s"k must be >= 1, got $k")
    keys.select(posexplode(array((0 until k).map(i =>
        Dedup.portableHash(concat(lit(s"b$i|"), key.cast("string")), 15)
          .bitwiseAND(lit((bits - 1).toLong))): _*))
        .as(Seq("i", "pos")))
      .select(col("pos")).distinct()
      .collect().map(_.getLong(0)).sorted
  }

  /** Membership test as a pure Column over the literal bit-position
    * array — stays inside whole-stage codegen, evaluates in the scan
    * stage before any exchange. True ⇢ key is possibly in the dim
    * set; false ⇢ DEFINITELY absent.
    */
  def mightContain(key: Column, setBits: Array[Long], bits: Int,
      k: Int): Column = {
    val posArr = array(setBits.map(lit): _*)
    (0 until k).map(i => array_contains(posArr,
        Dedup.portableHash(concat(lit(s"b$i|"), key.cast("string")), 15)
          .bitwiseAND(lit((bits - 1).toLong))))
      .reduce(_ && _)
  }
}
