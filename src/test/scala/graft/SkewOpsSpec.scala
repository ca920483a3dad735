package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.SkewOps

class SkewOpsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkTest.session
  import spark.implicits._

  private def skewed = (
    Seq.fill(1000)(("hot", 1.0)) ++
      (1 to 50).map(i => (s"k$i", i.toDouble))
    ).toDF("key", "value")

  test("salted aggregation equals direct aggregation") {
    val direct = skewed.groupBy("key")
      .agg(count(lit(1)).as("n"), sum("value").as("total"))
      .orderBy("key").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSeq
    val salted = SkewOps.saltedCountSum(skewed, "key", "value", "value", 8)
      .orderBy("key").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(salted === direct)
  }

  test("salted join equals plain join") {
    val dim = (Seq("hot") ++ (1 to 50).map(i => s"k$i"))
      .zipWithIndex.map { case (k, i) => (k, s"label$i") }.toDF("key", "label")
    val plain = skewed.join(dim, "key").groupBy("label")
      .agg(count(lit(1)).as("n")).orderBy("label").collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    val salted = SkewOps.saltedJoin(skewed, dim, "key", 8).groupBy("label")
      .agg(count(lit(1)).as("n")).orderBy("label").collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(salted === plain)
  }

  test("skew report surfaces the hot key with its share") {
    val top = SkewOps.keySkewReport(skewed, "key", 3).head()
    assert(top.getString(0) === "hot")
    assert(top.getDouble(2) > 0.9)
  }
}
