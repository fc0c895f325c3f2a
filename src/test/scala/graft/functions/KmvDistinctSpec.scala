package graft.functions

import graft.SparkSpec
import graft.sources.Tables
import org.apache.spark.sql.functions._

class KmvDistinctSpec extends SparkSpec {
  import spark.implicits._

  test("exact below k") {
    val df = Seq.tabulate(100)(i => ("g", i % 37)).toDF("g", "v")
    val got = df.groupBy("g").agg(KmvDistinct(256)(col("v")).as("d"))
      .head().getAs[Double]("d")
    assert(got === 37.0)
  }

  test("within error bounds above k and deterministic across repartitionings") {
    val li = Tables.lineitem(spark, sf)
    def estimate(parts: Int): Map[String, Double] =
      li.repartition(parts).groupBy("l_returnflag")
        .agg(KmvDistinct(128)(col("l_partkey")).as("d"))
        .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val exact = li.groupBy("l_returnflag").agg(countDistinct("l_partkey").as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val e4 = estimate(4)
    exact.foreach { case (g, n) =>
      val rel = math.abs(e4(g) - n) / n
      assert(rel < 0.25, s"group $g: est ${e4(g)} vs exact $n (rel $rel)")
    }
    // mergeable + deterministic: estimate independent of partitioning
    assert(estimate(1) === e4)
    assert(estimate(13) === e4)
  }
}
