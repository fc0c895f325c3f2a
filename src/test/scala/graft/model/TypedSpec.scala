package graft.model

import graft.SparkSpec
import graft.sources.Tables
import org.apache.spark.sql.functions._

class TypedSpec extends SparkSpec {
  import spark.implicits._

  test("typed readers round-trip the untyped tables") {
    val typed = Typed.orders(spark, sf)
    assert(typed.count() === Tables.orders(spark, sf).count())
    val first = typed.filter(_.o_orderkey == 0L).head()
    assert(first.o_custkey >= 0 && first.o_orderstatus.nonEmpty)
  }

  test("typed aggregation matches the untyped plan") {
    val typed = Typed.revenueByStatus(Typed.orders(spark, sf))
      .collect().toMap
    val untyped = Tables.orders(spark, sf).groupBy("o_orderstatus")
      .agg(sum("o_totalprice")).as[(String, Double)].collect().toMap
    assert(typed.keySet === untyped.keySet)
    typed.foreach { case (k, v) => assert(math.abs(v - untyped(k)) < 1e-6) }
  }
}
