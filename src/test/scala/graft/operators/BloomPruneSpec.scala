package graft.operators

import graft.SparkSpec
import graft.sources.Tables
import org.apache.spark.sql.functions._

class BloomPruneSpec extends SparkSpec {
  import spark.implicits._

  test("bloom-pruned join result equals the plain join") {
    val build = Tables.customer(spark, sf).filter(col("c_mktsegment") === "BUILDING")
    val probe = Tables.orders(spark, sf)
    val viaBloom = BloomPrune.join(probe, "o_custkey", build, "c_custkey", 10000L)
      .select("o_orderkey", "c_custkey").as[(Long, Long)].collect().toSet
    val plain = probe.join(build, col("o_custkey") === col("c_custkey"))
      .select("o_orderkey", "c_custkey").as[(Long, Long)].collect().toSet
    assert(viaBloom === plain)
    assert(plain.nonEmpty)
  }

  test("string keys prune correctly; unsupported key types fail fast") {
    val build = Seq("a", "b").toDF("k")
    val probe = (1 to 500).map(i => s"k$i").toDF("pk").unionAll(Seq("a").toDF("pk"))
    val kept = BloomPrune.prune(probe, col("pk"), build, "k", 100L)
      .as[String].collect().toSet
    assert(kept.contains("a"))
    assert(kept.size < 50)
    val err = intercept[RuntimeException] {
      BloomPrune.prune(Seq(1.5).toDF("pk"), col("pk"), Seq(1L).toDF("k"), "k", 10L)
    }
    assert(err.getMessage.contains("integral or string"))
  }

  test("prune drops most non-matching rows and keeps every matching one") {
    val build = Seq(1L, 2L, 3L).toDF("k")
    val probe = (1L to 10000L).toDF("pk")
    val kept = BloomPrune.prune(probe, col("pk"), build, "k", 100L, fpp = 0.01)
      .as[Long].collect().toSet
    assert(Set(1L, 2L, 3L).subsetOf(kept)) // no false negatives, ever
    assert(kept.size < 300, s"bloom kept ${kept.size} of 10000 at 1% fpp")
  }
}
