package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SkewSpec extends SparkSpec {
  import spark.implicits._

  test("saltedAggregate equals plain aggregation") {
    val df = Seq.tabulate(1000)(i => (if (i % 10 == 0) "hot" else s"k${i % 7}", i.toDouble))
      .toDF("k", "v")
    val plain = df.groupBy("k").agg(count("*").as("n"), sum("v").as("s"))
      .orderBy("k").collect()
    val salted = Skew.saltedAggregate(df, Seq("k"), col("v"), salts = 8,
      partialAggs = Seq(count("*").as("n"), sum("v").as("s")),
      mergeAggs = Seq(sum("n").as("n"), sum("s").as("s")))
      .orderBy("k").collect()
    assert(salted.map(r => (r.getString(0), r.getLong(1))).toSeq ===
      plain.map(r => (r.getString(0), r.getLong(1))).toSeq)
  }

  test("saltedJoin equals plain join") {
    val big = Seq.tabulate(500)(i => (i % 3, i.toLong)).toDF("k", "id")
    val small = Seq((0, "a"), (1, "b"), (2, "c"), (9, "zz")).toDF("k", "name")
    val plain = big.join(small, Seq("k")).select("id", "name").collect().toSet
    val salted = Skew.saltedJoin(big, small, Seq("k"), col("id"), salts = 4)
      .select("id", "name").collect().toSet
    assert(salted === plain)
    // left join keeps unmatched big rows exactly once
    val lplain = big.join(small, Seq("k"), "left").count()
    val lsalted = Skew.saltedJoin(big, small, Seq("k"), col("id"), 4, "left").count()
    assert(lsalted === lplain)
  }
}
