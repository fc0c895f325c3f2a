package graft.operators

import graft.SparkSpec
import graft.sources.{Sink, Tables}
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.functions._

class AsOfJoinSpec extends SparkSpec {
  import spark.implicits._

  test("as-of join picks the latest right row at or before each left ts") {
    val left = Seq((1L, 10L, 100L), (1L, 25L, 101L), (2L, 5L, 102L))
      .toDF("k", "t", "lid")
    val right = Seq((1L, 10L, "a"), (1L, 20L, "b"), (1L, 30L, "c"))
      .toDF("k", "t", "v")
    val out = AsOfJoin(left, right, keys = Seq("k"), leftTs = "t", rightTs = "t",
      payload = Seq("v" -> "asof_v", "t" -> "asof_t"), leftTie = "lid", rightTie = "t")
      .orderBy("lid").collect()
    // lid=100 at t=10: tie with right t=10 → matches "a" (≥ semantics)
    assert(out(0).getAs[String]("asof_v") === "a")
    // lid=101 at t=25: latest right ≤ 25 is t=20 → "b"
    assert(out(1).getAs[String]("asof_v") === "b")
    // lid=102, key 2: no right rows → null
    assert(out(2).isNullAt(out(2).fieldIndex("asof_v")))
  }

  test("tfIdfTopTerms ranks corpus-rare terms above ubiquitous ones") {
    val docs = Seq(
      (1L, "common rare1 rare1 common"),
      (2L, "common other other"),
      (3L, "common more words")).toDF("doc_id", "text")
    val top = TextAnalysis.tfIdfTopTerms(docs, k = 1)
      .filter(col("doc_id") === 1).head()
    // equal tf=2 in doc 1, but rare1 (df=1 → idf 4/2) outranks common (df=3 → idf 4/4)
    assert(top.getAs[String]("term") === "rare1")
  }

  test("normalize lowercases, strips non-alnum, collapses whitespace") {
    val docs = Seq((1L, "  Hello,   WORLD!! 42 ")).toDF("doc_id", "text")
    val r = TextAnalysis.normalize(docs).head()
    assert(r.getAs[String]("clean_text") === "hello world 42")
    assert(r.getAs[Int]("n_clean_chars") === 14)
  }

  test("co-bucketed tables join without any shuffle exchange") {
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
    Sink.writeBucketed(Tables.orders(spark, sf), "b_orders", 4, Seq("o_orderkey"))
    Sink.writeBucketed(Tables.lineitem(spark, sf), "b_lineitem", 4, Seq("l_orderkey"))
    val joined = spark.table("b_lineitem")
      .join(spark.table("b_orders"), col("l_orderkey") === col("o_orderkey"))
    assert(joined.count() > 0)
    val exchanges = joined.queryExecution.executedPlan.collect {
      case e: ShuffleExchangeExec => e
    }
    assert(exchanges.isEmpty, s"bucketed join must not shuffle, found: $exchanges")
  }
}
