package graft.operators

import graft.SparkSpec
import graft.sources.Tables
import org.apache.spark.sql.functions._

class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  test("binned range join equals the naive inequality join") {
    val ev = Tables.events(spark, sf).withColumn("tsu", unix_micros(col("ts")))
      .select("user_id", "event_id", "tsu")
    val ranges = ev.filter(col("event_id") % 10 === 0)
      .select(col("user_id"), col("event_id").as("rid"),
        (col("tsu") - 123456789L).as("lo"), (col("tsu") + 98765432L).as("hi"))

    val naive = ev.join(ranges, ev("user_id") === ranges("user_id")
        && col("tsu") >= col("lo") && col("tsu") <= col("hi"))
      .select(col("rid"), col("event_id")).collect().toSet.asInstanceOf[Set[Any]]
    val binned = RangeJoin.pointInRange(ev, ranges, Seq("user_id"),
      "tsu", "lo", "hi", binWidth = 100000000L)
      .select(col("rid"), col("event_id")).collect().toSet.asInstanceOf[Set[Any]]
    assert(binned === naive)
    assert(binned.nonEmpty)
  }

  test("binned range join plans as a hash join, not a nested loop") {
    val ev = Tables.events(spark, sf).withColumn("tsu", unix_micros(col("ts")))
      .select("user_id", "event_id", "tsu")
    val ranges = ev.limit(50).select(col("user_id"), col("event_id").as("rid"),
      (col("tsu") - 1000000L).as("lo"), (col("tsu") + 1000000L).as("hi"))
    val joined = RangeJoin.pointInRange(ev, ranges, Seq("user_id"), "tsu", "lo", "hi", 1000000L)
    joined.count()
    val plan = joined.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"), s"nested loop in:\n$plan")
    assert(plan.contains("HashJoin") || plan.contains("SortMergeJoin"))
  }
}
