package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** The optimizer-rule twin of RangeJoinSpec: same correctness bar, but the
  * user writes a PLAIN inequality join and the injected rule performs the
  * binned rewrite. Needs its own session (extensions bind at build time).
  */
class RangeJoinRuleSpec extends SparkSpec {

  private lazy val extSpark: SparkSession = {
    // getOrCreate would silently REUSE a session another suite already
    // built — without the extensions, since those bind only at session
    // construction. Clear the default/active slots, build a genuinely new
    // session, then restore the prior default so sibling suites are
    // unaffected regardless of suite ordering.
    // make sure the canonical shared test session exists first, so it (not
    // this extensions session) is what sibling suites get from getOrCreate
    val base = spark
    val prior = Some(base)
    SparkSession.clearDefaultSession()
    SparkSession.clearActiveSession()
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-rule-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // NOT the "spark.sql.extensions" config string: that is read from the
      // SparkContext conf at CONTEXT creation, so it silently no-ops when a
      // context already exists (as it does under the shared test JVM).
      // withExtensions binds at session construction unconditionally.
      .withExtensions(new GraftExtensions)
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    SparkSession.setDefaultSession(base)
    SparkSession.setActiveSession(base)
    s
  }

  private def fixtures(s: SparkSession) = {
    import s.implicits._
    val ev = graft.sources.Tables.events(s, sf).withColumn("tsu", unix_micros(col("ts")))
      .select("event_id", "tsu")
    val ranges = ev.filter(col("event_id") % 20 === 0)
      .select(col("event_id").as("rid"),
        (col("tsu") - 123456789L).as("lo"), (col("tsu") + 98765432L).as("hi"))
    (ev, ranges)
  }

  test("rule rewrites a keyless range join away from nested loop, same rows") {
    val s = extSpark
    val (ev, ranges) = fixtures(s)

    // baseline: rule OFF (no binWidth conf) → nested loop
    s.conf.unset("spark.graft.rangeJoin.binWidth")
    val naive = ev.join(ranges, col("tsu") >= col("lo") && col("tsu") <= col("hi"))
    naive.count()
    assert(naive.queryExecution.executedPlan.toString.contains("BroadcastNestedLoopJoin"))
    val expected = naive.select("rid", "event_id").collect().toSet

    // rule ON
    s.conf.set("spark.graft.rangeJoin.binWidth", "100000000")
    val rewritten = ev.join(ranges, col("tsu") >= col("lo") && col("tsu") <= col("hi"))
    rewritten.count()
    val plan = rewritten.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"), s"still nested loop:\n$plan")
    assert(rewritten.select("rid", "event_id").collect().toSet === expected)
    s.conf.unset("spark.graft.rangeJoin.binWidth")
  }

  test("rule preserves extra equi keys and leaves non-range joins untouched") {
    val s = extSpark
    import s.implicits._
    val ev = graft.sources.Tables.events(s, sf).withColumn("tsu", unix_micros(col("ts")))
      .select("user_id", "event_id", "tsu")
    val ranges = ev.filter(col("event_id") % 20 === 0)
      .select(col("user_id").as("ruid"), col("event_id").as("rid"),
        (col("tsu") - 123456789L).as("lo"), (col("tsu") + 98765432L).as("hi"))

    s.conf.set("spark.graft.rangeJoin.binWidth", "100000000")
    try {
      val keyed = ev.join(ranges, col("user_id") === col("ruid")
        && col("tsu") >= col("lo") && col("tsu") <= col("hi"))
      val naive = {
        s.conf.unset("spark.graft.rangeJoin.binWidth")
        val n = ev.join(ranges, col("user_id") === col("ruid")
          && col("tsu") >= col("lo") && col("tsu") <= col("hi"))
          .select("rid", "event_id").collect().toSet
        s.conf.set("spark.graft.rangeJoin.binWidth", "100000000")
        n
      }
      assert(keyed.select("rid", "event_id").collect().toSet === naive)

      // plain equi join must be untouched by the rule
      val equi = ev.join(ranges, col("user_id") === col("ruid"))
      assert(equi.count() > 0)
      assert(!equi.queryExecution.optimizedPlan.toString.contains("__l_bin"))
    } finally s.conf.unset("spark.graft.rangeJoin.binWidth")
  }
}
