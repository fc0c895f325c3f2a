package graft.operators

import graft.SparkSpec
import graft.sources.Tables
import org.apache.spark.sql.functions._

class CoreSpec extends SparkSpec {
  import spark.implicits._

  test("DimExtract dedups projected rows") {
    val df = Seq(("a", 1), ("a", 1), ("b", 2)).toDF("k", "v")
    assert(DimExtract.distinctRows(df, "k", "v").count() === 2)
    assert(DimExtract.byKey(df, Seq("k"), "k", "v").count() === 2)
  }

  test("AntiJoinInsert keeps only new keys") {
    val staged = Seq((1, "x"), (2, "y"), (3, "z")).toDF("id", "v")
    val existing = Seq((2, "old")).toDF("id", "v")
    val out = AntiJoinInsert.newRows(staged, existing, Seq("id"))
    assert(out.select("id").as[Int].collect().sorted === Array(1, 3))
  }

  test("AntiJoinInsert on composite key") {
    val staged = Seq((1, 1, "a"), (1, 2, "b")).toDF("k1", "k2", "v")
    val existing = Seq((1, 1, "?")).toDF("k1", "k2", "v")
    assert(AntiJoinInsert.newRows(staged, existing, Seq("k1", "k2"))
      .select("v").as[String].collect() === Array("b"))
  }

  test("LatestPerKey keeps the latest row per key") {
    val df = Seq((1, 10, "old"), (1, 20, "new"), (2, 5, "only")).toDF("k", "t", "v")
    val out = LatestPerKey(df, Seq("k"), Seq(col("t"))).orderBy("k")
    assert(out.select("v").as[String].collect() === Array("new", "only"))
  }

  test("LatestPerKey resolves upsert semantics (users.level fix)") {
    // a user that switched free→paid must surface once, as paid
    val events = Seq((7L, "free", 100L), (7L, "paid", 200L)).toDF("user", "level", "ts")
    val out = LatestPerKey(events, Seq("user"), Seq(col("ts")))
    assert(out.count() === 1)
    assert(out.select("level").as[String].head() === "paid")
  }

  test("SurrogateKey.dense is dense and ordered; sparse is unique") {
    val df = Seq(30, 10, 20).toDF("x")
    val dense = SurrogateKey.dense(df, "sk", Seq(col("x")))
    assert(dense.orderBy("x").select("sk").as[Long].collect() === Array(1L, 2L, 3L))
    val sparse = SurrogateKey.sparse(df, "sk")
    assert(sparse.select("sk").distinct().count() === 3)
  }

  test("SurrogateKey.nextOffset returns the first free id") {
    val df = Seq(5L, 11L).toDF("id")
    assert(SurrogateKey.nextOffset(df, "id") === 12L)
    assert(SurrogateKey.nextOffset(df.filter(col("id") < 0), "id") === 0L)
    // seeding sparse/dense with nextOffset never collides with existing keys
    val newKeys = SurrogateKey.sparse(Seq("x", "y").toDF("v"), "id", 12L)
      .select("id").as[Long].collect()
    assert(newKeys.forall(_ >= 12L))
    val denseKeys = SurrogateKey.dense(Seq("x", "y").toDF("v"), "id", Seq(col("v")), 12L)
      .select("id").as[Long].collect().sorted
    assert(denseKeys === Array(12L, 13L))
  }

  test("TopKPerGroup caps each group with deterministic ties") {
    val df = Seq(("g", 3, 1), ("g", 3, 2), ("g", 1, 3), ("h", 9, 4)).toDF("g", "score", "id")
    val out = TopKPerGroup(df, Seq("g"), Seq(col("score").desc, col("id")), 2)
    assert(out.filter(col("g") === "g").select("id").as[Int].collect().sorted === Array(1, 2))
    assert(out.filter(col("g") === "h").count() === 1)
  }

  test("Sessionize splits on gaps over the threshold") {
    val df = Seq(
      (1L, java.sql.Timestamp.valueOf("2024-01-01 00:00:00"), 1L),
      (1L, java.sql.Timestamp.valueOf("2024-01-01 00:10:00"), 2L), // same session
      (1L, java.sql.Timestamp.valueOf("2024-01-01 01:00:00"), 3L), // 50min gap → new
      (2L, java.sql.Timestamp.valueOf("2024-01-01 00:00:00"), 4L)
    ).toDF("user_id", "ts", "event_id")
    val out = Sessionize(df, "user_id", "ts", "event_id", 1800000000L)
    val u1 = out.filter(col("user_id") === 1).orderBy("event_id")
      .select("session_seq").as[Long].collect()
    assert(u1 === Array(1L, 1L, 2L))
    assert(out.filter(col("user_id") === 2).select("session_seq").as[Long].head() === 1L)
  }

  test("TimeDim derives calendar parts without a UDF") {
    val df = Seq(java.sql.Timestamp.valueOf("2024-01-07 13:45:00")).toDF("t")
    val row = TimeDim(df, "t").head()
    // 2024-01-07 is a Sunday: hour=13, day=7, ISO week=1, weekday=6 (0=Mon)
    assert(row.getAs[Int]("hour") === 13)
    assert(row.getAs[Int]("day") === 7)
    assert(row.getAs[Int]("week") === 1)
    assert(row.getAs[Int]("month") === 1)
    assert(row.getAs[Int]("year") === 2024)
    assert(row.getAs[Int]("weekday") === 6)
  }

  test("TimeDim.fromEpochMillis replaces the reference UDF") {
    val df = Seq(1704067200000L).toDF("ms") // 2024-01-01T00:00:00Z
    val out = df.select(TimeDim.fromEpochMillis(col("ms")).as("ts")).head().getTimestamp(0)
    assert(out.toInstant.toString === "2024-01-01T00:00:00Z")
  }

  test("FactEnrich broadcast-joins and keeps unmatched fact rows (left outer)") {
    val fact = Seq((1, "p1"), (2, "p404")).toDF("fid", "pk")
    val dim = Seq(("p1", "widget")).toDF("pk", "pname")
    val out = FactEnrich.onKeys(fact, dim, Seq("pk"))
    assert(out.count() === 2)
    assert(out.filter(col("fid") === 2).select("pname").head().isNullAt(0))
  }
}
