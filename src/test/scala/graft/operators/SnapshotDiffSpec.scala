package graft.operators

import graft.SparkSpec

class SnapshotDiffSpec extends SparkSpec {
  import spark.implicits._

  test("classifies added, removed, and changed rows; drops unchanged ones") {
    val older = Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0), (4L, "d", 40.0))
      .toDF("k", "name", "v")
    val newer = Seq((1L, "a", 10.0), (2L, "b", 25.0), (4L, "D", 40.0), (5L, "e", 50.0))
      .toDF("k", "name", "v")
    val out = SnapshotDiff(older, newer, Seq("k"), Seq("name", "v"))
      .select("k", "change").as[(Long, String)].collect().toMap
    assert(out === Map(2L -> "changed", 3L -> "removed", 4L -> "changed", 5L -> "added"))
  }

  test("keys-only diff (no compare columns) reports added and removed") {
    val older = Seq((1L, "x"), (2L, "y")).toDF("k", "v")
    val newer = Seq((2L, "changed-but-not-compared"), (3L, "z")).toDF("k", "v")
    val out = SnapshotDiff(older, newer, Seq("k"), compare = Nil)
      .select("k", "change").as[(Long, String)].collect().toMap
    assert(out === Map(1L -> "removed", 3L -> "added"))
  }

  test("null-safe comparison: null → value and value → null count as changed") {
    val older = Seq((1L, Option.empty[Double]), (2L, Some(2.0)), (3L, Option.empty[Double]))
      .toDF("k", "v")
    val newer = Seq((1L, Some(1.0)), (2L, Option.empty[Double]), (3L, Option.empty[Double]))
      .toDF("k", "v")
    val out = SnapshotDiff(older, newer, Seq("k"), Seq("v"))
      .select("k", "change").as[(Long, String)].collect().toMap
    assert(out === Map(1L -> "changed", 2L -> "changed")) // 3: null == null, unchanged
  }
}
