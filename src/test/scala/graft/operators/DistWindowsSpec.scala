package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

class DistWindowsSpec extends SparkSpec {
  import spark.implicits._

  /** One-pass reference: the exact window functions the operator replaces. */
  private def reference(df: org.apache.spark.sql.DataFrame, tiles: Int) = {
    val w = Window.partitionBy(col("k")).orderBy(col("v"), col("id"))
    df.select(col("k"), col("id"), col("v"),
      row_number().over(w).cast("long").as("rank"),
      ntile(tiles).over(w).as("tile"),
      percent_rank().over(w).as("pct_rank"),
      cume_dist().over(w).as("cume_dist"))
  }

  private def collectBoth(df: org.apache.spark.sql.DataFrame, tiles: Int, buckets: Int) = {
    val got = DistWindows.distribution(df, "k", "v", "id", tiles, buckets)
      .select("k", "id", "v", "rank", "tile", "pct_rank", "cume_dist")
      .collect().map(_.toSeq).sortBy(_.toString)
    val want = reference(df, tiles).collect().map(_.toSeq).sortBy(_.toString)
    (got, want)
  }

  test("two-pass distribution equals the one-pass window, ties in value included") {
    // 3 partitions, duplicated values (ties broken by unique id), sizes
    // not divisible by the tile count
    val rows = for {
      k <- Seq("a", "b", "c")
      i <- 1 to (if (k == "b") 97 else 41)
    } yield (k, i.toLong + (if (k == "c") 1000 else 0), (i % 7).toDouble)
    val df = rows.toDF("k", "id", "v")
    val (got, want) = collectBoth(df, tiles = 4, buckets = 8)
    assert(got.length === want.length)
    assert(got === want)
  }

  test("distribution is exact when partitions are smaller than the tile count") {
    val df = Seq(("a", 1L, 5.0), ("a", 2L, 3.0), ("b", 3L, 1.0))
      .toDF("k", "id", "v")
    val (got, want) = collectBoth(df, tiles = 4, buckets = 4)
    assert(got === want)
  }

  test("bucket count does not change the answer (1, 3, and 64 buckets agree)") {
    val rows = (1 to 200).map(i => ("x", i.toLong, math.sin(i).abs * 100))
    val df = rows.toDF("k", "id", "v")
    val b1 = DistWindows.distribution(df, "k", "v", "id", 4, buckets = 1)
      .select("id", "rank", "tile", "pct_rank", "cume_dist").collect().map(_.toSeq).sortBy(_.toString)
    val b3 = DistWindows.distribution(df, "k", "v", "id", 4, buckets = 3)
      .select("id", "rank", "tile", "pct_rank", "cume_dist").collect().map(_.toSeq).sortBy(_.toString)
    val b64 = DistWindows.distribution(df, "k", "v", "id", 4, buckets = 64)
      .select("id", "rank", "tile", "pct_rank", "cume_dist").collect().map(_.toSeq).sortBy(_.toString)
    assert(b1 === b3)
    assert(b3 === b64)
  }

  test("skewed value distributions still produce exact ranks (all values equal)") {
    // adversarial: every value identical — all rows land in one range
    // bucket no matter the boundaries; ranks still exact via the tie column
    val df = (1 to 50).map(i => ("z", i.toLong, 42.0)).toDF("k", "id", "v")
    val (got, want) = collectBoth(df, tiles = 4, buckets = 8)
    assert(got === want)
  }

  test("single-row partition: pct_rank is 0, cume_dist is 1, tile is 1") {
    val df = Seq(("solo", 1L, 9.9)).toDF("k", "id", "v")
    val out = DistWindows.distribution(df, "k", "v", "id", 4, buckets = 4)
      .select("rank", "tile", "pct_rank", "cume_dist").collect().head
    assert(out.getLong(0) === 1L)
    assert(out.getInt(1) === 1)
    assert(out.getDouble(2) === 0.0)
    assert(out.getDouble(3) === 1.0)
  }
}
