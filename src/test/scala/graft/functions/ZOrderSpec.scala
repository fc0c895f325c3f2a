package graft.functions

import graft.SparkSpec
import graft.sources.ManifestTable
import org.apache.spark.sql.functions._

class ZOrderSpec extends SparkSpec {
  import spark.implicits._

  test("interleave2 matches hand-computed Morton codes") {
    // x=0b101 → bits at 0,4 = 17; y=0b011 → bits at 1,3 = 10; z = 27
    val out = Seq((5L, 3L), (0L, 0L), (1L, 1L), (7L, 0L))
      .toDF("x", "y")
      .select(ZOrder.interleave2(col("x"), col("y")).as("z"))
      .as[Long].collect()
    assert(out === Array(27L, 0L, 3L, 21L))
  }

  test("z-clustered table prunes zone maps on BOTH dimensions") {
    val root = java.nio.file.Files.createTempDirectory("zt").toString + "/t"
    // 64×64 grid; 16 files along the Morton curve → each file is ~a 16×16 tile
    val grid = (for { a <- 0 until 64; b <- 0 until 64 } yield (a.toLong, b.toLong))
      .toDF("a", "b")
    ManifestTable.overwrite(spark,
      root, ZOrder.clusterBy2(grid, "a", "b", numFiles = 16),
      statsCols = Seq("a", "b"))

    val (keptA, totalA) = ManifestTable.prunedFiles(spark, root, "a", 0L, 7L)
    val (keptB, totalB) = ManifestTable.prunedFiles(spark, root, "b", 0L, 7L)
    assert(totalA === 16)
    assert(keptA.size <= totalA / 2, s"a-range kept ${keptA.size}/$totalA")
    assert(keptB.size <= totalB / 2, s"b-range kept ${keptB.size}/$totalB")
    // single-column sorting would give file skipping on the leading column
    // only; the curve gives it on both — and results stay exact:
    assert(ManifestTable.readRange(spark, root, "a", 0L, 7L).count() === 8 * 64)
    assert(ManifestTable.readRange(spark, root, "b", 0L, 7L).count() === 8 * 64)
  }

  test("interleaveN matches hand-computed 3-column Morton codes") {
    // x=0b11 → pos 0,3 = 9; y=0b01 → pos 1 = 2; z=0b10 → pos 5 = 32 → 43
    val out = Seq((3L, 1L, 2L), (0L, 0L, 0L), (1L, 1L, 1L))
      .toDF("x", "y", "z")
      .select(ZOrder.interleaveN(Seq(col("x"), col("y"), col("z")), 21).as("m"))
      .as[Long].collect()
    assert(out === Array(43L, 0L, 7L))
  }

  test("interleave2 is the N=2 instance of interleaveN") {
    val rows = Seq((5L, 3L), (123456L, 654321L), (0L, 1L)).toDF("x", "y")
    val a = rows.select(ZOrder.interleave2(col("x"), col("y")).as("z")).as[Long].collect()
    val b = rows.select(ZOrder.interleaveN(Seq(col("x"), col("y")), 21).as("z")).as[Long].collect()
    assert(a === b)
  }

  test("3-column z-clustered table prunes zone maps on ALL THREE dimensions") {
    val root = java.nio.file.Files.createTempDirectory("zt3").toString + "/t"
    // 16×16×16 cube; 16 files along the curve → each file ~a 4×4×4-ish tile
    val grid = (for { a <- 0 until 16; b <- 0 until 16; c <- 0 until 16 }
      yield (a.toLong, b.toLong, c.toLong)).toDF("a", "b", "c")
    ManifestTable.overwrite(spark,
      root, ZOrder.clusterByN(grid, Seq("a", "b", "c"), numFiles = 16),
      statsCols = Seq("a", "b", "c"))
    for (d <- Seq("a", "b", "c")) {
      val (kept, total) = ManifestTable.prunedFiles(spark, root, d, 0L, 3L)
      assert(total === 16)
      assert(kept.size <= total / 2, s"$d-range kept ${kept.size}/$total")
      // a single-column sort prunes its leading column only; the curve
      // prunes all three — and results stay exact:
      assert(ManifestTable.readRange(spark, root, d, 0L, 3L).count() === 4 * 16 * 16)
    }
  }

  test("readVersionDelta returns exactly the rows appended since a version") {
    val root = java.nio.file.Files.createTempDirectory("delta").toString + "/t"
    val v1 = ManifestTable.overwrite(spark, root, Seq((1L, "a"), (2L, "b")).toDF("id", "v"))
    val v2 = ManifestTable.append(spark, root, Seq((3L, "c")).toDF("id", "v"))
    val v3 = ManifestTable.append(spark, root, Seq((4L, "d"), (5L, "e")).toDF("id", "v"))
    assert(ManifestTable.readVersionDelta(spark, root, v1, v2)
      .select("id").as[Long].collect().toSet === Set(3L))
    assert(ManifestTable.readVersionDelta(spark, root, v1, v3)
      .select("id").as[Long].collect().toSet === Set(3L, 4L, 5L))
    assert(ManifestTable.readVersionDelta(spark, root, v3, v3).count() === 0)
  }
}
