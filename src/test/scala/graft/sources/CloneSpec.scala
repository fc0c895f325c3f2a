package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** SHALLOW CLONE: a zero-copy table clone referencing the source
  * snapshot's files in place — one metadata commit at any scale — that
  * then lives a fully independent life (own appends, own deletes, own
  * maintenance), with OPTIMIZE as the materialization path and vacuum
  * structurally unable to touch the source's files.
  */
class CloneSpec extends SparkSpec {
  import spark.implicits._

  private def root(tag: String): String =
    Files.createTempDirectory(s"clone_$tag").toString

  private def dataFileNames(path: String): Set[String] = {
    val d = java.nio.file.Paths.get(path, "data")
    if (!java.nio.file.Files.exists(d)) Set.empty
    else {
      val st = java.nio.file.Files.walk(d)
      try st.filter(p => p.toString.endsWith(".parquet"))
        .map[String](_.getFileName.toString).toArray.map(_.toString).toSet
      finally st.close()
    }
  }

  test("clone reads identically with zero bytes copied; stats and pruning carry") {
    val r = root("basic")
    val src = s"$r/src"; val dst = s"$r/dst"
    ManifestTable.overwrite(spark, src,
      (1 to 400).map(i => (i.toLong, s"v$i", i % 4)).toDF("id", "v", "g")
        .repartitionByRange(4, col("id")),
      partitionCols = Seq("g"), statsCols = Seq("id"))
    ManifestTable.shallowClone(spark, src, dst)
    // zero copy: the clone's own data dir holds NOTHING
    assert(dataFileNames(dst).isEmpty, "a shallow clone must copy no data file")
    val a = ManifestTable.read(spark, src).orderBy("id").collect()
    val b = ManifestTable.read(spark, dst).orderBy("id").collect()
    assert(b === a)
    // partition semantics and zone-map pruning work on the clone
    assert(ManifestTable.read(spark, dst).filter(col("g") === 2).count() === 100L)
    val (kept, total) = ManifestTable.prunedFiles(spark, dst, "id", 1L, 50L)
    assert(total > 1 && kept.size < total,
      s"carried stats must prune on the clone ($kept of $total)")
  }

  test("independent afterlife: writes to either side never affect the other") {
    val r = root("fork")
    val src = s"$r/src"; val dst = s"$r/dst"
    ManifestTable.overwrite(spark, src,
      Seq((1L, "a"), (2L, "b")).toDF("id", "v"))
    ManifestTable.shallowClone(spark, src, dst)
    ManifestTable.append(spark, dst, Seq((3L, "clone-only")).toDF("id", "v"))
    ManifestTable.append(spark, src, Seq((9L, "src-only")).toDF("id", "v"))
    assert(ManifestTable.read(spark, dst).count() === 3L)
    assert(ManifestTable.read(spark, src).count() === 3L)
    assert(!ManifestTable.read(spark, src).filter(col("v") === "clone-only")
      .isEmpty === false)
    assert(ManifestTable.read(spark, dst).filter(col("v") === "src-only")
      .count() === 0L)
    // a row-level DELETE on the clone rewrites INTO the clone; the
    // source file survives byte-identical
    val srcFiles = dataFileNames(src)
    ManifestTable.delete(spark, dst, col("id") === 1L)
    assert(ManifestTable.read(spark, dst).count() === 2L)
    assert(ManifestTable.read(spark, src).count() === 3L,
      "a clone-side delete must never touch the source")
    assert(dataFileNames(src) === srcFiles)
  }

  test("OPTIMIZE materializes external refs; vacuum then owns everything") {
    val r = root("opt")
    val src = s"$r/src"; val dst = s"$r/dst"
    ManifestTable.overwrite(spark, src,
      (1 to 100).map(i => (i.toLong, s"v$i")).toDF("id", "v").repartition(3))
    ManifestTable.shallowClone(spark, src, dst)
    ManifestTable.compact(spark, dst, targetRowsPerFile = 1000L)
    assert(dataFileNames(dst).nonEmpty, "compaction materializes the clone")
    ManifestTable.vacuum(spark, dst)
    // self-contained now, and the source is untouched throughout
    assert(ManifestTable.read(spark, dst).count() === 100L)
    assert(ManifestTable.read(spark, src).count() === 100L)
    // vacuum on the CLONE can never delete source bytes by construction
    assert(dataFileNames(src).nonEmpty)
  }

  test("version-pinned clone; clone-of-clone keeps original bases; guards") {
    val r = root("pin")
    val src = s"$r/src"
    ManifestTable.overwrite(spark, src, Seq((1L, "a")).toDF("id", "v"))
    ManifestTable.append(spark, src, Seq((2L, "b")).toDF("id", "v"))
    ManifestTable.shallowClone(spark, src, s"$r/v1", version = Some(1L))
    assert(ManifestTable.read(spark, s"$r/v1").count() === 1L)
    // clone of a clone: still zero-copy, still reads the ORIGINAL files
    ManifestTable.shallowClone(spark, s"$r/v1", s"$r/v1b")
    assert(dataFileNames(s"$r/v1b").isEmpty)
    assert(ManifestTable.read(spark, s"$r/v1b").count() === 1L)
    // refusals: existing target, DV-carrying source
    intercept[IllegalArgumentException] {
      ManifestTable.shallowClone(spark, src, s"$r/v1")
    }
    ManifestTable.deleteVectorized(spark, src, col("id") === 1L)
    val e = intercept[IllegalArgumentException] {
      ManifestTable.shallowClone(spark, src, s"$r/dv")
    }
    assert(e.getMessage.contains("deletion vectors"))
  }

  test("constraints, properties, transforms and column mapping carry into the clone") {
    val r = root("meta")
    val src = s"$r/src"; val dst = s"$r/dst"
    ManifestTable.overwrite(spark, src,
      (1 to 60).map(i => (i.toLong,
        java.sql.Timestamp.valueOf(f"2024-01-${i % 28 + 1}%02d 10:00:00"), i * 1.0))
        .toDF("id", "ts", "price"),
      transforms = Seq(ManifestTable.PartitionTransform("ts_day", "days", 0, "ts")))
    ManifestTable.setProperties(spark, src, Map("team" -> "etl"))
    // rename first (a constraint pins its column names), then constrain
    ManifestTable.renameColumn(spark, src, "price", "amount")
    ManifestTable.addConstraint(spark, src, "amount_pos", "amount > 0")
    ManifestTable.shallowClone(spark, src, dst)
    assert(ManifestTable.read(spark, dst).columns.contains("amount"))
    assert(ManifestTable.properties(spark, dst).get("team") === Some("etl"))
    // the carried constraint gates clone writes
    intercept[RuntimeException] {
      ManifestTable.append(spark, dst,
        Seq((99L, java.sql.Timestamp.valueOf("2024-02-01 00:00:00"), -5.0))
          .toDF("id", "ts", "amount"))
    }
    // hidden-partition derivation continues on clone appends
    ManifestTable.append(spark, dst,
      Seq((99L, java.sql.Timestamp.valueOf("2024-02-01 00:00:00"), 5.0))
        .toDF("id", "ts", "amount"))
    assert(ManifestTable.read(spark, dst).filter(col("id") === 99L)
      .select("ts_day").as[String].head() === "2024-02-01")
  }

  // the SQL face (CREATE TABLE … SHALLOW CLONE …) needs the injected graft
  // parser and is covered in GraftSqlParserSpec
}
