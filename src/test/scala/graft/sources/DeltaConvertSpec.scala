package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** CONVERT TO GRAFT from a DELTA table ([[ManifestTable.convertDelta]]):
  * replay the `_delta_log` JSON actions, commit the LIVE file set as
  * graft version 1 zero-copy (`ext::` refs at the Delta files in place),
  * leave the Delta log untouched. Unsupported features (DVs, column
  * mapping, generated columns, log-cleaned histories) refuse loudly —
  * never a silently wrong row set.
  */
class DeltaConvertSpec extends SparkSpec {

  import spark.implicits._

  private def mkRoot(tag: String): String =
    Files.createTempDirectory(s"dconv_$tag").toString + "/t"

  test("log replay: adds minus removes, exact rows, zero-copy refs, Delta log untouched, graft life begins") {
    val root = mkRoot("replay")
    val a = spark.range(100).select(col("id"), lit("a").as("s"))
    val b = spark.range(100, 200).select(col("id"), lit("b").as("s"))
    val c = spark.range(200, 300).select(col("id"), lit("c").as("s"))
    val relsA = DeltaLayout.writeFiles(spark, root, a, "sliceA")
    val relsB = DeltaLayout.writeFiles(spark, root, b, "sliceB")
    val relsC = DeltaLayout.writeFiles(spark, root, c, "sliceC")
    DeltaLayout.writeCommit(spark, root, 0,
      DeltaLayout.protocol() +: DeltaLayout.metaData(a.schema) +:
        (relsA ++ relsB).map(DeltaLayout.add(_)))
    DeltaLayout.writeCommit(spark, root, 1, relsC.map(DeltaLayout.add(_)))
    DeltaLayout.writeCommit(spark, root, 2, relsB.map(DeltaLayout.remove))
    // auto-dispatch: plain convert() routes a _delta_log directory here
    val v = ManifestTable.convert(spark, root, statsCols = Seq("id"))
    assert(v === 1L)
    val got = ManifestTable.read(spark, root)
      .select("id", "s").as[(Long, String)].collect().toSet
    val want = (0L until 100L).map(i => (i, "a")).toSet ++
      (200L until 300L).map(i => (i, "c")).toSet
    assert(got === want, "live set = adds minus removes; removed slice gone")
    // zero-copy: every committed ref is external, no byte moved
    val m = ManifestTable.readManifest(spark, root, 1L)
    assert(m.files.nonEmpty && m.files.forall(_.startsWith("ext::")),
      s"refs must be external (zero-copy): ${m.files.take(2)}")
    val f = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    (relsA ++ relsB ++ relsC).foreach(r => assert(
      f.exists(new org.apache.hadoop.fs.Path(root, r)),
      s"source file $r must stay in place (even dead ones — they are Delta's)"))
    assert(f.exists(new org.apache.hadoop.fs.Path(root, "_delta_log")),
      "the Delta log survives conversion")
    // the zone maps landed: an id-range read opens a subset, and the
    // converted table lives a normal graft life (append works)
    ManifestTable.append(spark, root,
      spark.range(1000, 1005).select(col("id"), lit("x").as("s")))
    assert(ManifestTable.read(spark, root).count() === 205L)
    // re-convert refuses (already graft)
    val e = intercept[IllegalArgumentException](
      ManifestTable.convert(spark, root))
    assert(e.getMessage.contains("already a graft table"))
  }

  test("partitioned Delta (hive layout): partition columns carry, pruning fires") {
    val root = mkRoot("part")
    val df = spark.range(400).select(col("id"),
      (when(col("id") % 2 === 0, "even").otherwise("odd")).as("par"))
    val rels = DeltaLayout.writeFiles(spark, root, df, "p", partitionBy = Seq("par"))
    assert(rels.forall(_.startsWith("par=")), s"hive layout expected: $rels")
    DeltaLayout.writeCommit(spark, root, 0,
      DeltaLayout.protocol() +: DeltaLayout.metaData(df.schema, Seq("par")) +:
        rels.map(DeltaLayout.add(_)))
    ManifestTable.convertDelta(spark, root)
    val even = ManifestTable.read(spark, root).filter(col("par") === "even")
    assert(even.count() === 200L)
    assert(ManifestTable.read(spark, root)
      .filter(col("par") === "odd").agg(sum("id")).head.getLong(0) ===
      (0L until 400L).filter(_ % 2 == 1).sum)
  }

  test("log-cleaned history bootstraps from the checkpoint parquet, then replays the JSON tail") {
    val root = mkRoot("ckpt")
    val a = spark.range(50).select(col("id"), lit("a").as("s"))
    val b = spark.range(50, 120).select(col("id"), lit("b").as("s"))
    val c = spark.range(200, 210).select(col("id"), lit("c").as("s"))
    val relsA = DeltaLayout.writeFiles(spark, root, a, "ca")
    val relsB = DeltaLayout.writeFiles(spark, root, b, "cb")
    val relsC = DeltaLayout.writeFiles(spark, root, c, "cc")
    // versions 0-6 were CLEANED: only the checkpoint at 6 (live = A+B)
    // and the JSON tail 7 (add C) + 8 (remove B) remain
    DeltaLayout.writeCheckpoint(spark, root, 6, relsA ++ relsB, a.schema)
    DeltaLayout.writeCommit(spark, root, 7, relsC.map(DeltaLayout.add(_)))
    DeltaLayout.writeCommit(spark, root, 8, relsB.map(DeltaLayout.remove))
    ManifestTable.convertDelta(spark, root, statsCols = Seq("id"))
    val got = ManifestTable.read(spark, root)
      .select("id", "s").as[(Long, String)].collect().toSet
    val want = (0L until 50L).map(i => (i, "a")).toSet ++
      (200L until 210L).map(i => (i, "c")).toSet
    assert(got === want, "checkpoint state + JSON tail = the live set")
    // a GAP in the tail (checkpoint 6, json 8 only) refuses loudly
    val gapRoot = mkRoot("ckpt_gap")
    val gr = DeltaLayout.writeFiles(spark, gapRoot,
      spark.range(5).toDF("id"), "g")
    DeltaLayout.writeCheckpoint(spark, gapRoot, 6, gr,
      spark.range(5).toDF("id").schema)
    DeltaLayout.writeCommit(spark, gapRoot, 8, gr.map(DeltaLayout.remove))
    val e = intercept[IllegalArgumentException](
      ManifestTable.convertDelta(spark, gapRoot))
    assert(e.getMessage.contains("checkpoint"), e.getMessage)
  }

  test("unsupported features refuse loudly: DVs, column mapping, generated columns, reader features, cleaned logs") {
    // deletion vector on a live add
    val dvRoot = mkRoot("dv")
    val df = spark.range(10).toDF("id")
    val dvRels = DeltaLayout.writeFiles(spark, dvRoot, df, "d")
    DeltaLayout.writeCommit(spark, dvRoot, 0,
      Seq(DeltaLayout.protocol(), DeltaLayout.metaData(df.schema),
        DeltaLayout.add(dvRels.head, withDv = true)))
    val e1 = intercept[IllegalArgumentException](
      ManifestTable.convertDelta(spark, dvRoot))
    assert(e1.getMessage.contains("DELETION VECTOR"))

    // column mapping configuration
    val cmRoot = mkRoot("cm")
    val cmRels = DeltaLayout.writeFiles(spark, cmRoot, df, "d")
    DeltaLayout.writeCommit(spark, cmRoot, 0,
      Seq(DeltaLayout.protocol(), DeltaLayout.metaData(df.schema,
        config = Map("delta.columnMapping.mode" -> "name")),
        DeltaLayout.add(cmRels.head)))
    val e2 = intercept[IllegalArgumentException](
      ManifestTable.convertDelta(spark, cmRoot))
    assert(e2.getMessage.contains("column mapping"))

    // a generated column in the schema metadata
    val genRoot = mkRoot("gen")
    val genRels = DeltaLayout.writeFiles(spark, genRoot, df, "d")
    val genSchema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("id",
        org.apache.spark.sql.types.LongType, nullable = true,
        new org.apache.spark.sql.types.MetadataBuilder()
          .putString("delta.generationExpression", "1 + 1").build())))
    DeltaLayout.writeCommit(spark, genRoot, 0,
      Seq(DeltaLayout.protocol(), DeltaLayout.metaData(genSchema),
        DeltaLayout.add(genRels.head)))
    val e3 = intercept[IllegalArgumentException](
      ManifestTable.convertDelta(spark, genRoot))
    assert(e3.getMessage.contains("GENERATED"))

    // a hard reader feature
    val rfRoot = mkRoot("rf")
    val rfRels = DeltaLayout.writeFiles(spark, rfRoot, df, "d")
    DeltaLayout.writeCommit(spark, rfRoot, 0,
      Seq(DeltaLayout.protocol(minReader = 3,
        readerFeatures = Seq("deletionVectors")),
        DeltaLayout.metaData(df.schema), DeltaLayout.add(rfRels.head)))
    val e4 = intercept[IllegalArgumentException](
      ManifestTable.convertDelta(spark, rfRoot))
    assert(e4.getMessage.contains("deletionVectors"))

    // a log-cleaned history (first JSON > 0)
    val clRoot = mkRoot("clean")
    val clRels = DeltaLayout.writeFiles(spark, clRoot, df, "d")
    DeltaLayout.writeCommit(spark, clRoot, 7,
      Seq(DeltaLayout.protocol(), DeltaLayout.metaData(df.schema),
        DeltaLayout.add(clRels.head)))
    val e5 = intercept[IllegalArgumentException](
      ManifestTable.convertDelta(spark, clRoot))
    assert(e5.getMessage.contains("version 0"))

    // a MID-GAP history (0,1,5 — head IS 0 but the chain is broken and no
    // checkpoint covers it): replaying across the gap would silently
    // resurrect removed rows / drop added ones, so it must refuse
    val mgRoot = mkRoot("midgap")
    val mgRels = DeltaLayout.writeFiles(spark, mgRoot, df, "d")
    DeltaLayout.writeCommit(spark, mgRoot, 0,
      Seq(DeltaLayout.protocol(), DeltaLayout.metaData(df.schema),
        DeltaLayout.add(mgRels.head)))
    DeltaLayout.writeCommit(spark, mgRoot, 1, mgRels.tail.map(DeltaLayout.add(_)))
    DeltaLayout.writeCommit(spark, mgRoot, 5, mgRels.map(DeltaLayout.remove))
    val e6 = intercept[IllegalArgumentException](
      ManifestTable.convertDelta(spark, mgRoot))
    assert(e6.getMessage.contains("contiguous"), e6.getMessage)

    // a BENIGN reader feature (timestampNtz) converts fine
    val okRoot = mkRoot("ok")
    val okRels = DeltaLayout.writeFiles(spark, okRoot, df, "d")
    DeltaLayout.writeCommit(spark, okRoot, 0,
      Seq(DeltaLayout.protocol(minReader = 3,
        readerFeatures = Seq("timestampNtz")),
        DeltaLayout.metaData(df.schema)) ++ okRels.map(DeltaLayout.add(_)))
    ManifestTable.convertDelta(spark, okRoot)
    assert(ManifestTable.read(spark, okRoot).count() === 10L)
  }
}
