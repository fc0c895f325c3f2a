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

  test("unsupported features refuse loudly: generated columns, hard reader features, cleaned logs, lying descriptors") {
    val df = spark.range(10).toDF("id")

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

    // a hard reader feature (deletionVectors/columnMapping now HANDLE;
    // v2Checkpoint does not)
    val rfRoot = mkRoot("rf")
    val rfRels = DeltaLayout.writeFiles(spark, rfRoot, df, "d")
    DeltaLayout.writeCommit(spark, rfRoot, 0,
      Seq(DeltaLayout.protocol(minReader = 3,
        readerFeatures = Seq("v2Checkpoint")),
        DeltaLayout.metaData(df.schema), DeltaLayout.add(rfRels.head)))
    val e4 = intercept[IllegalArgumentException](
      ManifestTable.convertDelta(spark, rfRoot))
    assert(e4.getMessage.contains("v2Checkpoint"))

    // a descriptor whose cardinality LIES about the bitmap must fail the
    // conversion loudly, not commit a half-wrong live set
    val lieRoot = mkRoot("lie")
    val lieRels = DeltaLayout.writeFiles(spark, lieRoot, df.coalesce(1), "d")
    val lieDv = DeltaLayout.writeDv(spark, lieRoot, Seq(1L, 2L))
      .copy(cardinality = 5L)
    DeltaLayout.writeCommit(spark, lieRoot, 0,
      Seq(DeltaLayout.protocol(minReader = 3,
        readerFeatures = Seq("deletionVectors")),
        DeltaLayout.metaData(df.schema),
        DeltaLayout.add(lieRels.head, Some(lieDv))))
    val eLie = intercept[Exception](ManifestTable.convertDelta(spark, lieRoot))
    assert(eLie.getMessage != null)
    assert(ManifestTable.currentVersion(spark, lieRoot).isEmpty,
      "a failed DV decode must not leave a committed graft table")

    // column-mapped PARTITION columns and NESTED fields refuse (graft's
    // map is top-level and never covers partition columns)
    import org.apache.spark.sql.types._
    def mapped(name: String, phys: String, dt: DataType = LongType) =
      StructField(name, dt, nullable = true, new MetadataBuilder()
        .putString("delta.columnMapping.physicalName", phys)
        .putLong("delta.columnMapping.id", 1L).build())
    val mpRoot = mkRoot("mappedpart")
    val mpRels = DeltaLayout.writeFiles(spark, mpRoot,
      spark.range(8).selectExpr("id AS `col-x`", "CAST(id % 2 AS STRING) AS `col-p`"),
      "d", partitionBy = Seq("col-p"))
    DeltaLayout.writeCommit(spark, mpRoot, 0,
      Seq(DeltaLayout.protocol(minReader = 2, minWriter = 5),
        DeltaLayout.metaData(StructType(Seq(mapped("id", "col-x"),
          mapped("p", "col-p", StringType))), Seq("p"),
          config = Map("delta.columnMapping.mode" -> "name")),
        DeltaLayout.add(mpRels.head)))
    val e7 = intercept[IllegalArgumentException](
      ManifestTable.convertDelta(spark, mpRoot))
    assert(e7.getMessage.contains("partition column"), e7.getMessage)

    val nestRoot = mkRoot("mappednest")
    val nestRels = DeltaLayout.writeFiles(spark, nestRoot,
      spark.range(4).selectExpr("named_struct('col-in', id) AS s"), "d")
    DeltaLayout.writeCommit(spark, nestRoot, 0,
      Seq(DeltaLayout.protocol(minReader = 2, minWriter = 5),
        DeltaLayout.metaData(StructType(Seq(StructField("s",
          StructType(Seq(mapped("inner", "col-in")))))),
          config = Map("delta.columnMapping.mode" -> "name")),
        DeltaLayout.add(nestRels.head)))
    val e8 = intercept[RuntimeException](
      ManifestTable.convertDelta(spark, nestRoot))
    assert(e8.getMessage.contains("nested"), e8.getMessage)

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

  test("deletion vectors convert: on-disk and inline DVs become graft DV sidecars, deleted rows absent, files zero-copy") {
    val root = mkRoot("dvconv")
    // ONE file per slice, known row order (range is ordered, coalesced):
    // position i holds id base+i, so DV positions are checkable in ids
    val f1 = DeltaLayout.writeFiles(spark, root,
      spark.range(100).toDF("id").coalesce(1), "f1")
    val f2 = DeltaLayout.writeFiles(spark, root,
      spark.range(100, 150).toDF("id").coalesce(1), "f2")
    assert(f1.size === 1 && f2.size === 1)
    val schema = spark.range(1).toDF("id").schema
    // commit 0: both files plain; commit 1: the Delta DELETE shape —
    // remove + re-add f1 with an ON-DISK prefixed DV (positions 3,7,50),
    // f2 gets an INLINE DV (positions 0,1 → ids 100,101)
    DeltaLayout.writeCommit(spark, root, 0,
      Seq(DeltaLayout.protocol(minReader = 3,
        readerFeatures = Seq("deletionVectors")),
        DeltaLayout.metaData(schema)) ++ (f1 ++ f2).map(DeltaLayout.add(_)))
    val dv1 = DeltaLayout.writeDv(spark, root, Seq(3L, 7L, 50L), prefix = "ab")
    val dv2 = DeltaLayout.inlineDv(Seq(0L, 1L))
    DeltaLayout.writeCommit(spark, root, 1,
      Seq(DeltaLayout.remove(f1.head), DeltaLayout.add(f1.head, Some(dv1)),
        DeltaLayout.remove(f2.head), DeltaLayout.add(f2.head, Some(dv2))))
    val v = ManifestTable.convert(spark, root, statsCols = Seq("id"))
    assert(v === 1L)
    val got = ManifestTable.read(spark, root).select("id")
      .as[Long].collect().toSet
    val want = (0L until 100L).toSet -- Set(3L, 7L, 50L) ++
      (102L until 150L).toSet
    assert(got === want, "DV positions must subtract exactly their rows")
    // the manifest carries real graft DV entries keyed by the ext:: refs
    val m = ManifestTable.readManifest(spark, root, 1L)
    assert(m.files.forall(_.startsWith("ext::")), "still zero-copy")
    assert(m.dvs.size === 2, s"two DV'd files, got ${m.dvs}")
    assert(m.dvs.values.map(_._2).toSeq.sorted === Seq(2L, 3L))
    // converted table lives a normal graft life: append + a further
    // graft-native DELETE both compose with the converted DVs
    ManifestTable.append(spark, root,
      spark.range(1000, 1003).toDF("id"))
    assert(ManifestTable.read(spark, root).count() === (want.size + 3).toLong)
    ManifestTable.delete(spark, root, col("id") === 5L)
    assert(!ManifestTable.read(spark, root).select("id").as[Long]
      .collect().contains(5L))
  }

  test("DV lifecycle in the log: a later add REPLACES the DV; a plain re-add clears it; remove drops it") {
    val root = mkRoot("dvlife")
    val f1 = DeltaLayout.writeFiles(spark, root,
      spark.range(20).toDF("id").coalesce(1), "f")
    val schema = spark.range(1).toDF("id").schema
    DeltaLayout.writeCommit(spark, root, 0,
      Seq(DeltaLayout.protocol(minReader = 3,
        readerFeatures = Seq("deletionVectors")),
        DeltaLayout.metaData(schema),
        DeltaLayout.add(f1.head, Some(DeltaLayout.writeDv(spark, root, Seq(3L))))))
    // the REPLACING DV must contain the old one (Delta's own contract);
    // the converter takes the LATEST descriptor, not a union
    DeltaLayout.writeCommit(spark, root, 1,
      Seq(DeltaLayout.remove(f1.head), DeltaLayout.add(f1.head,
        Some(DeltaLayout.writeDv(spark, root, Seq(3L, 7L))))))
    ManifestTable.convertDelta(spark, root)
    assert(ManifestTable.read(spark, root).select("id").as[Long]
      .collect().toSet === (0L until 20L).toSet -- Set(3L, 7L))

    // purge shape: re-add WITHOUT a DV clears it
    val root2 = mkRoot("dvpurge")
    val g1 = DeltaLayout.writeFiles(spark, root2,
      spark.range(10).toDF("id").coalesce(1), "g")
    DeltaLayout.writeCommit(spark, root2, 0,
      Seq(DeltaLayout.protocol(minReader = 3,
        readerFeatures = Seq("deletionVectors")),
        DeltaLayout.metaData(schema),
        DeltaLayout.add(g1.head, Some(DeltaLayout.writeDv(spark, root2, Seq(2L))))))
    DeltaLayout.writeCommit(spark, root2, 1,
      Seq(DeltaLayout.remove(g1.head), DeltaLayout.add(g1.head)))
    ManifestTable.convertDelta(spark, root2)
    assert(ManifestTable.read(spark, root2).count() === 10L,
      "a DV-less re-add purges the deletion vector")
    assert(ManifestTable.readManifest(spark, root2, 1L).dvs.isEmpty)
  }

  test("checkpoint-carried DVs convert (the log-cleaned + DV'd shape)") {
    val root = mkRoot("dvckpt")
    val f1 = DeltaLayout.writeFiles(spark, root,
      spark.range(30).toDF("id").coalesce(1), "cf")
    val schema = spark.range(1).toDF("id").schema
    val dv = DeltaLayout.writeDv(spark, root, Seq(0L, 29L))
    // versions 0-6 cleaned; checkpoint at 6 carries the DV'd add
    DeltaLayout.writeCheckpoint(spark, root, 6, f1, schema,
      dvs = Map(f1.head -> dv))
    DeltaLayout.writeCommit(spark, root, 7, Nil)
    ManifestTable.convertDelta(spark, root)
    assert(ManifestTable.read(spark, root).select("id").as[Long]
      .collect().toSet === (1L until 29L).toSet)
  }

  test("column mapping (name mode) converts: physical schema + colmap, logical reads, stats in logical names") {
    import org.apache.spark.sql.types._
    val root = mkRoot("cmconv")
    // files carry PHYSICAL names, the schemaString logical ones with the
    // mapping in metadata — the post-rename Delta shape
    val phys = spark.range(50)
      .selectExpr("id AS `col-aaa`", "id * 2 AS `col-bbb`")
    val rels = DeltaLayout.writeFiles(spark, root, phys, "m")
    def fld(logical: String, physName: String) =
      StructField(logical, LongType, nullable = true, new MetadataBuilder()
        .putString("delta.columnMapping.physicalName", physName)
        .putLong("delta.columnMapping.id", logical.length.toLong).build())
    val logical = StructType(Seq(fld("id", "col-aaa"), fld("twice", "col-bbb")))
    DeltaLayout.writeCommit(spark, root, 0,
      Seq(DeltaLayout.protocol(minReader = 2, minWriter = 5),
        DeltaLayout.metaData(logical,
          config = Map("delta.columnMapping.mode" -> "name"))) ++
        rels.map(DeltaLayout.add(_)))
    // stats requested in LOGICAL names (the user-facing contract)
    ManifestTable.convertDelta(spark, root, statsCols = Seq("id"))
    val got = ManifestTable.read(spark, root).select("id", "twice")
      .as[(Long, Long)].collect().toSet
    assert(got === (0L until 50L).map(i => (i, i * 2)).toSet,
      "logical names must read the physically-named parquet columns")
    val m = ManifestTable.readManifest(spark, root, 1L)
    assert(m.colmap === Map("id" -> "col-aaa", "twice" -> "col-bbb"))
    assert(m.schema.fieldNames.toSeq === Seq("col-aaa", "col-bbb"),
      "the stored schema speaks physical names")
    assert(m.schema.fields.forall(f =>
      !f.metadata.contains("delta.columnMapping.physicalName") &&
        !f.metadata.contains("delta.columnMapping.id")),
      "delta mapping metadata must strip from the stored schema")
    assert(m.statsCols === Seq("col-aaa"), "stats keys speak physical names")
    // the converted table renames and appends like any colmapped table
    ManifestTable.append(spark, root,
      spark.range(50, 55).select(col("id"), (col("id") * 2).as("twice")))
    assert(ManifestTable.read(spark, root).count() === 55L)
  }
}
