package graft.sources

import graft.SparkSpec
import graft.sources.ManifestTable.PartitionTransform
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, FloatType, IntegerType, LongType, StringType}
import java.nio.file.Files

/** Rename/drop schema evolution via column mapping: logical names change
  * in a metadata-only commit; data files of every vintage keep their
  * PHYSICAL names and resolve through the manifest's mapping — no
  * rewrite, old versions unaffected, dropped bytes never resurrect.
  */
class SchemaEvolutionSpec extends SparkSpec {
  import spark.implicits._

  test("rename is metadata-only: old and new files both resolve; time travel keeps the old name") {
    val path = Files.createTempDirectory("se_rename").toString + "/t"
    ManifestTable.overwrite(spark, path,
      Seq((1L, "a"), (2L, "b")).toDF("id", "v").coalesce(1))
    val before = ManifestTable.filesMeta(spark, path).count()
    ManifestTable.renameColumn(spark, path, "v", "val") // v2, no data writes
    assert(ManifestTable.filesMeta(spark, path).count() === before,
      "rename must not rewrite or add data files")
    val got = ManifestTable.read(spark, path)
    assert(got.columns === Array("id", "val"))
    assert(got.orderBy("id").as[(Long, String)].collect()
      === Array((1L, "a"), (2L, "b")), "pre-rename files read through the mapping")
    // post-rename append arrives under the LOGICAL name, lands physical
    ManifestTable.append(spark, path, Seq((3L, "c")).toDF("id", "val"))
    assert(ManifestTable.read(spark, path).orderBy("id").as[(Long, String)]
      .collect() === Array((1L, "a"), (2L, "b"), (3L, "c")),
      "old and new vintages share one physical name space")
    // prior versions are untouched: version 1 still says 'v'
    assert(ManifestTable.readVersion(spark, path, 1L).columns === Array("id", "v"))
    // an append under the RETIRED logical name now means a NEW column
    val e = intercept[IllegalArgumentException] {
      ManifestTable.append(spark, path, Seq((9L, "x")).toDF("id", "v"))
    }
    assert(e.getMessage.contains("missing: val"))
  }

  test("SQL scan and DML follow a rename") {
    val path = Files.createTempDirectory("se_sql").toString + "/t"
    ManifestTable.overwrite(spark, path,
      Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "v").coalesce(1))
    ManifestTable.renameColumn(spark, path, "v", "label")
    spark.sql("DROP TABLE IF EXISTS se_t")
    spark.sql(s"CREATE TABLE se_t USING graft OPTIONS (path '$path')")
    try {
      assert(spark.sql("SELECT label FROM se_t WHERE label = 'b'")
        .as[String].collect() === Array("b"))
      assert(spark.sql("SELECT id FROM se_t WHERE label >= 'b'")
        .as[Long].collect().sorted === Array(2L, 3L))
    } finally spark.sql("DROP TABLE IF EXISTS se_t"): Unit
    // row-level commands address the logical name
    ManifestTable.update(spark, path, col("label") === "a",
      Seq("label" -> lit("A")))
    ManifestTable.deleteVectorized(spark, path, col("label") === "c")
    assert(ManifestTable.read(spark, path).orderBy("id")
      .select("id", "label").as[(Long, String)].collect()
      === Array((1L, "A"), (2L, "b")))
    // merge on the renamed payload column
    ManifestTable.merge(spark, path,
      Seq((2L, "B"), (4L, "d")).toDF("id", "label"), keys = Seq("id"))
    assert(ManifestTable.read(spark, path).orderBy("id")
      .select("id", "label").as[(Long, String)].collect()
      === Array((1L, "A"), (2L, "B"), (4L, "d")))
  }

  test("drop is metadata-only and a re-added namesake never resurrects the dropped bytes") {
    val path = Files.createTempDirectory("se_drop").toString + "/t"
    ManifestTable.overwrite(spark, path,
      Seq((1L, "a", 10L), (2L, "b", 20L)).toDF("id", "v", "score").coalesce(1))
    val before = ManifestTable.filesMeta(spark, path).count()
    ManifestTable.dropColumn(spark, path, "score") // v2
    assert(ManifestTable.filesMeta(spark, path).count() === before)
    assert(ManifestTable.read(spark, path).columns === Array("id", "v"))
    // time travel still sees the dropped column
    assert(ManifestTable.readVersion(spark, path, 1L)
      .select("score").as[Long].collect().sorted === Array(10L, 20L))
    // re-add a column NAMED score: the old files' bytes must stay dead
    ManifestTable.append(spark, path, Seq((3L, "c", 99L)).toDF("id", "v", "score"))
    val got = ManifestTable.read(spark, path).orderBy("id")
      .select("id", "score").as[(Long, Option[Long])].collect()
    assert(got === Array((1L, None), (2L, None), (3L, Some(99L))),
      s"dropped bytes resurrected: ${got.toSeq}")
  }

  test("rename then rename again, and renaming into a freed name") {
    val path = Files.createTempDirectory("se_chain").toString + "/t"
    ManifestTable.overwrite(spark, path,
      Seq((1L, "a", 1.5)).toDF("id", "v", "w").coalesce(1))
    ManifestTable.renameColumn(spark, path, "v", "x") // v free now
    ManifestTable.renameColumn(spark, path, "w", "v") // reuse the freed name
    val got = ManifestTable.read(spark, path)
    assert(got.columns === Array("id", "x", "v"))
    assert(got.select("x").as[String].head() === "a")
    assert(got.select("v").as[Double].head() === 1.5)
    // round-trip back to the original name
    ManifestTable.renameColumn(spark, path, "x", "v2")
    ManifestTable.append(spark, path,
      Seq((2L, "b", 2.5)).toDF("id", "v2", "v"))
    assert(ManifestTable.read(spark, path).orderBy("id")
      .select("id", "v2", "v").as[(Long, String, Double)].collect()
      === Array((1L, "a", 1.5), (2L, "b", 2.5)))
  }

  test("physical-name column families reject rename/drop") {
    val path = Files.createTempDirectory("se_guard").toString + "/t"
    val df = spark.range(10).select(col("id"),
      expr("timestamp '2024-01-01' + make_interval(0,0,0,CAST(id AS INT),0,0,0)").as("ts"),
      (col("id") % 3).as("p"), col("id").cast("double").as("m"))
    ManifestTable.overwrite(spark, path, df,
      partitionCols = Seq("p"), statsCols = Seq("m"),
      transforms = Seq(PartitionTransform("ts_day", "days", 0, "ts")))
    ManifestTable.addConstraint(spark, path, "m_pos", "m >= 0")
    def rejects(name: String, wants: String): Unit = {
      val e = intercept[IllegalArgumentException] {
        ManifestTable.renameColumn(spark, path, name, name + "_2")
      }
      assert(e.getMessage.contains(wants), s"$name: ${e.getMessage}")
      val e2 = intercept[IllegalArgumentException] {
        ManifestTable.dropColumn(spark, path, name)
      }
      assert(e2.getMessage.contains(wants), s"$name drop: ${e2.getMessage}")
    }
    rejects("p", "partition column")
    rejects("ts", "transform")
    rejects("ts_day", "partition") // derived cols are partition cols first
    rejects("m", "stats") // constraint check fires after, stats first
    // a plain column is still evolvable on this table
    ManifestTable.renameColumn(spark, path, "id", "row_id")
    assert(ManifestTable.read(spark, path).columns.contains("row_id"))
  }

  test("type widening: wider batches widen the schema, narrow vintages upcast at read") {
    val path = Files.createTempDirectory("se_widen").toString + "/t"
    ManifestTable.overwrite(spark, path,
      spark.range(3).select(col("id").cast("int").as("id"),
        col("id").cast("float").as("f"),
        col("id").cast("decimal(5,2)").as("d")).coalesce(1))
    // an int→long / float→double / decimal(5,2)→(10,4) batch widens the
    // table; the old int32/float/narrow-decimal files upcast at read
    ManifestTable.append(spark, path,
      Seq((5000000000L, 2.5d, BigDecimal("12345.6789")))
        .toDF("id", "f", "d")
        .select(col("id"), col("f"), col("d").cast("decimal(10,4)").as("d")))
    val got = ManifestTable.read(spark, path)
    assert(got.schema("id").dataType.simpleString === "bigint")
    assert(got.schema("f").dataType.simpleString === "double")
    assert(got.schema("d").dataType.simpleString === "decimal(10,4)")
    assert(got.select("id").as[Long].collect().sorted
      === Array(0L, 1L, 2L, 5000000000L))
    assert(got.filter(col("id") === 1L).select("d").as[java.math.BigDecimal]
      .head() === new java.math.BigDecimal("1.0000"))
    // a NARROWER batch is accepted as-is: its physically-narrow file
    // upcasts at read exactly like the pre-widening vintages
    ManifestTable.append(spark, path,
      spark.range(10, 12).select(col("id").cast("int").as("id"),
        col("id").cast("float").as("f"), col("id").cast("decimal(5,2)").as("d")))
    assert(ManifestTable.read(spark, path).schema("id").dataType.simpleString === "bigint")
    assert(ManifestTable.read(spark, path).select("id").as[Long].collect().sorted
      === Array(0L, 1L, 2L, 10L, 11L, 5000000000L))
    // change feed casts pre-widening steps to the final schema
    assert(ManifestTable.readChanges(spark, path, 0L, 3L)
      .filter(col("_commit_version") === 1L)
      .select("id").as[Long].collect().sorted === Array(0L, 1L, 2L))
    // lossy retypes still reject
    val e = intercept[IllegalArgumentException] {
      ManifestTable.append(spark, path,
        Seq(("x", 1.0d, BigDecimal(1))).toDF("id", "f", "d")
          .select(col("id"), col("f"), col("d").cast("decimal(10,4)").as("d")))
    }
    assert(e.getMessage.contains("retyped: id"))
  }

  test("NESTED field evolution: a struct-superset batch adds the field, old files read NULL, CDF crosses, parent guards hold") {
    val path = Files.createTempDirectory("se_nested").toString + "/t"
    ManifestTable.overwrite(spark, path,
      spark.range(3).select(col("id"),
        struct(lit("en").as("lang"), col("id").cast("int").as("score"))
          .as("meta")).coalesce(1))
    // batch adds meta.source (and reorders its fields): table widens to
    // the MERGED struct — table field order kept, new field appended
    ManifestTable.append(spark, path,
      spark.range(10, 12).select(col("id"),
        struct(lit("web").as("source"), lit("fr").as("lang"),
          col("id").cast("int").as("score")).as("meta")))
    val got = ManifestTable.read(spark, path)
    assert(got.schema("meta").dataType.simpleString
      === "struct<lang:string,score:int,source:string>")
    // old files read NULL for the added nested field; new rows carry it
    assert(got.filter(col("id") === 1L).select("meta.source").head().isNullAt(0))
    assert(got.filter(col("id") === 10L).select("meta.source").as[String]
      .head() === "web")
    assert(got.filter(col("id") === 10L).select("meta.lang").as[String]
      .head() === "fr")
    // a batch MISSING the nested field (the old shape) still appends —
    // its rows read NULL for it, like every pre-evolution vintage
    ManifestTable.append(spark, path,
      spark.range(20, 21).select(col("id"),
        struct(lit("de").as("lang"), lit(7).as("score")).as("meta")))
    assert(ManifestTable.read(spark, path).count() === 6L)
    assert(ManifestTable.read(spark, path).filter(col("id") === 20L)
      .select("meta.source").head().isNullAt(0))
    // CDF across the evolution: the pre-add step's structs reshape to
    // the final type with NULL in the added field
    val cdf = ManifestTable.readChanges(spark, path, 0L, 3L)
    assert(cdf.filter(col("_commit_version") === 1L)
      .select("meta.source").collect().forall(_.isNullAt(0)))
    assert(cdf.filter(col("_commit_version") === 1L)
      .select("meta.lang").as[String].collect().toSet === Set("en"))
    assert(cdf.filter(col("_commit_version") === 2L)
      .select("meta.source").as[String].collect().toSet === Set("web"))
    // nested retype still rejects (score int → string)
    val e = intercept[IllegalArgumentException] {
      ManifestTable.append(spark, path,
        spark.range(30, 31).select(col("id"),
          struct(lit("en").as("lang"), lit("bad").as("score")).as("meta")))
    }
    assert(e.getMessage.contains("retyped: meta"))
    // parent rename stays metadata-only and keeps nested answers; the
    // renamed parent's nested field still reads
    ManifestTable.renameColumn(spark, path, "meta", "info")
    assert(ManifestTable.read(spark, path).filter(col("id") === 10L)
      .select("info.source").as[String].head() === "web")
    // parent drop retires the physical column: a re-added namesake
    // never resurrects the old struct bytes
    ManifestTable.dropColumn(spark, path, "info")
    ManifestTable.append(spark, path,
      spark.range(40, 41).select(col("id"),
        struct(lit("zz").as("lang")).as("info")))
    val after = ManifestTable.read(spark, path)
    assert(after.filter(col("id") === 10L).select("info").head().isNullAt(0),
      "dropped struct bytes must not resurrect under the re-added namesake")
    assert(after.filter(col("id") === 40L).select("info.lang").as[String]
      .head() === "zz")
  }

  test("NESTED scalar widening: probe-verified int→long across mixed vintages; CDF crosses; unverified edges keep rejecting") {
    // the probe itself: the verified lattice edge passes inside
    // struct/array/map containers, an off-lattice edge fails — and a
    // failing probe means nestedAddOk keeps the pre-r16 rejection
    assert(ManifestTable.NestedUpcastProbe.verified(IntegerType, LongType),
      "the reader's nested int32→int64 upcast must probe-verify")
    assert(ManifestTable.NestedUpcastProbe.verified(FloatType, DoubleType))
    assert(!ManifestTable.NestedUpcastProbe.verified(IntegerType, StringType),
      "an off-lattice edge must fail the probe")
    val path = Files.createTempDirectory("se_nwide").toString + "/t"
    // v1: meta.score is INT, tags is array<int>
    ManifestTable.overwrite(spark, path,
      spark.range(3).select(col("id"),
        struct(lit("en").as("lang"), col("id").cast("int").as("score")).as("meta"),
        array(col("id").cast("int")).as("tags")).coalesce(1))
    // v2: a batch whose nested score/tag are LONG with values past 2³¹ —
    // the table widens; v1's physically-int files upcast at read
    ManifestTable.append(spark, path,
      spark.range(10, 12).select(col("id"),
        struct(lit("fr").as("lang"), (col("id") + 3000000000L).as("score")).as("meta"),
        array(col("id") + 4000000000L).as("tags")))
    val got = ManifestTable.read(spark, path)
    assert(got.schema("meta").dataType.simpleString === "struct<lang:string,score:bigint>")
    assert(got.schema("tags").dataType.simpleString === "array<bigint>")
    assert(got.filter(col("id") === 1L).select("meta.score").as[Long].head() === 1L,
      "old int vintage upcasts exactly")
    assert(got.filter(col("id") === 10L).select("meta.score").as[Long].head()
      === 3000000010L, "the >2³¹ value reads exactly")
    assert(got.filter(col("id") === 10L).selectExpr("tags[0]").as[Long].head()
      === 4000000010L)
    // a narrow (old-shape) batch still appends after the widening and
    // upcasts at read like every pre-widening vintage
    ManifestTable.append(spark, path,
      spark.range(20, 21).select(col("id"),
        struct(lit("de").as("lang"), lit(7).as("score")).as("meta"),
        array(lit(8)).as("tags")))
    assert(ManifestTable.read(spark, path).filter(col("id") === 20L)
      .select("meta.score").as[Long].head() === 7L)
    // CDF ACROSS the widening: the pre-widening commit's rows reshape to
    // the final (wide) type
    val cdf = ManifestTable.readChanges(spark, path, 0L, 3L)
    assert(cdf.schema("meta").dataType.simpleString === "struct<lang:string,score:bigint>")
    assert(cdf.filter(col("_commit_version") === 1L)
      .select("meta.score").as[Long].collect().toSet === Set(0L, 1L, 2L))
    assert(cdf.filter(col("_commit_version") === 2L)
      .select("meta.score").as[Long].collect().toSet
      === Set(3000000010L, 3000000011L))
    // unverified nested edges keep rejecting: long → double is off the
    // lattice (lossy past 2⁵³) at top level, therefore nested too
    val e = intercept[IllegalArgumentException] {
      ManifestTable.append(spark, path,
        spark.range(30, 31).select(col("id"),
          struct(lit("en").as("lang"), lit(1.5).as("score")).as("meta"),
          array(lit(1L)).as("tags")))
    }
    assert(e.getMessage.contains("retyped: meta"))
  }

  test("nested evolution composes with compaction, MOR update, and keyed merge") {
    val path = Files.createTempDirectory("se_nested2").toString + "/t"
    ManifestTable.overwrite(spark, path,
      spark.range(6).select(col("id"),
        struct(lit("en").as("lang")).as("meta")).repartition(3))
    ManifestTable.append(spark, path,
      spark.range(10, 13).select(col("id"),
        struct(lit("fr").as("lang"), lit("web").as("source")).as("meta")))
    // compaction heals the mixed vintages into the MERGED schema —
    // old rows materialize NULL for the added nested field
    ManifestTable.compact(spark, path, targetRowsPerFile = 100000, zorderBy = Nil)
    val afterCompact = ManifestTable.read(spark, path)
    assert(afterCompact.count() === 9L)
    assert(afterCompact.schema("meta").dataType.simpleString
      === "struct<lang:string,source:string>")
    assert(afterCompact.filter(col("id") === 1L)
      .select("meta.source").head().isNullAt(0))
    assert(afterCompact.filter(col("id") === 11L)
      .select("meta.source").as[String].head() === "web")
    // MOR update touching pre-evolution rows: DV + appended replacement
    spark.conf.set(ManifestTable.DmlModeKey, "mor")
    try ManifestTable.update(spark, path, col("id") === 2L,
      Seq("meta" -> struct(lit("de").as("lang"), lit("ed").as("source"))))
    finally spark.conf.unset(ManifestTable.DmlModeKey)
    assert(ManifestTable.read(spark, path).filter(col("id") === 2L)
      .select("meta.source").as[String].head() === "ed")
    // keyed merge with the evolved struct shape upserts cleanly
    ManifestTable.merge(spark, path,
      spark.range(20, 22).select(col("id"),
        struct(lit("es").as("lang"), lit("m").as("source")).as("meta")),
      keys = Seq("id"))
    val fin = ManifestTable.read(spark, path)
    assert(fin.count() === 11L)
    assert(fin.filter(col("id") === 21L)
      .select("meta.lang").as[String].head() === "es")
  }

  test("change feed and rewrites speak logical names after a rename") {
    val path = Files.createTempDirectory("se_cdf").toString + "/t"
    ManifestTable.overwrite(spark, path,
      Seq((1L, "a"), (2L, "b")).toDF("id", "v").coalesce(1))
    ManifestTable.renameColumn(spark, path, "v", "val") // v2
    ManifestTable.append(spark, path, Seq((3L, "c")).toDF("id", "val")) // v3
    ManifestTable.compact(spark, path, 100L) // v4: rewrite across vintages
    assert(ManifestTable.readChanges(spark, path, 2L, 3L)
      .select("id", "val", "_change_type").as[(Long, String, String)]
      .collect() === Array((3L, "c", "insert")))
    assert(ManifestTable.readChanges(spark, path, 3L, 4L).isEmpty,
      "compaction across renamed vintages is still invisible")
    assert(ManifestTable.read(spark, path).orderBy("id").as[(Long, String)]
      .collect() === Array((1L, "a"), (2L, "b"), (3L, "c")))
  }
}
