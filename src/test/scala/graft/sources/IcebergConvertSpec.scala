package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** CONVERT TO GRAFT from an ICEBERG table
  * ([[ManifestTable.convertIceberg]]): resolve the current metadata
  * JSON, read the snapshot's Avro manifest list + manifests, commit the
  * live file set as graft version 1 zero-copy (`ext::` refs), leave the
  * Iceberg metadata untouched. Unsupported features (delete manifests,
  * hidden partitioning, non-parquet, outside-root files) refuse loudly —
  * never a silently wrong row set.
  */
class IcebergConvertSpec extends SparkSpec {

  import spark.implicits._

  private def mkRoot(tag: String): String =
    Files.createTempDirectory(s"iconv_$tag").toString + "/t"

  test("v2 snapshot: manifest-list + manifests, deleted entries excluded, zero-copy refs, metadata untouched, graft life begins") {
    val root = mkRoot("v2")
    val a = spark.range(100).select(col("id"), lit("a").as("s"))
    val b = spark.range(100, 160).select(col("id"), lit("b").as("s"))
    val dead = spark.range(500, 520).select(col("id"), lit("x").as("s"))
    val relsA = DeltaLayout.writeFiles(spark, root, a, "ia")
    val relsB = DeltaLayout.writeFiles(spark, root, b, "ib")
    val relsD = DeltaLayout.writeFiles(spark, root, dead, "ix")
    def abs(rel: String) = s"$root/$rel"
    // manifest 1: slice A ADDED (1) + the compacted-away slice D DELETED (2)
    val m1 = IcebergLayout.writeManifest(spark, root, "m1.avro",
      relsA.map(r => (abs(r), 1L, 1)) ++ relsD.map(r => (abs(r), 1L, 2)))
    // manifest 2: slice B EXISTING (0)
    val m2 = IcebergLayout.writeManifest(spark, root, "m2.avro",
      relsB.map(r => (abs(r), 1L, 0)))
    val ml = IcebergLayout.writeManifestList(spark, root, "ml.avro",
      Seq((m1, 0), (m2, 0)))
    IcebergLayout.writeMetadata(spark, root, 3, a.schema, Nil, Some(ml))
    // plain convert() auto-dispatches on metadata/*.metadata.json
    val v = ManifestTable.convert(spark, root, statsCols = Seq("id"))
    assert(v === 1L)
    val got = ManifestTable.read(spark, root)
      .select("id", "s").as[(Long, String)].collect().toSet
    val want = (0L until 100L).map((_, "a")).toSet ++
      (100L until 160L).map((_, "b")).toSet
    assert(got === want, "live set = existing+added entries, deleted excluded")
    val m = ManifestTable.readManifest(spark, root, 1L)
    assert(m.files.nonEmpty && m.files.forall(_.startsWith("ext::")),
      s"refs must be external (zero-copy): ${m.files.take(2)}")
    val f = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    (relsA ++ relsB ++ relsD).foreach(r => assert(
      f.exists(new org.apache.hadoop.fs.Path(root, r)),
      s"source file $r stays in place (dead ones too — they are Iceberg's)"))
    assert(f.exists(new org.apache.hadoop.fs.Path(root, "metadata")),
      "the Iceberg metadata survives conversion")
    // the converted table lives a normal graft life
    ManifestTable.append(spark, root,
      spark.range(1000, 1004).select(col("id"), lit("n").as("s")))
    assert(ManifestTable.read(spark, root).count() === 164L)
    val e = intercept[IllegalArgumentException](
      ManifestTable.convert(spark, root))
    assert(e.getMessage.contains("already a graft table"))
  }

  test("v1 metadata: inline manifests; without version-hint the highest-numbered metadata wins") {
    val root = mkRoot("v1")
    val a = spark.range(30).toDF("id")
    val b = spark.range(30, 45).toDF("id")
    val relsA = DeltaLayout.writeFiles(spark, root, a, "va")
    val relsB = DeltaLayout.writeFiles(spark, root, b, "vb")
    def abs(rel: String) = s"$root/$rel"
    val mOld = IcebergLayout.writeManifest(spark, root, "old.avro",
      relsA.map(r => (abs(r), 1L, 1)))
    val mNew = IcebergLayout.writeManifest(spark, root, "new.avro",
      (relsA ++ relsB).map(r => (abs(r), 1L, 0)))
    // v1: snapshots carry the manifests array inline, no manifest list
    IcebergLayout.writeMetadata(spark, root, 1, a.schema, Nil, None,
      manifests = Seq(mOld), formatVersion = 1, hint = false)
    IcebergLayout.writeMetadata(spark, root, 2, a.schema, Nil, None,
      manifests = Seq(mNew), formatVersion = 1, hint = false)
    ManifestTable.convertIceberg(spark, root)
    assert(ManifestTable.read(spark, root).count() === 45L,
      "the HIGHEST metadata version (v2, A+B) is the current snapshot")
  }

  test("identity-partitioned hive layout: partition columns carry, pruning fires") {
    val root = mkRoot("part")
    val df = spark.range(400).select(col("id"),
      when(col("id") % 2 === 0, "even").otherwise("odd").as("par"))
    val rels = DeltaLayout.writeFiles(spark, root, df, "p",
      partitionBy = Seq("par"))
    assert(rels.forall(_.startsWith("par=")), s"hive layout expected: $rels")
    val m1 = IcebergLayout.writeManifest(spark, root, "m.avro",
      rels.map(r => (s"$root/$r", 1L, 1)))
    val ml = IcebergLayout.writeManifestList(spark, root, "ml.avro",
      Seq((m1, 0)))
    IcebergLayout.writeMetadata(spark, root, 1, df.schema, Seq("par"),
      Some(ml))
    ManifestTable.convertIceberg(spark, root)
    assert(ManifestTable.read(spark, root)
      .filter(col("par") === "even").count() === 200L)
    assert(ManifestTable.read(spark, root).filter(col("par") === "odd")
      .agg(sum("id")).head.getLong(0) ===
      (0L until 400L).filter(_ % 2 == 1).sum)
  }

  test("type mapping: primitives, decimal, nested struct/list/map; uuid and unknown types refuse") {
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    def t(json: String) = IcebergMeta.toSparkType(mapper.readTree(json))
    import org.apache.spark.sql.types._
    assert(t("\"long\"") === LongType)
    assert(t("\"timestamptz\"") === TimestampType)
    assert(t("\"timestamp\"") === TimestampNTZType)
    assert(t("\"decimal(12, 2)\"") === DecimalType(12, 2))
    assert(t("\"fixed[16]\"") === BinaryType)
    val nested = t("""{"type":"struct","fields":[
      |{"id":1,"name":"a","required":true,"type":"string"},
      |{"id":2,"name":"b","required":false,"type":{"type":"list",
      |  "element-id":3,"element-required":true,"element":"double"}},
      |{"id":4,"name":"c","required":false,"type":{"type":"map",
      |  "key-id":5,"key":"string","value-id":6,"value-required":false,
      |  "value":"long"}}]}""".stripMargin)
    assert(nested === StructType(Seq(
      StructField("a", StringType, nullable = false),
      StructField("b", ArrayType(DoubleType, containsNull = false)),
      StructField("c", MapType(StringType, LongType,
        valueContainsNull = true)))))
    val eU = intercept[RuntimeException](t("\"uuid\""))
    assert(eU.getMessage.contains("uuid"))
    intercept[RuntimeException](t("\"time\""))
  }

  test("refusals: delete manifests, hidden partitioning, non-parquet, outside-root, no snapshot, k=v phantom dirs") {
    val df = spark.range(10).toDF("id")

    // a DELETE manifest in the list (v2 row-level deletes)
    val delRoot = mkRoot("del")
    val dr = DeltaLayout.writeFiles(spark, delRoot, df, "d")
    val dm = IcebergLayout.writeManifest(spark, delRoot, "m.avro",
      dr.map(r => (s"$delRoot/$r", 1L, 1)))
    val dml = IcebergLayout.writeManifestList(spark, delRoot, "ml.avro",
      Seq((dm, 0), (dm, 1)))
    IcebergLayout.writeMetadata(spark, delRoot, 1, df.schema, Nil, Some(dml))
    val e1 = intercept[IllegalArgumentException](
      ManifestTable.convertIceberg(spark, delRoot))
    assert(e1.getMessage.contains("DELETE manifests"), e1.getMessage)

    // a non-identity (hidden) partition transform
    val bkRoot = mkRoot("bucket")
    val br = DeltaLayout.writeFiles(spark, bkRoot, df, "d")
    val bm = IcebergLayout.writeManifest(spark, bkRoot, "m.avro",
      br.map(r => (s"$bkRoot/$r", 1L, 1)))
    val bml = IcebergLayout.writeManifestList(spark, bkRoot, "ml.avro",
      Seq((bm, 0)))
    IcebergLayout.writeMetadata(spark, bkRoot, 1, df.schema, Seq("id"),
      Some(bml), transforms = Map("id" -> "bucket[16]"))
    val e2 = intercept[IllegalArgumentException](
      ManifestTable.convertIceberg(spark, bkRoot))
    assert(e2.getMessage.contains("bucket[16]"), e2.getMessage)

    // a non-parquet file format
    val orcRoot = mkRoot("orc")
    val or = DeltaLayout.writeFiles(spark, orcRoot, df, "d")
    val om = IcebergLayout.writeManifest(spark, orcRoot, "m.avro",
      or.map(r => (s"$orcRoot/$r", 1L, 1)), format = "ORC")
    val oml = IcebergLayout.writeManifestList(spark, orcRoot, "ml.avro",
      Seq((om, 0)))
    IcebergLayout.writeMetadata(spark, orcRoot, 1, df.schema, Nil, Some(oml))
    val e3 = intercept[IllegalArgumentException](
      ManifestTable.convertIceberg(spark, orcRoot))
    assert(e3.getMessage.contains("ORC"), e3.getMessage)

    // a data file OUTSIDE the table root cannot reference zero-copy
    val outRoot = mkRoot("out")
    val elsewhere = Files.createTempDirectory("iconv_elsewhere").toString
    val er = DeltaLayout.writeFiles(spark, elsewhere, df, "d")
    val em = IcebergLayout.writeManifest(spark, outRoot, "m.avro",
      er.map(r => (s"$elsewhere/$r", 1L, 1)))
    val eml = IcebergLayout.writeManifestList(spark, outRoot, "ml.avro",
      Seq((em, 0)))
    IcebergLayout.writeMetadata(spark, outRoot, 1, df.schema, Nil, Some(eml))
    val e4 = intercept[IllegalArgumentException](
      ManifestTable.convertIceberg(spark, outRoot))
    assert(e4.getMessage.contains("outside the table root"), e4.getMessage)

    // no current snapshot
    val nsRoot = mkRoot("nosnap")
    new org.apache.hadoop.fs.Path(nsRoot).getFileSystem(
      spark.sparkContext.hadoopConfiguration).mkdirs(
      new org.apache.hadoop.fs.Path(nsRoot, "metadata"))
    val f = new org.apache.hadoop.fs.Path(nsRoot).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    val out = f.create(new org.apache.hadoop.fs.Path(
      new org.apache.hadoop.fs.Path(nsRoot, "metadata"), "v1.metadata.json"), true)
    out.write("""{"format-version":2,"location":"x","current-snapshot-id":-1,
      |"schemas":[{"type":"struct","schema-id":0,"fields":[]}],
      |"current-schema-id":0,"partition-specs":[{"spec-id":0,"fields":[]}],
      |"default-spec-id":0,"snapshots":[]}""".stripMargin.getBytes("UTF-8"))
    out.close()
    val e5 = intercept[IllegalArgumentException](
      ManifestTable.convertIceberg(spark, nsRoot))
    assert(e5.getMessage.contains("no current snapshot"), e5.getMessage)

    // an unpartitioned snapshot whose file sits under a k=v dir would
    // infer phantom partitions — refuse
    val kvRoot = mkRoot("kv")
    val kdf = spark.range(6).select(col("id"),
      lit("x").as("par"))
    val kr = DeltaLayout.writeFiles(spark, kvRoot, kdf, "d",
      partitionBy = Seq("par"))
    val km = IcebergLayout.writeManifest(spark, kvRoot, "m.avro",
      kr.map(r => (s"$kvRoot/$r", 1L, 1)))
    val kml = IcebergLayout.writeManifestList(spark, kvRoot, "ml.avro",
      Seq((km, 0)))
    IcebergLayout.writeMetadata(spark, kvRoot, 1,
      spark.range(1).toDF("id").schema, Nil, Some(kml))
    val e6 = intercept[IllegalArgumentException](
      ManifestTable.convertIceberg(spark, kvRoot))
    assert(e6.getMessage.contains("phantom"), e6.getMessage)
  }
}
