package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** VARIANT columns through the manifest table (Spark 4's `VariantType` —
  * the modern shape for a corpus's heterogeneous JSON metadata): the
  * binary variant is an opaque payload to the format, so every snapshot
  * mechanism must carry it untouched — these specs pin the round-trip,
  * typed extraction, heterogeneous rows, CDF, DML, and time travel. The
  * declared-stats guard matters too: a variant column cannot be a
  * zone-map/Bloom column (no order, no stable hash), and declaring one
  * must refuse loudly rather than corrupt pruning.
  */
class VariantSpec extends SparkSpec {
  import spark.implicits._

  test("variant round-trip: write, typed extraction, heterogeneous shapes, nested paths") {
    val path = Files.createTempDirectory("variant_rt").toString + "/t"
    // heterogeneous JSON per row — the shape a real props column takes
    val js = Seq(
      (1L, """{"lang":"en","score":3,"tags":["a","b"]}"""),
      (2L, """{"lang":"fr","quality":{"len":42,"ok":true}}"""),
      (3L, """{"score":7.5}"""),
      (4L, """null"""))
      .toDF("id", "j")
    ManifestTable.overwrite(spark, path,
      js.select(col("id"), parse_json(col("j")).as("props")))
    val got = ManifestTable.read(spark, path)
    assert(got.schema("props").dataType.typeName === "variant")
    assert(got.count() === 4L)
    val langs = got.select(col("id"),
      variant_get(col("props"), "$.lang", "string").as("lang"))
      .orderBy("id").collect().map(r => if (r.isNullAt(1)) null else r.getString(1))
    assert(langs.toSeq === Seq("en", "fr", null, null))
    // nested path + typed numeric extraction
    assert(got.filter(col("id") === 2L)
      .select(variant_get(col("props"), "$.quality.len", "long"))
      .head().getLong(0) === 42L)
    // array element path
    assert(got.filter(col("id") === 1L)
      .select(variant_get(col("props"), "$.tags[1]", "string"))
      .head().getString(0) === "b")
    // try_variant_get on a type mismatch: null, not an error
    assert(got.filter(col("id") === 3L)
      .select(try_variant_get(col("props"), "$.score", "string"))
      .head().getString(0) === "7.5")
  }

  test("variant columns ride CDF, DML, and time travel untouched") {
    val path = Files.createTempDirectory("variant_dml").toString + "/t"
    ManifestTable.overwrite(spark, path, spark.range(5).select(col("id"),
      parse_json(concat(lit("""{"v":"""), col("id"), lit("}"))).as("props")))
    // COW delete: variant payloads rewrite byte-faithfully
    ManifestTable.delete(spark, path, col("id") === 2L)
    val after = ManifestTable.read(spark, path)
    assert(after.count() === 4L)
    assert(after.select(variant_get(col("props"), "$.v", "long").as("v"))
      .as[Long].collect().sorted.toSeq === Seq(0L, 1L, 3L, 4L))
    // CDF across the delete emits the variant rows
    val ch = ManifestTable.readChanges(spark, path, 1L, 2L)
    val del = ch.filter(col("_change_type") === "delete")
      .select(variant_get(col("props"), "$.v", "long")).collect()
    assert(del.map(_.getLong(0)).toSeq === Seq(2L))
    // time travel reads the pre-delete variant snapshot
    assert(ManifestTable.readVersion(spark, path, 1L).count() === 5L)
    // append with evolution: a NEW variant column lands nullable
    ManifestTable.append(spark, path, Seq((100L, """{"v":100}""", """{"x":1}"""))
      .toDF("id", "j", "j2")
      .select(col("id"), parse_json(col("j")).as("props"),
        parse_json(col("j2")).as("extra")))
    val evolved = ManifestTable.read(spark, path)
    assert(evolved.schema("extra").dataType.typeName === "variant")
    assert(evolved.filter(col("id") === 0L).select("extra").head().isNullAt(0))
    assert(evolved.filter(col("id") === 100L)
      .select(variant_get(col("extra"), "$.x", "long")).head().getLong(0) === 1L)
  }

  test("a variant column refuses zone-map/Bloom declaration loudly") {
    val path = Files.createTempDirectory("variant_stats").toString + "/t"
    val df = spark.range(3).select(col("id"),
      parse_json(lit("""{"a":1}""")).as("props"))
    val e = intercept[Exception] {
      ManifestTable.overwrite(spark, path, df, statsCols = Seq("props"))
    }
    assert(e.getMessage != null)
    // stats on OTHER columns work fine beside a variant payload
    val p2 = Files.createTempDirectory("variant_stats2").toString + "/t"
    ManifestTable.overwrite(spark, p2, df, statsCols = Seq("id"))
    assert(ManifestTable.read(spark, p2).filter(col("id") === 1L).count() === 1L)
  }
}
