package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType, StructField}
import java.nio.file.Files

/** Column DEFAULT values (Iceberg-v3 initial-default re-derived,
  * NULL-backfill flavor): `ADD COLUMN c T DEFAULT lit` is one metadata
  * commit — old files read the default with zero rewrite, writers may
  * omit or NULL the column, and post-add files physically materialize
  * the value so zone maps stay exact.
  */
class ColumnDefaultSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(tag: String): String =
    Files.createTempDirectory(s"cdef_$tag").toString + "/t"

  test("ADD COLUMN DEFAULT: metadata-only, old files read the default, new writes fill") {
    val path = tmp("basic")
    ManifestTable.overwrite(spark, path,
      spark.range(100).select(col("id"), concat(lit("v"), col("id")).as("v"))
        .coalesce(2))
    def files() = {
      val out = scala.collection.mutable.Map[String, Long]()
      java.nio.file.Files.walk(java.nio.file.Paths.get(path, "data")).forEach { p =>
        if (p.toString.endsWith(".parquet"))
          out(p.toString) = java.nio.file.Files.size(p)
      }
      out.toMap
    }
    val before = files()
    ManifestTable.addColumns(spark, path,
      Seq(StructField("score", LongType), StructField("lang", StringType)),
      defaults = Map("score" -> "7", "lang" -> "'en'"))
    assert(files() === before, "ADD COLUMN DEFAULT must be metadata-only")
    // every pre-add row reads the defaults
    val got = ManifestTable.read(spark, path)
    assert(got.filter(col("score") === 7L && col("lang") === "en").count() === 100L)
    // an append OMITTING both columns fills them
    ManifestTable.append(spark, path,
      spark.range(100, 110).select(col("id"), lit("new").as("v")))
    // an append carrying one value and one NULL: value kept, NULL → default
    ManifestTable.append(spark, path,
      Seq((200L, "x", Option(99L), Option.empty[String]))
        .toDF("id", "v", "score", "lang"))
    val all = ManifestTable.read(spark, path)
    assert(all.filter(col("score").isNull || col("lang").isNull).count() === 0L)
    assert(all.filter(col("id") === 200L).select("score", "lang")
      .as[(Long, String)].head() === ((99L, "en")))
    assert(all.filter(col("id") === 105L).select("score", "lang")
      .as[(Long, String)].head() === ((7L, "en")))
    // aggregates see the default uniformly
    assert(all.agg(sum("score")).head.getLong(0) === 100L * 7 + 10L * 7 + 99L)
  }

  test("defaults survive rename, compose with DML/time travel, and validate loudly") {
    val path = tmp("ddl")
    ManifestTable.overwrite(spark, path,
      spark.range(50).select(col("id")).coalesce(1))
    ManifestTable.addColumns(spark, path,
      Seq(StructField("grade", LongType)), defaults = Map("grade" -> "3"))
    // rename keeps the linkage (the default is keyed by PHYSICAL name)
    ManifestTable.renameColumn(spark, path, "grade", "rank")
    assert(ManifestTable.read(spark, path).filter(col("rank") === 3L).count() === 50L)
    // COW update on a default column: untouched rows still read 3
    ManifestTable.update(spark, path, col("id") === 5L, Seq("rank" -> lit(9L)))
    val r = ManifestTable.read(spark, path)
    assert(r.filter(col("rank") === 9L).count() === 1L)
    assert(r.filter(col("rank") === 3L).count() === 49L)
    // time travel: the pre-add snapshot has no such column
    assert(!ManifestTable.readVersion(spark, path, 1L).columns.contains("rank"))
    // a dropped default column's entry goes stale harmlessly; re-add under
    // the same name gets a FRESH physical name and its own default
    ManifestTable.dropColumn(spark, path, "rank")
    ManifestTable.addColumns(spark, path,
      Seq(StructField("rank", LongType)), defaults = Map("rank" -> "11"))
    assert(ManifestTable.read(spark, path).filter(col("rank") === 11L).count() === 50L,
      "the re-added column must read ITS default, never the dropped bytes")
    // validation: non-constant and ill-typed defaults refuse at DDL time
    val e1 = intercept[Exception](ManifestTable.addColumns(spark, path,
      Seq(StructField("bad", LongType)), defaults = Map("bad" -> "id + 1")))
    assert(e1.getMessage.contains("constant literal"))
    val e2 = intercept[Exception](ManifestTable.addColumns(spark, path,
      Seq(StructField("bad", LongType)), defaults = Map("bad" -> "rand()")))
    assert(e2.getMessage.contains("constant literal"))
    intercept[Exception](ManifestTable.addColumns(spark, path,
      Seq(StructField("other", LongType)), defaults = Map("bad" -> "1")))
  }

  test("SQL face: ALTER TABLE ADD COLUMN DEFAULT + positional INSERT omitting trailing defaults") {
    val s = MorDmlSpec.extSpark
    import s.implicits._
    val path = tmp("sql")
    ManifestTable.overwrite(s, path,
      s.range(20).select(col("id"), concat(lit("v"), col("id")).as("v")).coalesce(1))
    s.sql("DROP TABLE IF EXISTS cdef_t")
    s.sql(s"CREATE TABLE cdef_t USING graft OPTIONS (path '$path')")
    try {
      s.sql("ALTER TABLE cdef_t ADD COLUMN score BIGINT DEFAULT 42")
      assert(s.sql("SELECT count(*) FROM cdef_t WHERE score = 42")
        .as[Long].head() === 20L)
      // positional INSERT omitting the trailing default column
      s.sql("INSERT INTO cdef_t VALUES (100, 'ins')")
      // ... and one supplying it
      s.sql("INSERT INTO cdef_t VALUES (101, 'ins2', 7)")
      assert(s.sql("SELECT score FROM cdef_t WHERE id = 100").as[Long].head() === 42L)
      assert(s.sql("SELECT score FROM cdef_t WHERE id = 101").as[Long].head() === 7L)
      // predicates/aggregates over the mixed old/new files
      assert(s.sql("SELECT sum(score) FROM cdef_t").as[Long].head()
        === 20L * 42 + 42 + 7)
      // the default shows in table properties (versioned metadata)
      val props = s.sql("SHOW TBLPROPERTIES cdef_t").collect()
        .map(r => r.getString(0) -> r.getString(1)).toMap
      assert(props.get("graft.default.score").contains("42"))
    } finally s.sql("DROP TABLE IF EXISTS cdef_t"): Unit
  }

  test("MERGE and REPLACE WHERE fill omitted default columns") {
    val path = tmp("dml")
    ManifestTable.overwrite(spark, path,
      spark.range(10).select(col("id"), col("id").as("n")).coalesce(1))
    ManifestTable.addColumns(spark, path,
      Seq(StructField("tag", StringType)), defaults = Map("tag" -> "'t0'"))
    // merge batch omits the default column entirely
    ManifestTable.merge(spark, path,
      Seq((5L, 500L), (20L, 2000L)).toDF("id", "n"), keys = Seq("id"))
    val got = ManifestTable.read(spark, path)
    assert(got.count() === 11L)
    assert(got.filter(col("tag").isNull).count() === 0L)
    assert(got.filter(col("id") === 20L).select("tag").as[String].head() === "t0")
    // REPLACE WHERE with an omitting batch
    ManifestTable.overwriteWhere(spark, path,
      Seq((7L, 777L)).toDF("id", "n"), col("id") === 7L)
    assert(ManifestTable.read(spark, path).filter(col("id") === 7L)
      .select("n", "tag").as[(Long, String)].head() === ((777L, "t0")))
  }

  test("UPDATE SET <defaultCol> = NULL materializes the default — stats/Bloom pruning stays exact (COW and MOR)") {
    for (mode <- Seq(None, Some("mor"))) {
      val path = tmp("setnull" + mode.getOrElse("cow"))
      // the default column IS a stats+bloom column: an update writing a
      // physical NULL here would record an all-null zone map for the new
      // file and bound pruning would silently drop matching rows
      ManifestTable.overwrite(spark, path,
        spark.range(100).select(col("id"), concat(lit("v"), col("id")).as("v"))
          .coalesce(2))
      ManifestTable.addColumns(spark, path,
        Seq(StructField("score", LongType)), defaults = Map("score" -> "7"))
      // score joins statsCols BEFORE the update, so the update's own
      // commit records zone maps for its rewritten/appended files — the
      // exact shape ADVICE flagged (all-null zone map → wrong pruning).
      // This also stats the PRE-add files (their bytes lack the column →
      // recorded all-null), pinning the read-as-default stats correction.
      ManifestTable.analyzeStats(spark, path, Seq("score"))
      mode.foreach(spark.conf.set(ManifestTable.DmlModeKey, _))
      try ManifestTable.update(spark, path, col("id") < 10L,
        Seq("score" -> lit(null), "v" -> lit("upd")))
      finally mode.foreach(_ => spark.conf.unset(ManifestTable.DmlModeKey))
      val got = ManifestTable.read(spark, path).filter(col("score") === 7L)
      assert(got.count() === 100L,
        s"mode=$mode: WHERE score = <default> must see the updated rows " +
          "— a physically-NULL default column poisons zone-map pruning")
      assert(got.filter(col("id") < 10L && col("v") =!= "upd").count() === 0L)
      // the point-read face (manifest-pruned) agrees with the full scan
      assert(ManifestTable.readPoint(spark, path, "score", 7L).count() === 100L)
      // metadata answers see the rows AS READ, not the physical bytes:
      // min/max include the default, COUNT(score) counts every row
      // (physical NULLs read as the non-null default). MOR leaves DVs,
      // which rightly decline metadata answers — purge them first
      // (a no-op under COW).
      ManifestTable.rewriteDeletes(spark, path)
      assert(ManifestTable.fastMinMax(spark, path, "score") === Some((7L, 7L)))
      val m = ManifestTable.readManifest(spark, path,
        ManifestTable.currentVersion(spark, path).get)
      assert(ManifestTable.fastNonNullCountOf(m, "score") === Some(100L))
    }
  }
}
