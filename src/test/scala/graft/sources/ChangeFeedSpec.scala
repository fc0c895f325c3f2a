package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Row-level change data feed ([[ManifestTable.readChanges]]): the Delta
  * CDF shape — `_change_type` insert/delete rows per commit — derived
  * from the file-level CDF by multiset difference, so rewrites that merely
  * carry rows (compaction, the untouched rows of an updated file) emit
  * nothing.
  */
class ChangeFeedSpec extends SparkSpec {
  import spark.implicits._

  private def changes(path: String, from: Long, to: Long): Seq[(Long, String, String, Long)] =
    ManifestTable.readChanges(spark, path, from, to)
      .select(col("id"), col("v"), col("_change_type"), col("_commit_version"))
      .as[(Long, String, String, Long)].collect().sortBy(r => (r._4, r._3, r._1)).toSeq

  test("append commits surface as pure inserts, stamped with their commit version") {
    val path = Files.createTempDirectory("cdf_append").toString + "/t"
    ManifestTable.overwrite(spark, path,
      Seq((1L, "a"), (2L, "b")).toDF("id", "v").coalesce(1))
    ManifestTable.append(spark, path, Seq((3L, "c")).toDF("id", "v"))
    ManifestTable.append(spark, path, Seq((4L, "d"), (5L, "e")).toDF("id", "v"))
    assert(changes(path, 1, 2) === Seq((3L, "c", "insert", 2L)))
    assert(changes(path, 1, 3) === Seq((3L, "c", "insert", 2L),
      (4L, "d", "insert", 3L), (5L, "e", "insert", 3L)))
    // the initial version itself, if asked for, is all inserts
    assert(changes(path, 0, 1) === Seq((1L, "a", "insert", 1L), (2L, "b", "insert", 1L)))
    // empty range → empty frame with the CDC schema
    val empty = ManifestTable.readChanges(spark, path, 3, 3)
    assert(empty.isEmpty && empty.columns.takeRight(2) ===
      Array("_change_type", "_commit_version"))
  }

  test("a deletion-vector commit emits exactly the deleted rows as deletes") {
    val path = Files.createTempDirectory("cdf_dv").toString + "/t"
    ManifestTable.overwrite(spark, path,
      Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "v").coalesce(1))
    ManifestTable.deleteVectorized(spark, path, col("id") === 2L)
    // file-level CDF re-delivers the whole touched file both ways; the
    // row-level feed must cancel the carried rows (1 and 3)
    assert(changes(path, 1, 2) === Seq((2L, "b", "delete", 2L)))
  }

  test("copy-on-write delete and update emit only the changed rows (carried rows cancel)") {
    val path = Files.createTempDirectory("cdf_cow").toString + "/t"
    ManifestTable.overwrite(spark, path,
      Seq((1L, "a"), (2L, "b"), (3L, "c"), (4L, "d")).toDF("id", "v").coalesce(1))
    ManifestTable.delete(spark, path, col("id") === 3L) // v2: rewrites the file
    assert(changes(path, 1, 2) === Seq((3L, "c", "delete", 2L)))
    ManifestTable.update(spark, path, col("id") === 1L, Seq("v" -> lit("A"))) // v3
    assert(changes(path, 2, 3) === Seq(
      (1L, "A", "update_postimage", 3L), (1L, "a", "update_preimage", 3L)),
      "an update is its TYPED pre/post pair; untouched rows of the rewritten file are invisible")
  }

  test("four-type CDF: update commits emit typed pairs, merge pairs by key, delete+reinsert stays plain") {
    val path = Files.createTempDirectory("cdf_types").toString + "/t"
    ManifestTable.overwrite(spark, path,
      Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "v").coalesce(1))
    // v2: a MERGE that updates key 2, inserts key 4, deletes key 3 — the
    // pairing must type ONLY key 2 as an update
    ManifestTable.merge(spark, path, Seq((2L, "B"), (4L, "d")).toDF("id", "v"),
      keys = Seq("id"), deleteKeys = Some(Seq(Tuple1(3L)).toDF("id")))
    assert(changes(path, 1, 2) === Seq(
      (4L, "d", "insert", 2L),
      (3L, "c", "delete", 2L),
      (2L, "B", "update_postimage", 2L),
      (2L, "b", "update_preimage", 2L)).sortBy(r => (r._4, r._3, r._1)),
      "merge types exactly the keys present on both sides of the diff")
    // v3+v4: DELETE then re-INSERT the same key across two commits — two
    // plain changes, NOT an update pair (the four-type refinement is
    // per-commit, keyed on the recorded op)
    ManifestTable.delete(spark, path, col("id") === 1L)                // v3
    ManifestTable.append(spark, path, Seq((1L, "a2")).toDF("id", "v")) // v4
    assert(changes(path, 2, 4) === Seq(
      (1L, "a", "delete", 3L), (1L, "a2", "insert", 4L)),
      "a delete and a re-insert across commits are two real changes, never an update pair")
  }

  test("compaction and DV materialization emit no change rows (rewrite invisibility)") {
    val path = Files.createTempDirectory("cdf_compact").toString + "/t"
    ManifestTable.overwrite(spark, path,
      spark.range(20).select(col("id"), concat(lit("r"), col("id")).as("v"))
        .repartition(4))
    ManifestTable.deleteVectorized(spark, path, col("id") === 7L) // v2
    ManifestTable.rewriteDeletes(spark, path) // v3: materializes the DV
    ManifestTable.compact(spark, path, targetRowsPerFile = 100L) // v4
    assert(changes(path, 2, 3).isEmpty,
      "PURGE rewrites a file to its visible rows — no logical change")
    assert(changes(path, 3, 4).isEmpty, "compaction carries every row — no logical change")
    // the whole range still reports the one real change
    assert(changes(path, 1, 4) === Seq((7L, "r7", "delete", 2L)))
  }

  test("the change feed reads through the DataSource and SQL faces (changesFrom/changesTo)") {
    val path = Files.createTempDirectory("cdf_sql").toString + "/t"
    ManifestTable.overwrite(spark, path,
      Seq((1L, "a"), (2L, "b")).toDF("id", "v").coalesce(1))
    ManifestTable.append(spark, path, Seq((3L, "c")).toDF("id", "v")) // v2
    ManifestTable.deleteVectorized(spark, path, col("id") === 1L)      // v3
    def rows(df: org.apache.spark.sql.DataFrame): Seq[(Long, String, Long)] =
      df.select(col("id"), col("_change_type"), col("_commit_version"))
        .as[(Long, String, Long)].collect().sortBy(r => (r._3, r._2, r._1)).toSeq
    // reader face, changesTo defaulting to the current version
    assert(rows(spark.read.format("graft").option("path", path)
        .option("changesFrom", "1").load())
      === Seq((3L, "insert", 2L), (1L, "delete", 3L)))
    // bounded range
    assert(rows(spark.read.format("graft").option("path", path)
        .option("changesFrom", "1").option("changesTo", "2").load())
      === Seq((3L, "insert", 2L)))
    // SQL face
    spark.sql("DROP TABLE IF EXISTS cdf_sql_t")
    spark.sql(s"CREATE TABLE cdf_sql_t USING graft " +
      s"OPTIONS (path '$path', changesFrom '2')")
    try assert(rows(spark.table("cdf_sql_t")) === Seq((1L, "delete", 3L)))
    finally spark.sql("DROP TABLE IF EXISTS cdf_sql_t"): Unit
  }

  test("cdf.eqdels=compute: row deltas across an eq-delete commit equal mor ingestion; follower replica converges") {
    def mk(tag: String): String = {
      val p = Files.createTempDirectory(s"cdf_eq$tag").toString + "/t"
      ManifestTable.overwrite(spark, p,
        Seq((1L, "a"), (2L, "b"), (3L, "c"), (4L, "d")).toDF("id", "v")
          .coalesce(1), statsCols = Seq("id"))
      p
    }
    val eq = mk("e"); val mor = mk("m")
    val batch = Seq((2L, "B"), (9L, "i")).toDF("id", "v") // upsert 2, insert 9
    val dels = Seq(3L).toDF("id")
    spark.conf.set(ManifestTable.DmlModeKey, "eq")
    try ManifestTable.merge(spark, eq, batch, keys = Seq("id"),
      deleteKeys = Some(dels))
    finally spark.conf.unset(ManifestTable.DmlModeKey)
    spark.conf.set(ManifestTable.DmlModeKey, "mor")
    try ManifestTable.merge(spark, mor, batch, keys = Seq("id"),
      deleteKeys = Some(dels))
    finally spark.conf.unset(ManifestTable.DmlModeKey)
    // the default stays the loud refusal
    val e = intercept[Exception](ManifestTable.readChanges(spark, eq, 1, 2).count())
    assert(e.getMessage.contains("equality-delete"))
    spark.conf.set("spark.graft.cdf.eqdels", "compute")
    try {
      assert(changes(eq, 1, 2) === changes(mor, 1, 2),
        "the same upsert batch must emit the identical typed row delta " +
          "under eq and mor ingestion")
      assert(changes(eq, 1, 2) === Seq(
        (2L, "b", "update_preimage", 2L), (2L, "B", "update_postimage", 2L),
        (3L, "c", "delete", 2L), (9L, "i", "insert", 2L))
        .sortBy(r => (r._4, r._3, r._1)))
      // follower replica: apply the windowed change feed to an in-memory
      // replica — the final state must equal the table
      var replica = Map.empty[Long, String]
      graft.streaming.Streaming.followChanges(spark, eq,
        Files.createTempDirectory("cdf_eqf").toString) { (df, _, _) =>
        df.select(col("id"), col("v"), col("_change_type"),
            col("_commit_version"))
          .as[(Long, String, String, Long)].collect()
          .sortBy(r => (r._4, r._3 == "insert" || r._3 == "update_postimage"))
          .foreach { case (id, v, t, _) =>
            if (t == "insert" || t == "update_postimage") replica += (id -> v)
            else replica -= id
          }
      }
      assert(replica === ManifestTable.read(spark, eq)
        .as[(Long, String)].collect().toMap,
        "a follower over an eq-ingested table converges to the table")
    } finally spark.conf.unset("spark.graft.cdf.eqdels")
  }

  test("readChanges across a rename commit aligns by PHYSICAL identity, not name") {
    val path = Files.createTempDirectory("cdf_rename").toString + "/t"
    ManifestTable.overwrite(spark, path,
      Seq((1L, "a"), (2L, "b")).toDF("id", "v").coalesce(1))
    ManifestTable.renameColumn(spark, path, "v", "val")                 // v2
    ManifestTable.append(spark, path, Seq((3L, "c")).toDF("id", "val")) // v3
    val got = ManifestTable.readChanges(spark, path, 0, 3)
      .select(col("id"), col("val"), col("_change_type"), col("_commit_version"))
      .as[(Long, Option[String], String, Long)].collect().sortBy(_._1).toSeq
    assert(got === Seq((1L, Some("a"), "insert", 1L), (2L, Some("b"), "insert", 1L),
      (3L, Some("c"), "insert", 3L)),
      "pre-rename steps must carry their values under the new name — a name-keyed " +
        "alignment would null them out and corrupt any replica bootstrapped across the rename")
  }

  test("a dropped-and-re-added column reads NULL in steps predating the re-add") {
    val path = Files.createTempDirectory("cdf_readd").toString + "/t"
    ManifestTable.overwrite(spark, path, Seq((1L, "a")).toDF("id", "v").coalesce(1))
    ManifestTable.dropColumn(spark, path, "v")                          // v2
    ManifestTable.append(spark, path, Seq((2L, "x")).toDF("id", "v"))   // v3: fresh physical
    val got = ManifestTable.readChanges(spark, path, 0, 3)
      .select(col("id"), col("v"), col("_change_type"), col("_commit_version"))
      .as[(Long, Option[String], String, Long)].collect().sortBy(_._1).toSeq
    assert(got === Seq((1L, None, "insert", 1L), (2L, Some("x"), "insert", 3L)),
      "the dropped vintage's bytes must not resurrect under the re-added namesake")
  }

  test("schema evolution inside the range null-aligns earlier steps to the final schema") {
    val path = Files.createTempDirectory("cdf_evolve").toString + "/t"
    ManifestTable.overwrite(spark, path, Seq((1L, "a")).toDF("id", "v").coalesce(1))
    ManifestTable.append(spark, path, Seq((2L, "b")).toDF("id", "v")) // v2: pre-evolution
    ManifestTable.append(spark, path,
      Seq((3L, "c", 30L)).toDF("id", "v", "w")) // v3: adds w
    val got = ManifestTable.readChanges(spark, path, 1, 3)
      .select(col("id"), col("w"), col("_change_type"), col("_commit_version"))
      .as[(Long, Option[Long], String, Long)].collect().sortBy(_._1).toSeq
    assert(got === Seq((2L, None, "insert", 2L), (3L, Some(30L), "insert", 3L)))
  }
}
