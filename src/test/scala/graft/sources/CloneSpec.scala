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
    // refusal: existing target
    intercept[IllegalArgumentException] {
      ManifestTable.shallowClone(spark, src, s"$r/v1")
    }
    // a DV-carrying source clones fine: the sidecars copy into the
    // clone's OWN _dv/ (never a reach into the source's private dirs)
    // and the deleted row stays dead in the clone
    ManifestTable.deleteVectorized(spark, src, col("id") === 1L)
    ManifestTable.shallowClone(spark, src, s"$r/dv")
    assert(ManifestTable.read(spark, s"$r/dv")
      .select("id").as[Long].collect().toSeq === Seq(2L))
    assert(java.nio.file.Files.exists(java.nio.file.Paths.get(s"$r/dv", "_dv")),
      "the clone must own a copy of the DV sidecars")
    // the clone never reads the SOURCE's _dv/: losing it changes nothing
    // (data files must stay — that part of the vacuum contract is unchanged)
    org.apache.commons.io.FileUtils.deleteDirectory(
      new java.io.File(src, "_dv"))
    assert(ManifestTable.read(spark, s"$r/dv")
      .select("id").as[Long].collect().toSeq === Seq(2L),
      "clone DVs are self-contained — the source's sidecars are not read")
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

  test("a DV'd branch forks zero-copy and FAST FORWARDs without any table rewrite") {
    val r = root("brdv")
    val path = s"$r/t"
    ManifestTable.overwrite(spark, path, spark.range(100)
      .select(col("id"), concat(lit("v"), col("id")).as("v")).coalesce(2))
    // main carries a DV at fork time — the branch must inherit it
    ManifestTable.deleteVectorized(spark, path, col("id") === 10L)
    ManifestTable.createBranch(spark, path, "exp")
    val bp = ManifestTable.branchPath(path, "exp")
    assert(ManifestTable.read(spark, bp).filter(col("id") === 10L).count() === 0L)
    // branch-side MOR work: a DV delete and a MOR update on the fork refs
    ManifestTable.deleteVectorized(spark, bp, col("id") === 20L)
    spark.conf.set(ManifestTable.DmlModeKey, "mor")
    try ManifestTable.update(spark, bp, col("id") === 30L, Seq("v" -> lit("u")))
    finally spark.conf.unset(ManifestTable.DmlModeKey)
    val mainBytes = dataFileNames(path)
    val v = ManifestTable.fastForward(spark, path, "exp")
    // the publish moved only the branch's small MOR append — every
    // pre-existing main data file is still present under the same name
    assert(mainBytes.subsetOf(dataFileNames(path)),
      "FAST FORWARD of a DV'd branch must not rewrite main's files")
    val got = ManifestTable.read(spark, path)
    assert(got.count() === 98L) // 100 - ids 10, 20
    assert(got.filter(col("id").isin(10L, 20L)).count() === 0L)
    assert(got.filter(col("id") === 30L).select("v").as[String].head() === "u")
    // published DVs are main's own now: time travel + further DML work
    assert(ManifestTable.readVersion(spark, path, v)
      .filter(col("id") === 20L).count() === 0L)
    ManifestTable.deleteVectorized(spark, path, col("id") === 40L)
    assert(ManifestTable.read(spark, path).count() === 97L)
  }

  test("SHALLOW CLONE of a live-eqdel table: sequences renumber, answers identical, zero materialization") {
    val r = root("eqclone")
    val src = s"$r/src"
    ManifestTable.overwrite(spark, src, spark.range(100)
      .select(col("id"), concat(lit("v"), col("id")).as("v")).coalesce(1),
      statsCols = Seq("id"))
    spark.conf.set(ManifestTable.DmlModeKey, "eq")
    try {
      // two entries at different sequences, with a delete-then-reborn key
      // whose survival depends on relative ORDER — the renumbering must
      // preserve every comparison
      ManifestTable.merge(spark, src, spark.range(0)
        .select(col("id"), lit("x").as("v")),
        keys = Seq("id"), deleteKeys = Some(Seq(5L, 6L).toDF("id")))
      ManifestTable.merge(spark, src, Seq((5L, "reborn")).toDF("id", "v"),
        keys = Seq("id"))
    } finally spark.conf.unset(ManifestTable.DmlModeKey)
    val want = ManifestTable.read(spark, src).orderBy("id").collect().toSeq
    val tgt = s"$r/tgt"
    ManifestTable.shallowClone(spark, src, tgt)
    assert(ManifestTable.read(spark, tgt).orderBy("id").collect().toSeq
      === want, "the clone answers exactly as the source")
    // zero-copy: no data bytes landed in the clone
    assert(!java.nio.file.Files.exists(java.nio.file.Paths.get(tgt, "data")) ||
      { var n = 0
        java.nio.file.Files.walk(java.nio.file.Paths.get(tgt, "data"))
          .forEach(p => if (p.toString.endsWith(".parquet")) n += 1)
        n == 0 })
    // the key sidecars are the clone's OWN (no reach into the source)
    assert(java.nio.file.Files.exists(java.nio.file.Paths.get(tgt, "_eqd")))
    // the clone lives its own life: an append carrying a carried-deleted
    // key is NOT deleted (new files sequence above every carried entry) …
    ManifestTable.append(spark, tgt, Seq((6L, "back")).toDF("id", "v"))
    assert(ManifestTable.read(spark, tgt).filter(col("id") === 6L)
      .select("v").as[String].collect().toSeq === Seq("back"))
    // … a fresh eq-merge linearizes after the carried ones …
    spark.conf.set(ManifestTable.DmlModeKey, "eq")
    try ManifestTable.merge(spark, tgt, spark.range(0)
      .select(col("id"), lit("x").as("v")),
      keys = Seq("id"), deleteKeys = Some(Seq(5L).toDF("id")))
    finally spark.conf.unset(ManifestTable.DmlModeKey)
    assert(ManifestTable.read(spark, tgt).filter(col("id") === 5L).count() === 0L)
    // … PURGE materializes the clone clean; the source is untouched
    ManifestTable.rewriteDeletes(spark, tgt)
    assert(ManifestTable.fastCount(spark, tgt) === Some(99L)) // 100 -5 -6 +back(6) -5
    assert(ManifestTable.read(spark, src).orderBy("id").collect().toSeq === want)
  }

  test("CHERRY-PICK replays an append-only branch onto MOVED main; conflicts refuse untouched") {
    val r = root("cp")
    val path = s"$r/t"
    ManifestTable.overwrite(spark, path, spark.range(100)
      .select(col("id"), lit("base").as("src")).coalesce(1))
    ManifestTable.createBranch(spark, path, "exp")
    val bp = ManifestTable.branchPath(path, "exp")
    // branch: two pure appends
    ManifestTable.append(spark, bp, spark.range(100, 120)
      .select(col("id"), lit("br1").as("src")))
    ManifestTable.append(spark, bp, spark.range(120, 130)
      .select(col("id"), lit("br2").as("src")))
    // main MOVES: an append AND a delete since the fork — fastForward
    // refuses this, cherry-pick is the answer
    ManifestTable.append(spark, path, spark.range(200, 210)
      .select(col("id"), lit("main").as("src")))
    ManifestTable.delete(spark, path, col("id") === 5L)
    intercept[Exception](ManifestTable.fastForward(spark, path, "exp"))
    val v = ManifestTable.cherryPick(spark, path, "exp")
    val got = ManifestTable.read(spark, path)
    assert(got.count() === 99L + 20L + 10L + 10L) // 100-1 +br1 +br2 +main
    assert(got.filter(col("src") === "br1").count() === 20L)
    assert(got.filter(col("src") === "br2").count() === 10L)
    assert(got.filter(col("id") === 5L).count() === 0L,
      "main's interleaved delete survives the replay")
    assert(ManifestTable.branches(spark, path).isEmpty,
      "a cherry-picked branch is dropped")
    // the replayed rows read as plain inserts in the change feed
    assert(ManifestTable.readChanges(spark, path, v - 1, v)
      .groupBy("_change_type").count().as[(String, Long)].collect().toMap
      === Map("insert" -> 30L))

    // refusal 1: a branch that DELETED cannot replay — table untouched
    ManifestTable.createBranch(spark, path, "del")
    ManifestTable.delete(spark, path, col("id") === 6L) // move main
    ManifestTable.delete(spark, ManifestTable.branchPath(path, "del"),
      col("id") === 7L)
    val nFiles = ManifestTable.read(spark, path).count()
    val e1 = intercept[IllegalArgumentException](
      ManifestTable.cherryPick(spark, path, "del"))
    assert(e1.getMessage.contains("not a pure append"))
    assert(ManifestTable.read(spark, path).count() === nFiles)
    ManifestTable.dropBranch(spark, path, "del")

    // refusal 2: main evolved its schema since the fork
    ManifestTable.createBranch(spark, path, "sch")
    ManifestTable.append(spark, ManifestTable.branchPath(path, "sch"),
      spark.range(300, 310).select(col("id"), lit("s").as("src")))
    ManifestTable.addColumns(spark, path, Seq(
      org.apache.spark.sql.types.StructField("extra",
        org.apache.spark.sql.types.LongType)))
    val e2 = intercept[IllegalArgumentException](
      ManifestTable.cherryPick(spark, path, "sch"))
    assert(e2.getMessage.contains("changed its definition"))
    ManifestTable.dropBranch(spark, path, "sch")
  }

  test("CHERRY-PICK purity gate covers constraints and properties — they would silently drop on replay") {
    val r = root("cpd")
    val path = s"$r/t"
    ManifestTable.overwrite(spark, path,
      spark.range(10).select(col("id"), (col("id") * 10).as("n")).coalesce(1))
    // branch adds a CHECK: not a pure append — the replayed main would
    // lose the constraint
    ManifestTable.createBranch(spark, path, "con")
    ManifestTable.addConstraint(spark,
      ManifestTable.branchPath(path, "con"), "n_pos", "n >= 0")
    ManifestTable.append(spark, path, Seq((50L, 500L)).toDF("id", "n"))
    val e1 = intercept[IllegalArgumentException](
      ManifestTable.cherryPick(spark, path, "con"))
    assert(e1.getMessage.contains("not a pure append"))
    ManifestTable.dropBranch(spark, path, "con")
    // branch sets a table property: same refusal
    ManifestTable.createBranch(spark, path, "prop")
    ManifestTable.setProperties(spark,
      ManifestTable.branchPath(path, "prop"), Map("graft.autoCompact" -> "true"))
    ManifestTable.append(spark, path, Seq((51L, 510L)).toDF("id", "n"))
    val e2 = intercept[IllegalArgumentException](
      ManifestTable.cherryPick(spark, path, "prop"))
    assert(e2.getMessage.contains("not a pure append"))
    ManifestTable.dropBranch(spark, path, "prop")
  }

  test("CHERRY-PICK re-gates branch appends under constraints main added after the fork") {
    val r = root("cpc")
    val path = s"$r/t"
    ManifestTable.overwrite(spark, path,
      spark.range(10).select(col("id"), (col("id") * 10).as("n")).coalesce(1))
    ManifestTable.createBranch(spark, path, "exp")
    ManifestTable.append(spark, ManifestTable.branchPath(path, "exp"),
      Seq((100L, -5L)).toDF("id", "n")) // violates the FUTURE constraint
    // main moves AND adds a constraint the branch never saw
    ManifestTable.append(spark, path, Seq((50L, 500L)).toDF("id", "n"))
    ManifestTable.addConstraint(spark, path, "n_pos", "n >= 0")
    val e = intercept[Exception](ManifestTable.cherryPick(spark, path, "exp"))
    assert(e.getMessage.contains("n_pos"))
    assert(ManifestTable.read(spark, path).filter(col("n") < 0).count() === 0L,
      "the violating branch rows must not land")
    ManifestTable.dropBranch(spark, path, "exp")
  }

  // the SQL face (CREATE TABLE … SHALLOW CLONE …) needs the injected graft
  // parser and is covered in GraftSqlParserSpec
}
