package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Equality deletes (`spark.graft.dml.mode=eq` — Iceberg v2 eq-deletes /
  * the Flink CDC writer): MERGE writes a key sidecar and appends the
  * batch, READING NOTHING — readers anti-join files sequenced before the
  * delete against the key set. These specs pin the zero-read write
  * contract, sequence-ordered semantics, every reader face, the
  * metadata-decline discipline, PURGE materialization, the feature-gated
  * format stamp, and the loud refusals (CDF, streaming, zero-copy ops).
  */
class EqualityDeleteSpec extends SparkSpec {
  import spark.implicits._

  private def withEq[A](s: SparkSession)(body: => A): A = {
    s.conf.set(ManifestTable.DmlModeKey, "eq")
    try body finally s.conf.unset(ManifestTable.DmlModeKey)
  }

  private def mkTable(tag: String, n: Int = 10000): String = {
    val path = Files.createTempDirectory(s"eqd_$tag").toString + "/t"
    ManifestTable.overwrite(spark, path, spark.range(n).select(col("id"),
      concat(lit("v"), col("id")).as("v")).repartitionByRange(4, col("id")),
      statsCols = Seq("id"))
    path
  }

  private def dataFiles(path: String): Map[String, Long] = {
    val out = scala.collection.mutable.Map[String, Long]()
    java.nio.file.Files.walk(java.nio.file.Paths.get(path, "data")).forEach { p =>
      if (p.toString.endsWith(".parquet"))
        out(p.toString) = java.nio.file.Files.size(p)
    }
    out.toMap
  }

  private def manifestText(path: String, v: Long): String =
    new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(path, "_manifests", f"m$v%012d.txt")))

  test("eq MERGE writes zero table bytes and matches the COW answer") {
    val cow = mkTable("cow"); val eq = mkTable("eq")
    val updates = spark.range(50).select((col("id") * 100).as("id"),
        lit("upd").as("v"))
      .unionAll(spark.range(20).select((col("id") + 20000L).as("id"),
        lit("new").as("v")))
    val dels = spark.range(30).select((col("id") * 100 + 51).as("id"))
    ManifestTable.merge(spark, cow, updates, keys = Seq("id"),
      deleteKeys = Some(dels))
    val before = dataFiles(eq)
    withEq(spark) {
      ManifestTable.merge(spark, eq, updates, keys = Seq("id"),
        deleteKeys = Some(dels))
    }
    val after = dataFiles(eq)
    before.foreach { case (f, sz) =>
      assert(after.get(f).contains(sz), s"eq merge rewrote $f") }
    // the write is key-sidecar + batch only: no DV dir, an _eqd dir
    assert(!java.nio.file.Files.exists(java.nio.file.Paths.get(eq, "_dv")))
    assert(java.nio.file.Files.exists(java.nio.file.Paths.get(eq, "_eqd")))
    assert(ManifestTable.read(spark, eq).orderBy("id").collect().toSeq
      === ManifestTable.read(spark, cow).orderBy("id").collect().toSeq)
    // live eqdels stamp format 2 (feature-gated protocol)
    assert(manifestText(eq, 2L).contains("format=2"))
    assert(manifestText(eq, 2L).contains("eqdel="))
  }

  test("sequence order: the merge's own batch is exempt; chained merges linearize") {
    val path = mkTable("seq", n = 100)
    withEq(spark) {
      // upsert key 5 — the new copy must survive its own delete
      ManifestTable.merge(spark, path,
        Seq((5L, "u1")).toDF("id", "v"), keys = Seq("id"))
      assert(ManifestTable.read(spark, path).filter(col("id") === 5L)
        .select("v").as[String].collect().toSeq === Seq("u1"))
      // re-upsert the same key: the older upsert's copy dies too
      ManifestTable.merge(spark, path,
        Seq((5L, "u2")).toDF("id", "v"), keys = Seq("id"))
      // delete it outright, then re-insert later: the re-insert survives
      ManifestTable.merge(spark, path,
        spark.range(0).select(col("id"), lit("x").as("v")),
        keys = Seq("id"), deleteKeys = Some(Seq(5L).toDF("id")))
      assert(ManifestTable.read(spark, path).filter(col("id") === 5L).count() === 0L)
      ManifestTable.merge(spark, path,
        Seq((5L, "reborn")).toDF("id", "v"), keys = Seq("id"))
    }
    val got = ManifestTable.read(spark, path)
    assert(got.filter(col("id") === 5L).select("v").as[String].collect().toSeq
      === Seq("reborn"))
    assert(got.count() === 100L)
    assert(got.groupBy("id").count().filter(col("count") > 1).count() === 0L)
  }

  test("every reader face honors eq-deletes: pruned/range/point, time travel, SQL scan, metadata declines") {
    val path = mkTable("faces", n = 1000)
    withEq(spark) {
      ManifestTable.merge(spark, path,
        Seq((100L, "u100")).toDF("id", "v"),
        keys = Seq("id"), deleteKeys = Some(Seq(101L, 102L).toDF("id")))
    }
    assert(ManifestTable.readRange(spark, path, "id", 95L, 105L)
      .select("id").as[Long].collect().sorted
      === Array(95L, 96L, 97L, 98L, 99L, 100L, 103L, 104L, 105L))
    assert(ManifestTable.readPoint(spark, path, "id", 101L).count() === 0L)
    assert(ManifestTable.readPoint(spark, path, "id", 100L)
      .select("v").as[String].head() === "u100")
    // time travel: the pre-merge snapshot still holds the old rows
    assert(ManifestTable.readVersion(spark, path, 1L)
      .filter(col("id").isin(100L, 101L, 102L)).count() === 3L)
    // the SQL datasource scan
    spark.sql("DROP TABLE IF EXISTS eqd_sql_t")
    spark.sql(s"CREATE TABLE eqd_sql_t USING graft OPTIONS (path '$path')")
    try {
      assert(spark.sql("SELECT count(*) FROM eqd_sql_t").as[Long].head() === 998L)
      assert(spark.sql("SELECT v FROM eqd_sql_t WHERE id = 100").as[String].head() === "u100")
    } finally spark.sql("DROP TABLE IF EXISTS eqd_sql_t"): Unit
    // metadata fast paths DECLINE (key multiplicity unknown) but scans stay exact
    assert(ManifestTable.fastCount(spark, path).isEmpty)
    assert(ManifestTable.fastMinMax(spark, path, "id").isEmpty)
    assert(ManifestTable.read(spark, path).count() === 998L)
  }

  test("interplay: DVs and MOR on an eq-deleted table never resurrect") {
    val path = mkTable("mix", n = 1000)
    withEq(spark) {
      ManifestTable.merge(spark, path, spark.range(0)
        .select(col("id"), lit("x").as("v")),
        keys = Seq("id"), deleteKeys = Some(Seq(10L).toDF("id")))
    }
    // a position delete on top of the eq-delete
    ManifestTable.deleteVectorized(spark, path, col("id") === 11L)
    assert(ManifestTable.read(spark, path).filter(col("id").isin(10L, 11L))
      .count() === 0L)
    // MOR update whose predicate spans both deleted rows: neither comes back
    spark.conf.set(ManifestTable.DmlModeKey, "mor")
    try ManifestTable.update(spark, path, col("id").between(9L, 12L),
      Seq("v" -> lit("u")))
    finally spark.conf.unset(ManifestTable.DmlModeKey)
    val got = ManifestTable.read(spark, path).filter(col("id").between(9L, 12L))
    assert(got.select("id").as[Long].collect().sorted === Array(9L, 12L))
    assert(got.filter(col("v") =!= "u").count() === 0L)
  }

  test("OPTIMIZE PURGE materializes: entries retire, format returns to 1, answers equal") {
    val path = mkTable("purge", n = 1000)
    withEq(spark) {
      ManifestTable.merge(spark, path,
        Seq((7L, "u7")).toDF("id", "v"),
        keys = Seq("id"), deleteKeys = Some(Seq(8L).toDF("id")))
    }
    val want = ManifestTable.read(spark, path).orderBy("id").collect().toSeq
    val v = ManifestTable.rewriteDeletes(spark, path)
    assert(ManifestTable.read(spark, path).orderBy("id").collect().toSeq === want)
    val txt = manifestText(path, v)
    assert(txt.contains("format=1") && !txt.contains("eqdel=") &&
      !txt.contains("fseq="),
      "a purged table sheds the entries, the sequences and the format bump")
    assert(ManifestTable.fastCount(spark, path) === Some(999L),
      "metadata answers return once materialized")
    // vacuum sweeps the retired key sidecar with its manifests
    ManifestTable.vacuum(spark, path, keepVersions = 1)
    val eqRoot = java.nio.file.Paths.get(path, "_eqd")
    assert(!java.nio.file.Files.exists(eqRoot) ||
      !java.nio.file.Files.list(eqRoot).findFirst().isPresent)
  }

  test("loud refusals: CDF and file-delta faces; format gate") {
    val path = mkTable("refuse", n = 100)
    val vBefore = ManifestTable.currentVersion(spark, path).get
    withEq(spark) {
      ManifestTable.merge(spark, path, Seq((1L, "u")).toDF("id", "v"),
        keys = Seq("id"))
    }
    val vAfter = ManifestTable.currentVersion(spark, path).get
    val cdf = intercept[Exception](
      ManifestTable.readChanges(spark, path, vBefore, vAfter).count())
    assert(cdf.getMessage.contains("equality-delete"))
    val delta = intercept[Exception](
      ManifestTable.readVersionDelta(spark, path, vBefore, vAfter).count())
    assert(delta.getMessage.contains("equality-delete"))
    // a format-1 reader must refuse the format-2 manifest rather than
    // resurrect rows: simulate by checking the stamp is really 2 (the
    // gate itself is spec'd in TableMetadataCarrySpec / format tests)
    assert(manifestText(path, vAfter).contains("format=2"))
    // ... and PURGE retires the debt everywhere
    ManifestTable.rewriteDeletes(spark, path)
    ManifestTable.shallowClone(spark, path,
      Files.createTempDirectory("eqd_c2").toString + "/t")
  }

  test("PURGE exonerates key-disjoint files metadata-only: only the matched working set rewrites") {
    val path = Files.createTempDirectory("eqd_exon").toString + "/t"
    // range-clustered on id with zone maps + Blooms: a narrow-key merge's
    // entries can only touch a couple of files
    ManifestTable.overwrite(spark, path, spark.range(10000)
      .select(col("id"), concat(lit("v"), col("id")).as("v"))
      .repartitionByRange(8, col("id")),
      statsCols = Seq("id"), bloomCols = Seq("id"))
    withEq(spark) {
      ManifestTable.merge(spark, path, Seq((100L, "u100")).toDF("id", "v"),
        keys = Seq("id"), deleteKeys = Some(Seq(101L).toDF("id")))
    }
    val v0 = ManifestTable.currentVersion(spark, path).get
    val before = ManifestTable.readManifest(spark, path, v0).files.toSet
    val v = ManifestTable.rewriteDeletes(spark, path)
    val after = ManifestTable.readManifest(spark, path, v).files.toSet
    val carried = before.intersect(after)
    assert(carried.size >= 7,
      s"key-disjoint files must carry, not rewrite (carried ${carried.size} of ${before.size})")
    assert(before.diff(after).nonEmpty, "the matched file(s) must rewrite")
    // the entries retired in the same commit (exonerated files re-sequenced)
    val txt = manifestText(path, v)
    assert(txt.contains("format=1") && !txt.contains("eqdel="),
      "exoneration must still retire every entry")
    assert(ManifestTable.fastCount(spark, path) === Some(9999L))
    // answers exact
    val got = ManifestTable.read(spark, path)
    assert(got.filter(col("id") === 101L).count() === 0L)
    assert(got.filter(col("id") === 100L).select("v").as[String]
      .collect().toSeq === Seq("u100"))
    // keys matching NOTHING live: the purge is a metadata-only commit
    val p2 = Files.createTempDirectory("eqd_exon2").toString + "/t"
    ManifestTable.overwrite(spark, p2, spark.range(100)
      .select(col("id"), concat(lit("v"), col("id")).as("v")).coalesce(1),
      statsCols = Seq("id"), bloomCols = Seq("id"))
    withEq(spark) {
      ManifestTable.merge(spark, p2, spark.range(0)
        .select(col("id"), lit("x").as("v")),
        keys = Seq("id"), deleteKeys = Some(Seq(5000L).toDF("id")))
    }
    val b2 = dataFiles(p2)
    val v2 = ManifestTable.rewriteDeletes(spark, p2)
    assert(dataFiles(p2) === b2, "no byte moves when no file holds a key")
    assert(manifestText(p2, v2).contains("format=1"))
    assert(ManifestTable.fastCount(spark, p2) === Some(100L))
  }

  test("FAST FORWARD publishes a live-eqdel branch: sequences renumber into main's domain") {
    val path = mkTable("ffeq", n = 100) // ids 0..99
    ManifestTable.createBranch(spark, path, "exp")
    val bp = ManifestTable.branchPath(path, "exp")
    withEq(spark) {
      // order-sensitive history: delete 6, then re-insert it — the
      // publish must preserve the relative sequencing exactly
      ManifestTable.merge(spark, bp, Seq((5L, "u5")).toDF("id", "v"),
        keys = Seq("id"), deleteKeys = Some(Seq(6L).toDF("id")))
      ManifestTable.merge(spark, bp, Seq((6L, "reborn")).toDF("id", "v"),
        keys = Seq("id"))
    }
    val want = ManifestTable.read(spark, bp).orderBy("id").collect().toSeq
    val v = ManifestTable.fastForward(spark, path, "exp")
    assert(ManifestTable.read(spark, path).orderBy("id").collect().toSeq
      === want, "the published main answers exactly as the branch did")
    assert(manifestText(path, v).contains("format=2"),
      "carried entries stay live on main until PURGE")
    assert(java.nio.file.Files.exists(java.nio.file.Paths.get(path, "_eqd")),
      "branch-own key sidecars moved into main's _eqd")
    // post-publish appends sequence ABOVE every carried entry: re-adding
    // keys the branch upserted or deleted must not be eaten
    ManifestTable.append(spark, path, Seq((5L, "fresh"), (6L, "after"))
      .toDF("id", "v"))
    val got = ManifestTable.read(spark, path)
    assert(got.filter(col("id") === 5L).count() === 2L,
      "the carried upsert-5 entry must not delete a post-publish append")
    assert(got.filter(col("id") === 6L).count() === 2L,
      "the carried delete-6 entry must not delete a post-publish append")
    // PURGE retires the carried debt on main
    ManifestTable.rewriteDeletes(spark, path)
    assert(ManifestTable.fastCount(spark, path) === Some(102L))
  }

  test("eq-merge rebase: a racing append commutes and both land") {
    val path = mkTable("race", n = 100)
    // simulate the race by committing version 2 out-of-band AFTER the
    // merge reads version 1 — easiest deterministic interleave: a second
    // eq-merge thread is nondeterministic, so instead assert the rebase
    // SEMANTICS: an eq-delete sequenced after an append applies to it
    withEq(spark) {
      ManifestTable.merge(spark, path, Seq((200L, "first")).toDF("id", "v"),
        keys = Seq("id"))
    }
    ManifestTable.append(spark, path, Seq((201L, "appended")).toDF("id", "v"))
    withEq(spark) {
      // deletes a key that only exists in the post-merge append: the
      // later sequence must win
      ManifestTable.merge(spark, path, spark.range(0)
        .select(col("id"), lit("x").as("v")),
        keys = Seq("id"), deleteKeys = Some(Seq(201L).toDF("id")))
    }
    val got = ManifestTable.read(spark, path)
    assert(got.filter(col("id") === 201L).count() === 0L)
    assert(got.filter(col("id") === 200L).select("v").as[String].head() === "first")
    assert(got.count() === 101L)
  }

  test("symlink export on an eq-deleted table materializes first — no resurrection for external readers") {
    val path = mkTable("sym", n = 100)
    withEq(spark) {
      ManifestTable.merge(spark, path, spark.range(0)
        .select(col("id"), lit("x").as("v")),
        keys = Seq("id"), deleteKeys = Some(Seq(5L).toDF("id")))
    }
    ManifestTable.generateSymlinkManifest(spark, path)
    val listed = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(path, "_symlink_format_manifest", "manifest")))
      .split("\n").filter(_.nonEmpty).toSeq
    val external = spark.read.parquet(listed: _*)
    assert(external.count() === 99L)
    assert(external.filter(col("id") === 5L).count() === 0L,
      "an external reader of the exported list must not see the eq-deleted row")
  }

  test("composite and NULL keys: the eq anti-join is null-safe, per-key-set grouped") {
    val path = Files.createTempDirectory("eqd_comp").toString + "/t"
    ManifestTable.overwrite(spark, path, Seq(
      (Option(1L), "a", 10L), (Option(1L), "b", 20L),
      (Option(2L), "a", 30L), (Option.empty[Long], "a", 40L))
      .toDF("k1", "k2", "n").coalesce(1))
    withEq(spark) {
      // composite upsert of (1, a) + tombstone for the NULL-keyed row
      ManifestTable.merge(spark, path,
        Seq((Option(1L), "a", 100L)).toDF("k1", "k2", "n"),
        keys = Seq("k1", "k2"),
        deleteKeys = Some(Seq((Option.empty[Long], "a")).toDF("k1", "k2")))
    }
    val got = ManifestTable.read(spark, path)
      .select("k1", "k2", "n").as[(Option[Long], String, Long)].collect().toSet
    assert(got === Set((Some(1L), "a", 100L), (Some(1L), "b", 20L),
      (Some(2L), "a", 30L)),
      "composite match replaced exactly (1,a); the null-keyed tombstone " +
        "deleted the null row; (1,b)/(2,a) untouched")
  }

  test("schema DDL on an eq-deleted table: rename keeps the key linkage, drop of a key column refuses") {
    val path = mkTable("ddl", n = 100)
    // key on the NON-stats column (stats columns refuse renames outright
    // — their keys are physical, a pre-existing contract)
    withEq(spark) {
      ManifestTable.merge(spark, path, spark.range(0)
        .select(col("id"), lit("x").as("v")),
        keys = Seq("v"), deleteKeys = Some(Seq("v50").toDF("v")))
    }
    assert(ManifestTable.read(spark, path).count() === 99L)
    // rename of the KEY column: the eqdel is keyed by PHYSICAL name, so
    // the delete keeps applying under the new logical name
    ManifestTable.renameColumn(spark, path, "v", "label")
    assert(ManifestTable.read(spark, path).filter(col("label") === "v50")
      .count() === 0L)
    assert(ManifestTable.read(spark, path).count() === 99L)
    // dropping the key column would brick every read — refuse, PURGE lifts
    val e = intercept[Exception](ManifestTable.dropColumn(spark, path, "label"))
    assert(e.getMessage.contains("equality delete"))
    ManifestTable.rewriteDeletes(spark, path)
    ManifestTable.dropColumn(spark, path, "label")
    assert(ManifestTable.read(spark, path).columns.toSeq === Seq("id"))
    // the extensions-session metadata COUNT(*) declines while entries
    // live (MetaAggregateRule must not answer 100 from stale file stats)
    val s = MorDmlSpec.extSpark
    val p2 = mkTable("metacnt", n = 100)
    s.conf.set(ManifestTable.DmlModeKey, "eq")
    try ManifestTable.merge(s, p2, s.range(0)
      .select(col("id"), lit("x").as("v")),
      keys = Seq("id"), deleteKeys = Some(Seq(1L, 2L).toDF("id")))
    finally s.conf.unset(ManifestTable.DmlModeKey)
    s.sql("DROP TABLE IF EXISTS eqd_cnt_t")
    s.sql(s"CREATE TABLE eqd_cnt_t USING graft OPTIONS (path '$p2')")
    try assert(s.sql("SELECT count(*) FROM eqd_cnt_t")
      .collect().head.getLong(0) === 98L)
    finally s.sql("DROP TABLE IF EXISTS eqd_cnt_t"): Unit
  }

  test("per-ENTRY-SET read routing: a file appended between entries joins only the later entry's keys") {
    val path = mkTable("entryset", n = 1000)
    // entry 1 (v2), then an appended file (v3), then entry 2 (v4): the
    // v3 file's affecting set is {entry 2} alone
    withEq(spark) {
      ManifestTable.merge(spark, path, spark.range(0)
        .select(col("id"), lit("a").as("v")),
        keys = Seq("id"), deleteKeys = Some(Seq(1L).toDF("id")))
    }
    ManifestTable.append(spark, path,
      Seq((5000L, "mid"), (1L, "reborn")).toDF("id", "v"))
    withEq(spark) {
      ManifestTable.merge(spark, path, spark.range(0)
        .select(col("id"), lit("b").as("v")),
        keys = Seq("id"), deleteKeys = Some(Seq(5000L).toDF("id")))
    }
    val m = ManifestTable.readManifest(spark, path,
      ManifestTable.currentVersion(spark, path).get)
    val Seq(e1, e2) = m.eqdels.sortBy(_.seq)
    val df = ManifestTable.read(spark, path)
    val plan = df.queryExecution.executedPlan.toString
    // entry 1's sidecar feeds ONE arm (the pre-entry-1 files); entry 2's
    // feeds BOTH (every at-risk file is sequenced before it)
    // plan Location strings truncate the sidecar dir's UUID tail — count
    // by the version prefix (eqNNNNNNNNNNNN), unique per entry
    def scansOf(name: String): Int =
      ("_eqd/" + java.util.regex.Pattern.quote(name.takeWhile(_ != '-')))
        .r.findAllIn(plan).length
    assert(scansOf(e1.name) >= 1 && scansOf(e2.name) > scansOf(e1.name),
      s"the mid-append arm must join only entry 2's keys " +
        s"(e1 scans ${scansOf(e1.name)}, e2 scans ${scansOf(e2.name)})\n$plan")
    // answer equality: id=1's reborn row survives entry 1 (sequenced
    // after it), id=5000 dies to entry 2, the original id=1 stays dead
    val got = df.filter(col("id").isin(1L, 5000L)).orderBy("id")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(got === Seq((1L, "reborn")))
    assert(df.count() === 1000L) // 1000 - e1's id=1 - e2's id=5000 + 2 appended
  }

  test("PURGE exonerates under COMPOSITE keys: leading-column pruning re-sequences key-disjoint files metadata-only") {
    val path = Files.createTempDirectory("eqd_exonc").toString + "/t"
    // range-clustered on the LEADING key column: trailing columns carry
    // no stats, yet lead-value zone maps prove disjointness
    ManifestTable.overwrite(spark, path, spark.range(10000)
      .select(col("id"), (col("id") % 7).as("sub"),
        concat(lit("v"), col("id")).as("v"))
      .repartitionByRange(8, col("id")),
      statsCols = Seq("id"), bloomCols = Seq("id"))
    withEq(spark) {
      ManifestTable.merge(spark, path,
        Seq((100L, 100L % 7, "u100")).toDF("id", "sub", "v"),
        keys = Seq("id", "sub"),
        deleteKeys = Some(Seq((101L, 101L % 7)).toDF("id", "sub")))
    }
    val v0 = ManifestTable.currentVersion(spark, path).get
    val before = ManifestTable.readManifest(spark, path, v0).files.toSet
    val v = ManifestTable.rewriteDeletes(spark, path)
    val after = ManifestTable.readManifest(spark, path, v).files.toSet
    val carried = before.intersect(after)
    assert(carried.size >= 7,
      s"composite-key purge must exonerate key-disjoint files (carried " +
        s"${carried.size} of ${before.size})")
    assert(before.diff(after).nonEmpty, "the matched file(s) must rewrite")
    val txt = manifestText(path, v)
    assert(txt.contains("format=1") && !txt.contains("eqdel="),
      "every entry retires in the same commit")
    // answers exact: the composite delete hit only its full key tuple
    val got = ManifestTable.read(spark, path)
    assert(got.filter(col("id") === 101L).count() === 0L)
    assert(got.filter(col("id") === 100L).select("v").as[String]
      .collect().toSeq === Seq("u100"))
    assert(ManifestTable.fastCount(spark, path) === Some(9999L))
    // a composite key whose TUPLE matches nothing but whose lead value
    // exists must still rewrite that file (lead-only pruning is
    // conservative, never wrong): sub=99 never occurs
    val p2 = Files.createTempDirectory("eqd_exonc2").toString + "/t"
    ManifestTable.overwrite(spark, p2, spark.range(1000)
      .select(col("id"), (col("id") % 7).as("sub"),
        concat(lit("v"), col("id")).as("v"))
      .repartitionByRange(4, col("id")),
      statsCols = Seq("id"), bloomCols = Seq("id"))
    withEq(spark) {
      ManifestTable.merge(spark, p2, spark.range(0)
        .select(col("id"), col("id").as("sub"), lit("x").as("v")),
        keys = Seq("id", "sub"),
        deleteKeys = Some(Seq((500L, 99L)).toDF("id", "sub")))
    }
    val v2 = ManifestTable.rewriteDeletes(spark, p2)
    assert(manifestText(p2, v2).contains("format=1"))
    assert(ManifestTable.read(spark, p2).count() === 1000L,
      "a no-match tuple deletes nothing")
    assert(ManifestTable.fastCount(spark, p2) === Some(1000L))
  }

  test("foldEqdelCounts is ONE-PASS: job count does not scale with the entry count; overlapping keys attribute to the earliest entry") {
    def jobsDuring(body: => Unit): Int = {
      val n = new java.util.concurrent.atomic.AtomicInteger
      val l = new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(
            j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
          n.incrementAndGet(): Unit
      }
      spark.sparkContext.addSparkListener(l)
      try { body; Thread.sleep(1500) }
      finally spark.sparkContext.removeSparkListener(l)
      n.get
    }
    // one-entry fold: the baseline job budget of the single-scan plan
    val p1 = mkTable("fold1p", n = 2000)
    withEq(spark) {
      ManifestTable.merge(spark, p1, Seq((1L, "u")).toDF("id", "v"),
        keys = Seq("id"), deleteKeys = Some(Seq(2L, 3L).toDF("id")))
    }
    val n1 = jobsDuring { ManifestTable.foldEqdelCounts(spark, p1): Unit }
    // four-entry fold with OVERLAPPING keys: entry 2 re-names id=10
    // (already claimed by entry 1) and id=11; the one-pass attribution
    // must hand id=10's pre-entry-1 row to entry 1 only
    val p4 = mkTable("fold4p", n = 2000)
    withEq(spark) {
      ManifestTable.merge(spark, p4, Seq((10L, "a")).toDF("id", "v"),
        keys = Seq("id"), deleteKeys = Some(Seq(10L).toDF("id")))
      ManifestTable.merge(spark, p4, spark.range(0)
        .select(col("id"), lit("b").as("v")),
        keys = Seq("id"), deleteKeys = Some(Seq(10L, 11L).toDF("id")))
      ManifestTable.merge(spark, p4, spark.range(0)
        .select(col("id"), lit("c").as("v")),
        keys = Seq("id"), deleteKeys = Some(Seq(12L, 13L).toDF("id")))
      ManifestTable.merge(spark, p4, spark.range(0)
        .select(col("id"), lit("d").as("v")),
        keys = Seq("id"), deleteKeys = Some(Seq(14L).toDF("id")))
    }
    assert(ManifestTable.fastCount(spark, p4).isEmpty)
    val n4 = jobsDuring { ManifestTable.foldEqdelCounts(spark, p4): Unit }
    assert(n4 <= n1 + 1,
      s"folding 4 entries ran $n4 jobs vs $n1 for 1 entry — the fold " +
        "must be one-pass (one scan + one action), not a per-entry chain")
    // ground truth: Σrows − Σmatched folds to the exact visible count —
    // overlap double-claiming would undercount here
    assert(ManifestTable.fastCount(spark, p4) ===
      Some(ManifestTable.read(spark, p4).count()))
  }

  test("foldEqdelCounts restores metadata fast counts; commit-time invalidation keeps them honest") {
    val path = mkTable("fold", n = 1000)
    withEq(spark) {
      ManifestTable.merge(spark, path, Seq((100L, "u100")).toDF("id", "v"),
        keys = Seq("id"), deleteKeys = Some(Seq(101L, 102L).toDF("id")))
    }
    assert(ManifestTable.fastCount(spark, path).isEmpty,
      "declines while the entry's matched-row count is unknown")
    val v = ManifestTable.foldEqdelCounts(spark, path)
    assert(ManifestTable.fastCount(spark, path) === Some(998L),
      "one fold commit restores the exact metadata count")
    assert(ManifestTable.foldEqdelCounts(spark, path) === v,
      "idempotent: fully-folded tables commit nothing")
    // appends don't invalidate — new files are not scoped to the entry
    ManifestTable.append(spark, path, Seq((5000L, "x")).toDF("id", "v"))
    assert(ManifestTable.fastCount(spark, path) === Some(999L))
    // a second eq-merge adds an UNFOLDED entry: decline returns, refold
    // recounts only against the fresh snapshot
    withEq(spark) {
      ManifestTable.merge(spark, path,
        spark.range(0).select(col("id"), lit("y").as("v")),
        keys = Seq("id"), deleteKeys = Some(Seq(103L).toDF("id")))
    }
    assert(ManifestTable.fastCount(spark, path).isEmpty)
    ManifestTable.foldEqdelCounts(spark, path)
    assert(ManifestTable.fastCount(spark, path) === Some(998L))
    // a DV write invalidates folded counts (positions are raw-row — they
    // may overlap the key set); the refold restores exactness
    ManifestTable.deleteVectorized(spark, path, col("id") === 104L)
    assert(ManifestTable.fastCount(spark, path).isEmpty,
      "a DV change clears every folded count")
    ManifestTable.foldEqdelCounts(spark, path)
    assert(ManifestTable.fastCount(spark, path) ===
      Some(ManifestTable.read(spark, path).count()))
    // a COW delete rewrites scoped files: folded counts clear, refold fixes
    ManifestTable.delete(spark, path, col("id") === 105L)
    ManifestTable.foldEqdelCounts(spark, path)
    assert(ManifestTable.fastCount(spark, path) ===
      Some(ManifestTable.read(spark, path).count()))
    // ANALYZE folds too (the SQL statistics face)
    val p2 = mkTable("fold2", n = 100)
    val s = MorDmlSpec.extSpark
    s.conf.set(ManifestTable.DmlModeKey, "eq")
    try ManifestTable.merge(s, p2, s.range(0)
      .select(col("id"), lit("z").as("v")),
      keys = Seq("id"), deleteKeys = Some(Seq(1L, 2L).toDF("id")))
    finally s.conf.unset(ManifestTable.DmlModeKey)
    assert(ManifestTable.fastCount(s, p2).isEmpty)
    s.sql(s"ANALYZE TABLE '$p2' COMPUTE STATISTICS")
    assert(ManifestTable.fastCount(s, p2) === Some(98L),
      "ANALYZE folds the matched counts as part of statistics")
  }

  test("a multi-file key sidecar reads correctly; the entry count comes from the write pass") {
    val path = mkTable("multi", n = 2000)
    // force a multi-file sidecar: with AQE's partition coalescing off the
    // distinct's shuffle width survives into the parallel write
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
    try withEq(spark) {
      ManifestTable.merge(spark, path,
        spark.range(0).select(col("id"), lit("x").as("v")),
        keys = Seq("id"),
        deleteKeys = Some(spark.range(0, 2000, 2).toDF("id"))) // 1000 keys
    } finally spark.conf.unset("spark.sql.adaptive.coalescePartitions.enabled")
    val eqd = java.nio.file.Paths.get(path, "_eqd")
    val entryDir = java.nio.file.Files.list(eqd).findFirst().get()
    var nFiles = 0
    java.nio.file.Files.walk(entryDir).forEach { p =>
      if (p.toString.endsWith(".parquet")) nFiles += 1 }
    assert(nFiles > 1, s"fixture must produce a multi-file sidecar (got $nFiles)")
    // the manifest count folded from the write's own observed metric
    val m = ManifestTable.readManifest(spark, path,
      ManifestTable.currentVersion(spark, path).get)
    assert(m.eqdels.map(_.count).sum === 1000L)
    // the reader globs the entry dir: every key file participates
    assert(ManifestTable.read(spark, path).count() === 1000L)
    assert(ManifestTable.read(spark, path)
      .filter(col("id") % 2 === 0).count() === 0L)
  }

  test("per-rel routing: files appended after the newest entry keep the plain plan; answers unchanged") {
    val path = mkTable("route", n = 1000)
    withEq(spark) {
      ManifestTable.merge(spark, path, Seq((3L, "u3")).toDF("id", "v"),
        keys = Seq("id"), deleteKeys = Some(Seq(4L).toDF("id")))
    }
    ManifestTable.append(spark, path, spark.range(5000, 5100)
      .select(col("id"), lit("fresh").as("v")))
    val v = ManifestTable.currentVersion(spark, path).get
    val m = ManifestTable.readManifest(spark, path, v)
    val maxSeq = m.eqdels.map(_.seq).max
    val (atRisk, clean) = m.files.partition(r => m.fseq.getOrElse(r, 0L) < maxSeq)
    assert(atRisk.nonEmpty && clean.nonEmpty,
      "fixture must hold both pre-entry and post-entry files")
    // the merge's own batch (fseq == seq) and the later append are exempt
    // from the entry — their read must be a plain scan, no joins at all
    val freshPlan = ManifestTable.readRels(spark, path, m, clean)
      .queryExecution.executedPlan.toString
    assert(!freshPlan.contains("Join"),
      s"post-entry files must read join-free, got:\n$freshPlan")
    // the full read routes per rel: the at-risk arm carries the one key
    // anti-join, the clean arm unions in beside it
    val full = ManifestTable.read(spark, path)
    val fullPlan = full.queryExecution.executedPlan.toString
    assert(fullPlan.contains("Union"), "per-rel routing must split the scan")
    assert("LeftAnti".r.findAllIn(fullPlan).length === 1,
      "exactly one key anti-join — entry-scoped, never fleet-wide")
    // answers unchanged by the routing
    assert(full.count() === 1099L)
    assert(full.filter(col("id") === 4L).count() === 0L)
    assert(full.filter(col("id") === 3L).select("v").as[String].collect().toSeq
      === Seq("u3"))
    assert(full.filter(col("id") >= 5000L).count() === 100L)
  }

  test("under eq mode, UPDATE routes merge-on-read: resident files carry byte-identical") {
    val path = mkTable("upd", n = 1000)
    val before = dataFiles(path)
    withEq(spark) {
      ManifestTable.update(spark, path, col("id") === 42L, Seq("v" -> lit("u")))
    }
    val after = dataFiles(path)
    before.foreach { case (f, sz) =>
      assert(after.get(f).contains(sz), s"eq-mode UPDATE rewrote $f") }
    assert(ManifestTable.read(spark, path).filter(col("id") === 42L)
      .select("v").as[String].collect().toSeq === Seq("u"))
    assert(ManifestTable.read(spark, path).count() === 1000L)
  }

  test("REPLACE WHERE / COW delete / compact on an eq-deleted table stay exact") {
    val path = mkTable("dml", n = 1000)
    withEq(spark) {
      ManifestTable.merge(spark, path, spark.range(0)
        .select(col("id"), lit("x").as("v")),
        keys = Seq("id"), deleteKeys = Some(Seq(500L).toDF("id")))
    }
    // COW delete of a range spanning the eq-deleted row: no resurrection
    ManifestTable.delete(spark, path, col("id").between(498L, 502L))
    assert(ManifestTable.read(spark, path)
      .filter(col("id").between(495L, 505L)).select("id").as[Long]
      .collect().sorted === Array(495L, 496L, 497L, 503L, 504L, 505L))
    // compact materializes everything it rewrites
    ManifestTable.compact(spark, path, targetRowsPerFile = 10000)
    assert(ManifestTable.read(spark, path).count() === 995L)
    assert(ManifestTable.fastCount(spark, path) === Some(995L),
      "a full compaction retires the entries — metadata answers return")
  }
}
