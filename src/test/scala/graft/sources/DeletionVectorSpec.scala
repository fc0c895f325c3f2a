package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Merge-on-read deletion vectors: point deletes write position sidecars
  * instead of rewriting files; every reader honors them; maintenance
  * materializes them away. The cost contract — DV write volume scales with
  * deleted ROWS, copy-on-write with touched FILES' bytes — is asserted
  * directly on the bytes.
  */
class DeletionVectorSpec extends SparkSpec {
  import spark.implicits._

  private def mkTable(tag: String, n: Int = 10000,
                      statsCols: Seq[String] = Seq("id")): String = {
    val path = Files.createTempDirectory(s"dv_$tag").toString + "/t"
    val df = spark.range(n).select(col("id"),
      (col("id") % 97).as("k"), concat(lit("v"), col("id")).as("v"))
      .repartitionByRange(8, col("id"))
    ManifestTable.overwrite(spark, path, df, statsCols = statsCols)
    path
  }

  private def dataFiles(path: String): Map[String, Long] = {
    val root = java.nio.file.Paths.get(path, "data")
    val out = scala.collection.mutable.Map[String, Long]()
    java.nio.file.Files.walk(root).forEach { p =>
      if (p.toString.endsWith(".parquet"))
        out(root.relativize(p).toString) = java.nio.file.Files.size(p)
    }
    out.toMap
  }

  private def dvBytes(path: String): Long = {
    val root = java.nio.file.Paths.get(path, "_dv")
    if (!java.nio.file.Files.exists(root)) 0L
    else {
      var total = 0L
      java.nio.file.Files.walk(root).forEach { p =>
        if (java.nio.file.Files.isRegularFile(p)) total += java.nio.file.Files.size(p)
      }
      total
    }
  }

  test("deleteVectorized removes matching rows without touching data files") {
    val path = mkTable("basic")
    val before = dataFiles(path)
    val v = ManifestTable.deleteVectorized(spark, path, col("id") % 1000 === 7)
    assert(v === 2L)
    // merge-on-read: every data file carries BYTE-IDENTICAL — no rewrite
    assert(dataFiles(path) === before)
    val got = ManifestTable.read(spark, path).select("id").as[Long].collect().toSet
    val want = (0L until 10000L).filterNot(_ % 1000 == 7).toSet
    assert(got === want)
    // ... and the sidecar cost is deleted-rows-sized, not file-sized
    val dv = dvBytes(path)
    assert(dv > 0 && dv < before.values.min,
      s"DV sidecar ($dv B) should be far below the smallest data file (${before.values.min} B)")
  }

  test("DV result matches copy-on-write delete on the same predicate") {
    val pathDv = mkTable("eqA"); val pathCow = mkTable("eqB")
    val pred = col("k") === 13 || col("id") < 5
    ManifestTable.deleteVectorized(spark, pathDv, pred)
    ManifestTable.delete(spark, pathCow, pred)
    val a = ManifestTable.read(spark, pathDv).orderBy("id").collect()
    val b = ManifestTable.read(spark, pathCow).orderBy("id").collect()
    assert(a === b)
    // the cost asymmetry this feature exists for: copy-on-write rewrote
    // every touched file (k hits all 8), merge-on-read rewrote none
    val cowCarried = dataFiles(pathCow).keySet
    assert(cowCarried.intersect(dataFiles(pathDv).keySet).isEmpty ||
      cowCarried != dataFiles(pathDv).keySet)
  }

  test("a second DV on the same file merges the prior positions") {
    val path = mkTable("merge2")
    ManifestTable.deleteVectorized(spark, path, col("id") === 42)
    ManifestTable.deleteVectorized(spark, path, col("id") === 43)
    val got = ManifestTable.read(spark, path).filter(col("id").between(40, 45))
      .select("id").as[Long].collect().toSet
    assert(got === Set(40L, 41L, 44L, 45L))
    assert(ManifestTable.read(spark, path).count() === 9998L)
  }

  test("fastCount stays exact under DVs; fastMinMax declines") {
    val path = mkTable("meta")
    assert(ManifestTable.fastCount(spark, path) === Some(10000L))
    assert(ManifestTable.fastMinMax(spark, path, "id").isDefined)
    ManifestTable.deleteVectorized(spark, path, col("id") >= 9990)
    assert(ManifestTable.fastCount(spark, path) === Some(9990L))
    // id=9999 was the recorded max and is deleted — metadata must decline
    assert(ManifestTable.fastMinMax(spark, path, "id").isEmpty)
  }

  test("time travel reads the pre-DV snapshot intact") {
    val path = mkTable("tt")
    ManifestTable.deleteVectorized(spark, path, col("id") < 100)
    assert(ManifestTable.read(spark, path).count() === 9900L)
    assert(ManifestTable.readVersion(spark, path, 1L).count() === 10000L)
  }

  test("pruned/range/point reads honor DVs") {
    val path = mkTable("pruned")
    ManifestTable.deleteVectorized(spark, path, col("id") === 1234)
    assert(ManifestTable.readRange(spark, path, "id", 1200L, 1300L)
      .count() === 100L)
    assert(ManifestTable.readRange(spark, path, "id", 1200L, 1300L)
      .filter(col("id") === 1234).count() === 0L)
  }

  test("the SQL datasource scan honors DVs") {
    val path = mkTable("sqlds")
    ManifestTable.deleteVectorized(spark, path, col("id") === 77)
    spark.sql("DROP TABLE IF EXISTS dv_sql_t")
    spark.sql(s"CREATE TABLE dv_sql_t USING graft OPTIONS (path '$path')")
    try {
      assert(spark.sql("SELECT count(*) FROM dv_sql_t WHERE id BETWEEN 70 AND 80")
        .as[Long].head() === 10L)
      // metadata-count path (MetaAggregateRule) must agree with the scan
      assert(spark.sql("SELECT count(*) FROM dv_sql_t").as[Long].head() === 9999L)
    } finally spark.sql("DROP TABLE IF EXISTS dv_sql_t"): Unit
  }

  test("copy-on-write delete and update after a DV do not resurrect rows") {
    val path = mkTable("resur")
    ManifestTable.deleteVectorized(spark, path, col("id") === 500)
    // an update whose predicate touches the DV'd file must keep 500 dead
    ManifestTable.update(spark, path, col("id") === 501,
      Seq("v" -> lit("updated")))
    val ids = ManifestTable.read(spark, path)
      .filter(col("id").between(499, 502)).select("id").as[Long].collect().toSet
    assert(ids === Set(499L, 501L, 502L))
    assert(ManifestTable.read(spark, path).filter(col("v") === "updated")
      .count() === 1L)
    // the rewrite materialized the file's DV: no dv entry should remain for
    // a file that was rewritten (manifest-level check via rewriteDeletes
    // being a no-op on the affected file is implied by correctness above)
    ManifestTable.delete(spark, path, col("id") === 502)
    assert(ManifestTable.read(spark, path)
      .filter(col("id").between(499, 502)).select("id").as[Long].collect().toSet
      === Set(499L, 501L))
  }

  test("rewriteDeletes materializes DVs and restores metadata answers") {
    val path = mkTable("rw")
    val before = dataFiles(path)
    ManifestTable.deleteVectorized(spark, path, col("id") % 2000 === 1)
    val vM = ManifestTable.rewriteDeletes(spark, path)
    val want = (0L until 10000L).filterNot(_ % 2000 == 1).toSet
    assert(ManifestTable.read(spark, path).select("id").as[Long].collect().toSet === want)
    assert(ManifestTable.fastCount(spark, path) === Some(9995L))
    // DVs gone → zone-map answers come back
    assert(ManifestTable.fastMinMax(spark, path, "id").isDefined)
    // rewriteDeletes on a DV-free table is a version no-op
    assert(ManifestTable.rewriteDeletes(spark, path) === vM)
    // vacuum sweeps the superseded DV sidecars once old versions retire
    assert(dvBytes(path) > 0L)
    ManifestTable.vacuum(spark, path, keepVersions = 1)
    assert(dvBytes(path) === 0L)
    // ... and the materialized rewrite replaced every DV'd file
    assert(dataFiles(path).keySet.intersect(before.keySet).size < before.size)
  }

  test("file-level CDF treats a DV commit as changed-file delta/removed") {
    val path = mkTable("cdf", n = 1000)
    val v1 = 1L
    val v2 = ManifestTable.deleteVectorized(spark, path, col("id") === 10)
    // removed side: the file's OLD visible rows (all of them, incl. id=10)
    val removed = ManifestTable.readVersionRemoved(spark, path, v1, v2)
    val delta = ManifestTable.readVersionDelta(spark, path, v1, v2)
    assert(removed.filter(col("id") === 10).count() === 1L)
    assert(delta.filter(col("id") === 10).count() === 0L)
    // additive-consumer contract: delta - removed = net change (-1 row)
    assert(delta.count() - removed.count() === -1L)
    // untouched files contribute to neither side
    val touchedRows = removed.count()
    assert(touchedRows < 1000L, s"only the DV'd file's rows should appear, got $touchedRows")
  }

  test("a DV commit on a sidecar-stats table reuses the sidecar (O(1) metadata)") {
    val key = "spark.graft.stats.sidecarThreshold"
    val before = spark.conf.getOption(key)
    spark.conf.set(key, "4") // force sidecar representation at 8 files
    try {
      val path = mkTable("sreuse")
      def sidecarOf(v: Long): Option[String] = {
        val txt = new String(java.nio.file.Files.readAllBytes(
          java.nio.file.Paths.get(path, "_manifests", f"m$v%012d.txt")))
        txt.split("\n").find(_.startsWith("sidecar=")).map(_.stripPrefix("sidecar="))
      }
      assert(sidecarOf(1L).isDefined, "table should be sidecar-backed at 8 files")
      val v2 = ManifestTable.deleteVectorized(spark, path, col("id") === 123)
      // the metadata-only commit shares the base's immutable sidecar
      assert(sidecarOf(v2) === sidecarOf(1L))
      // correctness unaffected: pruning + DV + fastCount all work
      assert(ManifestTable.read(spark, path).count() === 9999L)
      assert(ManifestTable.fastCount(spark, path) === Some(9999L))
      assert(ManifestTable.readRange(spark, path, "id", 100L, 200L).count() === 100L)
      // vacuum with both versions retired to one: the shared sidecar survives
      ManifestTable.vacuum(spark, path, keepVersions = 1)
      assert(ManifestTable.read(spark, path).count() === 9999L)
    } finally before match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }

  test("threshold-scoped PURGE: lightly-deleted files keep their DVs, heavy ones rewrite") {
    val path = mkTable("thresh") // 8 range-clustered files, stats on id
    // heavy deletes in the low band (~40-50% of the file(s) covering it),
    // one point delete far away (a fraction-of-a-percent of its file)
    ManifestTable.deleteVectorized(spark, path,
      col("id") < 1000 && col("id") % 2 === 0)
    ManifestTable.deleteVectorized(spark, path, col("id") === 9000L)
    // MANIFEST file lists, not disk: superseded files live until vacuum
    def filesOf(v: Long): Set[String] = new String(java.nio.file.Files
      .readAllBytes(java.nio.file.Paths.get(path, "_manifests", f"m$v%012d.txt")))
      .split("\n").filter(_.startsWith("file=")).map(_.stripPrefix("file=")).toSet
    val before = filesOf(ManifestTable.currentVersion(spark, path).get)
    // 20% threshold: the heavy file(s) rewrite; the point-deleted one
    // keeps its bytes AND its DV
    val v2 = ManifestTable.rewriteDeletes(spark, path, minDeletedFraction = 0.2)
    val after = filesOf(v2)
    assert((before -- after).nonEmpty, "the heavily-deleted file(s) must rewrite")
    assert(before.intersect(after).nonEmpty,
      "lightly-deleted files must keep their bytes")
    // exactly the point delete's DV entry survives the threshold pass
    val txt = new String(java.nio.file.Files.readAllBytes(java.nio.file.Paths
      .get(path, "_manifests", f"m${ManifestTable.currentVersion(spark, path).get}%012d.txt")))
    assert(txt.split("\n").count(_.startsWith("dv=")) === 1,
      "only the below-threshold file keeps a DV entry")
    val got = ManifestTable.read(spark, path)
    assert(got.filter(col("id") === 9000L).count() === 0L,
      "the kept DV still applies")
    assert(got.count() === 10000L - 500L - 1L)
    // fastCount stays exact (DV cardinality rides the manifest)
    assert(ManifestTable.fastCount(spark, path) === Some(10000L - 500L - 1L))
    // the SQL face: full PURGE then materializes the rest
    val s = MorDmlSpec.extSpark
    s.sql(s"OPTIMIZE '$path' PURGE MIN DELETED 90%") // nothing reaches 90%
    assert(ManifestTable.read(s, path).count() === 10000L - 500L - 1L)
    s.sql(s"OPTIMIZE '$path' PURGE")
    assert(ManifestTable.fastMinMax(s, path, "id").isDefined,
      "a full purge clears every DV")
  }

  test("append after a DV keeps the DV (carry) and merge respects it") {
    val path = mkTable("carry", n = 1000)
    ManifestTable.deleteVectorized(spark, path, col("id") === 5)
    ManifestTable.append(spark, path,
      spark.range(1000, 1010).select(col("id"), (col("id") % 97).as("k"),
        concat(lit("v"), col("id")).as("v")))
    assert(ManifestTable.read(spark, path).count() === 1009L)
    assert(ManifestTable.read(spark, path).filter(col("id") === 5).count() === 0L)
    // keyed merge over the DV'd table: deleted row must not resurrect as a
    // "kept" row of the unpartitioned full rewrite
    ManifestTable.merge(spark, path,
      Seq((3L, 3L, "m")).toDF("id", "k", "v"), keys = Seq("id"))
    val got = ManifestTable.read(spark, path)
    assert(got.filter(col("id") === 5).count() === 0L)
    assert(got.filter(col("id") === 3).select("v").as[String].head() === "m")
  }
}
