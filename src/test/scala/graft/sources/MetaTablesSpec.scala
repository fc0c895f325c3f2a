package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** The $history / $files observability surface: per-version commit rows
  * and per-file metadata straight from the manifests — no data IO.
  */
class MetaTablesSpec extends SparkSpec {
  import spark.implicits._

  test("history tracks the commit chain: versions, counts, DV and constraint columns") {
    val path = Files.createTempDirectory("meta_h").toString + "/t"
    ManifestTable.overwrite(spark, path,
      Seq((1L, 10.0), (2L, 20.0)).toDF("id", "v"), statsCols = Seq("id"),
      constraints = Seq("v_pos" -> "v > 0"))
    ManifestTable.append(spark, path, Seq((3L, 30.0)).toDF("id", "v"))
    ManifestTable.deleteVectorized(spark, path, col("id") === 1L)
    val h = ManifestTable.history(spark, path)
      .orderBy("version")
      .select("version", "n_files", "n_dv_files", "n_constraints", "n_rows")
      .as[(Long, Long, Long, Long, Option[Long])].collect()
    assert(h.map(_._1).toSeq === Seq(1L, 2L, 3L))
    assert(h(0)._5 === Some(2L) && h(1)._5 === Some(3L))
    assert(h(2)._5 === Some(2L), "DV cardinality must reach the metadata count")
    assert(h.forall(_._4 === 1L), "constraint count rides every version")
    assert(h(2)._3 === 1L && h(0)._3 === 0L, "DV'd-file count appears at v3")
    // commit times are monotone (atomic publish order)
    val ts = ManifestTable.history(spark, path).orderBy("version")
      .select("committed_at").as[java.sql.Timestamp].collect()
    assert(ts.sliding(2).forall(p => !p(1).before(p(0))))
  }

  test("filesMeta exposes per-file rows, DV deletions and zone ranges") {
    val path = Files.createTempDirectory("meta_f").toString + "/t"
    ManifestTable.overwrite(spark, path,
      spark.range(100).select(col("id"), (col("id") * 2).as("v"))
        .repartitionByRange(4, col("id")),
      statsCols = Seq("id"))
    ManifestTable.deleteVectorized(spark, path, col("id") === 0L)
    val fm = ManifestTable.filesMeta(spark, path)
      .as[(String, Option[Long], Option[Long], String)].collect()
    assert(fm.length === 4)
    assert(fm.map(_._2.get).sum === 100L)
    assert(fm.map(_._3.getOrElse(0L)).sum === 1L, "one DV'd row across the files")
    assert(fm.forall(_._4.startsWith("id=")), s"zone strings: ${fm.map(_._4).toSeq}")
  }

  test("metadata tables read through the SQL datasource and stay live") {
    val path = Files.createTempDirectory("meta_sql").toString + "/t"
    ManifestTable.overwrite(spark, path, Seq((1L, "a")).toDF("id", "v"))
    spark.sql("DROP TABLE IF EXISTS t_hist")
    spark.sql(s"CREATE TABLE t_hist USING graft OPTIONS (path '$path', meta 'history')")
    try {
      assert(spark.sql("SELECT max(version) FROM t_hist").as[Long].head() === 1L)
      ManifestTable.append(spark, path, Seq((2L, "b")).toDF("id", "v"))
      // live: the meta relation resolves per scan, not at CREATE time
      assert(spark.sql("SELECT max(version) FROM t_hist").as[Long].head() === 2L)
      val files = spark.read.format("graft").option("meta", "files").load(path)
      assert(files.count() >= 2L)
    } finally spark.sql("DROP TABLE IF EXISTS t_hist"): Unit
  }
}
