package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** CHECK constraints as versioned table metadata: declared at create or
  * added retroactively, enforced on every write path (append, merge,
  * overwritePartitions, update), SQL semantics (NULL passes), and a
  * violating batch leaves the table completely untouched.
  */
class ConstraintsSpec extends SparkSpec {
  import spark.implicits._

  private def tbl(tag: String): String =
    Files.createTempDirectory(s"cons_$tag").toString + "/t"

  test("declared at create: violating append rejects atomically, clean append lands") {
    val path = tbl("basic")
    ManifestTable.overwrite(spark, path,
      Seq((1L, 10.0), (2L, 20.0)).toDF("id", "price"),
      constraints = Seq("price_pos" -> "price > 0", "id_nn" -> "id IS NOT NULL"))
    val e = intercept[RuntimeException] {
      ManifestTable.append(spark, path, Seq((3L, -5.0)).toDF("id", "price"))
    }
    assert(e.getMessage.contains("price_pos"))
    // nothing landed: same version, same rows
    assert(ManifestTable.currentVersion(spark, path) === Some(1L))
    assert(ManifestTable.read(spark, path).count() === 2L)
    ManifestTable.append(spark, path, Seq((3L, 5.0)).toDF("id", "price"))
    assert(ManifestTable.read(spark, path).count() === 3L)
  }

  test("SQL CHECK semantics: NULL-valued expressions pass") {
    val path = tbl("nulls")
    ManifestTable.overwrite(spark, path,
      Seq((1L, Some(10.0))).toDF("id", "price"),
      constraints = Seq("price_pos" -> "price > 0"))
    // price NULL → expr NULL → passes (use 'price IS NOT NULL' to forbid)
    ManifestTable.append(spark, path,
      Seq((2L, Option.empty[Double])).toDF("id", "price"))
    assert(ManifestTable.read(spark, path).count() === 2L)
  }

  test("constraints survive the commit chain and gate merge and update") {
    val path = tbl("chain")
    ManifestTable.overwrite(spark, path,
      Seq((1L, 10.0), (2L, 20.0)).toDF("id", "price"),
      constraints = Seq("price_pos" -> "price > 0"))
    ManifestTable.append(spark, path, Seq((3L, 30.0)).toDF("id", "price"))
    ManifestTable.compact(spark, path, targetRowsPerFile = 100L)
    // still enforced after append + compact rewrote the metadata
    intercept[RuntimeException] {
      ManifestTable.merge(spark, path,
        Seq((2L, -1.0)).toDF("id", "price"), keys = Seq("id"))
    }
    assert(ManifestTable.read(spark, path)
      .filter(col("id") === 2L).select("price").as[Double].head() === 20.0)
    // an UPDATE whose SET produces a violation rejects too
    intercept[RuntimeException] {
      ManifestTable.update(spark, path, col("id") === 1L,
        Seq("price" -> lit(-9.0)))
    }
    assert(ManifestTable.read(spark, path)
      .filter(col("id") === 1L).select("price").as[Double].head() === 10.0)
    // clean merge + update still work
    ManifestTable.merge(spark, path,
      Seq((2L, 22.0)).toDF("id", "price"), keys = Seq("id"))
    ManifestTable.update(spark, path, col("id") === 1L, Seq("price" -> lit(11.0)))
    assert(ManifestTable.read(spark, path).select(sum("price")).as[Double].head() === 63.0)
  }

  test("addConstraint validates existing data; dropConstraint lifts the gate") {
    val path = tbl("addrop")
    ManifestTable.overwrite(spark, path,
      Seq((1L, 10.0), (2L, -3.0)).toDF("id", "price"))
    // existing data violates → add must reject without committing
    intercept[RuntimeException] {
      ManifestTable.addConstraint(spark, path, "price_pos", "price > 0")
    }
    assert(ManifestTable.currentVersion(spark, path) === Some(1L))
    // fix the data, then the add lands as a metadata commit
    ManifestTable.delete(spark, path, col("price") <= 0)
    ManifestTable.addConstraint(spark, path, "price_pos", "price > 0")
    intercept[RuntimeException] {
      ManifestTable.append(spark, path, Seq((9L, -1.0)).toDF("id", "price"))
    }
    ManifestTable.dropConstraint(spark, path, "price_pos")
    ManifestTable.append(spark, path, Seq((9L, -1.0)).toDF("id", "price"))
    assert(ManifestTable.read(spark, path).count() === 2L)
  }

  test("multi-column constraint over a partitioned table's writes") {
    val path = tbl("multi")
    ManifestTable.overwrite(spark, path,
      Seq((1L, "p1", 5.0), (2L, "p2", 6.0)).toDF("id", "p", "v"),
      partitionCols = Seq("p"),
      constraints = Seq("v_vs_id" -> "v > id"))
    intercept[RuntimeException] {
      ManifestTable.overwritePartitions(spark, path,
        Seq((7L, "p1", 3.0)).toDF("id", "p", "v"))
    }
    assert(ManifestTable.read(spark, path).count() === 2L)
    ManifestTable.overwritePartitions(spark, path,
      Seq((7L, "p1", 8.5)).toDF("id", "p", "v"))
    assert(ManifestTable.read(spark, path).filter(col("p") === "p1")
      .select("v").as[Double].head() === 8.5)
  }

  test("constraint added between stage and publish gates the staged bytes") {
    val path = tbl("wap")
    ManifestTable.overwrite(spark, path,
      Seq((1L, 10.0), (2L, 20.0)).toDF("id", "price"))
    // stage a batch that is CLEAN under the (empty) constraint set of its
    // stage time but violates the constraint added before publish —
    // without the publish-time re-check the stage is a constraint bypass
    val bad = ManifestTable.stageAppend(spark, path,
      Seq((3L, -5.0)).toDF("id", "price"))
    ManifestTable.addConstraint(spark, path, "price_pos", "price > 0")
    val e = intercept[RuntimeException] {
      ManifestTable.publishStaged(spark, path, bad)
    }
    assert(e.getMessage.contains("price_pos"))
    // table untouched: the add's metadata commit is the only new version
    assert(ManifestTable.currentVersion(spark, path) === Some(2L))
    assert(ManifestTable.read(spark, path).count() === 2L)
    // a CLEAN staged batch still publishes through the new constraint
    val ok = ManifestTable.stageAppend(spark, path,
      Seq((4L, 40.0)).toDF("id", "price"))
    ManifestTable.publishStaged(spark, path, ok)
    assert(ManifestTable.read(spark, path).count() === 3L)
  }

  test("appendOnly blocks overwrite/REPLACE and partition overwrite") {
    val path = tbl("appendonly")
    ManifestTable.overwrite(spark, path,
      Seq((1L, "p1", 5.0), (2L, "p2", 6.0)).toDF("id", "p", "v"),
      partitionCols = Seq("p"))
    ManifestTable.setProperties(spark, path, Map("graft.appendOnly" -> "true"))
    intercept[IllegalArgumentException] {
      ManifestTable.overwrite(spark, path, Seq((9L, "p1", 1.0)).toDF("id", "p", "v"))
    }
    intercept[IllegalArgumentException] {
      ManifestTable.overwritePartitions(spark, path,
        Seq((9L, "p1", 1.0)).toDF("id", "p", "v"))
    }
    // appends still flow — that is the property's whole point
    ManifestTable.append(spark, path, Seq((3L, "p1", 7.0)).toDF("id", "p", "v"))
    assert(ManifestTable.read(spark, path).count() === 3L)
  }
}
