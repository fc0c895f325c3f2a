package graft.operators

import graft.SparkSpec
import graft.sources.{Sink, Tables}
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Paths}

class MergeAnnSpec extends SparkSpec {
  import spark.implicits._

  test("MergeUpsert replaces matched keys and rewrites only touched partitions") {
    val path = Files.createTempDirectory("merge_t").toString + "/t"
    val orig = Tables.orders(spark, sf)
      .withColumn("year", year(col("o_orderdate")))
    Sink.writePartitioned(orig, path, Seq("year"))

    // untouched partition files must survive the merge byte-identical
    def filesOf(yearDir: String) =
      java.nio.file.Files.list(Paths.get(s"$path/$yearDir")).toArray.map(_.toString).sorted.toSeq
    val before1995 = filesOf("year=1995")

    // update: flip status of two 1997 orders, add one brand-new 1997 order
    val updates = orig.filter(col("year") === 1997).limit(2)
      .withColumn("o_orderstatus", lit("X"))
      .unionByName(orig.filter(col("year") === 1997).limit(1)
        .withColumn("o_orderkey", lit(999999L)))
    MergeUpsert(spark, path, updates, keys = Seq("o_orderkey"), partitionCols = Seq("year"))

    val after = spark.read.parquet(path)
    assert(after.count() === orig.count() + 1)
    assert(after.filter(col("o_orderstatus") === "X").count() === 2)
    assert(after.filter(col("o_orderkey") === 999999L).count() === 1)
    assert(filesOf("year=1995") === before1995, "untouched partition was rewritten")
  }

  test("MergeUpsert deletes the old copy when an update moves a key across partitions") {
    val path = Files.createTempDirectory("merge_mv").toString + "/t"
    Seq((7L, "free", "alice"), (8L, "free", "bob"), (9L, "paid", "carol"))
      .toDF("user_id", "level", "name").write.partitionBy("level").parquet(path)

    // user 7 flips free→paid: old row lives in level=free, new in level=paid
    MergeUpsert(spark, path, Seq((7L, "paid", "alice")).toDF("user_id", "level", "name"),
      keys = Seq("user_id"), partitionCols = Seq("level"))
    val after = spark.read.parquet(path)
    assert(after.filter(col("user_id") === 7L).count() === 1, "stale old-partition copy survived")
    assert(after.filter(col("user_id") === 7L).select("level").as[String].head() === "paid")
    assert(after.count() === 3)

    // bob flips too — draining level=free to zero rows: the directory must go
    MergeUpsert(spark, path, Seq((8L, "paid", "bob")).toDF("user_id", "level", "name"),
      keys = Seq("user_id"), partitionCols = Seq("level"))
    val drained = spark.read.parquet(path)
    assert(drained.count() === 3)
    assert(drained.filter(col("level") === "free").count() === 0)
  }

  test("MergeUpsert restores the session's partitionOverwriteMode") {
    val before = spark.conf.getOption("spark.sql.sources.partitionOverwriteMode")
    val path = Files.createTempDirectory("merge_conf").toString + "/t"
    Seq((1L, 0, "a")).toDF("id", "p", "v").write.partitionBy("p").parquet(path)
    MergeUpsert(spark, path, Seq((1L, 0, "A")).toDF("id", "p", "v"), Seq("id"), Seq("p"))
    assert(spark.conf.getOption("spark.sql.sources.partitionOverwriteMode") === before)
  }

  test("MergeUpsert without partitions does a full keyed rewrite") {
    val path = Files.createTempDirectory("merge_np").toString + "/t"
    Seq((1L, "a"), (2L, "b")).toDF("id", "v").write.parquet(path)
    MergeUpsert(spark, path, Seq((2L, "B"), (3L, "c")).toDF("id", "v"),
      keys = Seq("id"), partitionCols = Nil)
    val got = spark.read.parquet(path).as[(Long, String)].collect().toMap
    assert(got === Map(1L -> "a", 2L -> "B", 3L -> "c"))
  }

  test("AnnIndex query equals ivfTopK and prunes the cell scan") {
    val emb = Tables.embeddings(spark, sf)
    val idx = Files.createTempDirectory("ann_idx").toString
    AnnIndex.build(spark, emb, everyNthCentroid = 50, idx)

    val queries = emb.filter(col("vec_id") < 8)
    val fromIndex = AnnIndex.query(spark, idx, queries, k = 5, nProbe = 3)
    val direct = Similarity.ivfTopK(emb, queries, k = 5, everyNthCentroid = 50, nProbe = 3)
    assert(fromIndex.orderBy("q_id", "rk").collect() ===
      direct.orderBy("q_id", "rk").collect())

    // the scan must be partition-pruned to the probed cells
    val plan = fromIndex.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [cell"), s"no partition pruning in:\n$plan")
  }

  test("AnnIndex.upsert merges a batch into existing cells without a rebuild") {
    val emb = Tables.embeddings(spark, sf).select("vec_id", "embedding")
    val idx = Files.createTempDirectory("ann_up").toString
    AnnIndex.build(spark, emb, everyNthCentroid = 50, idx)
    val origCount = spark.read.parquet(s"$idx/cells").count()

    // batch: two NEW vectors cloned from existing ones (+100000) and one
    // REPLACEMENT — vec 1 takes vec 2's embedding (possibly moving cell)
    val batch = emb.filter(col("vec_id").isin(10L, 11L))
      .select((col("vec_id") + 100000L).as("vec_id"), col("embedding"))
      .unionByName(emb.filter(col("vec_id") === 2L)
        .select(lit(1L).as("vec_id"), col("embedding")))

    // cells the upsert may legitimately rewrite: the batch's assigned
    // cells plus wherever the replaced key's OLD copy lives
    val cents = spark.read.parquet(s"$idx/centroids")
      .select(col("cell"), col("embedding").as("cv"))
    val touched = Similarity.assignCells(batch, cents)
        .select("cell").as[Long].collect().toSet ++
      spark.read.parquet(s"$idx/cells").filter(col("vec_id") === 1L)
        .select("cell").as[Long].collect().toSet

    def filesOf(dir: java.nio.file.Path) =
      Files.list(dir).toArray.map(_.toString).sorted.toSeq
    val before = Files.list(Paths.get(s"$idx/cells")).toArray
      .map(_.asInstanceOf[java.nio.file.Path])
      .filter(_.getFileName.toString.startsWith("cell="))
      .map(d => d.getFileName.toString -> filesOf(d)).toMap

    AnnIndex.upsert(spark, idx, batch)

    // every cell the batch didn't touch keeps byte-identical files
    val untouched = before.keys.filterNot(d =>
      touched.contains(d.stripPrefix("cell=").toLong))
    assert(untouched.nonEmpty, "fixture degenerate: every cell touched")
    untouched.foreach { d =>
      assert(filesOf(Paths.get(s"$idx/cells/$d")) === before(d),
        s"untouched $d was rewritten")
    }

    val cells = spark.read.parquet(s"$idx/cells")
    assert(cells.count() === origCount + 2) // 2 inserts, 1 replace
    // the replacement took: exactly one copy of vec 1, carrying vec 2's embedding
    val v1 = cells.filter(col("vec_id") === 1L)
      .select("embedding").as[Array[Float]].collect()
    val v2 = emb.filter(col("vec_id") === 2L)
      .select("embedding").as[Array[Float]].head()
    assert(v1.length === 1 && v1.head === v2)

    // queries see the new vectors: vec 10's exact clone is its top neighbor
    val got = AnnIndex.query(spark, idx,
        emb.filter(col("vec_id") === 10L), k = 3, nProbe = 3)
      .orderBy("rk").select("n_id").as[Long].head()
    assert(got === 100010L, s"top neighbor after upsert was $got, not the clone")
  }

  test("AnnIndex built with refined centroids equals ivfTopK(refineIters) and recalls at least the seed index") {
    val emb = Tables.embeddings(spark, sf)
    val queries = emb.filter(col("vec_id") < 8)
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.select("q_id", "n_id").as[(Long, Long)].collect().toSet

    val truth = pairs(Similarity.bruteForceTopK(emb, queries, k = 5))

    val seedIdx = Files.createTempDirectory("ann_seed").toString
    AnnIndex.build(spark, emb, everyNthCentroid = 50, seedIdx)
    val refIdx = Files.createTempDirectory("ann_ref").toString
    AnnIndex.build(spark, emb, everyNthCentroid = 50, refIdx, refineIters = 2)

    val refined = pairs(AnnIndex.query(spark, refIdx, queries, k = 5, nProbe = 3))
    // the persisted refined index answers exactly like the inline trained path
    val direct = pairs(Similarity.ivfTopK(emb, queries, k = 5,
      everyNthCentroid = 50, nProbe = 3, refineIters = 2))
    assert(refined === direct)

    val seedRecall = (pairs(AnnIndex.query(spark, seedIdx, queries, k = 5, nProbe = 3))
      & truth).size.toDouble / truth.size
    val refRecall = (refined & truth).size.toDouble / truth.size
    info(s"index recall: seed=$seedRecall refined=$refRecall")
    assert(refRecall >= seedRecall,
      s"refined centroids must not lose recall: $refRecall < $seedRecall")
  }
}
