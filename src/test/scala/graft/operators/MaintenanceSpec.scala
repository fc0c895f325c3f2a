package graft.operators

import graft.SparkSpec
import graft.sources.{Sink, Tables}
import graft.streaming.Streaming
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import java.nio.file.Files

class MaintenanceSpec extends SparkSpec {
  import spark.implicits._

  test("compact reduces file count without changing data") {
    val path = Files.createTempDirectory("cmp").toString + "/t"
    val df = Tables.orders(spark, sf).withColumn("year", year(col("o_orderdate")))
    // simulate fragmented ingestion: 6 small appends
    (1 to 6).foreach(_ => Sink.writePartitioned(df.limit(250), path, Seq("year")))
    val before = Maintenance.fileCount(spark, path)
    val beforeData = spark.read.parquet(path).orderBy("o_orderkey", "o_totalprice").collect()

    Maintenance.compact(spark, path, Seq("year"), targetRowsPerFile = 100000)
    val after = Maintenance.fileCount(spark, path)
    assert(after < before, s"files: $before -> $after")
    val afterData = spark.read.parquet(path).orderBy("o_orderkey", "o_totalprice").collect()
    assert(afterData === beforeData)
  }

  test("quality report catches planted violations and passes clean data") {
    val orders = Tables.orders(spark, sf)
    val customer = Tables.customer(spark, sf)
    val clean = Quality.report(
      Quality.notNull(orders, Seq("o_orderkey", "o_custkey")),
      Quality.uniqueKey(orders, Seq("o_orderkey")),
      Quality.foreignKey(orders, "o_custkey", customer.withColumnRenamed("c_custkey", "o_custkey"), "o_custkey"))
    assert(clean.filter(col("violations") > 0).count() === 0)
    assert(clean.count() === 4) // 2 not-null rules + unique + fk

    val dirty = orders.unionByName(orders.limit(3)) // 3 duplicate keys
      .unionByName(orders.limit(1).withColumn("o_custkey", lit(-99L))) // broken FK (also a dup)
    val rep = Quality.report(
      Quality.uniqueKey(dirty, Seq("o_orderkey")),
      Quality.foreignKey(dirty, "o_custkey", customer.withColumnRenamed("c_custkey", "o_custkey"), "o_custkey"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(rep("unique_key:o_orderkey") === 4L) // 3 dups + the altered row's key
    assert(rep("foreign_key:o_custkey->o_custkey") === 1L)
  }

  test("notNull handles exotic column names (dots, spaces, backticks)") {
    val df = Seq((Some(1), None: Option[Int], Some(3)), (None, None, Some(6)))
      .toDF("a.b", "weird `col`", "plain name")
    val rep = Quality.notNull(df, Seq("a.b", "weird `col`", "plain name"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(rep === Map(
      "not_null:a.b" -> 1L,
      "not_null:weird `col`" -> 2L,
      "not_null:plain name" -> 0L))
  }

  test("streaming upsertSink merges micro-batches into the table") {
    implicit val sqlCtx = spark.sqlContext
    val path = Files.createTempDirectory("supsert").toString + "/t"
    val ckpt = Files.createTempDirectory("supsert_ck").toString
    val in = MemoryStream[(Long, String, Int)]
    val df = in.toDF().toDF("id", "v", "part")

    val q = Streaming.upsertSink(df, path, keys = Seq("id"), partitionCols = Seq("part"), ckpt)
    in.addData((1L, "a", 0), (2L, "b", 0), (3L, "c", 1))
    q.processAllAvailable()
    in.addData((2L, "B2", 0), (4L, "d", 1)) // update id=2, insert id=4
    q.processAllAvailable()
    q.stop()

    val got = spark.read.parquet(path).select("id", "v").as[(Long, String)].collect().toMap
    assert(got === Map(1L -> "a", 2L -> "B2", 3L -> "c", 4L -> "d"))
  }
}
