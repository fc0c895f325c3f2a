package graft.sources

import graft.SparkSpec
import java.nio.file.Files

class CsvSpec extends SparkSpec {

  test("CSV write/read round-trips the orders table") {
    val dir = Files.createTempDirectory("csv_rt").toString + "/orders"
    val orig = Tables.orders(spark, sf)
    Csv.write(orig, dir)
    val back = Csv.read(spark, Tables.ordersSchema, dir)
    assert(back.count() === orig.count())
    assert(back.schema === orig.schema)
    assert(back.exceptAll(orig).count() === 0)
    assert(orig.exceptAll(back).count() === 0)
  }

  test("JSON source reads with explicit schema and FAILFAST") {
    val dir = Files.createTempDirectory("json_rt").toString + "/orders"
    Tables.orders(spark, sf).write.json(dir)
    val back = Json.read(spark, Tables.ordersSchema, dir)
    assert(back.count() === Tables.orders(spark, sf).count())
  }

  test("ORC sink round-trips partitioned and pushes filters into the scan") {
    import org.apache.spark.sql.functions._
    val dir = Files.createTempDirectory("orc_rt").toString + "/orders"
    val orig = Tables.orders(spark, sf).withColumn("year", year(col("o_orderdate")))
    Sink.writeOrc(orig, dir, Seq("year"))
    val back = Sink.readOrc(spark, dir, orig.schema)
    assert(back.count() === orig.count())
    assert(back.exceptAll(orig).count() === 0 && orig.exceptAll(back).count() === 0)
    // native ORC reader: partition pruning + predicate pushdown both engage
    val plan = back.filter(col("year") === 1995 && col("o_totalprice") > 100000)
      .queryExecution.executedPlan.toString
    assert(plan.contains("FileScan orc"), s"not the native orc scan:\n$plan")
    assert(plan.contains("PartitionFilters: [") && plan.contains("year"),
      s"no partition pruning in:\n$plan")
    assert(plan.contains("PushedFilters: [") && plan.contains("GreaterThan(o_totalprice"),
      s"no predicate pushdown in:\n$plan")
  }

  test("writeJsonlShards exports byte-reproducible ordered training shards") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val docs = Tables.documents(spark, sf).select("doc_id", "lang")
    val out = Files.createTempDirectory("jsonl").toString + "/export"
    Sink.writeJsonlShards(docs, out, "doc_id", nShards = 4)

    val expected = graft.operators.TrainingData
      .deterministicShuffle(docs, "doc_id", 4)
      .select("doc_id", "shard", "pos").as[(Long, Int, Long)].collect()
      .groupBy(_._2).map { case (s, rows) => s -> rows.sortBy(_._3).map(_._1).toSeq }

    val IdRe = """"doc_id":(\d+)""".r
    def shardIds(dir: String, s: Int): Seq[Long] =
      spark.read.text(s"$dir/shard=$s").select("value").as[String].collect()
        .map(l => IdRe.findFirstMatchIn(l).get.group(1).toLong).toSeq
    (0 until 4).foreach { s =>
      assert(shardIds(out, s) === expected(s), s"shard $s order")
    }

    // a differently-partitioned run of the same corpus writes identical lines
    val out2 = Files.createTempDirectory("jsonl").toString + "/export2"
    Sink.writeJsonlShards(docs.repartition(7), out2, "doc_id", nShards = 4)
    (0 until 4).foreach { s =>
      val a = spark.read.text(s"$out/shard=$s").as[String].collect().toSeq
      val b = spark.read.text(s"$out2/shard=$s").as[String].collect().toSeq
      assert(a === b, s"shard $s bytes")
    }
  }
}
