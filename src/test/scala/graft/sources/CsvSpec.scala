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
}
