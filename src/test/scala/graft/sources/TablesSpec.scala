package graft.sources

import graft.SparkSpec

class TablesSpec extends SparkSpec {

  test("events read scopes the nanos legacy conf to the read (session conf untouched)") {
    val key = "spark.sql.legacy.parquet.nanosAsLong"
    val before = spark.conf.getOption(key)
    val df = Tables.events(spark, sf)
    assert(df.count() > 0)
    assert(df.schema("ts").dataType.typeName === "timestamp")
    assert(spark.conf.getOption(key) === before,
      "reading events must not mutate the shared session conf")
  }

  test("events read works in a session where the legacy conf is explicitly off") {
    val s2 = spark.newSession()
    s2.conf.set("spark.sql.legacy.parquet.nanosAsLong", "false")
    assert(Tables.events(s2, sf).count() > 0)
  }
}
