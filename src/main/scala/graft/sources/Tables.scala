package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types._

/** Typed readers for the harness fixture tables (`/root/testdata/sf*`,
  * schemas catalogued in FIXTURES.md §B).
  *
  * Design rule (SURVEY.md §7.4.7, 100 TB): every read declares an explicit
  * schema — never rely on inference. The reference's song-feed read infers
  * JSON schema at full-scan cost (reference `etl.py:96`; its explicit
  * `SongSchema` at `etl.py:75-86` is dead code) — at 100 TB that is an extra
  * pass over the data. Parquet footers make inference cheap locally, but an
  * explicit schema still (a) fails fast on drift, (b) prunes the read to the
  * declared columns, (c) documents the contract.
  */
object Tables {

  val regionSchema: StructType = StructType(Seq(
    StructField("r_regionkey", IntegerType),
    StructField("r_name", StringType)))

  val nationSchema: StructType = StructType(Seq(
    StructField("n_nationkey", IntegerType),
    StructField("n_name", StringType),
    StructField("n_regionkey", IntegerType)))

  val customerSchema: StructType = StructType(Seq(
    StructField("c_custkey", LongType),
    StructField("c_name", StringType),
    StructField("c_nationkey", IntegerType),
    StructField("c_acctbal", DoubleType),
    StructField("c_mktsegment", StringType)))

  val supplierSchema: StructType = StructType(Seq(
    StructField("s_suppkey", LongType),
    StructField("s_name", StringType),
    StructField("s_nationkey", IntegerType),
    StructField("s_acctbal", DoubleType)))

  val partSchema: StructType = StructType(Seq(
    StructField("p_partkey", LongType),
    StructField("p_name", StringType),
    StructField("p_brand", StringType),
    StructField("p_type", StringType),
    StructField("p_size", IntegerType),
    StructField("p_retailprice", DoubleType)))

  val ordersSchema: StructType = StructType(Seq(
    StructField("o_orderkey", LongType),
    StructField("o_custkey", LongType),
    StructField("o_orderstatus", StringType),
    StructField("o_totalprice", DoubleType),
    StructField("o_orderdate", TimestampType),
    StructField("o_orderpriority", StringType)))

  val lineitemSchema: StructType = StructType(Seq(
    StructField("l_orderkey", LongType),
    StructField("l_partkey", LongType),
    StructField("l_suppkey", LongType),
    StructField("l_linenumber", IntegerType),
    StructField("l_quantity", DoubleType),
    StructField("l_extendedprice", DoubleType),
    StructField("l_discount", DoubleType),
    StructField("l_tax", DoubleType),
    StructField("l_returnflag", StringType),
    StructField("l_linestatus", StringType),
    StructField("l_shipdate", TimestampType)))

  /** Raw shape of `events` when the on-disk `ts` is TIMESTAMP(NANOS) — Spark
    * only reads nanos as a raw long. Used by the NANOS branch of
    * [[ParquetUnits.readTimestamped]] and by the streaming demo (streaming
    * sources need the schema up front).
    */
  val eventsRawSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", LongType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  val eventsSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", TimestampType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  val documentsSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("lang", StringType),
    StructField("source", StringType),
    StructField("n_chars", LongType)))

  val embeddingsSchema: StructType = StructType(Seq(
    StructField("vec_id", LongType),
    StructField("embedding", ArrayType(FloatType)),
    StructField("label", IntegerType)))

  private def read(spark: SparkSession, dir: String, name: String, schema: StructType): DataFrame =
    spark.read.schema(schema).parquet(s"$dir/$name.parquet")

  def region(spark: SparkSession, dir: String): DataFrame = read(spark, dir, "region", regionSchema)
  def nation(spark: SparkSession, dir: String): DataFrame = read(spark, dir, "nation", nationSchema)
  def customer(spark: SparkSession, dir: String): DataFrame = read(spark, dir, "customer", customerSchema)
  def supplier(spark: SparkSession, dir: String): DataFrame = read(spark, dir, "supplier", supplierSchema)
  def part(spark: SparkSession, dir: String): DataFrame = read(spark, dir, "part", partSchema)
  def orders(spark: SparkSession, dir: String): DataFrame = read(spark, dir, "orders", ordersSchema)
  def lineitem(spark: SparkSession, dir: String): DataFrame = read(spark, dir, "lineitem", lineitemSchema)
  /** `ts` unit varies by testdata vintage (NANOS through round 6, MICROS from
    * round 7) — probe the footer instead of assuming (VERDICT r7 §wrong-1).
    */
  def events(spark: SparkSession, dir: String): DataFrame =
    ParquetUnits.readTimestamped(spark, s"$dir/events.parquet", eventsSchema, "ts")
  def documents(spark: SparkSession, dir: String): DataFrame = read(spark, dir, "documents", documentsSchema)
  def embeddings(spark: SparkSession, dir: String): DataFrame = read(spark, dir, "embeddings", embeddingsSchema)

  /** Song-feed schema from the reference (`etl.py:75-86`) — kept so the
    * reference's own JSON feeds can be read with `Json.read` at full parity
    * (explicit schema, FAILFAST) instead of the reference's live inferred
    * read (`etl.py:96`).
    */
  val songFeedSchema: StructType = StructType(Seq(
    StructField("artist_id", StringType),
    StructField("artist_latitude", DoubleType),
    StructField("artist_location", StringType),
    StructField("artist_longitude", DoubleType),
    StructField("artist_name", StringType),
    StructField("duration", DoubleType),
    StructField("num_songs", IntegerType),
    StructField("song_id", StringType),
    StructField("title", StringType),
    StructField("year", IntegerType)))

  /** Log-feed schema from the reference (11 fields consumed at `etl.py:175-176`). */
  val logFeedSchema: StructType = StructType(Seq(
    StructField("userId", StringType),
    StructField("firstName", StringType),
    StructField("lastName", StringType),
    StructField("gender", StringType),
    StructField("level", StringType),
    StructField("song", StringType),
    StructField("artist", StringType),
    StructField("sessionId", LongType),
    StructField("location", StringType),
    StructField("userAgent", StringType),
    StructField("ts", LongType)))
}
