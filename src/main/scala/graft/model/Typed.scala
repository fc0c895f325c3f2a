package graft.model

import graft.sources.Tables
import org.apache.spark.sql.{Dataset, SparkSession}

/** Typed records for the fixture tables (SURVEY §1.5: `Dataset[T]` with case
  * classes where compile-time field checks buy safety — dimension/fact
  * records with stable schemas; `DataFrame` stays the surface for
  * dynamic-schema operators).
  */
final case class Order(o_orderkey: Long, o_custkey: Long, o_orderstatus: String,
                       o_totalprice: Double, o_orderdate: java.sql.Timestamp,
                       o_orderpriority: String)

final case class Customer(c_custkey: Long, c_name: String, c_nationkey: Int,
                          c_acctbal: Double, c_mktsegment: String)

final case class Lineitem(l_orderkey: Long, l_partkey: Long, l_suppkey: Long,
                          l_linenumber: Int, l_quantity: Double, l_extendedprice: Double,
                          l_discount: Double, l_tax: Double, l_returnflag: String,
                          l_linestatus: String, l_shipdate: java.sql.Timestamp)

final case class Event(event_id: Long, ts: java.sql.Timestamp, user_id: Long,
                       event_type: String, value: Double, props: String)

final case class Document(doc_id: Long, text: String, lang: String, source: String,
                          n_chars: Long)

object Typed {
  def orders(spark: SparkSession, dir: String): Dataset[Order] = {
    import spark.implicits._
    Tables.orders(spark, dir).as[Order]
  }
  def customers(spark: SparkSession, dir: String): Dataset[Customer] = {
    import spark.implicits._
    Tables.customer(spark, dir).as[Customer]
  }
  def lineitems(spark: SparkSession, dir: String): Dataset[Lineitem] = {
    import spark.implicits._
    Tables.lineitem(spark, dir).as[Lineitem]
  }
  def events(spark: SparkSession, dir: String): Dataset[Event] = {
    import spark.implicits._
    Tables.events(spark, dir).as[Event]
  }
  def documents(spark: SparkSession, dir: String): Dataset[Document] = {
    import spark.implicits._
    Tables.documents(spark, dir).as[Document]
  }

  /** Typed example op: revenue per order status via `groupByKey` — field
    * access is compile-checked; the aggregation still plans as a hash
    * aggregate (KeyValueGroupedDataset.agg, not a reduce on the driver).
    */
  def revenueByStatus(orders: Dataset[Order]): Dataset[(String, Double)] = {
    import orders.sparkSession.implicits._
    orders.groupByKey(_.o_orderstatus)
      .agg(org.apache.spark.sql.functions.sum($"o_totalprice").as[Double])
  }
}
