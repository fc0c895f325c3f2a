package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Spark 4 wraps public `Column`s around ColumnNodes; the Expression⇄Column
  * converters live in `org.apache.spark.sql.classic` with `private[sql]`
  * access. This bridge (placed inside the sql package, the standard pattern
  * for Catalyst extensions built outside the Spark tree) re-exports the two
  * conversions the graft expressions need.
  */
/** `V2TableWithV1Fallback` is `private[sql]` — the hook Spark's streaming
  * resolution consults to route `readStream.table(...)` of a v2 table
  * through a V1 `Source`. This abstract re-export lets graft's catalog
  * table (outside the sql package) implement it. */
abstract class V1FallbackTable
  extends org.apache.spark.sql.connector.catalog.V2TableWithV1Fallback

object bridge {
  def toExpression(c: Column): Expression = ExpressionUtils.expression(c)
  def toColumn(e: Expression): Column = ExpressionUtils.column(e)

  /** The `CatalogTable` under the session catalog's v1 wrapper
    * (`V1Table` is `private[sql]`); None for any other table. The
    * delegating session catalog uses this to recognize graft-provider
    * entries it must serve natively. */
  def v1CatalogTable(t: org.apache.spark.sql.connector.catalog.Table)
      : Option[org.apache.spark.sql.catalyst.catalog.CatalogTable] = t match {
    case v1: org.apache.spark.sql.connector.catalog.V1Table => Some(v1.v1Table)
    case _ => None
  }

  /** Materialize an analyzed LogicalPlan as a DataFrame (the command side
    * of a lowered DML statement needs to run its source plan;
    * `Dataset.ofRows` is `private[sql]`).
    */
  def ofRows(spark: org.apache.spark.sql.SparkSession,
             plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan)
      : org.apache.spark.sql.DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)

  /** Re-plan a batch result as a STREAMING DataFrame (what a V1
    * `Source.getBatch` must return; `internalCreateDataFrame`'s
    * isStreaming flag is `private[sql]`).
    */
  def streamingDataFrame(spark: org.apache.spark.sql.SparkSession,
                         rdd: org.apache.spark.rdd.RDD[org.apache.spark.sql.catalyst.InternalRow],
                         schema: org.apache.spark.sql.types.StructType)
      : org.apache.spark.sql.DataFrame =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .internalCreateDataFrame(rdd, schema, isStreaming = true)

  /** Re-plan a streaming micro-batch as a BATCH DataFrame (what a V1
    * `Sink.addBatch` needs to hand the table's write paths: the incoming
    * Dataset carries streaming-incremental plan state that must not be
    * re-analyzed — the same materialization `ForeachBatchSink` performs).
    */
  def batchDataFrame(spark: org.apache.spark.sql.SparkSession,
                     rdd: org.apache.spark.rdd.RDD[org.apache.spark.sql.catalyst.InternalRow],
                     schema: org.apache.spark.sql.types.StructType)
      : org.apache.spark.sql.DataFrame =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .internalCreateDataFrame(rdd, schema, isStreaming = false)

  /** Unpersist the RDD blocks backing a `localCheckpoint`ed Dataset.
    * `Dataset.unpersist` only clears CacheManager entries, not the
    * checkpoint RDD's storage — its `LogicalRDD` leaf (private[sql]) holds
    * the persisted RDD, reachable only from inside the sql package.
    */
  def releaseCheckpoint(df: org.apache.spark.sql.DataFrame): Unit =
    df.queryExecution.analyzed.collectLeaves().foreach {
      case l: org.apache.spark.sql.execution.LogicalRDD => l.rdd.unpersist(true)
      case _ => ()
    }

  /** DDL `PARTITIONED BY` v2 transforms → a neutral `(kind, column, arg)`
    * list: `("identity", col, 0)`, `("days", col, 0)`,
    * `("bucket", col, n)`, `("trunc", col, n)`. The connector transform
    * case classes (`IdentityTransform` et al.) are `private[sql]`, so the
    * match lives here; callers map the neutral triples onto their own
    * partition spec. Unsupported transforms (months/years/hours,
    * multi-column buckets, nested refs) throw with the transform's
    * `describe()` — never silently dropped.
    */
  def v2Transforms(parts: Seq[org.apache.spark.sql.connector.expressions.Transform])
      : Seq[(String, String, Int)] = {
    import org.apache.spark.sql.connector.expressions._
    def nameOf(r: NamedReference): String = {
      require(r.fieldNames.length == 1,
        s"PARTITIONED BY: nested field '${r.describe()}' is not partitionable")
      r.fieldNames.head
    }
    parts.map {
      case it: IdentityTransform => ("identity", nameOf(it.ref), 0)
      case dt: DaysTransform => ("days", nameOf(dt.ref), 0)
      case ht: HoursTransform => ("hours", nameOf(ht.ref), 0)
      case mt: MonthsTransform => ("months", nameOf(mt.ref), 0)
      case yt: YearsTransform => ("years", nameOf(yt.ref), 0)
      case bt: BucketTransform if bt.columns.length == 1 =>
        ("bucket", nameOf(bt.columns.head), bt.numBuckets.value.toString.toInt)
      case at: ApplyTransform
          if at.name.equalsIgnoreCase("truncate") || at.name.equalsIgnoreCase("trunc") =>
        val ref = at.args.collectFirst { case r: NamedReference => nameOf(r) }
        val len = at.args.collectFirst { case LiteralValue(v, _) => v.toString.toInt }
        (ref, len) match {
          case (Some(c), Some(n)) if n > 0 => ("trunc", c, n)
          case _ => throw new IllegalArgumentException(
            "PARTITIONED BY: truncate needs a column and a positive length")
        }
      case other => throw new IllegalArgumentException(
        s"PARTITIONED BY: transform '${other.describe()}' is not supported by " +
          "graft tables — use identity columns, years/months/days/hours(ts), " +
          "bucket(n, col), or truncate(col, n)")
    }
  }

  /** Hive-style partition-directory escaping, exactly as Spark's writer
    * applies it (special chars percent-encoded, nulls →
    * `__HIVE_DEFAULT_PARTITION__`) — needed to map partition VALUES back to
    * the directory names the writer produced.
    */
  def escapePathValue(v: Any): String =
    if (v == null) org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils.DEFAULT_PARTITION_NAME
    else org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils.escapePathName(String.valueOf(v))

  /** Inverse of [[escapePathValue]]: directory segment → raw string value,
    * None for the hive null sentinel. */
  def unescapePathValue(s: String): Option[String] =
    if (s == org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils.DEFAULT_PARTITION_NAME) None
    else Some(org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils.unescapePathName(s))
}
