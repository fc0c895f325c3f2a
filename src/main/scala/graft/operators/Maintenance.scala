package graft.operators

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Table-maintenance operators for parquet lakes.
  *
  * `compact` fixes the small-files problem: streaming/incremental ingestion
  * (e.g. `Streaming.upsertSink`, `Sink.writePartitioned` appends) leaves
  * many tiny part-files per partition; scans then pay per-file open/footer
  * costs and lose vectorization efficiency. Compaction rewrites the table
  * (or a partition subset) into files of ~`targetRowsPerFile`, preserving
  * the partition layout. At 100 TB this runs per-partition as a rolling
  * background job — the rewrite cost is bounded by the partitions touched,
  * never the table.
  */
object Maintenance {

  /** Rewrite `path` so each partition holds ⌈rows/targetRowsPerFile⌉ files.
    * Two-phase (write to `path + ".compact.tmp"`, swap) so a crash never
    * leaves the table half-rewritten.
    */
  def compact(spark: SparkSession, path: String, partitionCols: Seq[String],
              targetRowsPerFile: Long): Unit = {
    val df = spark.read.parquet(path)
    val total = df.count()
    val nFiles = math.max(1, math.ceil(total.toDouble / targetRowsPerFile).toInt)

    val compacted =
      if (partitionCols.isEmpty) df.repartition(nFiles)
      else df.repartition(nFiles, partitionCols.map(col): _*)

    val tmp = path + ".compact.tmp"
    val w = compacted.write.mode(SaveMode.Overwrite)
    (if (partitionCols.nonEmpty) w.partitionBy(partitionCols: _*) else w).parquet(tmp)

    val hadoopPath = new org.apache.hadoop.fs.Path(path)
    val tmpPath = new org.apache.hadoop.fs.Path(tmp)
    val fs = hadoopPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(hadoopPath, true)
    fs.rename(tmpPath, hadoopPath)
  }

  /** Count data files per partition directory — the health metric compaction
    * improves.
    */
  def fileCount(spark: SparkSession, path: String): Long = {
    val hadoopPath = new org.apache.hadoop.fs.Path(path)
    val fs = hadoopPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val it = fs.listFiles(hadoopPath, true)
    var n = 0L
    while (it.hasNext) {
      val f = it.next()
      if (f.getPath.getName.endsWith(".parquet")) n += 1
    }
    n
  }
}

/** Declarative data-quality checks — the constraint layer a lake needs in
  * front of 100 TB ingest (nulls in key columns, duplicate keys, broken
  * foreign keys). Each check is a DataFrame aggregation; the report is one
  * row per rule with a violation count, so a gate is just
  * `report.filter($"violations" > 0).isEmpty`.
  */
object Quality {

  def notNull(df: DataFrame, cols: Seq[String]): DataFrame =
    df.select(cols.map(c =>
      sum(when(col(c).isNull, 1L).otherwise(0L)).as(c)): _*)
      .selectExpr(s"stack(${cols.length}, ${cols.map(c => s"'$c', $c").mkString(", ")}) AS (rule, violations)")
      .withColumn("rule", concat(lit("not_null:"), col("rule")))

  def uniqueKey(df: DataFrame, keys: Seq[String]): DataFrame =
    df.groupBy(keys.map(col): _*).agg(count(lit(1)).as("n")).filter(col("n") > 1)
      .agg(coalesce(sum(col("n") - 1), lit(0L)).as("violations"))
      .select(lit("unique_key:" + keys.mkString(",")).as("rule"), col("violations"))

  /** Orphaned foreign keys: rows of `child` whose `childKey` has no match in
    * `parent.parentKey` (null child keys are not violations).
    */
  def foreignKey(child: DataFrame, childKey: String,
                 parent: DataFrame, parentKey: String): DataFrame =
    child.filter(col(childKey).isNotNull)
      .join(parent.select(col(parentKey).as(childKey)).distinct(), Seq(childKey), "left_anti")
      .agg(count(lit(1)).as("violations"))
      .select(lit(s"foreign_key:$childKey->$parentKey").as("rule"), col("violations"))

  def report(checks: DataFrame*): DataFrame = checks.reduce(_ unionByName _)
}
