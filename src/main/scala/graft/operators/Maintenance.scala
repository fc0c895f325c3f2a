package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SaveMode, SparkSession}
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

  /** Rewrite `path` so each PARTITION holds ⌈partitionRows/targetRowsPerFile⌉
    * files (a salt inside each partition spreads rows over that many tasks —
    * repartitioning on the partition columns alone would funnel every
    * partition into a single task/file regardless of size).
    *
    * Swap discipline: write to `.compact.tmp`, move the original aside to
    * `.compact.old`, promote tmp, delete old. A crash at any point leaves the
    * data recoverable (original under `.old` or still in place) — never
    * deleted-before-replaced. NOT atomic for concurrent readers (there is a
    * window with no table at `path`); for snapshot-isolated compaction use
    * [[graft.sources.ManifestTable.compact]], which readers never observe
    * mid-swap.
    */
  def compact(spark: SparkSession, path: String, partitionCols: Seq[String],
              targetRowsPerFile: Long): Unit = {
    require(targetRowsPerFile > 0, "targetRowsPerFile must be positive")
    val compacted = sizedRepartition(spark.read.parquet(path), partitionCols, targetRowsPerFile)

    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val target = new org.apache.hadoop.fs.Path(path)
    val tmp = new org.apache.hadoop.fs.Path(path + ".compact.tmp")
    val old = new org.apache.hadoop.fs.Path(path + ".compact.old")

    val w = compacted.write.mode(SaveMode.Overwrite)
    (if (partitionCols.nonEmpty) w.partitionBy(partitionCols: _*) else w)
      .parquet(tmp.toString)

    fs.delete(old, true)
    if (!fs.rename(target, old)) sys.error(s"compact: could not move $target aside")
    if (!fs.rename(tmp, target)) {
      fs.rename(old, target) // roll back: restore the original
      sys.error(s"compact: could not promote $tmp; original restored")
    }
    fs.delete(old, true)
  }

  /** Repartition so each table PARTITION lands in ⌈partitionRows/target⌉
    * write tasks (= files). Per-partition file counts come from per-partition
    * row counts; each (partition, salt) pair gets its own GLOBAL slot id and
    * rows are range-partitioned by slot with an explicit partition count — a
    * plain column repartition would let AQE coalesce the small shuffle
    * partitions back together and write one file per partition regardless of
    * the target. Shared by [[compact]] and `ManifestTable.compact`.
    */
  def sizedRepartition(df: DataFrame, partitionCols: Seq[String],
                       targetRowsPerFile: Long): DataFrame =
    if (partitionCols.isEmpty) {
      val total = df.count()
      df.repartition(math.max(1, math.ceil(total.toDouble / targetRowsPerFile).toInt))
    } else {
      val w = org.apache.spark.sql.expressions.Window
        .orderBy(partitionCols.map(col): _*)
        .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
      val counts = df.groupBy(partitionCols.map(col): _*)
        .agg(count(lit(1)).as("__prows"))
        .withColumn("__nf", greatest(ceil(col("__prows") / targetRowsPerFile), lit(1L)))
        .withColumn("__base", coalesce(sum(col("__nf")).over(w), lit(0L)))
      val totalSlots = counts.agg(sum(col("__nf"))).head().getLong(0).toInt
      val salted = df.join(broadcast(counts), partitionCols)
        .withColumn("__slot",
          col("__base") + pmod(xxhash64(struct(df.columns.map(col): _*)), col("__nf")))
      salted.repartitionByRange(math.max(totalSlots, 1), col("__slot"))
        .drop("__prows", "__nf", "__base", "__slot")
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

  def notNull(df: DataFrame, cols: Seq[String]): DataFrame = {
    // one aggregate row of per-column null counts, exploded to one row per
    // rule — built entirely from Column objects (no SQL-string splicing), so
    // exotic column names (dots, spaces, embedded backticks) pass through
    def quoted(c: String): Column = df.col("`" + c.replace("`", "``") + "`")
    val counts = cols.zipWithIndex.map { case (c, i) =>
      struct(lit("not_null:" + c).as("rule"),
        sum(when(quoted(c).isNull, 1L).otherwise(0L)).as("violations")).as(s"__nn$i")
    }
    df.agg(counts.head, counts.tail: _*)
      .select(explode(array(cols.indices.map(i => col(s"__nn$i")): _*)).as("kv"))
      .select(col("kv.rule"), col("kv.violations"))
  }

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
