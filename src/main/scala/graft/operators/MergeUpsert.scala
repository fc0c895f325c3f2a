package graft.operators

import graft.sources.Sink
import org.apache.spark.sql.{DataFrame, Row, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Keyed upsert (MERGE) into a partitioned parquet table: rows whose keys
  * match existing rows REPLACE them, new keys are added — the semantics the
  * reference's dedup-insert pipeline needed for `users.level` flips but
  * could not express with append-only writes (SURVEY §7.4.4).
  *
  * Scale design: with partition columns, only the partitions TOUCHED by the
  * update batch are rewritten. "Touched" includes partitions where an
  * updated key's OLD row lives — an update that moves a key across
  * partitions (e.g. a `level` flip when partitioned by level) must delete
  * the old copy, so affected partitions are discovered with a key-pruned
  * semi join against the existing table (a scan of key+partition columns
  * only — column-pruned, cheap relative to the data), not just read off the
  * update batch. The write uses dynamic partition overwrite (scoped to this
  * write and restored after), and partitions drained to zero rows are
  * deleted explicitly — dynamic overwrite cannot rewrite a partition absent
  * from the written data. A 100 TB table with daily partitions pays for the
  * days it touches, not the table. On a lakehouse catalog this operator's
  * signature maps 1:1 onto Delta/Iceberg `MERGE INTO`.
  *
  * The merged frame is materialized (localCheckpoint) before the write:
  * overwriting a path that the plan is still reading from is the classic
  * self-overwrite failure.
  */
object MergeUpsert {
  def apply(spark: SparkSession, path: String, updates: DataFrame,
            keys: Seq[String], partitionCols: Seq[String]): Unit = {
    val existing = Sink.readOrEmpty(spark, path, updates.schema)
    val keyCols = keys.map(col)

    if (partitionCols.isEmpty) {
      val kept = existing.join(updates.select(keyCols: _*), keys, "left_anti")
      val next = kept.unionByName(updates.select(existing.columns.map(col): _*))
        .localCheckpoint(true)
      next.write.mode(SaveMode.Overwrite).parquet(path)
      return
    }

    val pCols = partitionCols.map(col)
    // partitions named by the update batch ∪ partitions holding old copies
    // of the updated keys (covers cross-partition key moves); bounded by the
    // update batch size, so safe to collect
    val affectedTuples: Array[Seq[Any]] = updates.select(pCols: _*)
      .union(existing
        .join(broadcast(updates.select(keyCols: _*).distinct()), keys, "left_semi")
        .select(pCols: _*))
      .distinct().collect().map(_.toSeq)

    val affectedDf = spark.createDataFrame(
      spark.sparkContext.parallelize(affectedTuples.map(Row.fromSeq).toSeq, 1),
      existing.select(pCols: _*).schema)

    val existingAffected = existing.join(broadcast(affectedDf), partitionCols)
    val kept = existingAffected.join(updates.select(keyCols: _*), keys, "left_anti")
    val next = kept.unionByName(updates.select(existing.columns.map(col): _*))
      .localCheckpoint(true) // materialize BEFORE touching the target

    // scope the dynamic-overwrite mode to THIS write — leaving it flipped
    // would silently change every later Overwrite on the shared session
    val prevMode = spark.conf.getOption("spark.sql.sources.partitionOverwriteMode")
    try {
      spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
      next.write.mode(SaveMode.Overwrite).partitionBy(partitionCols: _*).parquet(path)
    } finally {
      prevMode match {
        case Some(m) => spark.conf.set("spark.sql.sources.partitionOverwriteMode", m)
        case None => spark.conf.unset("spark.sql.sources.partitionOverwriteMode")
      }
    }

    // delete affected partitions that ended up with zero rows (dynamic
    // overwrite never saw them, so their stale files would survive)
    val live = next.select(pCols: _*).distinct().collect().map(_.toSeq).toSet
    val hadoopPath = new org.apache.hadoop.fs.Path(path)
    val fs = hadoopPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    affectedTuples.filterNot(live.contains).foreach { vals =>
      val dir = partitionCols.zip(vals)
        .map { case (c, v) => s"$c=${String.valueOf(v)}" }.mkString("/")
      fs.delete(new org.apache.hadoop.fs.Path(s"$path/$dir"), true)
    }
  }
}
