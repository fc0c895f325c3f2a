package graft.operators

import graft.sources.Sink
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Keyed upsert (MERGE) into a partitioned parquet table: rows whose keys
  * match existing rows REPLACE them, new keys are added — the semantics the
  * reference's dedup-insert pipeline needed for `users.level` flips but
  * could not express with append-only writes (SURVEY §7.4.4).
  *
  * Scale design: with partition columns, only the partitions TOUCHED by the
  * update batch are rewritten —
  *   1. the affected partition values come from the (small) update batch;
  *   2. the existing-side scan is restricted to those partitions (broadcast
  *      join ⇒ dynamic partition pruning on the partitioned scan);
  *   3. the write uses dynamic partition overwrite, so untouched partitions'
  *      files are never rewritten.
  * A 100 TB table with daily partitions pays for the day it touches, not the
  * table. On a lakehouse catalog this operator's signature maps 1:1 onto
  * Delta/Iceberg `MERGE INTO` — swapping the implementation changes no
  * caller.
  *
  * The merged frame is materialized (localCheckpoint) before the write:
  * overwriting a path that the plan is still reading from is the classic
  * self-overwrite failure.
  */
object MergeUpsert {
  def apply(spark: SparkSession, path: String, updates: DataFrame,
            keys: Seq[String], partitionCols: Seq[String]): Unit = {
    val existing = Sink.readOrEmpty(spark, path, updates.schema)

    val next =
      if (partitionCols.nonEmpty) {
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
        val affected = updates.select(partitionCols.map(col): _*).distinct()
        val existingAffected = existing.join(broadcast(affected), partitionCols)
        val kept = existingAffected.join(updates.select(keys.map(col): _*), keys, "left_anti")
        kept.unionByName(updates.select(existing.columns.map(col): _*))
      } else {
        val kept = existing.join(updates.select(keys.map(col): _*), keys, "left_anti")
        kept.unionByName(updates.select(existing.columns.map(col): _*))
      }

    val materialized = next.localCheckpoint(true)
    val writer = materialized.write.mode(SaveMode.Overwrite)
    (if (partitionCols.nonEmpty) writer.partitionBy(partitionCols: _*) else writer)
      .parquet(path)
  }
}
