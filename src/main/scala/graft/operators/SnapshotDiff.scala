package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Keyed diff of two table snapshots — the audit/CDC primitive a data lake
  * needs around incremental loads (which rows did this run add, drop, or
  * change?). One full-outer join on the key, then per-row classification:
  *
  *   - `added`    — key only in `newer`;
  *   - `removed`  — key only in `older`;
  *   - `changed`  — key in both, at least one compared column differs
  *                  (null-safe comparison).
  *
  * Unchanged rows are dropped (at 100 TB they are ~all rows; emitting them
  * would make the diff as large as the table). The join shuffles both sides
  * by key once; with snapshots bucketed on the key it is shuffle-free.
  */
object SnapshotDiff {

  def apply(older: DataFrame, newer: DataFrame, keys: Seq[String],
            compare: Seq[String]): DataFrame = {
    val o = older.select((keys ++ compare).map(col): _*)
      .withColumn("_old", lit(1))
      .withColumnsRenamed(compare.map(c => c -> s"_o_$c").toMap)
    val n = newer.select((keys ++ compare).map(col): _*)
      .withColumn("_new", lit(1))
      .withColumnsRenamed(compare.map(c => c -> s"_n_$c").toMap)

    // keys-only diff (compare = Nil) still classifies added/removed; with
    // nothing to compare, a key present in both snapshots is unchanged
    val anyDiff = compare.map(c => !(col(s"_o_$c") <=> col(s"_n_$c")))
      .foldLeft(lit(false))(_ || _)

    o.join(n, keys, "full_outer")
      .withColumn("change",
        when(col("_old").isNull, "added")
          .when(col("_new").isNull, "removed")
          .when(anyDiff, "changed"))
      .filter(col("change").isNotNull)
      .select(keys.map(col) ++ Seq(col("change")) ++
        compare.flatMap(c => Seq(col(s"_o_$c").as(s"old_$c"), col(s"_n_$c").as(s"new_$c"))): _*)
  }
}
