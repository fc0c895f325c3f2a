package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Dimension extraction: project + dedup (reference A1+P1,
  * `etl.py:102,132,182,211` — `select(...).distinct()`).
  *
  * `distinct()` hash-aggregates on ALL projected columns; when a true key is
  * known, key-scoped `dropDuplicates(keys)` shuffles the same amount but lets
  * AQE coalesce skew, and is the semantics the reference actually wanted for
  * `users` (SURVEY §7.4.4). At scale both are a single hash-partition
  * exchange on the dedup key — map-side partial aggregation keeps the shuffle
  * small when duplicates are frequent.
  */
object DimExtract {
  def distinctRows(df: DataFrame, cols: String*): DataFrame =
    df.select(cols.map(col): _*).distinct()

  def byKey(df: DataFrame, keys: Seq[String], cols: String*): DataFrame =
    df.select(cols.map(col): _*).dropDuplicates(keys)
}

/** Latest-row-per-key upsert (the `users.level` fix, SURVEY §7.4.4).
  *
  * The reference keeps BOTH rows when a user flips free↔paid
  * (`distinct()` at `etl.py:182`); the intended semantics is one row per
  * key, latest event wins. `row_number` over (key, orderDesc) is a single
  * shuffle on the key — the same cost as the reference's `distinct`, but
  * correct. Skewed keys are handled by AQE; there is no global sort.
  */
object LatestPerKey {
  def apply(df: DataFrame, keys: Seq[String], orderDesc: Seq[Column]): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(orderDesc.map(_.desc): _*)
    df.withColumn("__rn", row_number().over(w)).filter(col("__rn") === 1).drop("__rn")
  }
}

/** Insert-only-new-rows dedup (reference J1-J4, J5b).
  *
  * The reference's left_outer + project-left with the `isNull` filter
  * commented out (`etl.py:114-117` et al.) inserts everything every run; the
  * evident intent is a LEFT ANTI join (SURVEY §7.4.1). Anti joins need only
  * the key columns of `existing` — Catalyst prunes the rest, so at 100 TB
  * the shuffle carries keys, not rows. When `existing` is small (a dimension
  * snapshot), Catalyst broadcasts it and the shuffle disappears entirely.
  */
object AntiJoinInsert {
  def newRows(staged: DataFrame, existing: DataFrame, keys: Seq[String]): DataFrame =
    staged.join(existing.select(keys.map(col): _*), keys, "left_anti")

  /** Null-safe variant (`<=>` on every key): a NULL key component matches a
    * NULL in the target, so rows with nullable keys (e.g. a fact row whose
    * dimension lookup missed) are not re-inserted on every run — with plain
    * equality NULL never equals NULL and such rows duplicate forever
    * (the reference's songplays key `(start_time, song_id, sessionId)` has
    * exactly this bug for unmatched songs, `etl.py:275-277`).
    */
  def newRowsNullSafe(staged: DataFrame, existing: DataFrame, keys: Seq[String]): DataFrame = {
    val ex = existing.select(keys.map(k => col(k).as("__ex_" + k)): _*)
    staged.join(ex, keys.map(k => col(k) <=> col("__ex_" + k)).reduce(_ && _), "left_anti")
  }
}

/** Fact enrichment join (reference J5a, `etl.py:244-247`): left-outer join of
  * a large fact/log against a small dimension, possibly on a non-key
  * attribute. The dimension side is broadcast — at 100 TB the fact NEVER
  * shuffles for a dimension lookup; each executor streams its fact
  * partitions against an in-memory hash map of the dimension.
  */
object FactEnrich {
  def apply(fact: DataFrame, dim: DataFrame, cond: Column, joinType: String = "left_outer"): DataFrame =
    fact.join(broadcast(dim), cond, joinType)

  def onKeys(fact: DataFrame, dim: DataFrame, keys: Seq[String], joinType: String = "left_outer"): DataFrame =
    fact.join(broadcast(dim), keys, joinType)
}

/** Surrogate key generation (reference A2+A3, `etl.py:271-278`).
  *
  * Two tiers, chosen by what the caller needs:
  *  - `sparse`: `monotonically_increasing_id() + offset` — embarrassingly
  *    parallel, no shuffle, ids unique but NOT dense (partition-sparse).
  *    This is the 100 TB default and what the reference meant at
  *    `etl.py:278` (its `max(songplay_id)` seed at `etl.py:271-272` is a
  *    NameError — SURVEY §7.4.2).
  *  - `dense`: `row_number` over an explicit total order — deterministic and
  *    dense, but a single-partition window; only for bounded outputs or
  *    oracle-compared results.
  */
object SurrogateKey {
  def sparse(df: DataFrame, name: String, offset: Long = 0L): DataFrame =
    df.withColumn(name, monotonically_increasing_id() + lit(offset))

  /** Dense ids `offset, offset+1, ...` in `order` (default 1-based). */
  def dense(df: DataFrame, name: String, order: Seq[Column], offset: Long = 1L): DataFrame =
    df.withColumn(name,
      row_number().over(Window.orderBy(order: _*)).cast("long") - 1L + lit(offset))

  /** First FREE id after the existing target: `max(key) + 1`, or 0 on an
    * empty/missing target (the working form of the reference's broken A2
    * seed, `etl.py:271-272`). Feed directly as `offset` to `sparse`/`dense`
    * — the first new id is exactly `nextOffset`, no collision with existing
    * keys.
    */
  def nextOffset(existing: DataFrame, keyCol: String): Long =
    existing.agg(coalesce(max(col(keyCol)) + 1L, lit(0L))).head().getLong(0)
}

/** Top-k rows per group via rank window (beyond the reference — SURVEY §2.4
  * notes it has no window functions at all; any analytics engine needs them).
  * Spark ≥3.5 rewrites `row_number <= k` into `WindowGroupLimit`, pushing the
  * limit into the shuffle's map side, so only k rows per group per mapper
  * cross the wire.
  */
object TopKPerGroup {
  def apply(df: DataFrame, partitionBy: Seq[String], order: Seq[Column], k: Int,
            rankCol: String = "rk"): DataFrame = {
    val w = Window.partitionBy(partitionBy.map(col): _*).orderBy(order: _*)
    df.withColumn(rankCol, row_number().over(w)).filter(col(rankCol) <= k)
  }
}

/** Gap-based sessionization over an event stream (batch form). A session
  * breaks when the gap to the previous event of the same key exceeds
  * `gapMicros`. Two windows over the SAME (key, order) partitioning — one
  * shuffle total, Catalyst reuses the exchange.
  */
object Sessionize {
  def apply(df: DataFrame, keyCol: String, tsCol: String, tieBreak: String,
            gapMicros: Long): DataFrame = {
    val byKey = Window.partitionBy(col(keyCol)).orderBy(col(tsCol), col(tieBreak))
    val micros = unix_micros(col(tsCol))
    val prev = lag(micros, 1).over(byKey)
    val isNew = when(prev.isNull || (micros - prev) > gapMicros, 1).otherwise(0)
    df.withColumn("__new_session", isNew)
      .withColumn("session_seq", sum(col("__new_session")).over(
        byKey.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .drop("__new_session")
  }
}
