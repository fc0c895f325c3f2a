package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Dataset profiling: per-column summary statistics and value histograms —
  * the "what is in this table" pass every ingest pipeline runs before
  * trusting a new drop of data (the reference trusts its feeds blindly;
  * its only profiling is the `count()` prints at `etl.py:119,148,198,227`).
  *
  * Scale shape: aggregation-only — the output is bounded by #columns
  * (profile) or #bins (histogram), never by row count, so the driver-side
  * result is trivially small at any scale. [[numeric]] runs one
  * single-distinct aggregate PER column and unions the one-row results:
  * each column's scan is pruned to just that column (same total IO as one
  * wide scan under columnar storage) and each distinct pre-collapses
  * map-side before its shuffle. The alternative — one multi-distinct
  * aggregate — plans as an Expand carrying C+1 copies of every row through
  * a single shuffle, which measured 9× slower at sf0.1; per-column jobs
  * also let a scheduler run them concurrently. For distinct counts where
  * ±2% is acceptable, `approx_count_distinct` drops the shuffle to sketch
  * size — the exact version is kept because the oracle contract wants
  * bit-exact numbers.
  */
object Profile {

  private val dec = DecimalType(18, 2)

  /** One-pass profile of numeric columns: total rows, non-null count,
    * exact distinct count, min, max, and mean per column, one output row
    * per column (long format via `stack`).
    *
    * Cross-engine exactness: the mean goes through an exact DECIMAL(18,2)
    * sum, is converted to DOUBLE, and only then divided by the non-null
    * count — one deterministic IEEE division on both engines.
    */
  def numeric(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "profile needs at least one column")
    cols.map { c =>
      df.agg(
        count(lit(1)).as("n_rows"),
        count(col(c)).as("n_nonnull"),
        countDistinct(col(c)).as("n_distinct"),
        min(col(c)).cast("double").as("min_val"),
        max(col(c)).cast("double").as("max_val"),
        (sum(col(c).cast(dec)).cast("double") / count(col(c))).as("mean_val"))
        .select(lit(c).as("col_name"), col("n_rows"), col("n_nonnull"),
          col("n_distinct"), col("min_val"), col("max_val"), col("mean_val"))
    }.reduce(_ unionAll _)
  }

  /** Fixed-width histogram of a numeric column: one row per occupied bin
    * with the bin's count and actual min/max. `bin` = ⌊x / binWidth⌋ — the
    * division and floor are single IEEE double ops, identical across
    * engines; empty bins are absent (occupied-bin semantics, so the output
    * stays sparse under skew instead of materializing the full range).
    */
  def histogram(df: DataFrame, c: String, binWidth: Double): DataFrame = {
    require(binWidth > 0, "binWidth must be positive")
    df.filter(col(c).isNotNull)
      .groupBy(floor(col(c) / binWidth).cast("long").as("bin"))
      .agg(count(lit(1)).as("n"),
        min(col(c)).as("bin_min"),
        max(col(c)).as("bin_max"))
      .withColumn("bin_lo", col("bin").cast("double") * binWidth)
  }
}
