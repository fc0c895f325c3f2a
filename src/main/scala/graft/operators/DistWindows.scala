package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Scale-safe distribution windows (rank / ntile / percent_rank /
  * cume_dist) over a LOW-CARDINALITY partition key.
  *
  * The naive form — `Window.partitionBy(k).orderBy(v)` with a handful of
  * distinct `k` values — funnels the whole table through |k| reducers:
  * group COUNT is bounded but group SIZE is n/|k|, so at 100× scale each
  * reducer sorts tens of GB and parallelism is capped at |k| forever.
  * This operator computes the SAME exact results as two passes of bounded
  * work:
  *
  *  1. approx_percentile boundaries split each partition's value range
  *     into `buckets` roughly-equal RANGE buckets (data-adaptive — skewed
  *     value distributions still land balanced buckets). The boundary
  *     list is tiny (|k| × buckets values) and broadcast.
  *  2. per-(key, bucket) row counts → prefix-summed into global rank
  *     OFFSETS (a window over the |k| × buckets count frame — bounded
  *     rows, never the table) → broadcast back.
  *  3. row_number within each (key, bucket) — partitioning cardinality
  *     |k| × buckets, so shuffle parallelism scales with `buckets`, and
  *     each sort is ~n/(|k|·buckets) rows. Global rank = offset + local
  *     row number; ntile/percent_rank/cume_dist are then EXACT integer
  *     arithmetic on (rank, n) — bucketing never changes the answer,
  *     only the plan (approx_percentile's approximation moves bucket
  *     SIZES, not ranks).
  *
  * CONTRACT: (valueCol, tieCol) must be unique within each partition
  * (rank ≡ row_number; percent_rank/cume_dist of genuinely tied rows
  * would need tie-group counts) and non-null (nulls would need a
  * first-bucket rule; none of the lake's sort columns are nullable).
  *
  * Output columns appended: `rank` (long, 1-based), `tile` (int,
  * ntile(tiles)), `pct_rank` (double, (rank-1)/(n-1), 0 for n=1), and
  * `cume_dist` (double, rank/n) — bit-identical to the one-pass window
  * functions under the uniqueness contract (single IEEE divisions of
  * exact integers, the repo's cross-engine float discipline).
  */
object DistWindows {

  def distribution(df0: DataFrame, partCol: String, valueCol: String,
                   tieCol: String, tiles: Int, buckets: Int = 64,
                   accuracy: Int = 10000): DataFrame = {
    require(tiles >= 1, "tiles must be positive")
    require(buckets >= 1, "buckets must be positive")
    require(accuracy >= 1, "accuracy must be positive")
    // scan-parallelism guard (no-op when the scan already feeds the
    // cores): both passes below — the percentile sketch and the bucket
    // compute — are CPU-bound over every row
    val df = Spread(df0, col(tieCol))
    val qs = (1 until buckets).map(i => i.toDouble / buckets)
    val bucketed =
      if (buckets == 1) df.withColumn("_bkt", lit(0))
      else {
        val bounds = df.groupBy(col(partCol)).agg(
          expr(s"approx_percentile($valueCol, array(${qs.mkString(",")}), $accuracy)")
            .as("_bnds"))
        // bucket = #boundaries ≤ value: monotone in valueCol, so ranks
        // decompose as offset + within-bucket rank; rows tied on valueCol
        // always share a bucket (the tie column only orders inside one).
        // The count is UNROLLED into `buckets-1` codegen'd element_at
        // comparisons: the equivalent higher-order `size(filter(...))`
        // evaluates its lambda interpretively per element AND breaks
        // whole-stage codegen for the surrounding stage — measured ~2×
        // on this operator's two passes over the table. Identical value:
        // a null boundary contributes 0 either way (filter drops null
        // lambda results; `when` treats null as false). The HOF form
        // remains for pathological bucket counts where a 4·buckets-term
        // expression would strain codegen.
        val bktCount =
          if (buckets <= 256)
            (1 until buckets).map(i =>
              when(element_at(col("_bnds"), i) <= col(valueCol), 1).otherwise(0))
              .reduce(_ + _)
          else size(filter(col("_bnds"), b => b <= col(valueCol)))
        df.join(broadcast(bounds), Seq(partCol))
          .withColumn("_bkt", bktCount)
          .drop("_bnds")
      }
    // bounded frame: |partitions| × buckets rows — the ONLY window keyed
    // by the partition column alone runs here, over aggregated counts
    val wOff = Window.partitionBy(col(partCol)).orderBy(col("_bkt"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = bucketed.groupBy(col(partCol), col("_bkt"))
      .agg(count(lit(1)).as("_c"))
      .withColumn("_off", coalesce(sum(col("_c")).over(wOff), lit(0L)))
      .withColumn("_n", sum(col("_c")).over(Window.partitionBy(col(partCol))))
      .drop("_c")
    val wLocal = Window.partitionBy(col(partCol), col("_bkt"))
      .orderBy(col(valueCol), col(tieCol))
    val rn = col("_off") + row_number().over(wLocal).cast("long")
    val n = col("_n")
    // ntile semantics: the first (n mod tiles) tiles hold (n div tiles)+1
    // rows each, the rest (n div tiles); `div` (not `/`) keeps the
    // arithmetic integral — Spark's `/` on longs is double division
    bucketed.join(broadcast(offsets), Seq(partCol, "_bkt"))
      .withColumn("rank", rn)
      .withColumn("_base", expr(s"_n div $tiles"))
      .withColumn("_cut", (col("_base") + 1L) * (n % tiles))
      .withColumn("tile",
        when(col("rank") <= col("_cut"),
          expr("(rank - 1) div (_base + 1) + 1"))
          .otherwise((n % tiles) + expr("(rank - _cut - 1) div _base + 1"))
          .cast("int"))
      .withColumn("pct_rank",
        when(n === 1L, lit(0.0))
          .otherwise((col("rank") - 1).cast("double") / (n - 1).cast("double")))
      .withColumn("cume_dist", col("rank").cast("double") / n.cast("double"))
      .drop("_bkt", "_off", "_n", "_base", "_cut")
  }
}
