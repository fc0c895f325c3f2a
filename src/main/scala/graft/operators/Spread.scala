package graft.operators

import org.apache.spark.sql.{Column, DataFrame}

/** Scan-parallelism guard for CPU-heavy scan-side projections — the
  * optimization-guide §2.5 "input skew" fix ("one huge unsplittable
  * file … repartition immediately after the read").
  *
  * A parquet file is splittable only at row-group boundaries, so a
  * single-row-group input plans ONE scan task no matter how many cores
  * the session has — and every expensive projection that runs before
  * the first exchange (tokenization, shingle hashing, deletion-
  * neighborhood explodes, subvector encodes) runs single-threaded.
  * This helper hash-repartitions the input across the session's cores
  * ONLY when the planned scan cannot feed them; at production scale
  * (input splits ≫ cores) it is an exact no-op, so the operators that
  * use it keep their documented 100 TB shuffle shape. The explicit
  * partition count keeps AQE from coalescing the exchange back to one
  * task (AQE sizes by bytes and cannot see compute amplification).
  *
  * Hash-partitioning by the caller's id column is deterministic under
  * retries (no round-robin / rand-derived keys — SPARK-38388), and
  * every operator that uses this is already partition-order
  * independent, so results are bit-identical with and without the
  * exchange.
  */
object Spread {
  def apply(df: DataFrame, keys: Column*): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions >= target) df
    else df.repartition(target, keys: _*)
  }
}
