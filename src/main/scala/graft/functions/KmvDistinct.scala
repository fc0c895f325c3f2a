package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.{udaf, xxhash64}

/** Mergeable distinct-count sketch: KMV (k-minimum-values) over 64-bit
  * hashes, as a typed `Aggregator` — the custom-aggregate tier of the
  * function ladder (SURVEY §2.7). Unlike `approx_count_distinct`'s HLL this
  * sketch is fully DETERMINISTIC (same input set ⇒ same estimate, any
  * partitioning/merge order), which makes it reproducible across runs and
  * mergeable across partitions, days, or tables — the property needed to
  * PERSIST per-partition sketches and combine them later without rescanning
  * (e.g. daily distinct-user rollups over a 100 TB event log).
  *
  * Estimate: with u_k = k-th smallest hash mapped to [0,1),
  * D ≈ (k-1)/u_k; exact when fewer than k distinct hashes were seen.
  * Standard error ≈ 1/√(k−2).
  */
case class KmvBuffer(values: Array[Long]) // sign-flipped hashes, sorted asc, distinct, ≤ k

class KmvDistinct(k: Int) extends Aggregator[java.lang.Long, KmvBuffer, Double] {
  require(k >= 16, "k < 16 gives useless accuracy")
  private val TwoTo64 = 1.8446744073709552e19
  private val TwoTo63 = 9.223372036854775808e18

  override def zero: KmvBuffer = KmvBuffer(Array.empty)

  // flip the sign bit so SIGNED order of stored values == UNSIGNED hash order
  private def flip(h: Long): Long = h ^ Long.MinValue

  override def reduce(b: KmvBuffer, rawHash: java.lang.Long): KmvBuffer = {
    // null input = null column value (see apply below): skipped, matching
    // countDistinct/approx_count_distinct semantics — xxhash64(null) would
    // otherwise smuggle the seed hash in as a phantom distinct value
    if (rawHash == null) return b
    val v = flip(rawHash.longValue())
    val vs = b.values
    if (vs.length >= k && v >= vs(vs.length - 1)) b
    else {
      val idx = java.util.Arrays.binarySearch(vs, v)
      if (idx >= 0) b // already present
      else {
        val at = -idx - 1
        val merged = new Array[Long](math.min(vs.length + 1, k))
        System.arraycopy(vs, 0, merged, 0, at)
        if (at < merged.length) {
          merged(at) = v
          System.arraycopy(vs, at, merged, at + 1, merged.length - at - 1)
        }
        KmvBuffer(merged)
      }
    }
  }

  override def merge(b1: KmvBuffer, b2: KmvBuffer): KmvBuffer = {
    if (b2.values.isEmpty) b1
    else if (b1.values.isEmpty) b2
    else {
      // sorted-merge, dedup, cap at k
      val out = new Array[Long](math.min(b1.values.length + b2.values.length, k))
      var i = 0; var j = 0; var n = 0
      var last = Long.MaxValue; var first = true
      while (n < out.length && (i < b1.values.length || j < b2.values.length)) {
        val v =
          if (j >= b2.values.length || (i < b1.values.length && b1.values(i) <= b2.values(j))) {
            val x = b1.values(i); i += 1; x
          } else { val x = b2.values(j); j += 1; x }
        if (first || v != last) { out(n) = v; n += 1; last = v; first = false }
      }
      KmvBuffer(if (n == out.length) out else java.util.Arrays.copyOf(out, n))
    }
  }

  override def finish(b: KmvBuffer): Double =
    if (b.values.length < k) b.values.length.toDouble // exact below k
    else {
      val uK = (b.values(k - 1).toDouble + TwoTo63) / TwoTo64 // k-th min in [0,1)
      (k - 1).toDouble / uK
    }

  override def bufferEncoder: Encoder[KmvBuffer] = Encoders.product[KmvBuffer]
  override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
}

object KmvDistinct {
  /** Untyped entry point: `kmvDistinct(256)(col)` — hashes the column with
    * xxhash64 and sketches the hash stream; null values are excluded.
    */
  def apply(k: Int)(c: Column): Column = udaf(new KmvDistinct(k), Encoders.LONG)
    .apply(org.apache.spark.sql.functions.when(c.isNotNull, xxhash64(c)))
}
