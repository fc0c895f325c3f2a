package graft.operators

import graft.functions.TextFunctions
import org.apache.spark.sql.{DataFrame, Encoder, Encoders, SparkSession}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Exact top-k frequent terms at unbounded cardinality: a two-pass
  * heavy-hitter pipeline (north-star text-analysis operator).
  *
  * A plain `groupBy(term).count().orderBy(...).limit(k)` shuffles one row
  * per DISTINCT term — at 100 TB of web text that is billions of keys, and
  * the full term dictionary crosses the wire to produce 20 rows. This
  * operator instead:
  *
  *  1. CANDIDATES — one pass with a mergeable Misra–Gries sketch
  *     ([[MisraGries]], width w): bounded memory (w counters per partial),
  *     shuffle volume w rows total, and the classic guarantee that every
  *     term with true count > N/w survives;
  *  2. RECOUNT — exact counts for just the ≤w candidates (broadcast
  *     semi-join, then a groupBy whose key space is ≤w);
  *  3. CERTIFICATE — the result is the true top-k iff the k-th recounted
  *     candidate exceeds N/w (no non-candidate can beat it). The fallback
  *     when uncertified (near-uniform data — not heavy-hitter territory) is
  *     the exact full aggregation, so the OUTPUT is always exact and
  *     deterministic; the sketch only decides how much work it costs.
  *
  * Reference counterpart: none (`etl.py` has no frequency analysis); this
  * is the operator a training-data pipeline runs for vocabulary pruning and
  * boilerplate detection.
  */
object HeavyHitters {

  /** Mergeable Misra–Gries summary over strings. Reduce is the textbook
    * decrement step; merge sums counters then rebases by the (w+1)-th
    * largest (Agarwal et al., "Mergeable Summaries"), preserving the
    * count(t) ≥ sketch(t) ≥ count(t) − N/w bound under arbitrary merge
    * trees — exactly what Spark's partial aggregation needs.
    */
  final class MisraGries(width: Int)
      extends Aggregator[String, Map[String, Long], Map[String, Long]] {
    require(width > 0, "width must be positive")

    def zero: Map[String, Long] = Map.empty

    // Cost note: the decrement branch is O(width), but each call destroys
    // `width` units of counter mass and total mass inflow is one per input
    // row — so across a stream of N tokens the decrement work is O(N)
    // total, i.e. amortized O(1) per token; the common resident-increment
    // path is a single persistent-map update.
    def reduce(b: Map[String, Long], t: String): Map[String, Long] =
      b.get(t) match {
        case Some(n) => b.updated(t, n + 1)
        case None if b.size < width => b.updated(t, 1L)
        case None => // decrement all, drop zeros (charges the new item too)
          b.flatMap { case (k, n) => if (n > 1) Some(k -> (n - 1)) else None }
      }

    def merge(a: Map[String, Long], b: Map[String, Long]): Map[String, Long] = {
      val summed = b.foldLeft(a) { case (acc, (k, n)) =>
        acc.updated(k, acc.getOrElse(k, 0L) + n)
      }
      if (summed.size <= width) summed
      else {
        val cut = summed.values.toSeq.sorted(Ordering[Long].reverse)(width)
        summed.flatMap { case (k, n) => if (n > cut) Some(k -> (n - cut)) else None }
      }
    }

    def finish(r: Map[String, Long]): Map[String, Long] = r
    def bufferEncoder: Encoder[Map[String, Long]] = Encoders.kryo[Map[String, Long]]
    // a real MapType (not kryo binary) so the untyped udaf column reads back
    def outputEncoder: Encoder[Map[String, Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Map[String, Long]]()
  }

  /** Exact top-k terms of `textCol` by count (ties → term ascending), via
    * the sketch-candidates + exact-recount pipeline above. Output:
    * (term, n, rk), rk 1..k.
    */
  def topTerms(spark: SparkSession, docs: DataFrame, textCol: String,
               k: Int, width: Int = 4096): DataFrame = {
    import spark.implicits._
    require(k < width, s"need k ($k) < sketch width ($width) for the certificate")
    val terms = docs.select(explode(TextFunctions.tokens(col(textCol))).as("term"))

    // N and the candidate sketch in ONE pass over the corpus (no caching of
    // the exploded terms — at 100 TB re-reading compressed parquet for the
    // recount beats materializing raw token strings)
    val mgCol = udaf(new MisraGries(width), Encoders.STRING)
    val firstPass = terms.agg(count(col("term")), mgCol(col("term"))).head()
    val total = firstPass.getLong(0)
    val sketch = firstPass.getMap[String, Long](1).toMap

    val certified = {
      val cands = sketch.keys.toSeq.toDF("term")
      val exact = terms.join(broadcast(cands), Seq("term")).groupBy("term").count()
        .orderBy(col("count").desc, col("term")).limit(k).collect()
      // the k-th candidate count must beat the sketch's blind spot N/width
      if (exact.length >= k && exact.last.getLong(1) > total / width) Some(exact)
      else None
    }

    val top = certified.getOrElse {
      // uncertified (near-uniform term distribution): fall back to the full
      // exact aggregation so the result is still exact
      terms.groupBy("term").count()
        .orderBy(col("count").desc, col("term")).limit(k).collect()
    }
    top.zipWithIndex
      .map { case (r, i) => (r.getString(0), r.getLong(1), i + 1) }.toSeq
      .toDF("term", "n", "rk")
  }
}
