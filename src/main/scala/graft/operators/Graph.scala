package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Graph analytics over edge tables. Connected components already live in
  * [[Dedup.clusters]] (pointer-jumping, O(log diameter) rounds); this adds
  * rank propagation.
  *
  * Cross-engine exactness: PageRank's per-node update sums MANY incoming
  * contributions, and double addition is order-sensitive — a naive double
  * implementation can't hash-match another engine (or even itself across
  * partitionings). Ranks are therefore held as int64 in units of
  * 1/`scale` (the same quantization trick the deterministic k-means in
  * [[Similarity.refineCentroids]] uses): each contribution is one integer
  * division rank div out-degree, the gather is an exact order-free int64
  * sum, and the damping step is a single double multiply+floor — every
  * step deterministic and engine-portable. Quantization error is bounded
  * by (in-degree + 1)/scale per node per iteration — at the default
  * scale = 2^40 that is noise far below any ranking decision.
  */
object Graph {

  /** `iters` rounds of damped PageRank over `edges` (columns `src`, `dst`;
    * node ids long). Returns (node, pr) with pr in units of 1/scale; the
    * total mass Σpr stays ≈ scale (bounded quantization leakage only).
    *
    * CONTRACT: every node must have at least one out-edge (no dangling
    * nodes — their rank would leak each round). Callers building
    * bipartite or symmetric graphs get this for free by emitting both
    * directions; spec-checked.
    *
    * Scale shape: per iteration, one src-keyed equi-join (ranks ⋈ edges,
    * with the out-degree side joined in), one dst-keyed hash aggregation
    * with map-side partials, and a left join back onto the node set —
    * shuffles keyed by node id, state bounded by |nodes|, no driver-side
    * graph anywhere. The node count (one scalar) is the only action.
    */
  def pageRank(edges: DataFrame, iters: Int,
               damping: Double = 0.85, scale: Long = 1L << 40): DataFrame = {
    require(iters >= 1, "pageRank needs at least one iteration")
    require(scale > 0, "scale must be positive")
    val e = edges.select(col("src"), col("dst"))
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct()
    val outDeg = e.groupBy(col("src")).agg(count(lit(1)).as("deg"))
    val n = nodes.count()
    require(n > 0, "pageRank needs a non-empty edge set (an upstream filter drained it?)")
    val base = math.floor((1 - damping) / n * scale).toLong

    var pr = nodes.withColumn("pr", lit(scale / n))
    for (_ <- 1 to iters) {
      val contribs = e.join(pr, col("src") === col("node"))
        .join(outDeg, "src")
        .select(col("dst"), expr("pr div deg").as("c"))
      val gathered = contribs.groupBy(col("dst")).agg(sum(col("c")).as("s"))
      pr = nodes.join(gathered, col("node") === col("dst"), "left")
        .select(col("node"),
          (lit(base) + floor(lit(damping) * coalesce(col("s"), lit(0L)).cast("double"))
            .cast("long")).as("pr"))
    }
    pr
  }
}
