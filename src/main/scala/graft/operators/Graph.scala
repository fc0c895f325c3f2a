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
  *
  * Iteration scaling: past [[EagerIterThreshold]] rounds the loops switch
  * from one lazy fused plan (cheapest at the registered small iteration
  * counts — a single job, no materialization) to the
  * [[Dedup.clusters]] pattern — edge/node/degree inputs persisted once,
  * each round's state `localCheckpoint`ed and the previous round's blocks
  * released. Lineage and plan size then stay O(1) in `iters` and the edge
  * parquet is scanned once, not once per round; at real convergence counts
  * (20+ rounds) the lazy form's plan grows linearly and recomputes every
  * prior round per action, which is exactly the failure mode this avoids.
  */
object Graph {

  /** Round count above which the iterative operators persist their inputs
    * and checkpoint per round (see object scaladoc). At or below it the
    * plan stays lazy and fused — one job, the plan the registered
    * `iters = 3` queries bench at.
    */
  private[graft] val EagerIterThreshold = 4

  /** `iters` rounds of damped PageRank over `edges` (columns `src`, `dst`;
    * node ids long). Returns (node, pr) with pr in units of 1/scale; the
    * total mass Σpr stays ≈ scale (bounded quantization leakage only).
    *
    * CONTRACT: every node must have at least one out-edge (no dangling
    * nodes — their rank would leak each round). Callers building
    * bipartite or symmetric graphs get this for free by emitting both
    * directions. Enforced loudly by default (one node-bounded count
    * piggybacked on the setup actions); `validate = false` skips the
    * check for callers who accept the documented leak.
    *
    * Scale shape: per iteration, one src-keyed equi-join (ranks ⋈ edges,
    * with the out-degree side joined in), one dst-keyed hash aggregation
    * with map-side partials, and a left join back onto the node set —
    * shuffles keyed by node id, state bounded by |nodes|, no driver-side
    * graph anywhere. The node count (one scalar) is the only action at
    * small `iters`; past [[EagerIterThreshold]] each round materializes a
    * node-sized checkpoint (see object scaladoc).
    */
  def pageRank(edges: DataFrame, iters: Int,
               damping: Double = 0.85, scale: Long = 1L << 40,
               validate: Boolean = true): DataFrame = {
    require(iters >= 1, "pageRank needs at least one iteration")
    require(scale > 0, "scale must be positive")
    val ckpt = iters > EagerIterThreshold
    def pin(df: DataFrame): DataFrame = if (ckpt) df.persist() else df
    val e = pin(edges.select(col("src"), col("dst")))
    val nodes = pin(e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct())
    val outDeg = pin(e.groupBy(col("src")).agg(count(lit(1)).as("deg")))
    try {
      val n = nodes.count()
      require(n > 0, "pageRank needs a non-empty edge set (an upstream filter drained it?)")
      if (validate) {
        // |outDeg| = #distinct srcs = #nodes with an out-edge, so the
        // dangling count is one cheap aggregate away — no extra join
        val dangling = n - outDeg.count()
        require(dangling == 0L,
          s"pageRank graph has $dangling dangling node(s) (no out-edges) — " +
            "their rank mass would silently leak each round; add reverse " +
            "edges or self-loops, or pass validate = false to accept the leak")
      }
      val base = math.floor((1 - damping) / n * scale).toLong

      var pr = nodes.withColumn("pr", lit(scale / n))
      var prevCkpt: DataFrame = null
      for (_ <- 1 to iters) {
        val contribs = e.join(pr, col("src") === col("node"))
          .join(outDeg, "src")
          .select(col("dst"), expr("pr div deg").as("c"))
        val gathered = contribs.groupBy(col("dst")).agg(sum(col("c")).as("s"))
        val next = nodes.join(gathered, col("node") === col("dst"), "left")
          .select(col("node"),
            (lit(base) + floor(lit(damping) * coalesce(col("s"), lit(0L)).cast("double"))
              .cast("long")).as("pr"))
        pr = if (ckpt) {
          val c = next.localCheckpoint()
          if (prevCkpt != null) Dedup.release(prevCkpt)
          prevCkpt = c
          c
        } else next
      }
      pr
    } finally if (ckpt) { e.unpersist(); nodes.unpersist(); outDeg.unpersist(): Unit }
  }

  /** Semi-supervised label propagation: seeded nodes keep their labels
    * (clamped); every other node takes, per round, the majority label of
    * its in-neighbors (ties → smallest label; unlabeled neighbors don't
    * vote). `iters` synchronous rounds. Entirely integer — counts and
    * labels — so the unrolled oracle re-derivation is exact with no float
    * discipline needed at all. (No dangling-node contract: a node without
    * out-edges simply doesn't vote — nothing leaks.)
    *
    * Scale shape per round: one src-keyed join (labels onto edges), one
    * (dst, label)-keyed count with map-side partials, and one aggregate
    * argmax `max(struct(cnt, -label))` — the same aggregate-not-rank-window
    * pattern as the IVF assignment; no driver-side graph state. Past
    * [[EagerIterThreshold]] rounds, inputs persist once and each round's
    * labels checkpoint (see object scaladoc).
    * Output: (node, label) — label null where no label ever arrived.
    */
  def labelPropagation(edges: DataFrame, seeds: DataFrame, iters: Int): DataFrame = {
    require(iters >= 1, "labelPropagation needs at least one iteration")
    val ckpt = iters > EagerIterThreshold
    def pin(df: DataFrame): DataFrame = if (ckpt) df.persist() else df
    val e = pin(edges.select(col("src"), col("dst")))
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct()
    val seed = seeds.select(col("node"), col("label").cast("long").as("seed_label"))
      .groupBy("node").agg(min(col("seed_label")).as("seed_label"))
    val base = pin(nodes.join(seed, Seq("node"), "left"))
    try {
      var labels = base.select(col("node"), col("seed_label").as("label"))
      var prevCkpt: DataFrame = null
      for (_ <- 1 to iters) {
        val votes = e.join(labels.filter(col("label").isNotNull),
            col("src") === col("node"))
          .groupBy(col("dst"), col("label")).agg(count(lit(1)).as("cnt"))
          // argmax by (cnt desc, label asc): max over (cnt, -label) structs
          .groupBy(col("dst"))
          .agg(max(struct(col("cnt"), (-col("label")).as("nl"))).as("m"))
          .select(col("dst"), (-col("m.nl")).as("voted"))
        val next = base.join(votes, col("node") === col("dst"), "left")
          .select(col("node"),
            coalesce(col("seed_label"), col("voted")).as("label"))
        labels = if (ckpt) {
          val c = next.localCheckpoint()
          if (prevCkpt != null) Dedup.release(prevCkpt)
          prevCkpt = c
          c
        } else next
      }
      labels
    } finally if (ckpt) { e.unpersist(); base.unpersist(): Unit }
  }

  /** Personalized PageRank: identical machinery, but the (1−damping)
    * teleport mass returns to the SOURCE set instead of spreading
    * uniformly — rank then measures proximity to the sources, the
    * recommendation/related-items primitive. `sources` is a one-column
    * (node) frame; same dangling-node contract (and `validate` guard) and
    * int64 quantization as [[pageRank]].
    *
    * Scale note: the source flag rides the node set as a broadcast-joined
    * bit; per-iteration shape is unchanged, with the same
    * [[EagerIterThreshold]] checkpoint switch.
    */
  def pageRankPersonalized(edges: DataFrame, sources: DataFrame, iters: Int,
                           damping: Double = 0.85, scale: Long = 1L << 40,
                           validate: Boolean = true): DataFrame = {
    require(iters >= 1, "pageRankPersonalized needs at least one iteration")
    require(scale > 0, "scale must be positive")
    val ckpt = iters > EagerIterThreshold
    def pin(df: DataFrame): DataFrame = if (ckpt) df.persist() else df
    val e = pin(edges.select(col("src"), col("dst")))
    val nodes = pin(e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct())
    val outDeg = pin(e.groupBy(col("src")).agg(count(lit(1)).as("deg")))
    try {
      val srcSet = sources.select(col("node")).distinct()
        .join(nodes, Seq("node"), "left_semi")
      val nS = srcSet.count()
      require(nS > 0, "pageRankPersonalized needs at least one source node present in the graph")
      if (validate) {
        val dangling = nodes.count() - outDeg.count()
        require(dangling == 0L,
          s"pageRankPersonalized graph has $dangling dangling node(s) (no " +
            "out-edges) — their rank mass would silently leak each round; " +
            "add reverse edges or self-loops, or pass validate = false to accept the leak")
      }
      val baseS = math.floor((1 - damping) / nS * scale).toLong
      val flagged = pin(nodes.join(broadcast(srcSet.withColumn("is_src", lit(true))),
        Seq("node"), "left")
        .select(col("node"), coalesce(col("is_src"), lit(false)).as("is_src")))
      try {
        var pr = flagged.withColumn("pr",
          when(col("is_src"), lit(scale / nS)).otherwise(lit(0L)))
        var prevCkpt: DataFrame = null
        for (_ <- 1 to iters) {
          val contribs = e.join(pr.select(col("node"), col("pr")), col("src") === col("node"))
            .join(outDeg, "src")
            .select(col("dst"), expr("pr div deg").as("c"))
          val gathered = contribs.groupBy(col("dst")).agg(sum(col("c")).as("s"))
          val next = flagged.join(gathered, col("node") === col("dst"), "left")
            .select(col("node"), col("is_src"),
              (when(col("is_src"), lit(baseS)).otherwise(lit(0L)) +
                floor(lit(damping) * coalesce(col("s"), lit(0L)).cast("double"))
                  .cast("long")).as("pr"))
          pr = if (ckpt) {
            val c = next.localCheckpoint()
            if (prevCkpt != null) Dedup.release(prevCkpt)
            prevCkpt = c
            c
          } else next
        }
        pr.select("node", "pr")
      } finally if (ckpt) flagged.unpersist(): Unit
    } finally if (ckpt) { e.unpersist(); nodes.unpersist(); outDeg.unpersist(): Unit }
  }

  /** Per-node triangle counts over an undirected simple graph — the
    * clustering-coefficient / community-density primitive.
    *
    * `edges` (columns `src`, `dst`) may arrive directed, duplicated, or
    * with self-loops; the first step canonicalizes to the undirected
    * simple edge set {(u, v) : u < v}. Triangles are then enumerated
    * exactly once each via the degree-ordered orientation
    * (Chiba–Nishizeki / Schank–Wagner): every edge points from its
    * lower-(degree, id) endpoint to the higher one, wedges equi-join at
    * the shared apex — always the triangle's minimum-rank vertex — and a
    * semi-join against the oriented edge set closes them.
    *
    * Scale shape: under this orientation a node's OUT-degree is O(√m)
    * regardless of skew — a degree-d hub keeps out-edges only toward
    * neighbors ranked above it — so the wedge expansion, the single
    * super-linear term, is Σ outdeg² ≤ O(m^{3/2}) rather than deg² on
    * the hub. Everything is key-partitioned equi-joins and hash
    * aggregations with map-side partials (degree count on node id, wedge
    * join on the apex, closure semi-join on the (b, c) pair); no
    * driver-side adjacency, no cartesian anywhere. All-integer, so the
    * result hash-matches any engine.
    *
    * Output: (node, n_tri) for every node incident to at least one
    * canonical edge; n_tri = 0 where the node closes no triangle.
    */
  def triangleCounts(edges: DataFrame): DataFrame = {
    // canonical undirected simple edges; least/greatest + strict < also
    // drop self-loops and null endpoints
    val canon = edges.select(
        least(col("src"), col("dst")).as("u"),
        greatest(col("src"), col("dst")).as("v"))
      .filter(col("u") < col("v"))
      .distinct()
    val deg = canon.select(col("u").as("node"))
      .union(canon.select(col("v").as("node")))
      .groupBy(col("node")).agg(count(lit(1)).as("dg"))
    // orient each edge toward the higher (degree, id) rank; carry the
    // head's degree so the wedge ordering below reuses the same rank
    val lowFirst = col("du") < col("dv") ||
      (col("du") === col("dv") && col("u") < col("v"))
    val oriented = canon
      .join(deg.select(col("node").as("u"), col("dg").as("du")), "u")
      .join(deg.select(col("node").as("v"), col("dg").as("dv")), "v")
      .select(
        when(lowFirst, col("u")).otherwise(col("v")).as("a"),
        when(lowFirst, col("v")).otherwise(col("u")).as("b"),
        when(lowFirst, col("dv")).otherwise(col("du")).as("db"))
    // wedges meet at the apex; ordering the two heads by the SAME
    // (degree, id) rank means the closing edge — if present — is oriented
    // exactly b1→b2, so one semi-join direction suffices
    val o1 = oriented.select(col("a"), col("b").as("b1"), col("db").as("r1"))
    val o2 = oriented.select(col("a"), col("b").as("b2"), col("db").as("r2"))
    val tris = o1.join(o2, Seq("a"))
      .filter(col("r1") < col("r2") || (col("r1") === col("r2") && col("b1") < col("b2")))
      .select(col("a"), col("b1"), col("b2"))
      .join(oriented.select(col("a").as("b1"), col("b").as("b2")),
        Seq("b1", "b2"), "left_semi")
    val perNode = tris
      .select(explode(array(col("a"), col("b1"), col("b2"))).as("node"))
      .groupBy(col("node")).agg(count(lit(1)).as("n_tri"))
    deg.select(col("node"))
      .join(perNode, Seq("node"), "left")
      .select(col("node"), coalesce(col("n_tri"), lit(0L)).as("n_tri"))
  }

  /** Multi-source BFS: minimal hop distance (≤ `maxHops`) from any node in
    * `sources` (column `node`) along directed `edges` (columns `src`,
    * `dst`). Returns (node, dist) for every REACHED node; unreached nodes
    * are absent (the k-hop-neighborhood contract — graph-expansion
    * sampling, contamination-radius checks, feature propagation).
    *
    * All-integer, so it hash-matches a recursive-CTE re-derivation with no
    * float discipline.
    *
    * Scale shape: classic frontier BFS — each hop is one src-keyed
    * equi-join of the FRONTIER (not the full distance table) against the
    * edge set, an anti-join against visited nodes, and a map-side-partial
    * min-aggregation; state is bounded by |nodes|, the edge set is
    * persisted once and every round's frontier/visited set is
    * `localCheckpoint`ed with the previous round's blocks released
    * (lineage stays O(1) in hops — the [[Dedup.clusters]] discipline).
    * The only driver value per hop is the frontier's emptiness.
    */
  def bfsDistances(edges: DataFrame, sources: DataFrame, maxHops: Int): DataFrame = {
    require(maxHops >= 0, s"maxHops must be non-negative, got $maxHops")
    val e = edges.select(col("src"), col("dst")).persist()
    val seed = sources.select(col("node")).distinct()
      .select(col("node"), lit(0).as("dist")).localCheckpoint()
    // the visited set is the DISJOINT union of per-hop frontiers (bfsHop
    // anti-joins `dist`, so no node appears in two hops): keep each hop's
    // checkpoint and read `dist` as their lazy union instead of
    // re-checkpointing the whole union every hop — that rewrite was an
    // extra O(V) materialization job per hop for blocks the hop
    // checkpoints already hold (3 jobs/hop → 1). The hop's emptiness
    // probe rides the checkpoint materialization as an observed metric
    // instead of a separate limit-1 job.
    var dist = seed
    var frontier = seed
    var frontierEmpty = frontier.isEmpty
    var hop = 0
    try {
      while (hop < maxHops && !frontierEmpty) {
        val obs = org.apache.spark.sql.Observation()
        val next = bfsHop(frontier, e, dist)
          .observe(obs, count(lit(1)).as("n")).localCheckpoint()
        frontierEmpty = obs.get("n").asInstanceOf[Long] == 0L
        dist = dist.unionByName(next)
        frontier = next
        hop += 1
      }
      dist
    } finally e.unpersist(): Unit
  }

  /** One BFS hop: expand `frontier` along `edges`, cut nodes already in
    * `dist` (anti join), keep each new node's minimal in-hop distance.
    * Exposed for the plan audit — this IS the loop body's plan.
    */
  private[graft] def bfsHop(frontier: DataFrame, edges: DataFrame,
                            dist: DataFrame): DataFrame =
    frontier.join(edges, frontier("node") === edges("src"))
      .select(edges("dst").as("node"), (col("dist") + 1).as("dist"))
      .join(dist.select(col("node")), Seq("node"), "left_anti")
      .groupBy(col("node")).agg(min(col("dist")).as("dist"))
}
