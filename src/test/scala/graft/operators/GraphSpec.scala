package graft.operators

import graft.SparkSpec

class GraphSpec extends SparkSpec {
  import spark.implicits._

  test("pageRank matches hand-computed integer ranks on an asymmetric graph") {
    // a→b, a→c, b→a, c→a; n=3, scale=3000, damping 0.85
    // init: 1000 each (3000/3)
    // iter1: contribs a→{b,c}: 1000 div 2 = 500; b→a: 1000; c→a: 1000
    //        base = floor(0.15/3*3000) = 150
    //        a = 150 + floor(.85*2000) = 1850; b = c = 150 + floor(.85*500) = 575
    // iter2: a→{b,c}: 1850 div 2 = 925; b→a: 575; c→a: 575
    //        a = 150 + floor(.85*1150) = 1127; b = c = 150 + floor(.85*925) = 936
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 1L), (3L, 1L)).toDF("src", "dst")
    val out = Graph.pageRank(edges, iters = 2, damping = 0.85, scale = 3000L)
      .collect().map(r => r.getAs[Long]("node") -> r.getAs[Long]("pr")).toMap
    assert(out === Map(1L -> 1127L, 2L -> 936L, 3L -> 936L))
  }

  test("pageRank on a symmetric cycle is the uniform fixpoint") {
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L)).toDF("src", "dst")
    val out = Graph.pageRank(edges, iters = 4, scale = 3000L)
      .collect().map(_.getAs[Long]("pr"))
    // every node keeps exactly 1/n of the mass at every iteration
    assert(out.toSeq === Seq(1000L, 1000L, 1000L))
  }

  test("pageRank conserves total mass up to quantization leakage") {
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L), (1L, 3L), (3L, 1L))
      .toDF("src", "dst")
    val scale = 1L << 30
    val total = Graph.pageRank(edges, iters = 5, scale = scale)
      .agg(org.apache.spark.sql.functions.sum("pr")).as[Long].head()
    // each node loses < (inDeg+1)/scale per round to the two floors;
    // 4 nodes × 5 rounds × a few units — mass stays within 100 of scale
    assert(math.abs(total - scale) <= 100L)
  }

  test("pageRankPersonalized matches hand-computed ranks and localizes mass at the source") {
    // a→b, a→c, b→a, c→a; sources = {a}; scale 3000, damping 0.85
    // init: a=3000, b=c=0; baseS = floor(0.15*3000) = 450
    // iter1: a→{b,c}: 1500 each; nothing flows to a
    //        a = 450; b = c = floor(.85*1500) = 1275
    // iter2: a→{b,c}: 450 div 2 = 225; b,c→a: 1275 each (s_a = 2550)
    //        a = 450 + floor(.85*2550) = 2617; b = c = floor(.85*225) = 191
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 1L), (3L, 1L)).toDF("src", "dst")
    val out = Graph.pageRankPersonalized(edges, Seq(1L).toDF("node"),
      iters = 2, damping = 0.85, scale = 3000L)
      .collect().map(r => r.getAs[Long]("node") -> r.getAs[Long]("pr")).toMap
    assert(out === Map(1L -> 2617L, 2L -> 191L, 3L -> 191L))
  }

  test("labelPropagation: labels flow, seeds clamp, ties take the smaller label, islands stay null") {
    val edges = Seq(
      (1L, 2L), (4L, 2L), (2L, 1L), (2L, 4L), // 2 hears labels 7 and 3 → tie → 3
      (2L, 3L), (3L, 2L),                     // 3 is one hop further
      (5L, 6L), (6L, 5L))                     // unlabeled island
      .toDF("src", "dst")
    val seeds = Seq((1L, 7L), (4L, 3L)).toDF("node", "label")
    val out = Graph.labelPropagation(edges, seeds, iters = 3)
      .collect().map(r => r.getAs[Long]("node") ->
        Option(r.getAs[java.lang.Long]("label")).map(_.toLong)).toMap
    assert(out(1L) === Some(7L)) // seed clamps even though 2's label arrives
    assert(out(4L) === Some(3L))
    assert(out(2L) === Some(3L)) // tie between 7 and 3 → smaller label
    assert(out(3L) === Some(3L)) // propagated one hop further
    assert(out(5L) === None && out(6L) === None)
  }

  test("pageRankPersonalized rejects sources absent from the graph") {
    val edges = Seq((1L, 2L), (2L, 1L)).toDF("src", "dst")
    val e = intercept[IllegalArgumentException] {
      Graph.pageRankPersonalized(edges, Seq(99L).toDF("node"), iters = 1)
    }
    assert(e.getMessage.contains("source node present"))
  }

  test("pageRank rejects an empty edge set loudly") {
    val e = intercept[IllegalArgumentException] {
      Graph.pageRank(Seq.empty[(Long, Long)].toDF("src", "dst"), iters = 1)
    }
    assert(e.getMessage.contains("non-empty edge set"))
  }

  test("pageRank ranks a hub above spokes") {
    // star with back-edges: hub 0 ↔ each of 1..5
    val edges = ((1L to 5L).flatMap(i => Seq((0L, i), (i, 0L)))).toDF("src", "dst")
    val out = Graph.pageRank(edges, iters = 6)
      .collect().map(r => r.getAs[Long]("node") -> r.getAs[Long]("pr")).toMap
    assert((1L to 5L).forall(i => out(0L) > out(i)))
  }

  /** Driver-side exact replica of the quantized update rule — the oracle
    * for the checkpointed long-iteration path.
    */
  private def refPageRank(edges: Seq[(Long, Long)], iters: Int,
                          damping: Double, scale: Long): Map[Long, Long] = {
    val nodes = (edges.map(_._1) ++ edges.map(_._2)).distinct.sorted
    val outDeg = edges.groupBy(_._1).map { case (s, es) => s -> es.size.toLong }
    val base = math.floor((1 - damping) / nodes.size * scale).toLong
    var pr = nodes.map(_ -> scale / nodes.size).toMap
    for (_ <- 1 to iters) {
      val gathered = edges.groupBy(_._2).map { case (d, es) =>
        d -> es.map { case (s, _) => pr(s) / outDeg(s) }.sum
      }
      pr = nodes.map(v => v ->
        (base + math.floor(damping * gathered.getOrElse(v, 0L).toDouble).toLong)).toMap
    }
    pr
  }

  test("pageRank past the checkpoint threshold matches the exact driver-side recurrence") {
    // iters = 12 > EagerIterThreshold: exercises persist + per-round
    // localCheckpoint; result must be bit-identical to the lazy rule
    val edgeSeq = Seq((1L, 2L), (2L, 3L), (3L, 1L), (1L, 3L), (3L, 4L),
      (4L, 1L), (4L, 2L), (2L, 4L))
    val out = Graph.pageRank(edgeSeq.toDF("src", "dst"), iters = 12,
        damping = 0.85, scale = 1L << 20)
      .collect().map(r => r.getAs[Long]("node") -> r.getAs[Long]("pr")).toMap
    assert(out === refPageRank(edgeSeq, 12, 0.85, 1L << 20))
  }

  test("checkpointed iterations keep the plan size bounded in iters") {
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L)).toDF("src", "dst")
    // past the threshold each round reads the previous round's checkpoint
    // RDD, so the final plan has constant depth — more rounds must not
    // grow it (the lazy form grows linearly and would fail this hard)
    val p6 = Graph.pageRank(edges, iters = 6).queryExecution.optimizedPlan.toString
    val p12 = Graph.pageRank(edges, iters = 12).queryExecution.optimizedPlan.toString
    assert(p12.length <= p6.length + 64,
      s"plan grew with iters: ${p6.length} -> ${p12.length}")
  }

  test("pageRank rejects dangling nodes loudly, and validate=false accepts the leak") {
    val edges = Seq((1L, 2L)).toDF("src", "dst") // node 2 has no out-edge
    val e = intercept[IllegalArgumentException] { Graph.pageRank(edges, iters = 2) }
    assert(e.getMessage.contains("dangling"))
    // opt-out path still runs (documented mass leak)
    assert(Graph.pageRank(edges, iters = 2, validate = false).count() === 2)
    val e2 = intercept[IllegalArgumentException] {
      Graph.pageRankPersonalized(edges, Seq(1L).toDF("node"), iters = 2)
    }
    assert(e2.getMessage.contains("dangling"))
  }

  test("labelPropagation past the checkpoint threshold keeps the converged answer") {
    val edges = Seq(
      (1L, 2L), (4L, 2L), (2L, 1L), (2L, 4L),
      (2L, 3L), (3L, 2L),
      (5L, 6L), (6L, 5L))
      .toDF("src", "dst")
    val seeds = Seq((1L, 7L), (4L, 3L)).toDF("node", "label")
    // converged by round 3; rounds 4..12 are fixpoint no-ops, so the
    // checkpointed long run must reproduce the eager short run exactly
    val short = Graph.labelPropagation(edges, seeds, iters = 3)
      .collect().map(r => r.getAs[Long]("node") ->
        Option(r.getAs[java.lang.Long]("label")).map(_.toLong)).toMap
    val long = Graph.labelPropagation(edges, seeds, iters = 12)
      .collect().map(r => r.getAs[Long]("node") ->
        Option(r.getAs[java.lang.Long]("label")).map(_.toLong)).toMap
    assert(long === short)
  }

  test("pageRankPersonalized past the checkpoint threshold conserves mass at the sources") {
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L), (1L, 3L), (3L, 1L))
      .toDF("src", "dst")
    val scale = 1L << 30
    val out = Graph.pageRankPersonalized(edges, Seq(1L, 3L).toDF("node"),
      iters = 12, scale = scale)
    val total = out.agg(org.apache.spark.sql.functions.sum("pr")).as[Long].head()
    assert(math.abs(total - scale) <= 200L)
  }

  private def triMap(df: org.apache.spark.sql.DataFrame): Map[Long, Long] =
    df.collect().map(r => r.getAs[Long]("node") -> r.getAs[Long]("n_tri")).toMap

  test("triangleCounts on K4: four triangles, every node in three") {
    val edges = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L))
      .toDF("src", "dst")
    assert(triMap(Graph.triangleCounts(edges)) ===
      Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L))
  }

  test("triangleCounts on a 4-cycle finds none but reports every node") {
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L)).toDF("src", "dst")
    assert(triMap(Graph.triangleCounts(edges)) ===
      Map(1L -> 0L, 2L -> 0L, 3L -> 0L, 4L -> 0L))
  }

  test("triangleCounts canonicalizes direction, duplicates, and self-loops") {
    val clean = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L)).toDF("src", "dst")
    val messy = Seq(
      (2L, 1L), (1L, 2L), (1L, 2L),   // reversed + duplicated
      (2L, 3L), (3L, 2L),
      (1L, 3L),
      (4L, 3L), (3L, 4L),
      (2L, 2L), (4L, 4L))             // self-loops dropped
      .toDF("src", "dst")
    assert(triMap(Graph.triangleCounts(messy)) ===
      triMap(Graph.triangleCounts(clean)))
    assert(triMap(Graph.triangleCounts(clean)) ===
      Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 0L))
  }

  test("triangleCounts matches brute-force triple enumeration") {
    // deterministic pseudo-random graph on 15 nodes
    val edges = (for {
      i <- 1L to 15L; j <- (i + 1) to 15L if (i * 7 + j * 13) % 5 < 2
    } yield (i, j)).toDF("src", "dst")
    val canon = edges.toDF("u", "v")
    val brute = canon.select($"u".as("x"), $"v".as("y"))
      .join(canon.select($"u".as("y"), $"v".as("z")), "y")
      .join(canon.select($"u".as("x"), $"v".as("z")), Seq("x", "z"))
      .select(org.apache.spark.sql.functions.explode(
        org.apache.spark.sql.functions.array($"x", $"y", $"z")).as("node"))
      .groupBy($"node").count()
      .collect().map(r => r.getAs[Long]("node") -> r.getAs[Long]("count")).toMap
    val got = triMap(Graph.triangleCounts(edges))
    assert(got.filter(_._2 > 0) === brute)
    // and the node universe is everything incident to an edge
    assert(got.keySet === (1L to 15L).filter(i =>
      (1L to 15L).exists(j => j != i &&
        ((math.min(i, j) * 7 + math.max(i, j) * 13) % 5 < 2))).toSet)
  }

  test("triangleCounts on a star plus one chord: exactly the chord triangle") {
    val star = (2L to 11L).map(leaf => (1L, leaf))
    val edges = (star :+ (2L, 3L)).toDF("src", "dst")
    val out = triMap(Graph.triangleCounts(edges))
    assert(out(1L) === 1L && out(2L) === 1L && out(3L) === 1L)
    assert((4L to 11L).forall(out(_) === 0L))
  }

  test("bfsDistances: hand-computed chain with a shortcut takes the minimum") {
    // 1→2→3→4→5, plus shortcut 1→4. From {1}: d(1)=0 d(2)=1 d(3)=2 d(4)=1 d(5)=2
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (1L, 4L)).toDF("src", "dst")
    val out = Graph.bfsDistances(edges, Seq(1L).toDF("node"), maxHops = 10)
      .as[(Long, Int)].collect().toMap
    assert(out === Map(1L -> 0, 2L -> 1, 3L -> 2, 4L -> 1, 5L -> 2))
  }

  test("bfsDistances: maxHops bounds the frontier; unreached nodes are absent") {
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L)).toDF("src", "dst")
    val out = Graph.bfsDistances(edges, Seq(1L).toDF("node"), maxHops = 2)
      .as[(Long, Int)].collect().toMap
    // node 4 is 3 hops away, the 10→11 component disconnected: both absent
    assert(out === Map(1L -> 0, 2L -> 1, 3L -> 2))
  }

  test("bfsDistances: multi-source takes the nearest source; duplicate sources collapse") {
    val edges = Seq((1L, 2L), (2L, 3L), (5L, 3L)).toDF("src", "dst")
    val out = Graph.bfsDistances(edges, Seq(1L, 5L, 5L).toDF("node"), maxHops = 5)
      .as[(Long, Int)].collect().toMap
    assert(out === Map(1L -> 0, 5L -> 0, 2L -> 1, 3L -> 1))
  }

  test("bfsDistances: zero hops returns exactly the source set") {
    val edges = Seq((1L, 2L)).toDF("src", "dst")
    val out = Graph.bfsDistances(edges, Seq(1L).toDF("node"), maxHops = 0)
      .as[(Long, Int)].collect().toMap
    assert(out === Map(1L -> 0))
  }
}
