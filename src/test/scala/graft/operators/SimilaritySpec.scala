package graft.operators

import graft.SparkSpec
import graft.sources.Tables
import org.apache.spark.sql.functions._

class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  private lazy val emb = Tables.embeddings(spark, sf)

  test("bruteForceTopK returns k ranked neighbors per query, no self-match") {
    val out = Similarity.bruteForceTopK(emb, emb.filter(col("vec_id") < 3), k = 5).collect()
    assert(out.length === 15)
    assert(out.forall(r => r.getAs[Long]("q_id") != r.getAs[Long]("n_id")))
    // ranks are 1..5 per query and cosine is non-increasing within a query
    val byQ = out.groupBy(_.getAs[Long]("q_id"))
    byQ.values.foreach { rows =>
      val sorted = rows.sortBy(_.getAs[Int]("rk"))
      assert(sorted.map(_.getAs[Int]("rk")).toSeq === (1 to 5))
      val cos = sorted.map(_.getAs[Double]("cos")).toSeq
      assert(cos.zip(cos.tail).forall { case (a, b) => a >= b })
    }
  }

  test("bruteForceTopK agrees with a driver-side exact computation") {
    val vecs = emb.select("vec_id", "embedding").as[(Long, Array[Float])].collect().toMap
    def cosine(a: Array[Float], b: Array[Float]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0
      for (i <- a.indices) {
        d += a(i).toDouble * b(i); na += a(i).toDouble * a(i); nb += b(i).toDouble * b(i)
      }
      d / (math.sqrt(na) * math.sqrt(nb))
    }
    val q0 = vecs(0L)
    val expected = vecs.toSeq.filter(_._1 != 0L)
      .map { case (id, v) => (id, cosine(q0, v)) }
      .sortBy { case (id, c) => (-c, id) }.take(5).map(_._1)
    val got = Similarity.bruteForceTopK(emb, emb.filter(col("vec_id") === 0), k = 5)
      .orderBy("rk").select("n_id").as[Long].collect().toSeq
    assert(got === expected)
  }

  test("ivfTopK achieves reasonable recall vs brute force") {
    val queries = emb.filter(col("vec_id") < 8)
    val exact = Similarity.bruteForceTopK(emb, queries, k = 5)
      .select("q_id", "n_id").as[(Long, Long)].collect().toSet
    val approx = Similarity.ivfTopK(emb, queries, k = 5, everyNthCentroid = 50, nProbe = 3)
      .select("q_id", "n_id").as[(Long, Long)].collect().toSet
    val recall = (exact & approx).size.toDouble / exact.size
    assert(recall >= 0.3, s"IVF recall $recall too low even for random embeddings")
    assert(approx.size === exact.size)
  }

  test("ivfTopKFiltered: only eligible neighbors, full k delivered, exact when probing everything") {
    val queries = emb.filter(col("vec_id") < 8)
    val eligible = emb.filter(col("label") === 1).select("vec_id")
    val eligibleSet = eligible.as[Long].collect().toSet
    assert(eligibleSet.nonEmpty && eligibleSet.size < emb.count(),
      "fixture sanity: the label predicate must be selective")
    val got = Similarity.ivfTopKFiltered(emb, queries, k = 5,
      everyNthCentroid = 50, nProbe = 3, eligible = eligible).collect()
    // every neighbor satisfies the predicate, every query gets its k
    assert(got.forall(r => eligibleSet.contains(r.getAs[Long]("n_id"))))
    assert(got.groupBy(_.getAs[Long]("q_id")).forall(_._2.length == 5),
      "the in-probe filter must still deliver k eligible neighbors")
    // probing EVERY cell makes filtered IVF exact: equal to brute force
    // over the eligible corpus (the independent oracle)
    val nCells = emb.filter(col("vec_id") % 50 === 0).count().toInt
    val full = Similarity.ivfTopKFiltered(emb, queries, k = 5,
      everyNthCentroid = 50, nProbe = nCells, eligible = eligible)
      .select("q_id", "n_id", "rk").as[(Long, Long, Int)].collect().toSet
    val brute = Similarity.bruteForceTopK(
      emb.join(eligible, Seq("vec_id"), "left_semi"), queries, k = 5)
      .select("q_id", "n_id", "rk").as[(Long, Long, Int)].collect().toSet
    assert(full === brute,
      "all-probes filtered IVF must equal brute force over the eligible set")
    // post-filtering the UNFILTERED top-k under-delivers — the bug the
    // in-probe filter exists to avoid
    val postFiltered = Similarity.ivfTopK(emb, queries, k = 5,
      everyNthCentroid = 50, nProbe = 3)
      .filter(col("n_id").isInCollection(eligibleSet))
    assert(postFiltered.count() < got.length,
      "fixture sanity: post-filtering must actually lose neighbors here")
  }

  test("AnnIndex.query with an eligible set filters inside the probed cells") {
    val root = java.nio.file.Files.createTempDirectory("ann_filtered").toString
    AnnIndex.build(spark, emb, everyNthCentroid = 50, root)
    val queries = emb.filter(col("vec_id") < 4)
    val eligible = emb.filter(col("label") === 1).select("vec_id")
    val eligibleSet = eligible.as[Long].collect().toSet
    val got = AnnIndex.query(spark, root, queries, k = 3, nProbe = 3,
      eligible = Some(eligible)).collect()
    assert(got.nonEmpty)
    assert(got.forall(r => eligibleSet.contains(r.getAs[Long]("n_id"))))
    assert(got.groupBy(_.getAs[Long]("q_id")).forall(_._2.length == 3))
    // an all-ids eligible set is the unfiltered query, bit for bit
    val all = AnnIndex.query(spark, root, queries, k = 3, nProbe = 3,
      eligible = Some(emb.select("vec_id")))
    val plain = AnnIndex.query(spark, root, queries, k = 3, nProbe = 3)
    assert(all.collect().map(_.toString).sorted.toSeq ===
      plain.collect().map(_.toString).sorted.toSeq)
  }

  test("knnJoin equals ivfTopK on the same arguments (only the plan differs)") {
    val queries = emb.filter(col("vec_id") < 8)
    val viaIvf = Similarity.ivfTopK(emb, queries, k = 5, everyNthCentroid = 50, nProbe = 3)
      .orderBy("q_id", "rk").collect()
    val viaKnn = Similarity.knnJoin(emb, queries, k = 5, everyNthCentroid = 50, nProbe = 3)
      .orderBy("q_id", "rk").collect()
    assert(viaKnn.toSeq === viaIvf.toSeq)
  }

  test("knnJoin self-graph: every vector gets ranked neighbors, no self-match") {
    val g = Similarity.knnJoin(emb, emb, k = 3, everyNthCentroid = 50, nProbe = 2).cache()
    try {
      val n = emb.count()
      // every vector appears as a query (its probed cells always hold at
      // least one other vector on this fixture)
      assert(g.select("q_id").distinct().count() === n)
      assert(g.filter(col("q_id") === col("n_id")).count() === 0L)
      // ranks are contiguous from 1 and ordered by descending cosine
      val bad = g.groupBy("q_id")
        .agg(count(lit(1)).as("m"), max(col("rk")).as("maxrk"),
          min(col("rk")).as("minrk"))
        .filter(col("m") =!= col("maxrk") || col("minrk") =!= 1)
      assert(bad.count() === 0L)
      assert(g.count() <= n * 3)
    } finally g.unpersist()
  }

  test("pqTopK: PQ candidates + exact re-rank reach usable recall, exact cos values") {
    val queries = emb.filter(col("vec_id") < 8)
    val exact = Similarity.bruteForceTopK(emb, queries, k = 5)
      .select("q_id", "n_id").as[(Long, Long)].collect().toSet
    val pq = Similarity.pqTopK(emb, queries, k = 5).cache()
    try {
      val approx = pq.select("q_id", "n_id").as[(Long, Long)].collect().toSet
      val recall = (exact & approx).size.toDouble / exact.size
      assert(recall >= 0.3, s"PQ recall $recall too low even for random embeddings")
      assert(approx.size === exact.size)
      // survivors carry their TRUE cosine (the re-rank is exact): any
      // result pair also in the brute-force top-k must match its score
      val bf = Similarity.bruteForceTopK(emb, queries, k = 5)
        .select(col("q_id"), col("n_id"), round(col("cos"), 6).as("cos"))
        .as[(Long, Long, Double)].collect().map(r => (r._1, r._2) -> r._3).toMap
      val mismatched = pq.select("q_id", "n_id", "cos").as[(Long, Long, Double)]
        .collect().count { case (q, n, c) => bf.get((q, n)).exists(_ != c) }
      assert(mismatched === 0, "re-ranked cosine differs from the exact score")
    } finally pq.unpersist(): Unit
  }

  test("pqTopK is deterministic across input partitionings") {
    val queries = emb.filter(col("vec_id") < 8)
    val a = Similarity.pqTopK(emb, queries, k = 5)
      .orderBy("q_id", "rk").collect().toSeq
    val b = Similarity.pqTopK(emb.repartition(13), queries, k = 5)
      .orderBy("q_id", "rk").collect().toSeq
    assert(a === b)
  }

  test("k-means-refined IVF recall is at least the seed-centroid recall") {
    val queries = emb.filter(col("vec_id") < 8)
    val exact = Similarity.bruteForceTopK(emb, queries, k = 5)
      .select("q_id", "n_id").as[(Long, Long)].collect().toSet
    def recallOf(iters: Int): Double = {
      val approx = Similarity.ivfTopK(emb, queries, k = 5,
        everyNthCentroid = 50, nProbe = 3, refineIters = iters)
        .select("q_id", "n_id").as[(Long, Long)].collect().toSet
      (exact & approx).size.toDouble / exact.size
    }
    val seed = recallOf(0)
    val refined = recallOf(2)
    assert(refined >= seed, s"Lloyd refinement lowered recall: $refined < $seed")
  }

  test("refineCentroids is bit-deterministic across input partitionings") {
    val seeds = Similarity.centroids(emb, 50)
    def run(parts: Int): Map[Long, Seq[Float]] =
      Similarity.refineCentroids(emb.repartition(parts), seeds, iters = 2)
        .as[(Long, Seq[Float])].collect().toMap
    assert(run(3) === run(17))
  }

  test("int8 quantization stays in range and barely moves the top-k ranking") {
    val q8 = Similarity.quantize8(emb)
    val vals = q8.select("embedding").as[Array[Float]].collect()
    assert(vals.forall(_.forall(v => v == math.rint(v) && math.abs(v) <= 127f)))
    assert(vals.forall(_.exists(v => math.abs(v) == 127f))) // scale actually used

    val exact = Similarity.bruteForceTopK(emb, emb.filter(col("vec_id") < 8), k = 5)
      .select("q_id", "n_id").as[(Long, Long)].collect().toSet
    val quant = Similarity.bruteForceTopK(q8, q8.filter(col("vec_id") < 8), k = 5)
      .select("q_id", "n_id").as[(Long, Long)].collect().toSet
    val recall = (exact & quant).size.toDouble / exact.size
    assert(recall >= 0.8, s"int8 recall $recall vs exact ranks")
  }

  test("cosineDupPairs blocked by cells is a subset of unblocked pairs") {
    // the exact all-pairs form (everyNthCentroid=0) is spec-only ground
    // truth: its plan is O(n²), so SparkEntry registers only blocked configs
    val all = Similarity.cosineDupPairs(emb, threshold = 0.4)
      .select("vec_a", "vec_b").as[(Long, Long)].collect().toSet
    assert(all.nonEmpty)
    val recalls = Seq(25, 50).map { nth =>
      val blocked = Similarity.cosineDupPairs(emb, threshold = 0.4, everyNthCentroid = nth)
        .select("vec_a", "vec_b").as[(Long, Long)].collect().toSet
      assert(blocked.subsetOf(all), s"blocking nth=$nth invented a pair")
      nth -> blocked.size.toDouble / all.size
    }.toMap
    info(s"blocked-pair recall vs exact: $recalls")
    // coarser blocking (fewer, larger cells) must not recall less than finer
    assert(recalls(50) >= recalls(25), s"recall not monotone in cell size: $recalls")
    assert(recalls(25) > 0.0, s"fine blocking found nothing: $recalls")
  }

  test("hyperplane LSH in its registered SemDeDup regime finds planted copies") {
    // the registered q_embed_dup_pairs_lsh configuration: high threshold,
    // long buckets, few tables — hunting near-identical (augmented) copies,
    // planted here exactly as in SparkEntry (zeroed first component)
    val base = emb.select("vec_id", "embedding")
    val planted = base.filter(col("vec_id") % 4 === 0)
      .select((-col("vec_id") - 1000000L).as("vec_id"),
        concat(array(lit(0f)), slice(col("embedding"), 2, 63)).as("embedding"))
    val got = Similarity.hyperplaneDupPairs(base.unionByName(planted),
        threshold = 0.95, bits = 12, tables = 4)
      .as[(Long, Long, Double)].collect()
    assert(got.nonEmpty, "registered regime found nothing on planted copies")
    // the base corpus has no cos>=0.95 pairs, so every emitted pair must be
    // a (negative-mirror copy, original) pair above threshold
    got.foreach { case (a, b, c) =>
      assert(b === -(a + 1000000L), s"unexpected pair ($a,$b)")
      assert(c >= 0.95)
    }
    // recall over the TRUE planted pairs clearing the threshold
    val vecs = emb.select("vec_id", "embedding").as[(Long, Array[Float])].collect()
    def cos0(v: Array[Float]): Double = { // cosine against the zeroed-head copy
      var d = 0.0; var na = 0.0
      for (i <- v.indices) { na += v(i).toDouble * v(i); if (i > 0) d += v(i).toDouble * v(i) }
      d / (math.sqrt(na) * math.sqrt(d))
    }
    val truth = vecs.count { case (id, v) => id % 4 == 0 && cos0(v) >= 0.95 }
    val recall = got.length.toDouble / truth
    info(s"sign-LSH recall at threshold 0.95 (12 bits x 4 tables): $recall")
    assert(recall >= 0.6, s"recall $recall below the configured regime's expectation")
  }

  test("hyperplane LSH pairs are an exact-cosine subset with usable recall") {
    val exact = Similarity.cosineDupPairs(emb, threshold = 0.42)
      .as[(Long, Long, Double)].collect()
      .map { case (a, b, c) => (a, b) -> c }.toMap
    assert(exact.nonEmpty)
    val lsh = Similarity.hyperplaneDupPairs(emb, threshold = 0.42,
      bits = 5, tables = 16).as[(Long, Long, Double)].collect()
    assert(lsh.nonEmpty, "sign-LSH found nothing on the fixture")
    // verified subset: every emitted pair exists in the exact set with the
    // identical rounded cosine (the verify step removes false positives)
    lsh.foreach { case (a, b, c) =>
      assert(exact.get((a, b)).contains(c), s"($a,$b,$c) not in exact pairs")
    }
    val recall = lsh.length.toDouble / exact.size
    info(s"sign-LSH recall at threshold 0.42 (5 bits x 16 tables): $recall")
    assert(recall >= 0.5, s"recall $recall below the configured expectation")
  }

  test("ivfPqTopK with every cell probed is exactly pqTopK") {
    // nProbe >= nCells makes the probe cut total, so the composition must
    // collapse to the plain PQ search bit-for-bit
    val queries = emb.filter(col("vec_id") < 8)
    val nCells = emb.filter(col("vec_id") % 50 === 0).count().toInt
    val all = Similarity.ivfPqTopK(emb, queries, k = 5,
        everyNthCentroid = 50, nProbe = nCells)
      .orderBy("q_id", "rk").collect().toSeq
    val pq = Similarity.pqTopK(emb, queries, k = 5)
      .orderBy("q_id", "rk").collect().toSeq
    assert(all === pq)
  }

  test("ivfPqTopK honors the probe cut: every result lies in a probed cell") {
    val queries = emb.filter(col("vec_id") < 8)
    val out = Similarity.ivfPqTopK(emb, queries, k = 5,
      everyNthCentroid = 50, nProbe = 3)
    // re-derive the coarse quantizer independently
    val cents = Similarity.centroids(emb.select("vec_id", "embedding"), 50)
    val cellOf = Similarity.assignCells(emb.select("vec_id", "embedding"), cents)
      .select("vec_id", "cell").as[(Long, Long)].collect().toMap
    val centVecs = cents.select("cell", "cv").as[(Long, Array[Float])].collect()
    def cosine(a: Array[Float], b: Array[Float]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0
      for (i <- a.indices) {
        d += a(i).toDouble * b(i); na += a(i).toDouble * a(i); nb += b(i).toDouble * b(i)
      }
      d / (math.sqrt(na) * math.sqrt(nb))
    }
    val qVecs = queries.select("vec_id", "embedding").as[(Long, Array[Float])].collect()
    val probed: Map[Long, Set[Long]] = qVecs.map { case (qid, qv) =>
      qid -> centVecs.map { case (cell, cv) => (cell, cosine(qv, cv)) }
        .sortBy { case (cell, c) => (-c, cell) }.take(3).map(_._1).toSet
    }.toMap
    val rows = out.select("q_id", "n_id").as[(Long, Long)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (q, n) =>
      assert(probed(q).contains(cellOf(n)),
        s"result $n for query $q is outside its probed cells")
    }
    // recall floor: BOTH approximations compound here (the probe cut's miss
    // rate × the ADC candidate cut's), and these synthetic embeddings are
    // random — the no-cluster-structure worst case for an IVF — so the
    // floor sits below the single-tier specs' 0.3 (measured ~0.22)
    val exact = Similarity.bruteForceTopK(emb, queries, k = 5)
      .select("q_id", "n_id").as[(Long, Long)].collect().toSet
    val got = rows.toSet
    val recall = (exact & got).size.toDouble / exact.size
    assert(recall >= 0.15, s"IVF-PQ recall $recall too low even for random embeddings")
    info(s"IVF-PQ compound recall at nProbe=3, candidates=20: $recall")
  }

  test("ivfPqTopK is deterministic across input partitionings") {
    val queries = emb.filter(col("vec_id") < 8)
    val a = Similarity.ivfPqTopK(emb, queries, k = 5)
      .orderBy("q_id", "rk").collect().toSeq
    val b = Similarity.ivfPqTopK(emb.repartition(13), queries, k = 5)
      .orderBy("q_id", "rk").collect().toSeq
    assert(a === b)
  }
}
