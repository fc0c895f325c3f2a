package graft.operators

import graft.SparkSpec

class SearchSpec extends SparkSpec {
  import spark.implicits._

  test("searchPhrase requires ADJACENCY, not mere co-occurrence") {
    val df = Seq(
      (1L, "the hash join wins"),    // adjacent: match
      (2L, "hash table then join"),  // both tokens, not adjacent: no match
      (3L, "join hash"),             // reversed order: no match
      (4L, "hash join")).toDF("doc_id", "text")
    val hits = Search.searchPhrase(df, "hash join").select("doc_id").as[Long].collect().sorted
    assert(hits === Array(1L, 4L))
  }

  test("searchPhrase handles 3-token phrases and boundary positions") {
    val df = Seq(
      (1L, "a b c tail"),   // phrase at start
      (2L, "head a b c"),   // phrase at end
      (3L, "a b x c"),      // broken
      (4L, "a b")).toDF("doc_id", "text") // too short
    val hits = Search.searchPhrase(df, "a b c").select("doc_id").as[Long].collect().sorted
    assert(hits === Array(1L, 2L))
  }

  test("bm25 ranks multi-term matches above single-term, omits non-matches, numbers ranks densely") {
    val df = Seq(
      (1L, "x y z w"),             // no query term: absent
      (2L, "a q q q"),             // one term, once
      (3L, "a b q q"),             // both terms
      (4L, "a a a q")).toDF("doc_id", "text") // one term, high tf
    val out = Search.bm25(df, Seq("a", "b"), k = 10).collect()
      .map(r => (r.getAs[Int]("rk"), r.getAs[Long]("doc_id"), r.getAs[Double]("score")))
    assert(out.map(_._2).toSet === Set(2L, 3L, 4L))
    assert(out.map(_._1).toSeq === Seq(1, 2, 3))
    // doc 3 carries the rare term b (df=1) plus a — must out-rank both
    // single-term docs; tf saturation keeps doc 4's tripled 'a' below it
    assert(out.head._2 === 3L)
    // scores strictly ordered (ties would be doc_id-broken, none here)
    assert(out.map(_._3).toSeq === out.map(_._3).sorted.reverse.toSeq)
  }

  test("bm25 k cuts the list after ranking") {
    val df = Seq((1L, "a"), (2L, "a a"), (3L, "a a a")).toDF("doc_id", "text")
    val out = Search.bm25(df, Seq("a"), k = 2).collect()
    assert(out.length === 2)
  }

  test("hybridSearch fuses keyword and vector ranks; a doc strong in both wins") {
    val docs = Seq(
      (0L, "query doc placeholder"),
      (1L, "a a a a"),   // keyword-only star
      (2L, "a b"),       // good keyword AND nearest vector
      (3L, "x y z")).toDF("doc_id", "text") // vector-only candidate
    val emb = Seq(
      (0L, Array(1.0f, 0.0f)),   // the query vector
      (1L, Array(0.0f, 1.0f)),   // orthogonal: worst
      (2L, Array(0.9f, 0.1f)),   // near the query
      (3L, Array(0.8f, 0.2f))).toDF("vec_id", "embedding")
    val out = Search.hybridSearch(docs, emb, Seq("a", "b"), queryVecId = 0L, k = 4)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        ((Option(r.getAs[Integer]("kw_rank")), Option(r.getAs[Integer]("vec_rank")),
          r.getAs[Double]("rrf"), r.getAs[Int]("rk")))).toMap
    // doc 2: kw_rank 1 (only b-match) and vec_rank 1 — must fuse first
    assert(out(2L)._1 === Some(1) && out(2L)._2 === Some(1))
    assert(out(2L)._4 === 1)
    assert(out(2L)._3 === math.rint((1.0 / 61 + 1.0 / 61) * 1e6) / 1e6)
    // doc 3 never matches a keyword: its kw_rank is NULL, vector side only
    assert(out(3L)._1 === None && out(3L)._2.isDefined)
    assert(out(3L)._3 === math.rint((1.0 / (60 + out(3L)._2.get)) * 1e6) / 1e6)
    // the query doc itself is excluded from the vector list but may appear
    // via keywords only — here it has no query terms either, so kw side null
    assert(out.get(0L).forall(v => v._2.isEmpty))
  }

  test("bm25Indexed over a persisted index reproduces bm25 exactly") {
    import org.apache.spark.sql.functions.col
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id"), col("text"))
    val terms = Seq("join", "hash", "scan")
    val direct = Search.bm25(docs, terms, k = 50).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Double]("score"), r.getAs[Int]("rk")))
    val dir = java.nio.file.Files.createTempDirectory("graft_bm25idx").toString
    Search.searchIndex(docs).write.mode("overwrite").parquet(s"$dir/index")
    Search.docLengths(docs).write.mode("overwrite").parquet(s"$dir/dl")
    val viaIndex = Search.bm25Indexed(
      spark.read.parquet(s"$dir/index"), spark.read.parquet(s"$dir/dl"),
      Search.corpusStats(docs), terms, k = 50).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Double]("score"), r.getAs[Int]("rk")))
    assert(direct.nonEmpty && viaIndex.toSeq === direct.toSeq)
  }

  test("upsertIndex equals a full rebuild, down to bit-identical BM25 rankings") {
    import org.apache.spark.sql.functions.col
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id"), col("text"))
    val base = docs.filter(col("doc_id") % 3 =!= 0)
    val batch = docs.filter(col("doc_id") % 3 === 0)
    val terms = Seq("join", "hash", "scan")

    val upserted = Search.upsertIndex(Search.searchIndex(base), batch)
    val rebuilt = Search.searchIndex(docs)
    // index rows identical (df + full postings arrays) term by term
    val key = (r: org.apache.spark.sql.Row) =>
      (r.getAs[String]("term"), r.getAs[Long]("df"),
        r.getSeq[org.apache.spark.sql.Row](r.fieldIndex("postings")).toList)
    assert(upserted.collect().map(key).sortBy(_._1).toSeq ===
      rebuilt.collect().map(key).sortBy(_._1).toSeq)

    // query-time equality through the incremental stats path
    val dl = Search.docLengths(base).unionByName(Search.docLengths(batch))
    val viaUpsert = Search.bm25Indexed(upserted, dl,
      Search.statsFromLengths(dl), terms, k = 50).collect().toSeq
    val direct = Search.bm25(docs, terms, k = 50).collect().toSeq
    assert(viaUpsert === direct)
  }

  test("upsertIndex leaves terms absent from the batch untouched") {
    val base = Seq((1L, "alpha beta"), (2L, "alpha gamma")).toDF("doc_id", "text")
    val batch = Seq((3L, "beta delta")).toDF("doc_id", "text")
    val out = Search.upsertIndex(Search.searchIndex(base), batch).collect()
      .map(r => r.getAs[String]("term") ->
        ((r.getAs[Long]("df"), r.getSeq[org.apache.spark.sql.Row](2).map(_.getLong(0)).toList)))
      .toMap
    assert(out("alpha") === ((2L, List(1L, 2L))))   // untouched
    assert(out("gamma") === ((1L, List(2L))))       // untouched
    assert(out("beta") === ((2L, List(1L, 3L))))    // merged
    assert(out("delta") === ((1L, List(3L))))       // new term
  }

  test("hybridSearch candidate cut bounds both lists") {
    val docs = (1L to 20L).map(i => (i, if (i <= 10) "a" else "z")).toDF("doc_id", "text")
    val emb = (0L to 20L).map(i => (i, Array(i.toFloat, 1.0f))).toDF("vec_id", "embedding")
    val out = Search.hybridSearch(docs, emb, Seq("a"), queryVecId = 0L,
      k = 20, candidates = 5).collect()
    // vec_rank and kw_rank never exceed the candidate cut
    assert(out.flatMap(r => Option(r.getAs[Integer]("kw_rank"))).forall(_ <= 5))
    assert(out.flatMap(r => Option(r.getAs[Integer]("vec_rank"))).forall(_ <= 5))
  }
}
