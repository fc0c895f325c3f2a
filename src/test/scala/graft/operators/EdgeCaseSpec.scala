package graft.operators

import graft.SparkSpec
import graft.functions.TextFunctions
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Degenerate-input behavior: none of the operators may throw on empty
  * relations, null text, or sub-shingle documents — at 100 TB every
  * pathological row shape WILL occur, and a job that dies on row 3 billion
  * is the expensive way to find out.
  */
class EdgeCaseSpec extends SparkSpec {
  import spark.implicits._

  private def docs(rows: (Long, String)*) = rows.toSeq.toDF("doc_id", "text")

  test("dedup tiers tolerate null / empty / short texts") {
    val d = docs((1L, null), (2L, ""), (3L, "one two"), (4L, "a b c d e"), (5L, "a b c d e"))
    // fingerprint: null text → null fingerprint group; empty → empty-bag group
    assert(Dedup.fingerprintGroups(d, "doc_id", "text").count() === 4)
    // jaccard/minhash: docs without a full shingle are silently excluded,
    // the 5-token twins still pair up
    val jp = Dedup.jaccardPairs(d, "doc_id", "text").collect()
    assert(jp.map(r => (r.getLong(0), r.getLong(1))).toSet === Set((4L, 5L)))
    val mp = Dedup.minhashLshPairs(d, "doc_id", "text").collect()
    assert(mp.map(r => (r.getLong(0), r.getLong(1))).toSet === Set((4L, 5L)))
    // simhash contract: null text → null signature (no accidental
    // "all nulls are duplicates" collisions); empty text → defined signature
    val sig = Dedup.simhashSignatures(d, "doc_id", "text").collect()
      .map(r => r.getLong(0) -> Option(r.getString(1))).toMap
    assert(sig(1L).isEmpty)
    assert(sig(2L).isDefined && sig(3L).isDefined)
    assert(sig.size === 5)
  }

  test("incremental near-dup tolerates empty batch, null/short texts, and overlap") {
    val corpus = docs((1L, "a b c d e"), (2L, null), (3L, "x y"))
    // empty batch → empty result, no crash
    assert(Dedup.jaccardPairsAgainst(corpus, corpus.filter(col("doc_id") < 0),
      "doc_id", "text").count() === 0)
    // null/short batch docs are excluded; a batch doc that also sits in the
    // corpus (same id, duplicate content) must NOT self-pair
    val batch = docs((1L, "a b c d e"), (4L, null), (5L, "z"))
    assert(Dedup.jaccardPairsAgainst(corpus, batch, "doc_id", "text").count() === 0)
    // a genuine near-dup batch doc still pairs with its corpus twin
    val hit = Dedup.jaccardPairsAgainst(corpus, docs((9L, "a b c d e")), "doc_id", "text")
      .collect()
    assert(hit.map(r => (r.getLong(0), r.getLong(1))).toSet === Set((9L, 1L)))
  }

  test("shingle width is validated eagerly") {
    intercept[IllegalArgumentException] {
      graft.functions.TextFunctions.shingles(col("text"), 0)
    }
    intercept[IllegalArgumentException] {
      Dedup.jaccardPairs(docs((1L, "a b c")), "doc_id", "text", n = -1)
    }
  }

  test("text analysis tolerates null and empty text") {
    val d = docs((1L, null), (2L, ""), (3L, "x"))
    assert(TextAnalysis.langId(d).count() === 3)
    assert(TextAnalysis.tokenClasses(d).count() === 3)
    assert(TextAnalysis.normalize(d).count() === 3)
    // tfidf drops token-less docs, keeps the rest
    assert(TextAnalysis.tfIdfTopTerms(d, 3).select("doc_id").as[Long].collect().toSet === Set(3L))
  }

  test("hyperplane LSH drops non-finite vectors and rejects over-long ones") {
    val d = Seq(
      (1L, Array(1f, Float.NaN)),
      (2L, Array(0.5f, 2f)),
      (3L, Array(0.5f, 2f)),
      (4L, Array(Float.PositiveInfinity, 1f))).toDF("vec_id", "embedding")
    // NaN/Inf rows are dropped (siblings drop them via NaN cosine; here the
    // ANSI quantization cast would throw) — the identical finite twins pair
    val out = Similarity.hyperplaneDupPairs(d, threshold = 0.9,
      bits = 2, tables = 2, dim = 2).collect()
    assert(out.map(r => (r.getLong(0), r.getLong(1))).toSet === Set((2L, 3L)))
    // a vector longer than dim must fail loudly, not silently truncate
    val wide = Seq((1L, Array(1f, 2f, 3f))).toDF("vec_id", "embedding")
    intercept[Exception] {
      Similarity.hyperplaneDupPairs(wide, threshold = 0.5,
        bits = 2, tables = 2, dim = 2).collect()
    }
  }

  test("hyperplane LSH drops null-component and over-bound finite vectors") {
    // a NULL component must drop the vector DETERMINISTICALLY (not via a
    // null exists() the filter interprets one way and the oracle's
    // list_filter the other); a finite value past the quantization bound
    // must be filtered, not explode the ANSI cast; and vector 5 — every
    // component UNDER the naive per-cast bound but whose signed projection
    // SUM would overflow long — must be dropped by the dim-aware bound,
    // not crash the aggregate (or silently wrap where the oracle's
    // HUGEINT sum wouldn't)
    val d = Seq(
      (1L, Seq(Option(1f), None)),
      (2L, Seq(Option(0.5f), Option(2f))),
      (3L, Seq(Option(0.5f), Option(2f))),
      (4L, Seq(Option(1e13f), Option(1f))),
      (5L, Seq(Option(5e12f), Option(5e12f)))).toDF("vec_id", "embedding")
    val out = Similarity.hyperplaneDupPairs(d, threshold = 0.9,
      bits = 2, tables = 2, dim = 2).collect()
    assert(out.map(r => (r.getLong(0), r.getLong(1))).toSet === Set((2L, 3L)))
  }

  test("core operators tolerate empty inputs") {
    val empty = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      StructType(Seq(StructField("k", LongType), StructField("ts", LongType))))
    assert(AntiJoinInsert.newRows(empty, empty, Seq("k")).count() === 0)
    assert(LatestPerKey(empty, Seq("k"), Seq(col("ts"))).count() === 0)
    assert(TopKPerGroup(empty, Seq("k"), Seq(col("ts")), 3).count() === 0)
    assert(Dedup.exact(empty).count() === 0)
    assert(SurrogateKey.nextOffset(empty, "k") === 0L)
  }

  test("similarity tolerates empty corpus and empty query set") {
    val emptyEmb = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      StructType(Seq(StructField("vec_id", LongType),
        StructField("embedding", ArrayType(FloatType)))))
    assert(Similarity.bruteForceTopK(emptyEmb, emptyEmb, 5).count() === 0)
    assert(Similarity.cosineDupPairs(emptyEmb, 0.5).count() === 0)
    val emb = graft.sources.Tables.embeddings(spark, sf)
    assert(Similarity.bruteForceTopK(emb, emb.filter(col("vec_id") < 0), 5).count() === 0)
  }
}
