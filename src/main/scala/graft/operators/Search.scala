package graft.operators

import graft.functions.CosineSimilarity.cosineSim
import graft.functions.TextFunctions.tokens
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Ranked text retrieval over the document corpus: phrase match, BM25-style
  * scoring, and keyword+vector hybrid fusion — the search stack a RAG
  * pipeline runs next to its embedding index.
  *
  * Cross-engine exactness discipline (every operator here is DuckDB-oracled):
  *  - the idf component is the log-free ratio (N+1)/(df+1) — rankings are
  *    unchanged (log is monotone) and every step stays a deterministic IEEE
  *    op, where libm `log` may differ in the last ulp between runtimes;
  *  - per-document score totals add the per-term contributions in SORTED
  *    term order via an explicit expression chain, never a SUM aggregate
  *    over doubles (aggregation order is nondeterministic and double
  *    addition is not associative);
  *  - all rank windows carry the doc id as tie-break.
  */
object Search {

  /** Documents whose token stream contains `phrase` as ADJACENT whole
    * tokens (under the shared `\S+` tokenization). Entirely row-local and
    * codegen'd: one compiled regex anchored on token boundaries — each
    * phrase token is literal-quoted, adjacency is a whitespace run, and the
    * ends must sit at string edge or whitespace. (A first cut materialized
    * every doc's n-gram array via `transform`+`array_join` and tested
    * membership — interpreted per element, 4× slower at sf0.1; the DuckDB
    * oracle keeps that independent n-gram derivation, so the two
    * constructions check each other.) The whitespace class is the explicit
    * `[ \t\r\n]` the repo uses for engine portability, matching the data's
    * whitespace alphabet.
    */
  def searchPhrase(docs: DataFrame, phrase: String): DataFrame = {
    val p = phrase.trim.split("\\s+").toSeq
    require(p.nonEmpty && p.head.nonEmpty, "searchPhrase needs a non-empty phrase")
    val ws = "[ \\t\\r\\n]"
    val pat = s"(^|$ws)" +
      p.map(java.util.regex.Pattern.quote).mkString(s"$ws+") +
      s"($ws|$$)"
    docs.filter(col("text").rlike(pat))
  }

  /** BM25-style ranked retrieval for a bag of query terms: per-term
    * contribution idf(t) · tf·(k1+1) / (tf + k1·(1−b + b·dl/avgdl)),
    * summed per document in sorted-term order, top `k` docs by
    * (score desc, doc_id). Docs matching no term are absent.
    *
    * Scale shape: only matching terms explode (the isin filter lands in the
    * generator's projection), tf/df aggregate map-side, the df and corpus
    * stats sides are term-bounded broadcasts, and the final top-k is a
    * TakeOrdered — per-partition heaps, no global sort. The per-term pivot
    * is bounded by |terms|.
    */
  def bm25(docs: DataFrame, terms: Seq[String], k: Int,
           k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(terms.nonEmpty, "bm25 needs at least one query term")
    require(terms.distinct.size == terms.size, "bm25 terms must be distinct")
    val toks = docs.select(col("doc_id"), explode(tokens(col("text"))).as("term"))
      .filter(col("term").isin(terms: _*))
    val tf = toks.groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
    val dfT = toks.select("doc_id", "term").distinct()
      .groupBy("term").agg(count(lit(1)).as("df"))
    bm25Score(tf.join(broadcast(dfT), "term"), docLengths(docs), corpusStats(docs),
      terms, k, k1, b)
  }

  /** tf-aware search index: one row per vocabulary term with its df and
    * postings as a doc-sorted `array<struct<doc_id, tf>>` — the shape a
    * persisted BM25 index table stores. Build once per corpus snapshot;
    * [[bm25Indexed]] then serves queries from |terms| posting rows.
    */
  def searchIndex(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), explode(tokens(col("text"))).as("term"))
      .groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
      .groupBy("term").agg(count(lit(1)).as("df"),
        sort_array(collect_list(struct(col("doc_id"), col("tf")))).as("postings"))

  /** Per-document token counts — persisted next to [[searchIndex]] (BM25's
    * length normalization needs them at query time). */
  def docLengths(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), size(tokens(col("text"))).as("dl"))

  /** Corpus-level constants (doc count, average doc length), one row. */
  def corpusStats(docs: DataFrame): DataFrame =
    docs.agg(
      count(lit(1)).as("n_docs"),
      (sum(size(tokens(col("text")))).cast("double") / count(lit(1))).as("avgdl"))

  /** Incremental index maintenance: merge a NEW batch of documents into an
    * existing [[searchIndex]] without rebuilding it. Only the terms the
    * batch actually contains are re-aggregated (their postings explode and
    * merge with the batch's); every other term's row passes through
    * untouched via an anti join. Cost is bounded by the affected terms'
    * posting volume + the batch — never the corpus.
    *
    * Precondition: batch doc ids are disjoint from the indexed corpus
    * (append-only ingest — the same contract as `AnnIndex.upsert`). A
    * re-ingested doc id would double-count df/tf; dedup the batch against
    * the corpus first (`Dedup.exact` / anti join on doc_id).
    *
    * Equivalence `upsert(index(a), b) ≡ index(a ∪ b)` is spec-checked down
    * to bit-identical BM25 rankings; pair with a `docLengths` union and
    * [[statsFromLengths]] for the query-time tables.
    */
  def upsertIndex(index: DataFrame, newDocs: DataFrame): DataFrame = {
    val delta = searchIndex(newDocs)
    index.join(delta.select("term"), Seq("term"), "left_anti")
      .unionByName(upsertDeltaFrom(index, delta))
  }

  /** The CHANGED index rows only — merged entries for exactly the terms the
    * batch contains (new terms included). This is what a keyed storage
    * merge wants ([[graft.streaming.Streaming.indexUpsertSink]] hands these
    * rows to `ManifestTable.merge`, which carries every untouched row/file
    * over); [[upsertIndex]] is this plus the anti-join passthrough for
    * callers holding the index as a DataFrame.
    */
  def upsertDelta(index: DataFrame, newDocs: DataFrame): DataFrame =
    upsertDeltaFrom(index, searchIndex(newDocs))

  /** [[upsertDelta]] over an already-built batch delta (so callers that
    * also need the delta — e.g. for bucket pruning — build it once).
    *
    * IDEMPOTENT by construction: the batch's doc ids (read off the delta's
    * own postings) are anti-joined OUT of the affected terms' existing
    * postings before the batch's are added, so the output is independent
    * of whether this batch was already applied — a replayed micro-batch
    * re-produces byte-identical rows instead of double-counting. The
    * removal is exact for a replay (same doc, same text); a doc
    * re-ingested with CHANGED text still leaves stale postings under terms
    * it no longer contains — true document update needs a tombstone pass
    * over the doc's previous term set.
    */
  private[graft] def upsertDeltaFrom(index: DataFrame, delta: DataFrame): DataFrame = {
    val batchIds = delta
      .select(explode(col("postings")).as("p")).select(col("p.doc_id").as("bid"))
      .distinct()
    val affected = index.join(delta.select("term"), Seq("term"), "left_semi")
    val kept = affected.select(col("term"), explode(col("postings")).as("p"))
      .join(broadcast(batchIds), col("p.doc_id") === col("bid"), "left_anti")
    kept.unionByName(delta.select(col("term"), explode(col("postings")).as("p")))
      .groupBy("term").agg(count(lit(1)).as("df"),
        sort_array(collect_list(col("p"))).as("postings"))
  }

  /** Corpus stats re-derived from a [[docLengths]] table (so incremental
    * ingest never rescans text): same sum/count as [[corpusStats]], hence
    * the identical avgdl double. */
  def statsFromLengths(docLens: DataFrame): DataFrame =
    docLens.agg(
      count(lit(1)).as("n_docs"),
      (sum(col("dl")).cast("double") / count(lit(1))).as("avgdl"))

  /** BM25 served FROM a [[searchIndex]] (possibly read back from disk):
    * identical scores and ranks to [[bm25]] — same idf (the index df IS the
    * per-term posting count), same tf, same fixed-order summation
    * (equivalence spec-checked, including a parquet round-trip). The query
    * touches |terms| index rows + the doc-length table; the corpus text is
    * never scanned.
    */
  def bm25Indexed(index: DataFrame, docLens: DataFrame, stats: DataFrame,
                  terms: Seq[String], k: Int,
                  k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(terms.nonEmpty, "bm25Indexed needs at least one query term")
    require(terms.distinct.size == terms.size, "bm25Indexed terms must be distinct")
    val tfDf = index.filter(col("term").isin(terms: _*))
      .select(col("term"), col("df"), explode(col("postings")).as("p"))
      .select(col("term"), col("df"),
        col("p.doc_id").as("doc_id"), col("p.tf").as("tf"))
    bm25Score(tfDf, docLens, stats, terms, k, k1, b)
  }

  /** Shared scoring core: `tfDf` carries (doc_id, term, tf, df) for the
    * matched terms, however it was produced (corpus scan or index). */
  private def bm25Score(tfDf: DataFrame, docLens: DataFrame, stats: DataFrame,
                        terms: Seq[String], k: Int, k1: Double, b: Double): DataFrame = {
    val contrib = tfDf.join(docLens, "doc_id")
      .crossJoin(broadcast(stats))
      .withColumn("c",
        ((col("n_docs") + 1).cast("double") / (col("df") + 1)) *
          (col("tf") * lit(k1 + 1)) /
          (col("tf") + lit(k1) * (lit(1 - b) + lit(b) * col("dl") / col("avgdl"))))
    // fixed-order, expression-level total: sorted(terms) left-to-right
    val perTerm = contrib.groupBy("doc_id").pivot("term", terms).agg(first(col("c")))
    val score = terms.sorted.map(t => coalesce(col(s"`$t`"), lit(0.0))).reduceLeft(_ + _)
    perTerm.select(col("doc_id"), round(score, 6).as("score"))
      .orderBy(col("score").desc, col("doc_id")).limit(k)
      .withColumn("rk",
        row_number().over(Window.orderBy(col("score").desc, col("doc_id"))).cast("int"))
  }

  /** Hybrid keyword + vector retrieval via reciprocal-rank fusion:
    * rrf(d) = 1/(60+rank_bm25(d)) + 1/(60+rank_cos(d)), with a missing
    * ranking contributing 0; top `k` by (rrf desc, doc_id). 60 is the
    * standard RRF damping constant (Cormack et al.).
    *
    * Both candidate lists are cut to `candidates` docs by TakeOrdered
    * BEFORE ranks are assigned, so the rank windows only ever see a bounded
    * set — at 100 TB the candidate generation is the existing bm25 top-k
    * and an ANN top-k, and the fusion cost is |candidates|, not corpus.
    * Rank arithmetic is integer; 1/(60+rank) is one exact-operand IEEE
    * division, so the fused score is bit-stable across engines.
    */
  def hybridSearch(docs: DataFrame, embeddings: DataFrame, terms: Seq[String],
                   queryVecId: Long, k: Int, candidates: Int = 100): DataFrame = {
    val kw = bm25(docs, terms, k = candidates)
      .select(col("doc_id"), col("rk").as("kw_rank"))
    val qv = embeddings.filter(col("vec_id") === queryVecId)
      .select(col("embedding").as("qv"))
    val vec = embeddings.filter(col("vec_id") =!= queryVecId)
      .crossJoin(broadcast(qv))
      .select(col("vec_id").as("doc_id"),
        round(cosineSim(col("embedding"), col("qv")), 6).as("cos"))
      .orderBy(col("cos").desc, col("doc_id")).limit(candidates)
      .withColumn("vec_rank",
        row_number().over(Window.orderBy(col("cos").desc, col("doc_id"))).cast("int"))
      .select("doc_id", "vec_rank")
    kw.join(vec, Seq("doc_id"), "full_outer")
      .withColumn("rrf", round(
        coalesce(lit(1.0) / (lit(60) + col("kw_rank")), lit(0.0)) +
          coalesce(lit(1.0) / (lit(60) + col("vec_rank")), lit(0.0)), 6))
      .orderBy(col("rrf").desc, col("doc_id")).limit(k)
      .withColumn("rk",
        row_number().over(Window.orderBy(col("rrf").desc, col("doc_id"))).cast("int"))
      .select("doc_id", "kw_rank", "vec_rank", "rrf", "rk")
  }
}
