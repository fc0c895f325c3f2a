package graft.operators

import graft.functions.TextFunctions._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Text-analysis operators over a document table (north-star LLM-pipeline
  * components): per-doc statistics, quality scoring, language-ID, and
  * regex-class token counting. All pure codegen'd expressions — a single
  * narrow projection over the scan, no shuffle, which is exactly the shape
  * that saturates IO at 100 TB.
  */
object TextAnalysis {

  /** Per-document token statistics + a simple quality score.
    * `ttr` = type-token ratio (distinct/total); `avg_token_len` in chars.
    * `quality` penalizes extreme doc length and degenerate vocabulary —
    * a stand-in for fastText-style quality classifiers, fully deterministic.
    */
  def stats(docs: DataFrame): DataFrame = {
    val toks = tokens(col("text"))
    docs.select(
      col("doc_id"),
      size(toks).as("n_tokens"),
      size(array_distinct(toks)).as("n_uniq"),
      length(col("text")).as("n_chars_live"),
      round(size(array_distinct(toks)).cast("double") / size(toks), 6).as("ttr"),
      round((length(col("text")) - (size(toks) - 1)).cast("double") / size(toks), 6)
        .as("avg_token_len"),
      round(
        least(size(toks).cast("double") / 64, lit(1.0)) *
          (size(array_distinct(toks)).cast("double") / size(toks)), 6).as("quality"))
  }

  /** Language identification by stopword-marker voting (per-language hit
    * counts + argmax prediction; 'und' when no marker fires).
    */
  def langId(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      markerHits(col("text"), "en").as("en_hits"),
      markerHits(col("text"), "es").as("es_hits"),
      markerHits(col("text"), "fr").as("fr_hits"),
      markerHits(col("text"), "de").as("de_hits"),
      predictedLang(col("text")).as("pred_lang"))

  /** BPE-ish regex token classes: alphabetic runs, digit runs, and single
    * non-alnum glyphs — the pre-tokenization split GPT-style BPE vocabularies
    * apply before merges. Counted per class.
    */
  def tokenClasses(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      size(regexp_extract_all(col("text"), lit("[A-Za-z]+"), lit(0))).as("n_alpha"),
      size(regexp_extract_all(col("text"), lit("[0-9]+"), lit(0))).as("n_num"),
      size(regexp_extract_all(col("text"), lit("[^A-Za-z0-9\\s]"), lit(0))).as("n_other"))

  /** Text normalization for ingest pipelines: lowercase, strip non-alnum,
    * collapse runs of whitespace, trim. One codegen'd projection.
    */
  def normalize(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      trim(regexp_replace(regexp_replace(lower(col("text")), "[^a-z0-9 ]", ""),
        " +", " ")).as("clean_text"))
      .withColumn("n_clean_chars", length(col("clean_text")))

  /** Top-k corpus terms per document by tf·idf.
    *
    * idf is the plain ratio (N+1)/(df+1) — deliberately log-free so every
    * arithmetic step is a deterministic double op reproducible across
    * engines (libm `log` may differ in the last ulp between runtimes);
    * rankings are unchanged since log is monotone.
    *
    * Shape: one explode + two hash aggregations (tf by (doc,term), df by
    * term) + a broadcast of the tiny df/N side, then a per-doc rank window.
    * The corpus-wide df table is the only global state and is bounded by
    * vocabulary size, not corpus size.
    */
  def tfIdfTopTerms(docs: DataFrame, k: Int): DataFrame = {
    val tok = docs.select(col("doc_id"), explode(tokens(col("text"))).as("term"))
    val tf = tok.groupBy("doc_id", "term").agg(count("*").as("tf"))
    val df = tok.select("doc_id", "term").distinct()
      .groupBy("term").agg(count("*").as("df"))
    val n = docs.select(countDistinct(col("doc_id")).as("n_docs"))
    val scored = tf.join(broadcast(df), "term").crossJoin(broadcast(n))
      .withColumn("score",
        round(col("tf") * ((col("n_docs") + 1).cast("double") / (col("df") + 1)), 6))
    val w = Window.partitionBy(col("doc_id")).orderBy(col("score").desc, col("term"))
    scored.withColumn("rk", row_number().over(w)).filter(col("rk") <= k)
      .select("doc_id", "term", "score", "rk")
  }

  // ---------------------------------------------------------------------------
  // HTML / boilerplate stripping

  /** Script/style blocks die whole (non-greedy, dot-matches-newline). The
    * pattern is RE2-compatible (no lookaround/backrefs) so the DuckDB
    * oracle runs it verbatim; the close tag is matched loosely
    * (`</(script|style)`) because browsers too terminate the block at the
    * first closer regardless of which element opened it.
    */
  val HtmlBlockRe = "(?s)<(script|style)[^>]*>.*?</(script|style)[^>]*>"
  val HtmlTagRe = "<[^>]*>"

  /** Strip markup from HTML-ish text: script/style blocks first (their
    * CONTENT is not prose), then remaining tags, then the five core
    * character entities, then whitespace collapse+trim. `n_tags` counts the
    * tags removed (after block removal) — a cheap markup-density signal for
    * quality filtering. Web-crawl curation runs this before every text
    * operator in this file.
    *
    * Scale: three codegen'd regex passes + literal replaces, row-local, no
    * shuffle — the same cost class as [[normalize]].
    */
  def stripHtml(docs: DataFrame, textCol: String = "text"): DataFrame = {
    val noBlocks = regexp_replace(col(textCol), HtmlBlockRe, " ")
    val noTags = regexp_replace(noBlocks, HtmlTagRe, " ")
    // &amp; decodes LAST: "&amp;lt;" is the literal text "&lt;", not "<"
    val decoded = Seq("&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"",
      "&#39;" -> "'", "&amp;" -> "&")
      .foldLeft(noTags) { case (c, (e, r)) => replace(c, lit(e), lit(r)) }
    docs.withColumn("n_tags",
        size(regexp_extract_all(noBlocks, lit(HtmlTagRe), lit(0))))
      .withColumn("clean_text",
        trim(regexp_replace(decoded, "[ \\t\\r\\n]+", " ")))
  }
}
