package graft.operators

import graft.functions.TextFunctions._
import org.apache.spark.sql.DataFrame
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
}
