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
  def tfIdfTopTerms(docs0: DataFrame, k: Int): DataFrame = {
    // scan-parallelism guard (no-op at scale): tokenization is the
    // operator's scan-side cost and both tf and df re-run it
    val docs = Spread(docs0.select(col("doc_id"), col("text")), col("doc_id"))
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

  /** Inverted index over the corpus: term → document frequency + the sorted
    * posting list (doc ids). Postings are emitted as a comma-joined string
    * so the result is engine-portable (array hash semantics differ across
    * engines); `minDf` drops the hapax tail, which at web scale is most of
    * the vocabulary.
    *
    * Scale shape: explode(distinct-per-doc tokens) → one hash aggregation
    * keyed by term. State per term is its posting list — for genuinely hot
    * terms (df ~ corpus size) a production index shards postings into
    * (term, bucket) groups or a bitmap codec; the single-group form is kept
    * here because it is the oracle-checkable core and the sharding is a
    * key-suffix away.
    */
  def invertedIndex(docs: DataFrame, minDf: Long): DataFrame =
    invertedIndexArr(docs, minDf)
      .withColumn("postings", array_join(col("postings"), ","))

  /** The index in its native shape: postings as a sorted `array<long>` —
    * what a persisted index table stores and [[searchIndexed]] serves from.
    * `minDf = 1` keeps every term (required for exact search equivalence;
    * a pruned index silently misses rarer-than-minDf terms).
    */
  def invertedIndexArr(docs: DataFrame, minDf: Long): DataFrame =
    Spread(docs.select(col("doc_id"), col("text")), col("doc_id"))
      .select(col("doc_id"), explode(array_distinct(tokens(col("text")))).as("term"))
      .groupBy("term")
      .agg(count(lit(1)).as("df"),
        sort_array(collect_list(col("doc_id"))).as("postings"))
      .filter(col("df") >= minDf)

  /** Conjunctive search served FROM an index ([[invertedIndexArr]] shape,
    * possibly read back from a persisted table) instead of scanning the
    * corpus: pull the |terms| posting rows, explode them, and keep doc ids
    * hit |terms| times. Result ≡ [[searchAll]] doc ids when the index was
    * built with `minDf = 1` (spec-checked, including a parquet round-trip).
    *
    * Scale: the scan side is |terms| postings — independent of corpus row
    * count; the aggregate's key space is the docs matching ≥1 term. This is
    * why a 100 TB corpus serves keyword queries from the index table, not
    * the text.
    */
  def searchIndexed(index: DataFrame, terms: Seq[String]): DataFrame = {
    require(terms.nonEmpty, "searchIndexed needs at least one term")
    // a duplicated term would make the n_hit == |terms| check unsatisfiable
    // and silently return zero rows — reject loudly, as bm25 does
    require(terms.distinct.size == terms.size, "searchIndexed terms must be distinct")
    index.filter(col("term").isin(terms: _*))
      .select(explode(col("postings")).as("doc_id"))
      .groupBy("doc_id").agg(count(lit(1)).as("n_hit"))
      .filter(col("n_hit") === terms.size)
      .select("doc_id")
  }

  /** Conjunctive keyword search: documents containing ALL of `terms`
    * (exact whole-token match under the shared `\S+` tokenization).
    *
    * Shape: explode only the matching terms (the filter lands inside the
    * generator's projection), count distinct hits per doc, keep docs whose
    * hit count equals |terms|, then a left-semi join back to the corpus.
    * The exploded stream is bounded by |terms| × docs-with-a-hit, not by
    * corpus token volume, and the semi join carries only doc ids. Against a
    * persisted [[invertedIndex]] the scan side drops to |terms| postings —
    * this form is the index-free baseline with identical semantics.
    */
  def searchAll(docs: DataFrame, terms: Seq[String]): DataFrame = {
    require(terms.nonEmpty, "searchAll needs at least one term")
    // a duplicated term would make the n_hit == |terms| check unsatisfiable
    // and silently return zero rows — reject loudly, as bm25 does
    require(terms.distinct.size == terms.size, "searchAll terms must be distinct")
    val matched = docs
      .select(col("doc_id"), explode(array_distinct(tokens(col("text")))).as("term"))
      .filter(col("term").isin(terms: _*))
      .groupBy("doc_id").agg(count(lit(1)).as("n_hit"))
      .filter(col("n_hit") === terms.size)
      .select("doc_id")
    docs.join(matched, Seq("doc_id"), "left_semi")
  }

  /** Corpus-wide n-gram counts, top-k by frequency (count-based LM
    * statistics / contamination analysis). Grams are built row-locally by a
    * `transform` over the token array (no self-join, no window); the only
    * shuffle is the final count aggregation, whose key space is the gram
    * vocabulary. Ties rank deterministically (count desc, gram asc).
    */
  def ngramCounts(docs: DataFrame, n: Int, k: Int): DataFrame = {
    require(n >= 1 && k >= 1, "n and k must be positive")
    val grams = Spread(docs.select(col("doc_id"), col("text")), col("doc_id"))
      .select(tokens(col("text")).as("ts"))
      .filter(size(col("ts")) >= n)
      .select(explode(expr(
        s"transform(sequence(1, size(ts) - ${n - 1}), i -> array_join(slice(ts, i, $n), ' '))"))
        .as("gram"))
    // top-k via TakeOrdered (per-partition heaps, no single-partition sort of
    // the vocabulary); the rank window then only ever sees k rows
    val top = grams.groupBy("gram").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("gram")).limit(k)
    top.withColumn("rk",
      row_number().over(Window.orderBy(col("n").desc, col("gram"))).cast("int"))
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
  /** Learned-BPE application: encode each alphabetic pre-token by applying
    * a merge table in RANK ORDER — merge k rewrites every (left-to-right,
    * non-overlapping) adjacent occurrence of its pair before merge k+1
    * runs, the order the merges were learned in. Symbols travel as a
    * U+001F-separated string (sep-wrapped, so a pair match is exactly an
    * adjacent-symbol match and multi-char symbols can never match inside a
    * neighbor), and each merge is ONE literal string replace — semantics
    * an independent engine reproduces verbatim with its own `replace`,
    * which is what makes the DuckDB oracle exact. One caveat is inherited
    * from non-overlapping replace on both engines: an odd chain `a a a`
    * merges its first two occurrences only per pass (the shared separator
    * is consumed), identically on both sides.
    *
    * Only tokens matching `^ ?[A-Za-z]+$` are encoded (merges are defined
    * over letters; the optional GPT-2-style leading space rides along as
    * its own symbol). The whitespace/punct/contraction pre-tokens are
    * deliberately excluded: Java and RE2 disagree on `.` vs `\r`, and the
    * alpha restriction keeps the per-char split engine-portable.
    *
    * Output per doc: (doc_id, n_alpha_tokens, n_symbols, n_alpha_chars,
    * chars_per_symbol) — integers plus one IEEE division, the repo's
    * cross-engine float discipline. Pure per-row expressions: no shuffle,
    * no UDF, whole-stage codegen'd.
    */
  def bpeTokenize(docs: DataFrame, idCol: String, textCol: String,
                  preTokenRe: String, merges: Seq[(String, String)]): DataFrame = {
    val S = "\u001f"
    val alpha = filter(
      regexp_extract_all(col(textCol), lit(preTokenRe), lit(0)),
      t => t.rlike("^ ?[A-Za-z]+$"))
    def encode(t: org.apache.spark.sql.Column) =
      merges.foldLeft(concat(lit(S), regexp_replace(t, "(.)", "$1" + S))) {
        case (acc, (a, b)) =>
          call_function("replace", acc, lit(S + a + S + b + S), lit(S + a + b + S))
      }
    val nSym = aggregate(col("_enc"), lit(0L), (a, s) =>
      a + (length(s) - length(call_function("replace", s, lit(S), lit("")))).cast("long") - 1L)
    docs.select(col(idCol), col(textCol), alpha.as("_toks"))
      .withColumn("_enc", transform(col("_toks"), t => encode(t)))
      .select(col(idCol),
        size(col("_toks")).as("n_alpha_tokens"),
        nSym.as("n_symbols"),
        aggregate(col("_toks"), lit(0L), (a, t) => a + length(t).cast("long"))
          .as("n_alpha_chars"))
      .withColumn("chars_per_symbol",
        col("n_alpha_chars").cast("double") / greatest(col("n_symbols"), lit(1L)))
  }

  /** Distributed BPE TRAINING (Sennrich-style): learn `rounds` merges from
    * the corpus. The scale lever is the classic one — training runs over
    * the DISTINCT-word vocabulary with frequencies, never the corpus:
    * corpus → (token, count) is one shuffle, bounded by vocabulary size,
    * and each round after that is one pair-count aggregation over the
    * vocabulary plus a 1-row argmax action (the Lloyd-iteration pattern —
    * driver traffic is one (pair, count) row per round). Merge
    * application inside the loop is the SAME sep-wrapped literal-replace
    * semantics as [[bpeTokenize]], which is what lets an independent
    * engine re-derive the whole training loop verbatim (the oracle is a
    * generated chain of per-round CTEs: pair-count → argmax → replace).
    *
    * Determinism: argmax ties break on (count DESC, left, right) — binary
    * string order, engine-portable over the ASCII symbol alphabet. Only
    * `^ ?[A-Za-z]+$` pre-tokens train (same restriction, and reason, as
    * [[bpeTokenize]]).
    *
    * Output: (rank, left_sym, right_sym, pair_count) — the learned merge
    * table, feedable straight into [[bpeTokenize]].
    */
  def bpeTrain(spark: org.apache.spark.sql.SparkSession, docs: DataFrame,
               textCol: String, preTokenRe: String, rounds: Int): DataFrame = {
    import spark.implicits._
    require(rounds >= 1 && rounds <= 64, s"rounds must be 1-64, got $rounds")
    val S = "\u001f"
    val alpha = filter(
      regexp_extract_all(col(textCol), lit(preTokenRe), lit(0)),
      t => t.rlike("^ ?[A-Za-z]+$"))
    // Each generation is a localCheckpoint, not a persist: the replace
    // chain otherwise grows the logical plan by one withColumn per round,
    // and every round's argmax pays analyzer + cache-lookup + optimizer
    // passes over the WHOLE chain (measured as ~0.18 s/round of driver
    // gap by the round-18 job profiler — more than the round's actual
    // jobs). A checkpoint truncates lineage to O(1) per round; its eager
    // materialization job replaces the lazy cache fill the argmax was
    // paying anyway, and the vocab is merge-table-sized, never corpus-
    // sized, so the extra materialization is bounded.
    var vocab = docs.select(explode(alpha).as("tok"))
      .groupBy("tok").agg(count(lit(1)).as("cnt"))
      .select(concat(lit(S), regexp_replace(col("tok"), "(.)", "$1" + S)).as("toks"),
        col("cnt"))
      .localCheckpoint()
    val merges = scala.collection.mutable.ArrayBuffer.empty[(Int, String, String, Long)]
    var r = 1
    var done = false
    while (r <= rounds && !done) {
      // adjacent symbol pairs, weighted by word frequency. The guarded
      // sequence (filter i < size) avoids Spark's descending sequence(1, 0)
      // on single-symbol words — same pitfall as FuzzyJoin documents.
      val pairs = vocab
        .select(expr(s"filter(split(toks, '$S'), x -> x <> '')").as("s"), col("cnt"))
        .select(explode(expr(
          "transform(filter(sequence(1, size(s)), i -> i < size(s)), " +
            "i -> struct(element_at(s, i) AS l, element_at(s, i + 1) AS r))")).as("p"),
          col("cnt"))
        .groupBy(col("p.l").as("l"), col("p.r").as("r")).agg(sum("cnt").as("cnt"))
      val best = pairs.orderBy(col("cnt").desc, col("l"), col("r")).limit(1).collect()
      if (best.isEmpty) done = true
      else {
        val l = best(0).getString(0); val rt = best(0).getString(1)
        merges += ((r, l, rt, best(0).getLong(2)))
        val next = vocab.withColumn("toks",
          call_function("replace", col("toks"),
            lit(S + l + S + rt + S), lit(S + l + rt + S))).localCheckpoint()
        Dedup.release(vocab)
        vocab = next
        r += 1
      }
    }
    Dedup.release(vocab)
    merges.toSeq.toDF("rank", "left_sym", "right_sym", "pair_count")
  }

  /** Bigram language-model quality scoring — the CCNet/Gopher-style
    * perplexity filter: train add-one-smoothed bigram statistics on a
    * reference corpus, then score every document by how predictable its
    * token stream is under that model. High perplexity ⇒ the doc's word
    * transitions are alien to the reference distribution (boilerplate,
    * gibberish, wrong language) — the classic cut for training-data
    * curation.
    *
    * p(w2|w1) = (C(w1 w2) + 1) / (C(w1·) + V), V = |ref vocabulary| + 1;
    * perplexity = geometric mean of the inverse probabilities.
    *
    * Scale design (100 TB): the model IS a distributed table — bigram
    * counts stay partitioned by bigram key, never collected or broadcast
    * (a web-scale bigram table is itself TB-sized). Scoring is two
    * key-partitioned shuffle joins (bigram, then first-token) plus one
    * per-doc aggregation; doc bigrams pre-collapse multiplicity map-side
    * so join input is bounded by DISTINCT bigrams per doc. The only
    * broadcast is the 1-row vocabulary scalar.
    *
    * Cross-engine exactness: every count-derived quantity ships as an
    * integer — inverse probabilities quantized to micro-units via pure
    * integer floor division, so sums/mins/maxes hash bit-identically. The
    * one transcendental (the perplexity itself) is emitted ONLY through
    * `ppl_ok`, an AM–GM–HM envelope both engines evaluate on their own
    * doubles: floor-quantization gives the bounds real slack, so the
    * boolean is stable to float noise yet flips on any genuine defect in
    * the count plumbing or the log-space mean. A loud guard rejects
    * reference corpora big enough to overflow the micro-quantization
    * (first-token counts above ~9.2e12).
    */
  def lmPerplexity(score: DataFrame, ref: DataFrame): DataFrame = {
    val maxSafe = 9200000000000L
    val refBg = ref.select(explode(shingles(col("text"), 2)).as("bg"))
      .select(col("bg"), substring_index(col("bg"), " ", 1).as("w1"))
    val bigCounts = refBg.groupBy("bg").agg(count(lit(1)).as("c12"))
    val uniCounts = refBg.groupBy("w1").agg(count(lit(1)).as("c1"))
    val vocab = ref.select(explode(tokens(col("text"))).as("t"))
      .agg((countDistinct(col("t")) + lit(1L)).as("v"))
    val docBg = score
      .select(col("doc_id"), explode(shingles(col("text"), 2)).as("bg"))
      .groupBy(col("doc_id"), col("bg")).agg(count(lit(1)).as("m"))
      .withColumn("w1", substring_index(col("bg"), " ", 1))
    val scored = docBg
      .join(bigCounts, Seq("bg"), "left")
      .join(uniCounts, Seq("w1"), "left")
      .crossJoin(broadcast(vocab))
      .select(col("doc_id"), col("m"),
        coalesce(col("c12"), lit(0L)).as("c12"),
        coalesce(col("c1"), lit(0L)).as("c1"), col("v"))
      .withColumn("num",
        when(col("c1") + col("v") > maxSafe, raise_error(concat(
          lit("lmPerplexity: first-token count overflows micro-quantization: "),
          (col("c1") + col("v")).cast("string"))))
          .otherwise(col("c1") + col("v")))
      .withColumn("den", col("c12") + lit(1L))
      .withColumn("q", expr("(num * 1000000) div den"))
      .withColumn("h", expr("(den * 1000000) div num"))
    // m·q rides as decimal: q alone can reach 9.2e18 at the guard boundary,
    // so the products must not sum in long. 19 digits each keeps the
    // product width inside DuckDB's 38-digit ceiling too
    val d20 = org.apache.spark.sql.types.DecimalType(19, 0)
    val per = scored.groupBy("doc_id").agg(
      sum(col("m")).as("n_bigrams"),
      sum(when(col("c12") === 0L, col("m")).otherwise(lit(0L))).as("oov_bigrams"),
      sum(col("m").cast(d20) * col("q").cast(d20)).as("sum_q"),
      sum(col("m").cast(d20) * col("h").cast(d20)).as("sum_h"),
      min(col("q")).as("min_q"),
      max(col("q")).as("max_q"),
      sum(col("m").cast("double") *
        (log(col("num").cast("double")) - log(col("den").cast("double"))))
        .as("sum_lp"))
      .withColumn("ppl", exp(col("sum_lp") / col("n_bigrams")))
      .withColumn("am",
        (col("sum_q").cast("double") / col("n_bigrams") + 1.0) / 1e6)
      .withColumn("hm",
        col("n_bigrams").cast("double") * 1e6 /
          (col("sum_h") + col("n_bigrams")).cast("double"))
      .withColumn("ppl_ok",
        col("ppl") <= col("am") * 1.000001 + 1e-6 &&
          col("ppl") >= col("hm") * 0.999999 - 1e-6 &&
          col("ppl") >= col("min_q").cast("double") / 1e6 * 0.999999 - 1e-6 &&
          col("ppl") <= (col("max_q") + lit(1L)).cast("double") / 1e6 * 1.000001 + 1e-6)
    // exact integer floor on the decimal sum: subtract the remainder first,
    // so the division is exact-integer-valued and the cast can't round
    score.select(col("doc_id")).join(per, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        coalesce(col("oov_bigrams"), lit(0L)).as("oov_bigrams"),
        expr("CAST((sum_q - sum_q % n_bigrams) / n_bigrams AS BIGINT)")
          .as("am_micro"),
        col("min_q"), col("max_q"),
        coalesce(col("ppl_ok"), lit(true)).as("ppl_ok"))
  }

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
