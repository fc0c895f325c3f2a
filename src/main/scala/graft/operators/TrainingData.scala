package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Training-data curation operators for LLM pipelines (north-star brief):
  * PII redaction, Gopher-style repetition/quality rules, deterministic
  * train/val/test splits, and context-window packing. Everything is pure
  * column algebra — codegen-friendly, no UDFs, no driver loops — and
  * deterministic, so each operator carries a DuckDB oracle.
  *
  * Reference counterpart: none — the reference (etl.py) stops at star-schema
  * ETL; these are the operations its data lake would need to feed model
  * training at 100 TB.
  */
object TrainingData {

  // ---------------------------------------------------------------------------
  // PII redaction

  /** Regexes shared verbatim with the DuckDB oracle (RE2-compatible subset:
    * no backrefs, no lookaround — also the fastest path through Java regex).
    */
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val Ipv4Re = "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b"
  val LongDigitsRe = "\\b[0-9]{9,}\\b"

  /** Scrub emails, IPv4 addresses, and long digit runs (ids, card/phone
    * numbers) from `textCol`, and count what was removed. Order matters:
    * emails first (their local part may contain digits), then IPs (dotted
    * digits would otherwise partially match the digit rule), then digit runs.
    * Counts are pattern matches on the respective pre-replacement text, so
    * pre-existing literal `[EMAIL]`/`[IP]`/`[NUM]` tokens (e.g. a re-run
    * over an already-redacted corpus) are never counted.
    *
    * Scale: codegen'd regex passes, no shuffle — a pure map.
    */
  def redactPii(df: DataFrame, textCol: String): DataFrame = {
    val t0 = col(textCol)
    val t1 = regexp_replace(t0, EmailRe, "[EMAIL]")
    val t2 = regexp_replace(t1, Ipv4Re, "[IP]")
    val t3 = regexp_replace(t2, LongDigitsRe, "[NUM]")
    def count(t: Column, re: String) = size(regexp_extract_all(t, lit(re), lit(0)))
    df.withColumn("clean", t3)
      .withColumn("n_emails", count(t0, EmailRe))
      .withColumn("n_ips", count(t1, Ipv4Re))
      .withColumn("n_nums", count(t2, LongDigitsRe))
  }

  // ---------------------------------------------------------------------------
  // Gopher-style repetition / quality rules

  /** Per-document repetition and quality signals in the style of the Gopher
    * / C4 filtering rules, adapted to word granularity:
    *   - `dup_word_frac`    — 1 − distinct/total words (repetition);
    *   - `top_word_frac`    — occurrences of the most frequent word / total;
    *   - `top_bigram_frac`  — occurrences of the most frequent word bigram / (total−1);
    *   - `stopword_frac`    — fraction of words in a tiny function-word list
    *                          (a document with none is usually not prose);
    *   - `mean_word_len`    — Gopher keeps 3..10;
    *   - `gopher_ok`        — conjunction of the standard thresholds.
    *
    * All signals are higher-order-function folds over the token array — one
    * projection, no explode, no shuffle; the most-frequent-element counts use
    * `aggregate` over a sorted copy so they stay O(n log n) per row without
    * a map-typed intermediate.
    */
  def repetitionStats(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val words = graft.functions.TextFunctions.tokens(col(textCol))
    val nw = size(col("ws")).cast("int")
    // zero-token documents (empty/whitespace text) are legitimate input:
    // divisions use a clamped denominator (fractions come out 0) and the
    // bigram slice is gated — slice with length -1 throws under Spark 4
    val nwSafe = greatest(nw, lit(1))
    val stopwords = Seq("the", "a", "an", "of", "to", "and", "in", "is", "it", "that")

    df.select(col(idCol), col(textCol))
      .withColumn("ws", words)
      .withColumn("n_words", nw)
      .withColumn("bigrams", expr(
        """IF(size(ws) >= 2,
          |   transform(slice(ws, 1, size(ws) - 1), (w, i) -> concat(w, ' ', ws[i + 1])),
          |   array())""".stripMargin))
      .withColumn("top_word_n", expr(maxRunSql("ws")))
      .withColumn("top_bigram_n", expr(maxRunSql("bigrams")))
      .withColumn("n_stop", size(filter(col("ws"),
        w => w.isin(stopwords.map(lit): _*))).cast("int"))
      .withColumn("dup_word_frac",
        round(size(col("ws")).cast("double") / nwSafe
          - size(array_distinct(col("ws"))).cast("double") / nwSafe, 6))
      .withColumn("top_word_frac", round(col("top_word_n").cast("double") / nwSafe, 6))
      .withColumn("top_bigram_frac",
        round(col("top_bigram_n").cast("double") / greatest(nw - 1, lit(1)), 6))
      .withColumn("stopword_frac", round(col("n_stop").cast("double") / nwSafe, 6))
      .withColumn("mean_word_len", round(
        aggregate(col("ws"), lit(0L), (acc, w) => acc + length(w)).cast("double") / nwSafe, 6))
      .withColumn("gopher_ok",
        col("n_words").between(10, 100000) &&
          col("mean_word_len").between(2.0, 12.0) &&
          col("top_word_frac") <= 0.20 &&
          col("dup_word_frac") <= 0.80 &&
          col("stopword_frac") >= 0.01)
      .select(idCol, "n_words", "dup_word_frac", "top_word_frac", "top_bigram_frac",
        "stopword_frac", "mean_word_len", "gopher_ok")
  }

  /** SQL fold for the most-frequent-element count of a (string) array
    * column: sort, then count the longest equal-run. Shared shape with the
    * DuckDB oracle. */
  private def maxRunSql(arrCol: String): String =
    s"""aggregate(array_sort($arrCol),
       |  named_struct('prev', CAST(NULL AS STRING), 'run', 0, 'best', 0),
       |  (acc, x) -> named_struct(
       |    'prev', x,
       |    'run', IF(acc.prev <=> x, acc.run + 1, 1),
       |    'best', GREATEST(acc.best, IF(acc.prev <=> x, acc.run + 1, 1))),
       |  acc -> acc.best)""".stripMargin

  // ---------------------------------------------------------------------------
  // Deterministic train/val/test split + stratified sampling

  /** Uniform bucket in [0, 256) from the row's id: first two hex chars of
    * md5(id). Stable across runs, engines, partitionings, and data order —
    * the foundation for leak-proof splits and reproducible sampling.
    */
  def hashBucket(id: Column): Column = {
    val h = md5(id.cast("string"))
    val hexDigit = (c: Column) => (instr(lit("0123456789abcdef"), c) - 1).cast("int")
    hexDigit(substring(h, 1, 1)) * 16 + hexDigit(substring(h, 2, 1))
  }

  /** Uniform value in [0, 2³²) from the id's md5 (first 8 hex chars) — the
    * shard-assignment basis. [[hashBucket]]'s 256 buckets are right for
    * rates-in-256ths sampling but would silently CAP a shard count at 256
    * (and skew whenever 256 % nShards != 0); 32 bits keep the modulo bias
    * under nShards/2³² at any realistic shard count.
    */
  def hashBucket32(id: Column): Column =
    conv(substring(md5(id.cast("string")), 1, 8), 16, 10).cast("long")

  /** Assign each row to train/val/test by hashing its id, so a document
    * keeps its split forever (the property that prevents train/test leakage
    * when the corpus is re-ingested). Bucket < 204 → train (~80%), < 230 →
    * val (~10%), else test (~10%).
    *
    * Scale: pure map — md5 of the key only; no shuffle, no RNG state.
    */
  def splitAssign(df: DataFrame, idCol: String): DataFrame =
    df.withColumn("bucket", hashBucket(col(idCol)))
      .withColumn("split",
        when(col("bucket") < 204, "train")
          .when(col("bucket") < 230, "val")
          .otherwise("test"))

  /** Stratified deterministic downsampling (language/source rebalancing,
    * temperature-style mixing): keep a row iff its hash bucket falls below
    * the stratum's keep rate, expressed in 256ths so the decision is exact
    * integer math. A row's fate depends only on (id, stratum rate) — re-runs
    * and engines agree, and lowering a rate only ever removes rows already
    * kept (nested samples, the property quota-based samplers lack).
    */
  def sampleByBucket(df: DataFrame, idCol: String, stratumCol: String,
                     keepOf256: Map[String, Int], defaultKeep: Int = 256): DataFrame = {
    val keep = keepOf256.foldLeft(lit(defaultKeep)) { case (acc, (k, v)) =>
      when(col(stratumCol) === k, lit(v)).otherwise(acc)
    }
    df.withColumn("bucket", hashBucket(col(idCol))).filter(col("bucket") < keep)
  }

  // ---------------------------------------------------------------------------
  // Model-based quality scoring (hashed linear classifier)

  /** Modulus for the multiplicative feature-weight hash: a prime, so the
    * map j → (j·K) mod M scatters the 4096 feature indices across the full
    * residue range. Integer weights in [-(M-1)/2, (M-1)/2] keep the
    * accumulation EXACT — the float appears only in the final sigmoid.
    */
  private val WeightMod = 1000003L
  private val WeightMul = 2654435761L // Knuth's multiplicative constant

  /** Score documents with a hashed-feature linear classifier — the shape of
    * the fasttext-style quality models (DCLM, FineWeb-edu) that gate what
    * enters a training mix. A real deployment loads trained weights; this
    * sandbox derives a deterministic weight table from the feature index
    * instead (no model artifacts here), keeping the load-bearing plumbing —
    * feature hashing, bag-of-features accumulation, bias-free logistic
    * output, threshold gate — real, testable, and oracle-checkable.
    *
    * Per token: feature j = first 3 md5 hex chars (∈ [0, 4096)); integer
    * weight w(j) = (j·WeightMul) mod WeightMod − (WeightMod−1)/2. Per doc:
    * `w_sum` = Σ w over token OCCURRENCES (exact integer — engines cannot
    * disagree), `q_score` = sigmoid(w_sum / (n_words·WeightMod)) rounded to
    * 6 dp, `keep` = q_score ≥ threshold. Empty docs score sigmoid(0) = 0.5.
    *
    * Scale: one `aggregate` fold over the token array — no explode, no
    * shuffle, no weight table in memory (the "table" is two multiplies).
    * With trained weights the same fold reads a broadcast array instead;
    * nothing else changes.
    */
  def qualityScore(df: DataFrame, idCol: String, textCol: String,
                   threshold: Double = 0.5): DataFrame = {
    val half = (WeightMod - 1) / 2
    // NULL text scores as an empty document (w_sum 0, sigmoid 0.5) rather
    // than a NULL row — mirrors the oracle's coalesce(list_sum, 0)
    val toks = graft.functions.TextFunctions.tokens(coalesce(col(textCol), lit("")))
    def weight(t: Column): Column = {
      val j = conv(substring(md5(t), 1, 3), 16, 10).cast("long")
      (j * WeightMul) % WeightMod - half
    }
    df.select(col(idCol), col(textCol))
      .withColumn("_ws", toks)
      .withColumn("n_words", size(col("_ws")).cast("int"))
      .withColumn("w_sum", aggregate(col("_ws"), lit(0L), (acc, t) => acc + weight(t)))
      .withColumn("q_score", round(
        lit(1.0) / (lit(1.0) + exp(-(col("w_sum").cast("double")
          / (greatest(col("n_words"), lit(1)) * WeightMod)))), 6))
      .withColumn("keep", (col("q_score") >= threshold).cast("int"))
      .select(idCol, "n_words", "w_sum", "q_score", "keep")
  }

  // ---------------------------------------------------------------------------
  // Deterministic global shuffle (training-order export)

  /** Assign every row a reproducible pseudo-random (shard, pos) — the
    * training-data export order. Shard comes from the id's [[hashBucket]];
    * position is the rank of an independently-salted md5 within the shard.
    * The order depends only on ids: re-runs, engines, partitionings, and
    * input order all agree, and adding documents never reorders existing
    * ones relative to each other — the reproducibility property an RNG
    * shuffle (`rand(seed)` is partitioning-dependent in Spark) cannot give.
    *
    * Scale: one hash-partition exchange on `shard` plus a per-shard sort —
    * never a global sort. Each shard is corpus/nShards rows; size nShards
    * so a shard fits an executor's spill budget (a 100 TB corpus at 4096
    * shards sorts ~25 GB per task, a normal external sort).
    */
  def deterministicShuffle(df: DataFrame, idCol: String, nShards: Int): DataFrame = {
    require(nShards > 0, s"nShards must be positive, got $nShards")
    // order salt "o" decorrelates the within-shard order from the shard
    // assignment (both are md5 of the id, but of different strings)
    val w = Window.partitionBy(col("shard")).orderBy(col("_oh"), col(idCol))
    df.withColumn("shard", (hashBucket32(col(idCol)) % nShards).cast("int"))
      .withColumn("_oh", md5(concat(lit("o"), col(idCol).cast("string"))))
      .withColumn("pos", (row_number().over(w) - 1).cast("long"))
      .drop("_oh")
  }

  /** Keep at most `maxPerGroup` rows per group (domain/source frequency
    * capping — the C4/RefinedWeb guard against a single site dominating the
    * corpus), chosen deterministically: rows are ranked inside their group
    * by a salted md5 of the id, so the survivors are a reproducible uniform
    * sample, not "whichever K arrived first". Output keeps `grp_rank`
    * (1-based) for auditability.
    *
    * Scale: one exchange on `groupCol`; the `row_number <= K` filter is
    * rewritten by Spark into a WindowGroupLimit — each map task keeps only
    * its local top-K per group BEFORE the shuffle, so a skewed domain ships
    * K rows per input partition, not its whole population.
    */
  def capPerGroup(df: DataFrame, idCol: String, groupCol: String,
                  maxPerGroup: Int): DataFrame = {
    require(maxPerGroup > 0, s"maxPerGroup must be positive, got $maxPerGroup")
    val w = Window.partitionBy(col(groupCol))
      .orderBy(md5(concat(lit("c"), col(idCol).cast("string"))), col(idCol))
    df.withColumn("grp_rank", row_number().over(w))
      .filter(col("grp_rank") <= maxPerGroup)
  }

  // ---------------------------------------------------------------------------
  // Temperature-based mixture sampling

  /** Rebalance a corpus across strata (languages, sources) the way
    * multilingual training mixes are built: target proportions follow
    * n_s^α with α = 0.5 — the square-root temperature that upsamples tail
    * strata without letting the head dominate — under a total budget of
    * ~`budget` kept documents. Per stratum: weight w_s = ⌊√n_s⌋, keep rate
    * in 256ths = min(256, (256·budget·w_s) div (W·n_s)), then the same
    * [[hashBucket]] decision as [[sampleByBucket]] — so the sample is
    * deterministic, engine-independent, and NESTED: raising the budget only
    * ever adds documents. All rate math is integer (⌊√n⌋ is exact for any
    * int64 count because IEEE sqrt is correctly rounded); under ANSI
    * semantics an overflow of 256·budget·w_s fails loudly rather than
    * mis-sampling (budget·√n_s must stay below 2⁵⁵).
    *
    * Output: kept rows as (id, stratum, bucket, keep256). A stratum so
    * large its rate rounds to zero drops entirely — at that point the
    * budget cannot represent it; raise the budget or cap the stratum first
    * ([[capPerGroup]]).
    *
    * Scale: one map-side-combined count aggregate (strata-sized), the total
    * re-broadcast, one broadcast join back onto the corpus — the corpus
    * itself never shuffles.
    */
  def temperatureMix(df: DataFrame, idCol: String, stratumCol: String,
                     budget: Long): DataFrame = {
    require(budget > 0, s"budget must be positive, got $budget")
    val counts = df.groupBy(stratumCol).agg(count(lit(1)).as("_n"))
      .withColumn("_w", floor(sqrt(col("_n").cast("double"))).cast("long"))
    val totalW = counts.agg(sum("_w").as("_tw"))
    // NULL is a real stratum (un-identified language is still corpus mass):
    // it participates in the weight total AND receives its rate, via a
    // null-safe join — a plain equi-join would count it into W and then
    // silently drop every null row, under-delivering the budget
    val rates = counts.crossJoin(broadcast(totalW))
      .withColumn("keep256",
        least(lit(256L), expr(s"(256 * ${budget}L * _w) DIV (_tw * _n)")))
      .select(col(stratumCol).as("_stratum"), col("keep256"))
    df.join(broadcast(rates), col(stratumCol) <=> col("_stratum"))
      .drop("_stratum")
      .withColumn("bucket", hashBucket(col(idCol)))
      .filter(col("bucket") < col("keep256"))
      .select(idCol, stratumCol, "bucket", "keep256")
  }

  // ---------------------------------------------------------------------------
  // Sliding-window text chunking (RAG / context prep)

  /** Split each document into token windows of `window` tokens advancing by
    * `window - overlap` — the standard RAG/embedding chunker. Every chunk is
    * a row: (id, chunk_id, chunk_text, n_tokens); a document shorter than
    * the window yields exactly one chunk.
    *
    * Pure row-local array algebra (`sequence`/`transform`/`slice` + one
    * generator): chunks of a document never leave its partition and nothing
    * shuffles. Contrast with [[contextChunks]], which packs the corpus-level
    * token stream into fixed budgets; this one windows each document
    * independently.
    */
  def chunkText(df: DataFrame, idCol: String, textCol: String,
                window: Int, overlap: Int): DataFrame = {
    require(window > 0 && overlap >= 0 && overlap < window,
      s"need 0 <= overlap < window, got window=$window overlap=$overlap")
    val stride = window - overlap
    val nChunks = greatest(lit(1L),
      ceil((size(col("_ts")) - lit(overlap)).cast("double") / lit(stride)).cast("long"))
    df.withColumn("_ts", graft.functions.TextFunctions.tokens(col(textCol)))
      .withColumn("_c", explode(transform(sequence(lit(0L), nChunks - 1),
        i => struct(i.as("chunk_id"),
          slice(col("_ts"), (i * stride + 1).cast("int"), lit(window)).as("ctoks")))))
      .select(col(idCol), col("_c.chunk_id").as("chunk_id"),
        array_join(col("_c.ctoks"), " ").as("chunk_text"),
        size(col("_c.ctoks")).as("n_tokens"))
  }

  // ---------------------------------------------------------------------------
  // Benchmark decontamination

  /** Flag (corpus doc, benchmark doc) pairs sharing at least `minShared`
    * distinct word-`n`-grams — the overlap check that keeps eval benchmarks
    * out of training data. Output: (idCol, bench_id, n_shared).
    *
    * Scale shape: benchmark suites are tiny next to a 100 TB corpus, so the
    * benchmark's distinct shingle hashes BROADCAST and the corpus never
    * shuffles — each task drains its own scan partitions against the
    * in-memory benchmark set, and only matching (doc, bench) pairs (with
    * map-side-combined counts) reach the wire. Shingles travel as 64-bit
    * rolling hashes ([[graft.functions.TextFunctions.rollingShingleHashes]]),
    * never as strings.
    */
  def decontaminate(corpus: DataFrame, bench: DataFrame, idCol: String,
                    textCol: String, n: Int = 3, minShared: Long = 1L): DataFrame = {
    import graft.functions.TextFunctions._
    def shingles(df: DataFrame, as: String) =
      df.select(col(idCol).as(as),
        explode(array_distinct(rollingShingleHashes(tokenHashes(col(textCol)), n))).as("h"))
    // scan-parallelism guard on the CORPUS side only (no-op at scale):
    // its shingle pass is the operator's per-row cost; the bench side is
    // small by contract and broadcast anyway
    shingles(Spread(corpus.select(col(idCol), col(textCol)), col(idCol)), idCol)
      .join(broadcast(shingles(bench, "bench_id")), "h")
      // both sides are per-doc distinct, so the pair count IS the number of
      // distinct shared n-grams
      .groupBy(col(idCol), col("bench_id"))
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= minShared)
  }

  // ---------------------------------------------------------------------------
  // Context-window packing

  /** Pack the token stream into fixed-size context windows, the way
    * pretraining shards are cut: documents are concatenated in a
    * deterministic order inside each shard and the running token offset maps
    * every document to the chunk range [chunk_first, chunk_last] it lands in.
    *
    * Sharding (`id % nShards`) keeps the running-sum window partitioned —
    * each shard packs independently in parallel, which is exactly how a
    * 100 TB corpus is cut (per-file / per-shard streams), instead of one
    * global single-partition prefix sum.
    */
  def contextChunks(df: DataFrame, idCol: String, nTokensCol: String,
                    ctxSize: Int, nShards: Int): DataFrame = {
    val shard = (col(idCol) % nShards).cast("int")
    val w = Window.partitionBy(col("shard")).orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("shard", shard)
      .withColumn("tok_end", sum(col(nTokensCol)).over(w).cast("long"))
      .withColumn("tok_offset", (col("tok_end") - col(nTokensCol)).cast("long"))
      .withColumn("chunk_first", floor(col("tok_offset") / ctxSize).cast("long"))
      .withColumn("chunk_last",
        floor((col("tok_end") - 1) / ctxSize).cast("long"))
      .select(col(idCol), col("shard"), col("tok_offset"), col("tok_end"),
        col("chunk_first"), col("chunk_last"))
  }
}
