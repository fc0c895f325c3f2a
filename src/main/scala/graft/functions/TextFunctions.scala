package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text primitives for the LLM-pipeline operators (tokenize, shingle,
  * fingerprint, simhash). All pure Catalyst expressions — codegen'd, no UDFs,
  * so they stay inside whole-stage codegen on the 100 TB scan path.
  *
  * Everything here is engine-portable by construction: the same semantics are
  * expressible in ANSI-ish SQL (see SparkEntry.oracleSql), which is what
  * makes these operators oracle-checkable against DuckDB.
  */
object TextFunctions {

  /** Whitespace-delimited tokens. `\\S+` extraction (rather than split on
    * `\\s+`) sidesteps leading/trailing-empty-string edge cases identically
    * across engines.
    */
  def tokens(text: Column): Column = regexp_extract_all(text, lit("\\S+"), lit(0))

  /** Word n-gram shingles: `["a b c", "b c d", ...]`. Documents shorter than
    * n (including null/empty text) yield an empty array — the guard is a
    * `when`, NOT `sequence(1, 0)`: Spark's `sequence` auto-steps DOWNWARD
    * when start > stop, so `sequence(1, 0)` is `[1, 0]` and the 0 index
    * crashes `slice`.
    */
  def shingles(text: Column, n: Int): Column = {
    require(n >= 1, s"shingle width must be >= 1, got $n")
    val ts = tokens(text)
    when(size(ts) >= n,
      transform(
        sequence(lit(1), size(ts) - (n - 1)),
        i => concat_ws(" ", slice(ts, i, lit(n)))))
      .otherwise(array().cast("array<string>"))
  }

  /** One xxhash64 per token: `["a","b"] → [h(a), h(b)]`. The long-valued
    * basis for [[rollingShingleHashes]] — compute it ONCE into a named
    * column before building shingles from it, so the tokenizer regex runs a
    * single time per document.
    */
  def tokenHashes(text: Column): Column = transform(tokens(text), t => xxhash64(t))

  /** Rolling word-n-gram hashes over a token-hash array: element i is the
    * left-fold xxhash64 combine of hashes i..i+n-1, built with `zip_with`
    * over shifted `slice`s — no per-shingle string is ever allocated, which
    * measured 13× faster than slice+concat_ws shingle strings (the round-1
    * dedup bottleneck). Documents shorter than n yield an empty array (the
    * shifted-slice length clamps to 0 — no `sequence(1,0)` descent hazard).
    *
    * Distinctness-preserving vs string shingles: tokens are whitespace-free
    * (`\\S+`), so the n-tuple of token hashes determines the n-gram string;
    * hash collisions across ~10⁹ shingles are ~2⁻⁵⁰ per pair — the same
    * budget the string-hash basis already accepted.
    */
  def rollingShingleHashes(tokenHashes: Column, n: Int): Column = {
    require(n >= 1, s"shingle width must be >= 1, got $n")
    if (n == 1) tokenHashes
    else {
      val g = greatest(size(tokenHashes) - (n - 1), lit(0))
      (2 to n).foldLeft(slice(tokenHashes, lit(1), g)) { (acc, k) =>
        zip_with(acc, slice(tokenHashes, lit(k), g), (a, b) => xxhash64(a, b))
      }
    }
  }

  /** Bag-of-words fingerprint: md5 over the sorted distinct token set.
    * Documents that are permutations of the same vocabulary collide — a
    * cheap, exact, order-insensitive dedup key (one hash per doc, groupBy
    * fingerprint = one shuffle of 16-byte keys at any scale).
    */
  def bagFingerprint(text: Column): Column =
    md5(to_binary(array_join(array_sort(array_distinct(tokens(text))), " "), lit("utf-8")))

  /** 64-bit SimHash rendered as a 64-char '0'/'1' string (MSB first).
    *
    * Per-token basis hash = md5 hex (engine-portable; xxhash64 would be
    * Spark-only). Bit j of the signature is the sign of
    * sum_tokens(count * (2*bit_j(md5(token)) - 1)). Near-identical token
    * bags ⇒ small Hamming distance. Computed as pure array expressions —
    * one pass over tokens per doc, no explode, no shuffle.
    */
  def simhash64(text: Column): Column = {
    // null text → null signature (matching bagFingerprint's null propagation;
    // without the gate every null doc would get the identical all-zeros
    // signature and read as an exact duplicate of every other null doc)
    when(text.isNotNull, simhash64NonNull(text)).otherwise(lit(null).cast("string"))
  }

  private def simhash64NonNull(text: Column): Column = {
    val toks = tokens(text)
    // ONE fold over token OCCURRENCES with a 64-long accumulator: each
    // occurrence adds its ±1 bit vector (sum over occurrences ≡ the
    // count-weighted sum over distinct tokens). Per occurrence: one md5,
    // 16 nibble decodes, 64 adds — O(tokens·64) per doc. The naive shape
    // (per-bit aggregate over per-distinct-token count arrays) re-evaluated
    // the entries array for each of the 64 bits AND counted occurrences
    // with an O(tokens) filter per distinct token — O(distinct·tokens·64),
    // a measured ~570 ms/doc on the fixture corpus vs ~1 ms for this form
    // (interpreted HOF lambdas get no common-subexpression reuse, so
    // every nested reference re-evaluates; keep subtrees as HOF INPUTS,
    // which are evaluated once, not as lambda-body references).
    // constant per-bit masks, MSB-first within each 32-bit half: bit j of
    // the half with value n is set iff (n & mask(j)) != 0
    val halfMasks = array((0 until 32).map(j => lit(1L << (31 - j))): _*)
    def halfVec(n: Column): Column =
      // array_repeat evaluates n ONCE; a lambda that referenced n directly
      // would re-evaluate its conv() per element
      zip_with(halfMasks, array_repeat(n, 32),
        (m, x) => when(x.bitwiseAND(m) > 0, 1L).otherwise(-1L))
    val acc = aggregate(toks, array_repeat(lit(0L), 64), (a, tok) => {
      // first 16 hex chars of the md5 = the 64 signature bits, decoded as
      // two 32-bit halves (16 hex chars would overflow signed BIGINT)
      val h = md5(to_binary(tok, lit("utf-8")))
      val vec = concat(
        halfVec(conv(h.substr(lit(1), lit(8)), 16, 10).cast("long")),
        halfVec(conv(h.substr(lit(9), lit(8)), 16, 10).cast("long")))
      zip_with(a, vec, (x, y) => x + y)
    })
    array_join(transform(acc,
      x => when(x >= 0, lit("1")).otherwise(lit("0"))), "")
  }

  /** Language-ID by stopword-marker voting. Returns the struct
    * (en, es, fr, de, pred) where pred is the argmax language with a fixed
    * tie order (en > es > fr > de; 'und' when all zero). A deliberately
    * simple n-gram-free heuristic: count marker-token occurrences.
    */
  val markers: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "a", "of", "and", "to", "is"),
    "es" -> Seq("el", "la", "los", "las", "una", "es"),
    "fr" -> Seq("le", "les", "des", "une", "est", "et"),
    "de" -> Seq("der", "die", "das", "und", "ist", "ein"))

  def markerHits(text: Column, lang: String): Column =
    size(filter(tokens(text), t => t.isInCollection(markers(lang))))

  def predictedLang(text: Column): Column = {
    val en = markerHits(text, "en"); val es = markerHits(text, "es")
    val fr = markerHits(text, "fr"); val de = markerHits(text, "de")
    val best = greatest(en, es, fr, de)
    when(best === 0, "und")
      .when(en === best, "en").when(es === best, "es")
      .when(fr === best, "fr").otherwise("de")
  }
}
