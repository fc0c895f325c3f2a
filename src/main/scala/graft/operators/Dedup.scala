package graft.operators

import graft.functions.TextFunctions
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ByteType, DecimalType, IntegerType, LongType, ShortType}
import org.apache.spark.storage.StorageLevel

/** Document deduplication suite (north-star LLM-pipeline operators;
  * SURVEY §7.3). Four tiers, cheapest first:
  *
  *  1. exact        — `dropDuplicates` on content (or a hash of it);
  *  2. fingerprint  — md5 over the sorted token set: catches permutations;
  *  3. simhash      — 64-bit signature; near-identical bags ⇒ small Hamming;
  *  4. minhash LSH  — banded Jaccard sketch over word shingles: catches
  *                    near-duplicates with edits, at sub-quadratic cost.
  *
  * Scale notes (100 TB): every tier is shuffle-bounded by (doc-count ×
  * signature-size), never by pairs. Pair enumeration happens ONLY inside LSH
  * buckets (whose size the band structure controls) or between documents
  * sharing a shingle. Shingles travel as 64-bit xxhash64 values, not
  * strings — joins and minima run over fixed-width longs (collision odds
  * across ~10⁹ distinct shingles are ~2⁻⁵⁰ per pair, far below any
  * statistical noise floor of near-dup detection).
  *
  * Contract shared by every tier: `idCol` is a UNIQUE document identifier.
  * The signature tiers aggregate token/shingle rows by id, so rows sharing
  * an id are treated as ONE document (their token bags merge into a single
  * blended signature) — feed `exact`-deduped input if ids can repeat.
  *
  * Which Jaccard path to run:
  *  - [[minhashLshPairs]] is the SCALE path (and the one `SparkEntry`
  *    registers): LSH candidate generation bounded by the band structure,
  *    then the TRUE Jaccard computed per candidate, so false positives are
  *    eliminated and recall at threshold t is 1-(1-t^r)^b (≈1 for any sane
  *    configuration — e.g. ≥0.9999 at t=0.7 with 32 bands × 4 rows).
  *  - [[jaccardPairs]] enumerates every document pair sharing ≥1 shingle —
  *    exact by construction, but one stop-phrase shingle shared by d
  *    documents expands into O(d²) pairs inside a single bucket, so it is
  *    only safe uncapped on bounded corpora (specs, oracles) or with a
  *    `maxShingleDf` cap.
  */
object Dedup {

  /** Tier 1: exact dedup — one hash-aggregate shuffle on the dedup columns. */
  def exact(df: DataFrame, cols: String*): DataFrame =
    if (cols.isEmpty) df.distinct() else df.dropDuplicates(cols)

  /** Release the storage behind a frame returned by [[minhashLshPairs]]
    * once the caller is done with it (`Dataset.unpersist` does not reach a
    * localCheckpoint's RDD blocks). After release the frame is spent — it
    * cannot be recomputed.
    */
  def release(pairs: DataFrame): Unit =
    org.apache.spark.sql.graft.bridge.releaseCheckpoint(pairs)

  /** Tier 2: bag-of-words fingerprint groups. Output: one row per
    * fingerprint with the representative (min) id and member count.
    */
  def fingerprintGroups(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs
      .select(col(idCol).as("doc_id"), TextFunctions.bagFingerprint(col(textCol)).as("fingerprint"))
      .groupBy("fingerprint")
      .agg(min("doc_id").as("keep_id"), count("*").as("n_docs"))

  /** Tier 3: per-doc 64-bit simhash signature (engine-portable bit string).
    *
    * Bit semantics identical to [[TextFunctions.simhash64]] (sign of the
    * count-weighted ±1 sum of md5 bits over token occurrences; null text →
    * null signature; token-less text → all-ones), but computed as ONE ROW
    * PER TOKEN OCCURRENCE feeding 64 codegen'd ± sums in a hash aggregate
    * instead of an interpreted higher-order fold. Interpreted HOF lambdas
    * evaluate outside whole-stage codegen (~0.5 ms/doc measured at sf0.1 —
    * the single biggest cost of the simhash tier); the aggregate form keeps
    * md5 + bit tests + sums inside codegen, and map-side partial
    * aggregation bounds the shuffle at docs × 64 longs regardless of token
    * count — the same shape that makes the minhash signature fast.
    */
  def simhashSignatures(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    // explode_outer keeps token-less docs (null or empty text) as a single
    // null-token row, so every input doc survives the groupBy
    val toks = docs.select(col(idCol).as("doc_id"),
        col(textCol).isNotNull.as("has_text"),
        explode_outer(TextFunctions.tokens(col(textCol))).as("tok"))
      .select(col("doc_id"), col("has_text"), col("tok").isNotNull.as("has_tok"),
        md5(to_binary(col("tok"), lit("utf-8"))).as("h"))
      // first 16 hex chars = the 64 signature bits, decoded as two 32-bit
      // halves (16 hex chars would overflow signed BIGINT)
      .select(col("doc_id"), col("has_text"), col("has_tok"),
        conv(col("h").substr(lit(1), lit(8)), 16, 10).cast("long").as("hi"),
        conv(col("h").substr(lit(9), lit(8)), 16, 10).cast("long").as("lo"))
    // MSB-first: signature position j reads bit (31-j) of its 32-bit half
    def bitSum(j: Int): Column = {
      val (half, mask) = if (j < 32) (col("hi"), 1L << (31 - j))
                         else (col("lo"), 1L << (63 - j))
      sum(when(!col("has_tok"), 0L)
        .when(half.bitwiseAND(lit(mask)) > 0, 1L).otherwise(-1L)).as(s"b$j")
    }
    val aggs = max(col("has_text")).as("has_text") +: (0 until 64).map(bitSum)
    toks.groupBy("doc_id").agg(aggs.head, aggs.tail: _*)
      .select(col("doc_id"),
        when(col("has_text"), concat((0 until 64).map(j =>
          when(col(s"b$j") >= 0, lit("1")).otherwise(lit("0"))): _*))
          .otherwise(lit(null).cast("string")).as("simhash"))
  }

  /** SimHash near-dup pairs: all pairs with Hamming distance ≤ `maxHamming`
    * — EXACT, not probabilistic, by pigeonhole: the 64-bit signature splits
    * into `bands` contiguous segments, and ≤ maxHamming < bands differing
    * bits cannot touch every segment, so every qualifying pair collides on
    * at least one band. Candidate generation is a hash join on
    * (band, segment) — pair enumeration happens only inside band buckets,
    * never across the corpus — followed by exact Hamming verification in
    * bit math (conv → xor → bit_count, all codegen'd; NOT 64 interpreted
    * per-char compares). Output: (doc_a, doc_b, hamming), doc_a < doc_b.
    *
    * Band width is the scale lever: 64/bands bits per segment give
    * 2^(64/bands) buckets. The default (4 bands × 16 bits → 65 536 buckets)
    * keeps random collisions ≈ n²/2¹⁶ per band — with 8 bands the 256
    * 8-bit buckets made candidate generation quadratic in practice (a
    * measured 100× bench blowup at sf0.1). More bands only makes sense
    * together with a larger maxHamming budget, never alone.
    */
  def simhashPairs(docs: DataFrame, idCol: String, textCol: String,
                   maxHamming: Int = 3, bands: Int = 4): DataFrame = {
    require(64 % bands == 0 && bands >= 2,
      s"bands ($bands) must divide 64 and be >= 2 (a 64-bit segment would " +
        "overflow the signed-BIGINT decode of a 32-bit half)")
    require(maxHamming < bands,
      s"exactness needs maxHamming ($maxHamming) < bands ($bands) [pigeonhole]")
    // materialize signatures once (both sides of the candidate self-join
    // would otherwise recompute the whole signature fold); eager result: the
    // pair set is small, and materializing it here lets the finally release
    // the signature blocks without the caller replaying anything
    // scan-parallelism guard (no-op at scale): the signature fold —
    // tokenize + md5 + 64 ± sums per doc — is the pairs path's dominant
    // scan-side cost; q_dedup_simhash (signatures only, one cheap pass)
    // measured FASTER without the exchange, so the spread lives here,
    // not inside simhashSignatures
    val sigs = packedSignatures(Spread(docs, col(idCol)), idCol, textCol)
      .localCheckpoint()
    try simhashPairsFrom(sigs, maxHamming, bands).localCheckpoint()
    finally release(sigs)
  }

  /** Lazy packed form of [[simhashSignatures]]: the portable bit STRING
    * decoded into two 32-bit halves packed in longs — banding and Hamming
    * then run as shift/mask/xor/popcount over 16 bytes per pair instead of
    * substring+conv over 128 chars. Null-signature (null-text) docs are
    * dropped: they have no bits to band.
    */
  private[graft] def packedSignatures(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    simhashSignatures(docs, idCol, textCol)
      .filter(col("simhash").isNotNull)
      .select(col("doc_id"),
        conv(substring(col("simhash"), 1, 32), 2, 10).cast("long").as("hi"),
        conv(substring(col("simhash"), 33, 32), 2, 10).cast("long").as("lo"))

  /** Banded candidate generation + exact Hamming verification over packed
    * (doc_id, hi, lo) signatures. Lazy — [[simhashPairs]] adds the
    * checkpoint lifecycle; `PlanAudit` reads this plan directly (the
    * checkpointed public form erases the join shape it needs to assert).
    */
  private[graft] def simhashPairsFrom(sigs: DataFrame, maxHamming: Int, bands: Int): DataFrame = {
    val w = 64 / bands
    // band k = bits [k*w, (k+1)*w) MSB-first; bands >= 2 means each band
    // sits entirely inside one half, so extraction is one shift + mask
    def seg(k: Int): Column = {
      val off = k * w
      val (half, shift) = if (off < 32) (col("hi"), 32 - off - w)
                          else (col("lo"), 64 - off - w)
      shiftright(half, shift).bitwiseAND(lit((1L << w) - 1))
    }
    val banded = sigs.select(col("doc_id"), col("hi"), col("lo"),
      explode(array((0 until bands).map(k =>
        struct(lit(k).as("band"), seg(k).as("bs"))): _*)).as("bk"))
      .select(col("doc_id"), col("hi"), col("lo"),
        col("bk.band").as("band"), col("bk.bs").as("bs"))
    val cand = banded.select(col("band"), col("bs"),
        col("doc_id").as("doc_a"), col("hi").as("ha"), col("lo").as("la"))
      .join(banded.select(col("band"), col("bs"),
        col("doc_id").as("doc_b"), col("hi").as("hb"), col("lo").as("lb")),
        Seq("band", "bs"))
      .filter(col("doc_a") < col("doc_b"))
    // Hamming BEFORE dedup: popcount per candidate row is pennies, and a
    // multi-band collision costs only a duplicate popcount — whereas
    // distinct-then-filter shuffles EVERY candidate (quadratic in bucket
    // size on signature-correlated corpora); post-filter the distinct
    // shuffles only true near-dup pairs
    cand
      .withColumn("hamming",
        expr("CAST(bit_count(ha ^ hb) + bit_count(la ^ lb) AS INT)"))
      .filter(col("hamming") <= maxHamming)
      .select("doc_a", "doc_b", "hamming").distinct()
  }

  /** Exploded distinct shingle hashes with the doc's shingle-set size carried
    * along: (id, nsh, h). Carrying `nsh` on every row costs 4 bytes but
    * removes the second aggregation (and hence the need to cache the
    * exploded relation) from the exact-pairs path.
    *
    * Staged selects on purpose: the token-hash array is a named column so
    * the tokenizer regex and per-token hashing run once per document; the
    * rolling combine then touches only longs (13× faster than building
    * shingle strings — see [[TextFunctions.rollingShingleHashes]]).
    */
  private[graft] def shingleHashes(docs: DataFrame, idCol: String, textCol: String, n: Int): DataFrame =
    Spread(docs.select(col(idCol).as("id"), col(textCol).as("__sh_text")), col("id"))
      .select(col("id"), TextFunctions.tokenHashes(col("__sh_text")).as("th"))
      .select(col("id"),
        array_distinct(TextFunctions.rollingShingleHashes(col("th"), n)).as("arr"))
      .select(col("id"), size(col("arr")).as("nsh"), explode(col("arr")).as("h"))

  /** (doc_a, doc_b, i, na, nb) → (doc_a, doc_b, jaccard) filtered ≥ threshold. */
  private def jaccardFromCounts(inter: DataFrame, threshold: Double): DataFrame =
    inter
      .withColumn("jaccard",
        round(col("i").cast("double") / (col("na") + col("nb") - col("i")), 6))
      .filter(col("jaccard") >= threshold)
      .select("doc_a", "doc_b", "jaccard")

  /** Exact shingle-Jaccard near-dup pairs, shingle-join blocked:
    * only documents sharing at least one shingle are ever paired.
    * Output: (doc_a, doc_b, jaccard) with doc_a < doc_b, jaccard ≥ threshold.
    *
    * Single pass over the exploded shingle relation (sizes travel with the
    * rows), so nothing is cached and nothing needs unpersisting.
    *
    * @param maxShingleDf drop shingles shared by more than this many docs
    *        before pairing — a stop-phrase appearing in millions of
    *        documents would otherwise blow up one bucket into O(df²) pairs
    *        on a single task. Ultra-common shingles carry no near-dup
    *        signal, so capping changes results only for degenerate corpora.
    *        Default: uncapped (exact). For unbounded corpora prefer
    *        [[minhashLshPairs]], whose candidate count the band structure
    *        bounds.
    */
  def jaccardPairs(docs: DataFrame, idCol: String, textCol: String,
                   n: Int = 3, threshold: Double = 0.7,
                   maxShingleDf: Int = Int.MaxValue): DataFrame = {
    val tok = shingleHashes(docs, idCol, textCol, n)
    // intersection counts via bucket-pair enumeration: ONE shuffle on the
    // shingle hash (vs two sorted join sides), pairs expanded per bucket —
    // identical counts to a self-join, ~2× faster measured. Bucket sizes are
    // bounded by a shingle's document frequency, the same bound the
    // self-join's output has.
    val inter = tok.groupBy("h")
      .agg(collect_set(struct(col("id"), col("nsh"))).as("ids"))
      .filter(size(col("ids")) > 1 && size(col("ids")) <= maxShingleDf)
      .select(explode(col("ids")).as("a"), col("ids"))
      .select(col("a"), explode(col("ids")).as("b"))
      .filter(col("a.id") < col("b.id"))
      .groupBy(col("a.id").as("doc_a"), col("b.id").as("doc_b"))
      // na/nb are functionally determined by doc_a/doc_b — first() is exact
      .agg(count(lit(1)).as("i"), first(col("a.nsh")).as("na"), first(col("b.nsh")).as("nb"))
    jaccardFromCounts(inter, threshold)
  }

  /** Incremental near-dup check: which BATCH documents near-duplicate an
    * existing CORPUS document (shingle-Jaccard ≥ threshold)? This is the
    * primitive an incremental ingest runs instead of re-clustering the
    * world: only the new batch is scored, the corpus is touched by one
    * shingle-keyed hash join — no corpus self-pairs, no batch self-pairs.
    * Output: (batch_id, corpus_id, jaccard), jaccard ≥ threshold over the
    * FULL shingle sets of both documents.
    *
    * Scale shape: both sides shuffle once on the 64-bit shingle hash;
    * the corpus' hashed shingles are scanned/tokenized ONCE (cached
    * MEMORY_AND_DISK while the df-cap aggregate and the pairing join both
    * read them, released before returning — the [[minhashLshPairs]]
    * lifecycle, so the result is eager and localCheckpoint-backed). Pair
    * expansion is bounded per corpus shingle by `maxShingleDf` (the corpus
    * document frequency — a stop-phrase shared by millions of corpus docs
    * would otherwise pair every batch doc containing it with all of them).
    * Candidate count ≤ |batch shingles| × maxShingleDf. If batch and
    * corpus overlap, a doc meeting itself is dropped (same id); distinct
    * ids with duplicate content pair normally. Reference counterpart: the
    * dedup-before-insert anti-joins at etl.py:107-123 — exact-key only;
    * this is the near-dup upgrade.
    */
  def jaccardPairsAgainst(corpus: DataFrame, batch: DataFrame,
                          idCol: String, textCol: String,
                          n: Int = 3, threshold: Double = 0.7,
                          maxShingleDf: Int = Int.MaxValue): DataFrame = {
    val bt = shingleHashes(batch, idCol, textCol, n)
    val ct = shingleHashes(corpus, idCol, textCol, n).persist(StorageLevel.MEMORY_AND_DISK)
    try pairsAgainstFrom(bt, ct, threshold, maxShingleDf).localCheckpoint()
    finally ct.unpersist(blocking = true)
  }

  /** Lazy body of [[jaccardPairsAgainst]] over pre-built shingle relations
    * — [[jaccardPairsAgainst]] adds the cache/checkpoint lifecycle;
    * `PlanAudit` reads this plan directly (the checkpointed public form
    * erases the join shape it needs to assert). */
  private[graft] def pairsAgainstFrom(bt: DataFrame, ct: DataFrame,
                                      threshold: Double, maxShingleDf: Int): DataFrame = {
    // cap by CORPUS document frequency before pairing (one aggregate over
    // the cached shingles; semi-join keeps only pairing-eligible ones)
    val capped = if (maxShingleDf == Int.MaxValue) ct
      else ct.join(
        ct.groupBy("h").agg(count(lit(1)).as("df"))
          .filter(col("df") <= maxShingleDf).select("h"),
        Seq("h"), "left_semi")
    val inter = bt.select(col("id").as("doc_a"), col("nsh").as("na"), col("h"))
      .join(capped.select(col("id").as("doc_b"), col("nsh").as("nb"), col("h")), Seq("h"))
      // overlapping inputs: a doc present on both sides must not self-pair
      .filter(col("doc_a") =!= col("doc_b"))
      .groupBy("doc_a", "doc_b")
      .agg(count(lit(1)).as("i"), first(col("na")).as("na"), first(col("nb")).as("nb"))
    jaccardFromCounts(inter, threshold)
      .select(col("doc_a").as("batch_id"), col("doc_b").as("corpus_id"), col("jaccard"))
  }

  /** Duplicate CLUSTERS from a near-dup pair list — the step that turns
    * pairwise similarity into an actionable keep-list. Transitive closure:
    * if a~b and b~c, then {a,b,c} is one cluster even when a~c was never
    * emitted. Output: one row per document appearing in ≥1 pair —
    * (doc_id, cluster_id, keep) where cluster_id is the component's minimum
    * id and keep=1 marks the canonical representative.
    *
    * Algorithm: min-label propagation with POINTER JUMPING. Each round
    * relaxes over the (undirected, self-looped) edge list — label(v) := min
    * over N(v)∪{v} of labels — then shortcuts label(v) := label(label(v)),
    * so label chains halve every round and convergence is O(log diameter)
    * rounds, not O(diameter): a 10⁶-long pairwise-drift chain finishes in
    * ~20 rounds where one-hop propagation would need 10⁶. Scale shape:
    * both steps are hash joins bounded by |edges| / |nodes|; the caller's
    * pair plan and the per-round labels are `localCheckpoint`ed so nothing
    * upstream is ever re-evaluated and lineage stays O(1) across rounds.
    * The self-loops make relax a single join+aggregate (the node's own
    * label arrives through its (v,v) edge — no second join), and the
    * fixpoint test is exact: for numeric ids, the label-sum probe (every
    * per-node change is strictly decreasing, so Σ label as decimal —
    * overflow-free — is strictly monotone and stalls iff NO label moved);
    * for any other id type, a changed-row join against the previous round.
    * No driver-side graph state.
    *
    * Reference counterpart: none — `etl.py` dedups on exact keys only
    * (etl.py:60,79); clustering is what its pipeline would need the moment
    * near-dup pairs replace exact matches.
    */
  def clusters(pairs: DataFrame, aCol: String = "doc_a", bCol: String = "doc_b",
               maxIters: Int = 50): DataFrame = {
    // materialize the caller's (possibly expensive) pair plan ONCE — the
    // union branches below read these checkpoint blocks; the uncached form
    // re-ran a multi-second near-dup plan per branch inside a single job
    val p = pairs.select(col(aCol).as("src"), col(bCol).as("dst")).localCheckpoint()
    val edges =
      try p.union(p.select(col("dst"), col("src")))
        .union(p.select(col("src"), col("src")))
        .union(p.select(col("dst"), col("dst")))
        .distinct().localCheckpoint()
      finally release(p)
    // exact convergence probe, fast path for INTEGRAL ids: labels only ever
    // decrease, so the decimal sum (38 digits — no overflow at any node
    // count) is unchanged iff the round was a no-op. One narrow scan of
    // checkpointed blocks. Integral ONLY — not NumericType: a fractional id
    // (float/double/decimal-with-scale) rounds in the decimal(38,0) cast, so
    // a label change smaller than the rounding quantum (2.4 -> 2.3) could
    // leave the sum unchanged and report convergence before the fixpoint.
    // Everything else (strings, fractionals) falls back to the exact
    // changed-row join — one extra cheap join per round, same
    // any-orderable-type domain the operator always had.
    val integralIds = p.schema("src").dataType match {
      case LongType | IntegerType | ShortType | ByteType => true
      case dt: DecimalType => dt.scale == 0
      case _ => false
    }
    def anyChanged(prev: DataFrame, cur: DataFrame): Boolean =
      prev.select(col("id"), col("lbl").as("prev_lbl"))
        .join(cur.select(col("id"), col("lbl").as("cur_lbl")), Seq("id"))
        .filter(!(col("prev_lbl") <=> col("cur_lbl")))
        .limit(1).count() > 0
    var labels = edges.select(col("src").as("id"), col("src").as("lbl"))
      .distinct().localCheckpoint()
    try {
      // no initial sum scan: for any pair with doc_a != doc_b round 1
      // strictly decreases a label, so None ≠ Some(round-1 sum) is the
      // correct verdict; an empty pair list gives None == None and still
      // converges at round 1. The one degenerate input — every pair a
      // self-pair (a,a) — now detects its (unchanged) fixpoint at round 2
      // instead of round 1, which only matters to a caller passing
      // maxIters=1 (pointer jumping needs ≥2 rounds on any real graph)
      var prevSum: Option[BigDecimal] = None
      var converged = false
      var it = 0
      while (!converged && it < maxIters) {
        // relax: label(v) := min over N(v)∪{v} (self-loop carries own label)
        val relaxed = edges.join(labels, edges("dst") === labels("id"))
          .groupBy(edges("src").as("id")).agg(min(col("lbl")).as("lbl"))
        // shortcut: adopt the label of your label (labels are always node
        // ids and every node has a label row, so the inner join is total).
        // `relaxed` appears on both sides uncached: its inputs are
        // checkpointed, and recomputing two cheap hash stages beats
        // materializing an extra checkpoint every round.
        val shortcut = relaxed
          .join(relaxed.select(col("id").as("l2"), col("lbl").as("ll")),
            col("lbl") === col("l2"))
          .select(col("id"), col("ll").as("lbl"))
        // the convergence sum rides the checkpoint materialization as an
        // observed metric — one job per round instead of two (the
        // separate labelSum scan of the fresh checkpoint)
        val obs = if (integralIds) Some(org.apache.spark.sql.Observation()) else None
        val next = obs.fold(shortcut)(o =>
          shortcut.observe(o, sum(col("lbl").cast("decimal(38,0)")).as("s")))
          .localCheckpoint()
        if (integralIds) {
          val metrics: Map[String, Any] = obs.get.get
          val curSum = Option(metrics("s"))
            .map(v => BigDecimal(v.asInstanceOf[java.math.BigDecimal]))
          converged = curSum == prevSum
          prevSum = curSum
        } else converged = !anyChanged(labels, next)
        release(labels)
        labels = next
        it += 1
      }
      require(converged, s"clusters did not converge in $maxIters rounds")
      labels.select(col("id").as("doc_id"), col("lbl").as("cluster_id"),
        (col("id") === col("lbl")).cast("int").as("keep"))
    } finally release(edges)
  }

  /** Tier 4: MinHash + LSH near-dup pairs, exact-verified — the scale path
    * for exact-Jaccard output.
    *
    * Signature: `numHashes` minima of xxhash64(seed=i, shingle-hash).
    * Banding: `bands` bands of `numHashes/bands` rows — a pair collides in
    * ≥1 band with prob 1-(1-j^r)^b, so at sane thresholds candidate recall
    * is effectively exact; the final exact Jaccard verification removes all
    * false positives. Hence the output EQUALS `jaccardPairs` while never
    * enumerating non-colliding pairs.
    *
    * Cache lifecycle: the exploded shingle relation is persisted
    * MEMORY_AND_DISK while the operator uses it (signatures + both sides of
    * the verification join), then unpersisted (blocking) before returning.
    * The returned frame is `localCheckpoint`-backed — the pair set is small
    * (near-dups above threshold), its blocks are dropped by
    * `result.unpersist()` or reclaimed by the ContextCleaner when the
    * Dataset is garbage-collected. No shingle-scale blocks outlive the call.
    */
  def minhashLshPairs(docs: DataFrame, idCol: String, textCol: String,
                      n: Int = 3, numHashes: Int = 64, bands: Int = 16,
                      threshold: Double = 0.7,
                      maxBucket: Int = Int.MaxValue): DataFrame = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    val r = numHashes / bands
    val tok = shingleHashes(docs, idCol, textCol, n).persist(StorageLevel.MEMORY_AND_DISK)
    try {
      // signature via one hash-aggregate: every xxhash64 and min() stays
      // inside whole-stage codegen
      val minCols = (0 until numHashes).map(i => min(xxhash64(lit(i), col("h"))).as(s"h$i"))
      val sig = tok.groupBy("id")
        .agg(minCols.head, minCols.tail: _*)
        .select(col("id"), array((0 until numHashes).map(i => col(s"h$i")): _*).as("sig"))

      val banded = sig.select(col("id"),
        explode(transform(sequence(lit(0), lit(bands - 1)),
          k => struct(k.as("band"), slice(col("sig"), k * lit(r) + 1, lit(r)).as("bsig")))).as("bk"))

      // maxBucket guards low-variance corpora where one band signature
      // collects a huge member list (O(size²) candidate pairs from one task)
      val buckets = banded.groupBy("bk").agg(collect_set(col("id")).as("ids"))
        .filter(size(col("ids")) > 1 && size(col("ids")) <= maxBucket)

      val candidates = buckets
        .select(explode(col("ids")).as("doc_a"), col("ids"))
        .select(col("doc_a"), explode(col("ids")).as("doc_b"))
        .filter(col("doc_a") < col("doc_b"))
        .distinct()

      // exact verification: intersection counts via hash-joins against the
      // (small) candidate set — no arrays, no re-tokenization; shingle-set
      // sizes ride along from `tok`, no separate sizes aggregate
      val inter = tok.join(broadcast(candidates), col("id") === col("doc_a"))
        .select(col("doc_a"), col("nsh").as("na"), col("doc_b"), col("h"))
        .join(tok.select(col("id").as("doc_b"), col("nsh").as("nb"), col("h")), Seq("doc_b", "h"))
        .groupBy("doc_a", "doc_b")
        .agg(count(lit(1)).as("i"), first(col("na")).as("na"), first(col("nb")).as("nb"))
      // eager: materializes the pair set while `tok` is still cached, so the
      // caller's actions replay nothing
      jaccardFromCounts(inter, threshold).localCheckpoint()
    } finally tok.unpersist(blocking = true)
  }

  // ---------------------------------------------------------------------------
  // Exact duplicated-SPAN removal (substring-level dedup)

  /** Cut every repeated word-`n`-gram span from all but its first corpus
    * occurrence — substring-level exact dedup in the style of Lee et al.,
    * "Deduplicating Training Data Makes Language Models Better" (the step
    * document-level dedup cannot do: boilerplate, license headers, and
    * quoted passages repeat inside otherwise-unique documents).
    *
    * Semantics: an n-gram occurrence (doc, pos) is REMOVED iff the n-gram
    * occurs ≥2 times corpus-wide and (doc, pos) is not the globally-first
    * occurrence (min by (doc, pos) — deterministic, engine-independent).
    * Removed occurrences mark tokens [pos, pos+n-1]; overlapping marks
    * union, so maximal duplicated spans are cut in one piece — but only
    * spans of at least max(`minSpanTokens`, n) tokens are actually cut
    * (the paper uses a 50-token floor: short accidental repeats stay).
    * Output: (id, clean_text, n_removed) — clean_text is the surviving
    * tokens joined by single spaces, one row per input document.
    *
    * Scale shape (100 TB): the paper's suffix array is a single-machine
    * structure; the distributed equivalent is this — (1) one map pass emits
    * rolling xxhash64 n-gram hashes (fixed-width longs, never strings);
    * (2) one hash-aggregate on the gram hash computes (count, argmin) with
    * map-side partial aggregation; (3) duplicated grams (a small fraction)
    * join back against the gram stream on the hash — AQE broadcasts this
    * side when it fits; (4) marks aggregate per doc and the cut is pure
    * row-local array algebra. Shuffles are bounded by gram count × 16
    * bytes; nothing is ever pairwise.
    */
  def removeDupSpans(df: DataFrame, idCol: String, textCol: String, n: Int,
                     minSpanTokens: Int = 0): DataFrame = {
    require(n >= 1, s"span gram width must be >= 1, got $n")
    // NULL text ≡ empty document (clean_text "", 0 removed) — keeps one
    // row per input doc and matches the oracle's coalesce-to-'' semantics
    // instead of propagating NULL through the token algebra
    val txt = coalesce(col(textCol), lit(""))
    val base = df.select(col(idCol), col(textCol))
      .withColumn("_ts", TextFunctions.tokens(txt))
      .withColumn("_gh", TextFunctions.rollingShingleHashes(
        TextFunctions.tokenHashes(txt), n))
    val grams = base.select(col(idCol), posexplode(col("_gh")).as(Seq("pos", "h")))
    // per-gram corpus stats: occurrence count + canonical first occurrence.
    // min over the (id, pos) struct is lexicographic in both engines.
    val dupStats = grams.groupBy("h")
      .agg(count(lit(1)).as("cnt"), min(struct(col(idCol), col("pos"))).as("keep"))
      .filter(col("cnt") >= 2)
    val marked = grams.join(dupStats, "h")
      .filter(!(col(idCol) === col(s"keep.$idCol") && col("pos") === col("keep.pos")))
      .select(col(idCol), col("pos"))
    val cuts = marked.groupBy(idCol).agg(collect_set(col("pos")).as("_starts"))
    // marked-token cover → maximal contiguous runs → only runs of at least
    // max(minSpanTokens, n) tokens are cut (the paper's span-length floor:
    // a repeated 3-gram inside otherwise-unique prose is noise, a repeated
    // 50-token run is boilerplate). One SQL fold over the sorted cover —
    // row-local, and with the default floor (= n) every run qualifies.
    val floorTokens = math.max(minSpanTokens, n)
    val runCutSql =
      s"""aggregate(
         |  array_sort(_cov),
         |  named_struct('prev', -2, 's', -1, 'cut', CAST(array() AS array<int>)),
         |  (a, x) -> IF(x = a.prev + 1,
         |    named_struct('prev', x, 's', a.s, 'cut', a.cut),
         |    named_struct('prev', x, 's', x, 'cut',
         |      IF(a.s >= 0 AND a.prev - a.s + 1 >= $floorTokens,
         |         concat(a.cut, sequence(a.s, a.prev)), a.cut))),
         |  a -> IF(a.s >= 0 AND a.prev - a.s + 1 >= $floorTokens,
         |          concat(a.cut, sequence(a.s, a.prev)), a.cut))""".stripMargin
    base.join(cuts, Seq(idCol), "left")
      .withColumn("_cov", array_distinct(flatten(transform(
        coalesce(col("_starts"), array().cast("array<int>")),
        p => sequence(p, p + n - 1)))))
      .withColumn("_cut", expr(runCutSql))
      .withColumn("_kept", filter(col("_ts"), (t, i) => !array_contains(col("_cut"), i)))
      .select(col(idCol),
        array_join(col("_kept"), " ").as("clean_text"),
        (size(col("_ts")) - size(col("_kept"))).as("n_removed"))
  }
}
