package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Fuzzy string matching (entity resolution): pairs of rows whose string
  * keys are within edit distance `k`, found WITHOUT an all-pairs
  * comparison.
  *
  * Method: FastSS deletion neighborhoods, generalized to depth k. Each
  * string emits every variant reachable by deleting UP TO k characters
  * (depth 0 = the string itself). Two strings within edit distance k
  * necessarily share a variant: align an optimal edit script and delete,
  * from each string, the characters the script touches — substitutions
  * delete the differing position from both sides, an insert/delete
  * deletes the extra character from the longer side — at most k
  * deletions per string, landing both on the same string. The variant
  * equi-join therefore has PERFECT RECALL at depth k; it also admits
  * farther pairs (different deletions colliding), so every candidate is
  * verified with a real `levenshtein` — exact precision, per candidate,
  * never per pair-of-rows.
  *
  * Scale shape: the explode is ×O(len^k) on the KEY column only — the
  * entity-resolution regime is short keys (names, codes), where
  * len²/2 ≈ 150 variants is cheap and, crucially, a variant bucket only
  * collides for strings agreeing on EVERYTHING except the deleted
  * positions, so bucket sizes track local duplicate density, never
  * corpus size (unlike q-gram blocking, where a shared constant prefix
  * puts the whole corpus in one gram bucket). For long text use the
  * shingle-Jaccard tiers in [[Dedup]] instead.
  *
  * Degenerate corpora (thousands of copies of ONE key) still blow a
  * single bucket into O(|bucket|²) pairs — `maxBucket` skips buckets
  * past the cap, the same documented recall trade as
  * `Dedup.jaccardPairs(maxShingleDf)` and `Streaming.nearDupPairs
  * (maxBucket)`: exact-duplicate floods carry no fuzzy-match signal a
  * plain exact dedup wouldn't catch first.
  */
object FuzzyJoin {

  /** All pairs (id_a < id_b) whose `strCol` values are within edit
    * distance `k`, including exact duplicates (dist 0). Output:
    * (id_a, id_b, str_a, str_b, dist).
    *
    * @param k         maximum edit distance (1-3; the variant explode is
    *                  O(len^k) per row — keep keys short at k ≥ 2)
    * @param maxBucket skip variant buckets larger than this before pair
    *                  expansion (degenerate duplicate floods; see object
    *                  scaladoc). Default: uncapped (exact).
    */
  def selfPairs(df: DataFrame, idCol: String, strCol: String,
                k: Int = 1, maxBucket: Int = Int.MaxValue): DataFrame = {
    require(k >= 1 && k <= 3, s"selfPairs supports edit distance 1-3, got $k")
    require(maxBucket > 1, "maxBucket must admit at least one pair")
    // depth-1 deletion layer: i = 0 keeps the string; i = j drops char j.
    // array_distinct is load-bearing: deleting ANY position inside a run
    // of identical characters yields the SAME variant, and duplicate
    // (variant, id) rows would multiply candidate rows quadratically in
    // run length across the join (measured 4× on zero-padded keys)
    def delOnce(arr: String) =
      s"array_distinct(flatten(transform($arr, v -> " +
        "transform(sequence(0, length(v)), i -> " +
        "CASE WHEN i = 0 THEN v " +
        "ELSE concat(substr(v, 1, i - 1), substr(v, i + 1, length(v))) END))))"
    val neighborhood = (1 to k).foldLeft("array(vs)")((acc, _) => delOnce(acc))
    val variants = df.select(col(idCol).as("vid"), col(strCol).as("vs"))
      .withColumn("variant", explode(expr(neighborhood)))
    // candidate pairs via bucket-pair enumeration (the same ONE-shuffle
    // shape as Dedup.jaccardPairs: group by variant, expand pairs per
    // bucket — identical pair set to a self-join with half the explode and
    // shuffle work); candidates travel as bare id pairs and names
    // re-attach for the verify via two id-keyed joins
    val cand = variants.groupBy(col("variant"))
      .agg(collect_set(col("vid")).as("ids"))
      .filter(size(col("ids")) > 1 && size(col("ids")) <= maxBucket)
      .select(explode(col("ids")).as("id_a"), col("ids"))
      .select(col("id_a"), explode(col("ids")).as("id_b"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b").distinct()
    val names = df.select(col(idCol), col(strCol))
    cand
      .join(names.select(col(idCol).as("id_a"), col(strCol).as("str_a")), Seq("id_a"))
      .join(names.select(col(idCol).as("id_b"), col(strCol).as("str_b")), Seq("id_b"))
      .withColumn("dist", levenshtein(col("str_a"), col("str_b")))
      .filter(col("dist") <= k)
      .select("id_a", "id_b", "str_a", "str_b", "dist")
  }
}
