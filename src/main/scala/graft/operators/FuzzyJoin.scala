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
  * delete the differing position from each side, an insert/delete
  * deletes the extra character from the longer side — at most k
  * deletions per string, landing both on the same string. The variant
  * equi-join therefore has PERFECT RECALL at depth k; it also admits
  * farther pairs (different deletions colliding), so every candidate is
  * verified with a real `levenshtein` — exact precision, per candidate,
  * never per pair-of-rows.
  *
  * Position pruning (the scale lever): depth-k variants carry their
  * deleted-position sets, and a candidate pair is REJECTED before the
  * pair shuffle when both sides sit at depth exactly k but deleted
  * DIFFERENT positions. Recall survives, by the alignment above: a
  * depth-(k,k) meeting implies equal original lengths (equal variants ⇒
  * len_a − k = len_b − k), and an equal-length pair needing depth k on
  * BOTH sides is exactly k substitutions — whose deletion sets are the
  * k differing positions, IDENTICAL on the two sides. Every other
  * script class (fewer subs, insert+delete, length-changing edits)
  * reaches a shared variant with depth < k on at least one side, which
  * the rule always admits. The rule is what makes k = 2 viable on
  * zero-padded key spaces (`Customer#000012345`): without it, any two
  * keys whose digit tails share a length-(L−2) subsequence collide —
  * at sf0.1 that admitted ~100× more candidates than true pairs
  * (23 s → ~9 s measured on `q_fuzzy_join_k2`; hashed variant keys and
  * packed position codes took it to ~7 s, and the remaining time is
  * output-bound — the sf0.1 answer itself is 4.1M verified pairs).
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
    * @param maxBucket skip variant buckets holding more than this many
    *                  DISTINCT ids before pair expansion (degenerate
    *                  duplicate floods; see object scaladoc). A bucket
    *                  whose position-annotated row count exceeds
    *                  4×maxBucket is likewise skipped (same-character
    *                  runs multiply rows per id, not ids). Default:
    *                  uncapped (exact).
    */
  def selfPairs(df: DataFrame, idCol: String, strCol: String,
                k: Int = 1, maxBucket: Int = Int.MaxValue): DataFrame = {
    require(k >= 1 && k <= 3, s"selfPairs supports edit distance 1-3, got $k")
    require(maxBucket > 1, "maxBucket must admit at least one pair")
    // Depth-d deletion layer over `vs`, positions 1-indexed on the
    // ORIGINAL string. `filter(sequence(0, …))` rather than
    // `sequence(1, …)` because Spark's sequence DESCENDS when
    // start > stop — sequence(1, 0) is [1, 0], not empty.
    //
    // The deleted-position SET travels as one packed BIGINT (base 2^20
    // per position, i < j < l), not an array: equal sets always pack
    // equal, so the depth-(k,k) pruning rule is unchanged, and for
    // strings past 2^20 chars a pack collision can only ADMIT a
    // candidate the levenshtein verify then rejects — never drop one.
    // pos = 0 marks depth < k (real positions are 1-indexed, so a
    // depth-k pack is always > 0), which replaces the `d` column.
    def layer(d: Int, withPos: Boolean): String = d match {
      case 0 =>
        "array(named_struct('v', vs, 'pos', CAST(0 AS BIGINT)))"
      case 1 =>
        val v = "concat(substr(vs, 1, i - 1), substr(vs, i + 1, length(vs)))"
        val pos = if (withPos) "CAST(i AS BIGINT)" else "CAST(0 AS BIGINT)"
        "transform(filter(sequence(0, length(vs)), i -> i >= 1), " +
          s"i -> named_struct('v', $v, 'pos', $pos))"
      case 2 =>
        val v = "concat(substr(vs, 1, i - 1), substr(vs, i + 1, j - i - 1), " +
          "substr(vs, j + 1, length(vs)))"
        val pos =
          if (withPos) "CAST(i AS BIGINT) * 1048576 + j" else "CAST(0 AS BIGINT)"
        "flatten(transform(filter(sequence(0, length(vs)), i -> i >= 1 AND i < length(vs)), " +
          "i -> transform(filter(sequence(0, length(vs)), j -> j > i), " +
          s"j -> named_struct('v', $v, 'pos', $pos))))"
      case _ =>
        val v = "concat(substr(vs, 1, i - 1), substr(vs, i + 1, j - i - 1), " +
          "substr(vs, j + 1, l - j - 1), substr(vs, l + 1, length(vs)))"
        val pos =
          if (withPos) "(CAST(i AS BIGINT) * 1048576 + j) * 1048576 + l"
          else "CAST(0 AS BIGINT)"
        "flatten(flatten(transform(filter(sequence(0, length(vs)), i -> i >= 1 AND i + 2 <= length(vs)), " +
          "i -> transform(filter(sequence(0, length(vs)), j -> j > i AND j + 1 <= length(vs)), " +
          "j -> transform(filter(sequence(0, length(vs)), l -> l > j), " +
          s"l -> named_struct('v', $v, 'pos', $pos))))))"
    }
    // Depth < k travels position-free and run-collapsed (deleting ANY
    // position inside a run of identical characters yields the SAME
    // variant; duplicate rows would multiply candidates quadratically in
    // run length — measured 4× on zero-padded keys). Depth k keeps one
    // row PER position set: the pruning rule needs the true sets, and a
    // per-string canonical collapse breaks recall (two strings can reach
    // the shared substitution-positions variant via different canonical
    // deletions).
    val loose = (0 until k).map(layer(_, withPos = false)).mkString(", ")
    val neighborhood =
      s"concat(array_distinct(concat($loose)), ${layer(k, withPos = true)})"
    // Variants leave the explode as xxhash64 LONGS — the string itself
    // never reaches the shuffle (16+ bytes → 8; with the packed-long pos
    // this measured 8.6 s → 7.1 s on q_fuzzy_join_k2 at sf0.1, the rest
    // being the 4.1M-pair verify). A hash collision merges two buckets,
    // which only ADDS candidate pairs for the exact verify to reject;
    // genuinely shared variants still hash equal, so recall is intact.
    val variants = Spread(df.select(col(idCol).as("vid"), col(strCol).as("vs")), col("vid"))
      .withColumn("t", explode(expr(neighborhood)))
      .select(col("vid"), xxhash64(col("t.v")).as("vh"), col("t.pos").as("pos"))
    // candidate pairs via bucket-pair enumeration (the same ONE-shuffle
    // shape as Dedup.jaccardPairs: group by variant hash, expand pairs
    // per bucket — identical pair set to a self-join with half the
    // explode and shuffle work). The position-pruning filter runs INSIDE
    // the expansion stage, before any pair reaches the distinct shuffle;
    // candidates travel as bare id pairs and names re-attach for the
    // verify via two id-keyed joins.
    val itemsCap =
      if (maxBucket >= Int.MaxValue / 4) Int.MaxValue else maxBucket * 4
    val cand = variants.groupBy(col("vh"))
      .agg(collect_list(struct(col("vid"), col("pos"))).as("items"))
      .withColumn("nd", size(array_distinct(expr("transform(items, x -> x.vid)"))))
      .filter(col("nd") > 1 && col("nd") <= maxBucket &&
        size(col("items")) <= itemsCap)
      .select(explode(col("items")).as("a"), col("items"))
      .select(col("a"), explode(col("items")).as("b"))
      .filter(col("a.vid") < col("b.vid") &&
        !(col("a.pos") > 0L && col("b.pos") > 0L && col("a.pos") =!= col("b.pos")))
      .select(col("a.vid").as("id_a"), col("b.vid").as("id_b")).distinct()
    val names = df.select(col(idCol), col(strCol))
    cand
      .join(names.select(col(idCol).as("id_a"), col(strCol).as("str_a")), Seq("id_a"))
      .join(names.select(col(idCol).as("id_b"), col(strCol).as("str_b")), Seq("id_b"))
      .withColumn("dist", levenshtein(col("str_a"), col("str_b")))
      .filter(col("dist") <= k)
      .select("id_a", "id_b", "str_a", "str_b", "dist")
  }
}
