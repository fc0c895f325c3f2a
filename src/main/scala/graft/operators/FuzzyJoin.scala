package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Fuzzy string matching (entity resolution): pairs of rows whose string
  * keys are within edit distance 1, found WITHOUT an all-pairs comparison.
  *
  * Method: FastSS deletion neighborhoods. Each string emits itself plus
  * every single-character deletion (len+1 variants); two strings within
  * edit distance 1 necessarily share a variant (substitution: both drop
  * the differing position; insert/delete: the longer one drops the extra
  * character and equals the shorter). The variant equi-join therefore has
  * perfect recall; it also admits some distance-2 pairs (two different
  * deletions landing on the same string), so candidates are verified with
  * a real `levenshtein` — exact precision, and the verify is per-candidate,
  * not per-pair-of-rows.
  *
  * Scale shape: the explode is ×(len+1) on the KEY column only; the join
  * is keyed by variant string, and a variant bucket only collides for
  * genuinely-near strings, so bucket sizes track duplicate density, not
  * corpus size — the same never-all-pairs discipline as the shingle-bucket
  * Jaccard dedup. A q-gram count-filter generalizes this to larger k; the
  * deletion-neighborhood form is exact and compact for k = 1, the common
  * entity-resolution regime.
  */
object FuzzyJoin {

  /** All pairs (id_a < id_b) whose `strCol` values are within edit
    * distance 1, including exact duplicates (dist 0). Output:
    * (id_a, id_b, str_a, str_b, dist).
    */
  def selfPairs(df: DataFrame, idCol: String, strCol: String): DataFrame = {
    val variants = df.select(col(idCol).as("vid"), col(strCol).as("vs"))
      .withColumn("variant", explode(expr(
        // i = 0 keeps the string itself; i = k drops character k.
        // array_distinct is load-bearing: deleting ANY position inside a
        // run of identical characters yields the SAME variant, and the
        // duplicate (variant, id) rows would multiply candidate rows
        // quadratically in run length across the join (measured 4× on
        // zero-padded keys)
        s"array_distinct(transform(sequence(0, length(vs)), i -> " +
          s"CASE WHEN i = 0 THEN vs " +
          s"ELSE concat(substr(vs, 1, i - 1), substr(vs, i + 1, length(vs))) END))")))
    // candidate pairs via bucket-pair enumeration (the same ONE-shuffle
    // shape as Dedup.jaccardPairs: group by variant, expand pairs per
    // bucket — identical pair set to a self-join with half the explode and
    // shuffle work); candidates travel as bare id pairs and names
    // re-attach for the verify via two id-keyed joins
    val cand = variants.groupBy(col("variant"))
      .agg(collect_set(col("vid")).as("ids"))
      .filter(size(col("ids")) > 1)
      .select(explode(col("ids")).as("id_a"), col("ids"))
      .select(col("id_a"), explode(col("ids")).as("id_b"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b").distinct()
    val names = df.select(col(idCol), col(strCol))
    cand
      .join(names.select(col(idCol).as("id_a"), col(strCol).as("str_a")), Seq("id_a"))
      .join(names.select(col(idCol).as("id_b"), col(strCol).as("str_b")), Seq("id_b"))
      .withColumn("dist", levenshtein(col("str_a"), col("str_b")))
      .filter(col("dist") <= 1)
      .select("id_a", "id_b", "str_a", "str_b", "dist")
  }
}
