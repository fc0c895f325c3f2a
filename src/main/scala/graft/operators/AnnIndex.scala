package graft.operators

import graft.functions.CosineSimilarity.cosineSim
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Persisted IVF index for ANN search: the corpus is materialized as parquet
  * PARTITIONED BY cell (nearest deterministic seed centroid), with the
  * centroid vectors stored alongside. A query then:
  *   1. ranks centroids against the query batch (tiny, broadcast);
  *   2. reads ONLY the probed cells' partition directories — static
  *      partition pruning, since the probed cell ids are known up front;
  *   3. exact top-k within the probed subset.
  *
  * This is the operator `Similarity.ivfTopK` (which recomputes cells per
  * query) upgraded to the 100 TB shape: assignment cost is paid once at
  * build, queries touch nProbe/nCells of the data at the FILESYSTEM level —
  * the same mechanism as date-partition pruning, applied to vector cells.
  */
object AnnIndex {

  /** Build the index. `refineIters > 0` tightens the deterministic seed
    * centroids with that many Lloyd iterations ([[Similarity.refineCentroids]])
    * before the one-time assignment — better-centered cells mean each probe
    * captures more true neighbors, so recall at a fixed nProbe/nCells scan
    * fraction strictly improves (measured in `MergeAnnSpec`). The refinement
    * cost is paid once here, never at query time.
    */
  def build(spark: SparkSession, corpus: DataFrame, everyNthCentroid: Int,
            path: String, refineIters: Int = 0): Unit = {
    val base = corpus.select(col("vec_id"), col("embedding"))
    val cents0 = Similarity.refineCentroids(
      base, Similarity.centroids(base, everyNthCentroid), refineIters)
    // both writes below consume the centroid table; when a Lloyd chain
    // exists, materialize it once (nCells rows, bounded by construction)
    // instead of re-running refineIters corpus passes per write
    val cents = if (refineIters > 0) cents0.localCheckpoint(true) else cents0
    Similarity.assignCells(base, cents)
      .write.mode(SaveMode.Overwrite).partitionBy("cell").parquet(s"$path/cells")
    cents.select(col("cell"), col("cv").as("embedding"))
      .write.mode(SaveMode.Overwrite).parquet(s"$path/centroids")
  }

  /** Incrementally upsert a vector batch into an existing index — the live
    * 100 TB path: a corpus that grows by append-batches must not pay a full
    * rebuild per batch. The batch is assigned against the PERSISTED
    * centroids (tiny, broadcast), then [[MergeUpsert]] rewrites only the
    * cell partitions the batch actually touches — every other cell's files
    * stay byte-identical (spec-checked), so query-side partition pruning
    * and any downstream caches keyed on file identity are undisturbed.
    * An existing `vec_id` is REPLACED (including across cells if its new
    * embedding assigns elsewhere); a new id is inserted.
    *
    * Centroids are deliberately NOT refined here: cell geometry stays fixed
    * so upserts stay cheap and deterministic. Under drift (batch
    * distribution diverging from the build corpus), recall at fixed nProbe
    * degrades gracefully — re-center with a periodic [[build]] (the usual
    * IVF operational pattern).
    */
  def upsert(spark: SparkSession, path: String, batch: DataFrame): Unit = {
    val cents = spark.read.parquet(s"$path/centroids")
      .select(col("cell"), col("embedding").as("cv"))
    val assigned = Similarity.assignCells(
      batch.select(col("vec_id"), col("embedding")), cents)
    MergeUpsert(spark, s"$path/cells", assigned,
      keys = Seq("vec_id"), partitionCols = Seq("cell"))
  }

  /** @param eligible when set, a `vec_id` set restricting candidates —
    *        FILTERED search over the persisted index: the filter applies
    *        inside the probed cells before the rank cut (see
    *        [[Similarity.ivfTopKFiltered]] for why post-filtering is
    *        wrong), joined LEFT SEMI so a selective id set broadcasts
    *        and a huge one shuffles, never collected. */
  def query(spark: SparkSession, path: String, queries: DataFrame,
            k: Int, nProbe: Int,
            eligible: Option[DataFrame] = None): DataFrame = {
    val cents = spark.read.parquet(s"$path/centroids")
      .select(col("cell"), col("embedding").as("cv"))
    val q = queries.select(col("vec_id").as("q_id"), col("embedding").as("qv"))

    val qScored = q.join(broadcast(cents))
      .withColumn("ccos", cosineSim(col("qv"), col("cv")))
    val qw = Window.partitionBy(col("q_id")).orderBy(col("ccos").desc, col("cell"))
    val probes = qScored.withColumn("crk", row_number().over(qw))
      .filter(col("crk") <= nProbe).select(col("q_id"), col("qv"), col("cell"))

    // probed cell ids are small by construction (≤ nProbe × |Q|): collect
    // them so the scan below is STATICALLY partition-pruned
    val probedCells = probes.select("cell").distinct().collect().map(_.getLong(0))

    val cells0 = spark.read.parquet(s"$path/cells")
      .filter(col("cell").isin(probedCells: _*))
      .select(col("cell"), col("vec_id").as("n_id"), col("embedding").as("nv"))
    val cells = eligible.fold(cells0)(e =>
      cells0.join(e.select(col("vec_id").as("n_id")), Seq("n_id"), "left_semi"))

    val scored = cells.join(broadcast(probes), Seq("cell"))
      .filter(col("q_id") =!= col("n_id"))
      .withColumn("cos", cosineSim(col("qv"), col("nv")))
    val w = Window.partitionBy(col("q_id")).orderBy(col("cos").desc, col("n_id"))
    scored.withColumn("rk", row_number().over(w)).filter(col("rk") <= k)
      .select(col("q_id"), col("n_id"), round(col("cos"), 6).as("cos"), col("rk"))
  }
}
