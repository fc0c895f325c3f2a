package graft.operators

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.sources.ManifestTable

/** Incrementally maintained aggregate materialized view over a
  * [[ManifestTable]] source — the "standing GROUP BY" a 100 TB lake needs:
  * the source is never rescanned after the first build. Each refresh reads
  * only the files that CHANGED between the last-reflected source version and
  * the current one ([[ManifestTable.readVersionDelta]] for added files,
  * [[ManifestTable.readVersionRemoved]] for rewritten-away ones), aggregates
  * that delta, and folds it into the stored view:
  *
  *   mv' = reAgg( mv ∪ agg(added) ∪ −agg(removed) ),  groups with n = 0 drop
  *
  * which is exact for the abelian-group aggregates maintained here —
  * `count(*)` and decimal `sum`s (decimal addition is associative AND
  * order-independent, so the incremental result is bit-identical to a full
  * recompute; doubles would drift). Averages derive as `sum/n` downstream.
  *
  * MIN/MAX are maintained with a GROUP-RESCAN fallback (min/max form a
  * semilattice, not a group — a delete can't be "subtracted"): appends
  * fold for free (`min(stored, added)`), and a refresh stays O(delta)
  * unless a removed row TIES a group's stored extreme — only then are the
  * affected groups recomputed from the source at the pinned target
  * version, key-filtered and column-pruned (zone maps on the group keys
  * prune the rescan like any other filtered scan). That is the standard
  * IVM treatment of non-invertible aggregates: exact always, incremental
  * except precisely where incrementality is impossible.
  *
  * Scale shape: a refresh touches (a) the delta files — proportional to what
  * changed, not to the table — and (b) the stored view, whose size is the
  * group cardinality, not the row count. The view itself is rewritten whole
  * per refresh (it is aggregate-sized, usually thousands-to-millions of
  * rows); the 100 TB fact table behind it is the thing that is never
  * re-read. Unchanged rows inside a rewritten source file appear in both the
  * removed and added deltas and cancel exactly — correct, if wasteful, under
  * heavy compaction; refresh before compacting for the cheap path.
  *
  * Crash safety (single-writer, like every sink in this repo): the source
  * version a view build is ABOUT to reflect is recorded as an intent marker
  * `v<mvVersion>_s<srcVersion>` in `_mv_src/` BEFORE the view's own atomic
  * [[ManifestTable.overwrite]] commit, where `mvVersion` is the version that
  * commit will produce. By induction every committed view version has its
  * marker; a dangling marker (crash between marker and commit) names a view
  * version that does not exist and is simply RESUMED — the next refresh
  * replays the same deterministic delta to the same target version, then
  * catches up to the current head in a further pass. At every crash point a
  * rerun converges with no double-application: the delta applied is pinned
  * by (watermark marker, intent marker), not by wall-clock table state.
  */
object MaterializedView {

  /** Measures are cast to DECIMAL(18,2) before summing (the repo-wide exact
    * discipline) and stored widened, so merges never round.
    */
  private val MeasureType = DecimalType(18, 2)
  private val StoredSumType = DecimalType(28, 2)

  private def markerDir(mvPath: String) = new Path(mvPath, "_mv_src")

  private def markers(spark: SparkSession, mvPath: String): Map[Long, Long] = {
    val dir = markerDir(mvPath)
    val f = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!f.exists(dir)) Map.empty
    else f.listStatus(dir).toSeq.map(_.getPath.getName).flatMap { n =>
      // malformed names are ignored, same tolerance as followTable markers
      "^v([0-9]{12})_s([0-9]{12})$".r.findFirstMatchIn(n)
        .map(m => m.group(1).toLong -> m.group(2).toLong)
    }.toMap
  }

  private def writeMarker(spark: SparkSession, mvPath: String,
                          mvVersion: Long, srcVersion: Long): Unit = {
    val p = new Path(markerDir(mvPath), f"v$mvVersion%012d_s$srcVersion%012d")
    val f = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // atomic empty-file create; existence IS the content, nothing can be
    // half-written (the followTable checkpoint idiom)
    f.create(p, false).close()
  }

  private def sweepMarkers(spark: SparkSession, mvPath: String,
                           below: Long): Unit = {
    val dir = markerDir(mvPath)
    val f = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    markers(spark, mvPath).keys.filter(_ < below).foreach { v =>
      val s = markers(spark, mvPath)(v)
      f.delete(new Path(dir, f"v$v%012d_s$s%012d"), false): Unit
    }
  }

  private def sumCol(c: String) = s"sum_$c"
  private def minCol(c: String) = s"min_$c"
  private def maxCol(c: String) = s"max_$c"

  private def agg(df: DataFrame, keys: Seq[String], sums: Seq[String],
                  mins: Seq[String] = Nil, maxs: Seq[String] = Nil): DataFrame =
    df.groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("n"),
        sums.map(c => sum(col(c).cast(MeasureType)).cast(StoredSumType)
          .as(sumCol(c))) ++
          mins.map(c => min(col(c)).as(minCol(c))) ++
          maxs.map(c => max(col(c)).as(maxCol(c))): _*)

  /** Additive inverse of an aggregated delta — for the GROUP aggregates
    * only. Min/max columns become NULL so the merge's `min()`/`max()`
    * ignores the removed side entirely; removal is handled by the suspect-
    * group rescan instead. */
  private def negate(aggDf: DataFrame, sums: Seq[String],
                     mins: Seq[String] = Nil, maxs: Seq[String] = Nil): DataFrame =
    aggDf.withColumn("n", -col("n"))
      .withColumns(sums.map(c => sumCol(c) ->
        (-col(sumCol(c))).cast(StoredSumType)).toMap)
      .withColumns(mins.map(c => minCol(c) ->
        lit(null).cast(aggDf.schema(minCol(c)).dataType)).toMap)
      .withColumns(maxs.map(c => maxCol(c) ->
        lit(null).cast(aggDf.schema(maxCol(c)).dataType)).toMap)

  /** Current view contents: `keys…, n, sum_<measure>…` (snapshot-isolated,
    * time-travelable — it is just a ManifestTable).
    */
  def read(spark: SparkSession, mvPath: String): DataFrame =
    ManifestTable.read(spark, mvPath)

  /** Bring the view at `mvPath` up to date with the source's current
    * version; returns the source version now reflected. First call builds
    * the view in full; later calls are incremental. `keys`/`sums` must be
    * the same on every call for a given view (checked against the stored
    * schema — a drifted definition fails loudly instead of merging apples
    * into oranges).
    */
  def refresh(spark: SparkSession, srcPath: String, mvPath: String,
              keys: Seq[String], sums: Seq[String],
              mins: Seq[String] = Nil, maxs: Seq[String] = Nil): Long = {
    require(keys.nonEmpty, "materialized view needs at least one group key")
    var v = refreshOnce(spark, srcPath, mvPath, keys, sums, mins, maxs)
    // a resumed stale intent lands below the head — catch up
    while (ManifestTable.currentVersion(spark, srcPath).exists(_ > v))
      v = refreshOnce(spark, srcPath, mvPath, keys, sums, mins, maxs)
    v
  }

  private def refreshOnce(spark: SparkSession, srcPath: String, mvPath: String,
                          keys: Seq[String], sums: Seq[String],
                          mins: Seq[String], maxs: Seq[String]): Long = {
    val srcHead = ManifestTable.currentVersion(spark, srcPath)
      .getOrElse(sys.error(s"no manifest table at $srcPath"))
    val outCols = (keys.map(col) :+ col("n")) ++ sums.map(c => col(sumCol(c))) ++
      mins.map(c => col(minCol(c))) ++ maxs.map(c => col(maxCol(c)))
    ManifestTable.currentVersion(spark, mvPath) match {
      case None =>
        // full build; an existing v1 intent means a prior build crashed
        // before its commit — resume its pinned target, not today's head
        val target = markers(spark, mvPath).getOrElse(1L, {
          writeMarker(spark, mvPath, 1L, srcHead); srcHead
        })
        val mv = agg(ManifestTable.readVersion(spark, srcPath, target),
          keys, sums, mins, maxs).select(outCols: _*)
        ManifestTable.overwrite(spark, mvPath, mv)
        target
      case Some(mvV) =>
        val have = markers(spark, mvPath)
        val from = have.getOrElse(mvV, sys.error(
          s"view at $mvPath (version $mvV) has no source watermark marker — " +
            "not maintained by MaterializedView.refresh?"))
        checkDefinition(spark, mvPath, keys, sums, mins, maxs)
        val target = have.get(mvV + 1) match {
          case Some(t) => t // dangling intent: deterministic redo
          case None if srcHead == from => return from // up to date
          case None => writeMarker(spark, mvPath, mvV + 1, srcHead); srcHead
        }
        if (target == from) return from
        val added = ManifestTable.readVersionDelta(spark, srcPath, from, target)
        val removed = ManifestTable.readVersionRemoved(spark, srcPath, from, target)
        val stored = read(spark, mvPath).select(outCols: _*)
        // with min/max maintained, the removed-side aggregate feeds BOTH
        // the negated delta and the suspect-group detection — materialize
        // it once (it is aggregate-sized) instead of replaying the
        // removed-files scan per consumer
        val removedAgg0 = agg(removed, keys, sums, mins, maxs)
        val removedAgg = if (mins.isEmpty && maxs.isEmpty) removedAgg0
                         else removedAgg0.localCheckpoint(true)
        val delta = agg(added, keys, sums, mins, maxs)
          .unionByName(negate(removedAgg, sums, mins, maxs))
        val merged = stored.unionByName(delta)
          .groupBy(keys.map(col): _*)
          .agg(sum(col("n")).as("n"),
            sums.map(c => sum(col(sumCol(c))).cast(StoredSumType)
              .as(sumCol(c))) ++
              mins.map(c => min(col(minCol(c))).as(minCol(c))) ++
              maxs.map(c => max(col(maxCol(c))).as(maxCol(c))): _*)
          .filter(col("n") > 0)
          .select(outCols: _*)
        val finalMv =
          if (mins.isEmpty && maxs.isEmpty) merged
          else {
            // SUSPECT groups: a removed row TIED the stored extreme — the
            // surviving extreme is unknowable from deltas (min/max is a
            // semilattice; deletes don't invert). Removed rows existed in
            // the stored state, so removedMin >= storedMin: the tie test
            // is exact, not heuristic. Only these groups rescan, from the
            // PINNED target snapshot (crash-replay deterministic),
            // key-filtered and pruned to keys + measures.
            // right sides carry RENAMED key columns and join null-safely:
            // a NULL group key is a group like any other here
            val s = stored.select((keys.map(col) ++
              mins.map(c => col(minCol(c))) ++
              maxs.map(c => col(maxCol(c)))).map(c => c): _*)
            val r = removedAgg.select((keys.map(k => col(k).as(s"__k_$k")) ++
              mins.map(c => col(minCol(c)).as(s"__r_${minCol(c)}")) ++
              maxs.map(c => col(maxCol(c)).as(s"__r_${maxCol(c)}"))).map(c => c): _*)
            val tied = (mins.map(c => col(minCol(c)) <=> col(s"__r_${minCol(c)}")) ++
              maxs.map(c => col(maxCol(c)) <=> col(s"__r_${maxCol(c)}")))
              .reduce(_ || _)
            val suspectKeys = s
              .join(r, keys.map(k => col(k) <=> col(s"__k_$k")).reduce(_ && _))
              .filter(tied)
              .select(keys.map(k => col(s"__k_$k")): _*).distinct()
            val srcT = ManifestTable.readVersion(spark, srcPath, target)
            val rescan = srcT
              .join(suspectKeys,
                keys.map(k => srcT(k) <=> suspectKeys(s"__k_$k")).reduce(_ && _),
                "left_semi")
              .groupBy(keys.map(col): _*)
              .agg(lit(true).as("__rescanned"),
                mins.map(c => min(col(c)).as(s"__s_${minCol(c)}")) ++
                  maxs.map(c => max(col(c)).as(s"__s_${maxCol(c)}")): _*)
              .select((keys.map(k => col(k).as(s"__k_$k")) :+
                col("__rescanned")) ++
                mins.map(c => col(s"__s_${minCol(c)}")) ++
                maxs.map(c => col(s"__s_${maxCol(c)}")): _*)
            merged
              .join(rescan,
                keys.map(k => merged(k) <=> rescan(s"__k_$k")).reduce(_ && _),
                "left")
              .select((keys.map(col) :+ col("n")) ++
                sums.map(c => col(sumCol(c))) ++
                mins.map(c => when(col("__rescanned"), col(s"__s_${minCol(c)}"))
                  .otherwise(col(minCol(c))).as(minCol(c))) ++
                maxs.map(c => when(col("__rescanned"), col(s"__s_${maxCol(c)}"))
                  .otherwise(col(maxCol(c))).as(maxCol(c))): _*)
          }
        ManifestTable.overwrite(spark, mvPath, finalMv)
        sweepMarkers(spark, mvPath, below = mvV + 1)
        target
    }
  }

  private def checkDefinition(spark: SparkSession, mvPath: String,
                              keys: Seq[String], sums: Seq[String],
                              mins: Seq[String], maxs: Seq[String]): Unit = {
    val stored = read(spark, mvPath).schema.fieldNames.toSeq
    val want = (keys :+ "n") ++ sums.map(sumCol) ++
      mins.map(minCol) ++ maxs.map(maxCol)
    require(stored.sorted == want.sorted,
      s"view at $mvPath stores columns ${stored.mkString(",")} but refresh " +
        s"was called with keys=${keys.mkString(",")} sums=${sums.mkString(",")} " +
        s"mins=${mins.mkString(",")} maxs=${maxs.mkString(",")}")
  }
}
