package graft.plans

import graft.sources.GraftRelation
import org.apache.spark.sql.catalyst.TableIdentifier
import org.apache.spark.sql.catalyst.catalog.{CatalogStatistics, CatalogStorageFormat, CatalogTable, CatalogTableType}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.LogicalRelation

/** Surface ROW COUNTS to the cost-based optimizer for graft relations.
  *
  * `GraftRelation.sizeInBytes` already feeds the size heuristics (auto
  * broadcast), but v1 `BaseRelation` has no row-count hook — so CBO join
  * reordering over graft-heavy multi-way joins runs on bytes alone, and
  * `LogicalRelation.computeStats` only reads `rowCount` out of an attached
  * catalog table's `CatalogStatistics`. This rule attaches exactly that:
  * for every graft scan whose catalog entry carries no stats (path reads
  * have no catalog entry at all; `CREATE TABLE … USING graft` entries
  * never ran ANALYZE), fill `CatalogStatistics(sizeInBytes, rowCount)`
  * from the manifest.
  *
  * Planning-cost discipline: the row count comes from
  * [[GraftRelation.metaCountCheap]] — inline-stats manifests only, a
  * driver-side fold over an already-parsed manifest, NO Spark job. Tables
  * whose stats sit in a distributed sidecar (≥ the file threshold) keep a
  * bytes-only estimate: their cardinality never decides a join order
  * against a small table anyway, and an exact count there costs a job per
  * query plan. Statless manifests contribute `rowCount = None` — never a
  * guess.
  *
  * Runs in the injected-optimizer batch, which Spark places before the
  * Join Reorder batch, so `CostBasedJoinReorder` (under
  * `spark.sql.cbo.enabled` + `spark.sql.cbo.joinReorder.enabled`) sees the
  * cardinalities. The guard (`stats.isEmpty`) makes the rule a no-op on
  * its own output, and an explicit user-run ANALYZE TABLE always wins.
  */
object GraftStatsRule extends Rule[LogicalPlan]
    with org.apache.spark.sql.catalyst.expressions.PredicateHelper {
  override def apply(plan: LogicalPlan): LogicalPlan = {
    // string-skew calibration signal: the QUERY's own equality literals
    // per attribute (exprIds are plan-global, so the map keys straight
    // into each relation's output) — collected once per rule pass, only
    // when CBO could consume the result
    val eqLits: Map[org.apache.spark.sql.catalyst.expressions.ExprId, Set[String]] =
      if (conf.cboEnabled) collectEqLiterals(plan) else Map.empty
    val joinKeys: Set[org.apache.spark.sql.catalyst.expressions.ExprId] =
      if (conf.cboEnabled) collectJoinKeys(plan) else Set.empty
    plan.transform {
      case lr: LogicalRelation if lr.relation.isInstanceOf[GraftRelation] &&
          lr.catalogTable.forall(_.stats.isEmpty) =>
        val r = lr.relation.asInstanceOf[GraftRelation]
        val stats = CatalogStatistics(BigInt(r.sizeInBytes),
          r.metaCountCheap.map(BigInt(_)), columnStats(r, lr, eqLits, joinKeys))
        val table = lr.catalogTable.getOrElse(synthetic(r))
        lr.copy(catalogTable = Some(table.copy(stats = Some(stats))))
    }
  }

  /** Top-level conjunctive equality/IN string literals per attribute —
    * what the plan actually tests, so the string column stats can
    * calibrate equality selectivity from the zone maps' point-mass
    * frequency floors. */
  private def collectEqLiterals(plan: LogicalPlan)
      : Map[org.apache.spark.sql.catalyst.expressions.ExprId, Set[String]] = {
    import org.apache.spark.sql.catalyst.expressions._
    import org.apache.spark.sql.types.StringType
    import org.apache.spark.unsafe.types.UTF8String
    plan.collect {
      case org.apache.spark.sql.catalyst.plans.logical.Filter(cond, _) =>
        splitConjunctivePredicates(cond).flatMap {
          case EqualTo(a: AttributeReference, Literal(v: UTF8String, StringType)) =>
            Seq(a.exprId -> v.toString)
          case EqualTo(Literal(v: UTF8String, StringType), a: AttributeReference) =>
            Seq(a.exprId -> v.toString)
          case EqualNullSafe(a: AttributeReference, Literal(v: UTF8String, StringType)) =>
            Seq(a.exprId -> v.toString)
          case In(a: AttributeReference, ls) =>
            ls.collect { case Literal(v: UTF8String, StringType) =>
              a.exprId -> v.toString }
          case _ => Nil
        }
    }.flatten.groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).toSet }
  }

  /** Attributes used as EQUI-JOIN keys anywhere in the plan. The string
    * point-mass calibration must not rewrite these columns' NDV: a
    * lowered distinct count feeds the SAME query's join-cardinality
    * estimate (output rows scale with 1/max(ndv)), so a hot-key filter
    * beside a join on the same column would inflate the join estimate by
    * the skew factor and can mis-reorder joins — the equality-
    * selectivity fix is worth less than a join-order regression. */
  private def collectJoinKeys(plan: LogicalPlan)
      : Set[org.apache.spark.sql.catalyst.expressions.ExprId] = {
    import org.apache.spark.sql.catalyst.expressions._
    plan.collect {
      case j: org.apache.spark.sql.catalyst.plans.logical.Join =>
        j.condition.toSeq.flatMap(splitConjunctivePredicates).flatMap {
          case EqualTo(l, r) => (l.references ++ r.references).map(_.exprId)
          case EqualNullSafe(l, r) => (l.references ++ r.references).map(_.exprId)
          case _ => Nil
        }
    }.flatten.toSet
  }

  /** Column min/max for CBO filter-selectivity estimation, folded from
    * the manifest's zone maps (driver-cheap inline manifests only, same
    * discipline as the row count). Numerics, decimals and temporals —
    * each round-trips `CatalogColumnStat`'s external string form exactly
    * (`java.sql.Date`/`Timestamp` print the form `fromExternalString`
    * parses, and time IS the skew column of a log lake, so temporal
    * histograms matter most). Strings stay excluded: zone maps prune
    * them at scan time anyway, and the external encoding is lossy. */
  private def columnStats(r: GraftRelation, lr: LogicalRelation,
      eqLits: Map[org.apache.spark.sql.catalyst.expressions.ExprId, Set[String]],
      joinKeys: Set[org.apache.spark.sql.catalyst.expressions.ExprId] = Set.empty)
      : Map[String, org.apache.spark.sql.catalyst.catalog.CatalogColumnStat] = {
    import org.apache.spark.sql.catalyst.catalog.CatalogColumnStat
    import org.apache.spark.sql.types._
    // column stats only feed CBO estimation — don't pay the per-column
    // fold on sessions that run with CBO off (the default)
    if (!conf.cboEnabled) return Map.empty
    r.statsColumnsCheap.flatMap { c =>
      lr.schema.find(_.name == c).flatMap { f => f.dataType match {
        case ByteType | ShortType | IntegerType | LongType
            | FloatType | DoubleType | _: DecimalType
            | DateType | TimestampType =>
          // NDV from the merged per-file KMV sketches: the estimate that
          // lets join reorder tell a near-unique key from a 5-value key
          val ndv = r.metaNdvCheap(c)
          val hist = histogramOf(r, c, ndv)
          r.metaMinMaxCheap(c).map { case (mn, mx) =>
            c -> CatalogColumnStat(distinctCount = ndv.map(BigInt(_)),
              min = Some(extString(mn)), max = Some(extString(mx)),
              histogram = hist)
          }.orElse(ndv.map(n =>
            c -> CatalogColumnStat(distinctCount = Some(BigInt(n)),
              histogram = hist)))
        case StringType =>
          // STRING columns (a text corpus's skew columns: domain, lang):
          // CatalogColumnStat has no string histogram, so equality
          // selectivity is 1/NDV — under 90% skew that is off by the
          // skew factor. When the QUERY tests an equality literal whose
          // zone-map point-mass frequency floor is known (range-clustered
          // tables: single-value files carry the hot key's mass), fold
          // the frequency into an EFFECTIVE distinct count
          // (⌈1/freq⌉ ≤ NDV), so 1/ndv lands near the literal's true
          // selectivity. Unclustered tables and untested columns keep
          // the honest sketch NDV — never a guess. Columns that are ALSO
          // equi-join keys in this plan keep it too ([[collectJoinKeys]]:
          // the rewritten NDV would corrupt the join-cardinality
          // estimate on the same column).
          val ndv = r.metaNdvCheap(c)
          val attr = lr.output.find(_.name == c)
          val lits = attr.map(_.exprId)
            .filterNot(joinKeys.contains)
            .flatMap(eqLits.get).getOrElse(Set.empty)
          val freq = lits.iterator.flatMap(v => r.metaPointFreqCheap(c, v))
            .reduceOption(_ max _)
          val effective = freq.filter(_ > 0).map(fr =>
            math.max(1L, math.round(1.0 / fr)))
            .map(e => ndv.fold(e)(n => math.min(n, e)))
            .orElse(ndv)
          effective.map(n =>
            c -> CatalogColumnStat(distinctCount = Some(BigInt(n))))
        case _ => None
      }}
    }.toMap
  }

  /** Stats extremes in `CatalogColumnStat.fromExternalString`'s expected
    * encoding. Timestamps MUST format at UTC with the exact pattern the
    * version-2 parser uses (`yyyy-MM-dd HH:mm:ss.SSSSSS` over internal
    * micros) — `java.sql.Timestamp.toString` renders JVM-local
    * wall-clock, which on a non-UTC driver shifts min/max by the zone
    * offset and disagrees with the histogram bins (built from true UTC
    * micros). Everything else round-trips through `toString`. */
  private def extString(a: Any): String = a match {
    case t: java.sql.Timestamp =>
      org.apache.spark.sql.catalyst.util.TimestampFormatter(
          format = "yyyy-MM-dd HH:mm:ss.SSSSSS",
          zoneId = java.time.ZoneOffset.UTC, isParsing = false)
        .format(org.apache.spark.sql.catalyst.util.DateTimeUtils
          .fromJavaTimestamp(t))
    case t: java.time.Instant =>
      org.apache.spark.sql.catalyst.util.TimestampFormatter(
          format = "yyyy-MM-dd HH:mm:ss.SSSSSS",
          zoneId = java.time.ZoneOffset.UTC, isParsing = false)
        .format(org.apache.spark.sql.catalyst.util.DateTimeUtils
          .instantToMicros(t))
    case other => other.toString
  }

  /** Equi-height histogram for CBO filter/join selectivity under skew,
    * folded DRIVER-CHEAP from the manifest's per-file zone maps + row
    * counts — no data scan, no job (`spark.sql.statistics.histogram
    * .enabled` gates it, like ANALYZE's own histograms). Each file
    * contributes its non-null rows spread uniformly over its [min, max];
    * the resulting piecewise density cuts into `histogramNumBins`
    * equal-mass bins. Fidelity therefore FOLLOWS CLUSTERING: a
    * range-clustered/Z-ordered table (graft's write-distribution and
    * OPTIMIZE default) yields bins that hug the true mass — exactly the
    * skew signal FilterEstimation and join estimation consume — while an
    * unclustered table degrades toward the uniform estimate CBO would
    * use anyway, never to a wrong one. Per-bin NDV scales the sketch NDV
    * by value-width (clamped to the bin's mass). */
  private def histogramOf(r: GraftRelation, c: String, ndv: Option[Long])
      : Option[org.apache.spark.sql.catalyst.plans.logical.Histogram] = {
    import org.apache.spark.sql.catalyst.plans.logical.{Histogram, HistogramBin}
    if (!conf.histogramEnabled) return None
    // temporals map onto Spark's INTERNAL epoch doubles (days / micros) —
    // the exact axis FilterEstimation converts temporal literals to, so
    // the bins line up with the predicate being estimated
    import org.apache.spark.sql.catalyst.util.DateTimeUtils
    def toD(a: Any): Option[Double] = a match {
      case t: java.sql.Timestamp =>
        Some(DateTimeUtils.fromJavaTimestamp(t).toDouble)
      case t: java.time.Instant =>
        Some(DateTimeUtils.instantToMicros(t).toDouble)
      case d: java.sql.Date => Some(DateTimeUtils.fromJavaDate(d).toDouble)
      case d: java.time.LocalDate => Some(d.toEpochDay.toDouble)
      case n: java.lang.Number => Some(n.doubleValue())
      case d: scala.math.BigDecimal => Some(d.toDouble)
      case _ => None
    }
    val segs = r.metaFileRangesCheap(c).getOrElse(return None)
      .flatMap { case (mn, mx, n) =>
        for (lo <- toD(mn); hi <- toD(mx)) yield (lo, hi, n.toDouble) }
    if (segs.isEmpty) return None
    val total = segs.map(_._3).sum
    if (total <= 0) return None
    // elementary intervals between all endpoints; point masses at lo==hi
    val pts = segs.flatMap(s => Seq(s._1, s._2)).distinct.sorted.toIndexedSeq
    val idx = pts.zipWithIndex.toMap
    val pointMass = new Array[Double](pts.length)
    val intMass = new Array[Double](math.max(0, pts.length - 1))
    segs.foreach { case (lo, hi, n) =>
      if (hi == lo) pointMass(idx(lo)) += n
      else {
        val w = hi - lo
        var i = idx(lo)
        while (i < intMass.length && pts(i) < hi) {
          intMass(i) += n * (pts(i + 1) - pts(i)) / w; i += 1
        }
      }
    }
    val nBins = math.max(1, math.min(conf.histogramNumBins,
      // no more bins than the structure can support — each bin boundary
      // must be a distinct double
      math.max(1, (pts.length - 1) * 4)))
    val height = total / nBins
    val width = pts.last - pts.head
    def binNdv(lo: Double, hi: Double, mass: Double): Long = {
      val byWidth = ndv.map(n => if (width > 0) n * (hi - lo) / width else n.toDouble)
        .getOrElse(mass)
      math.max(1L, math.min(mass.round, byWidth.round))
    }
    val bins = scala.collection.mutable.ArrayBuffer[HistogramBin]()
    var cum = 0.0          // mass emitted into CLOSED bins
    var binLo = pts.head
    var target = height
    def emitUpTo(cut: Double, cumNow: Double): Unit = {
      bins += HistogramBin(binLo, cut, binNdv(binLo, cut, cumNow - cum))
      cum = cumNow; binLo = cut; target += height
    }
    var acc = 0.0          // running mass including the open bin
    var i = 0
    while (i < pts.length) {
      // point masses are atomic: a cut never splits one — a heavy hitter
      // emits REPEATED same-point bins, the standard equi-height encoding
      acc += pointMass(i)
      while (acc >= target - 1e-9 && bins.length < nBins - 1)
        emitUpTo(pts(i), acc)
      if (i < intMass.length && intMass(i) > 0) {
        val a = pts(i); val b = pts(i + 1); val m = intMass(i)
        // uniform density inside an elementary interval: the position of
        // cumulative mass T is a + (T - massBefore) / m * (b - a)
        while (acc + m >= target - 1e-9 && bins.length < nBins - 1) {
          val cut = a + (target - acc) / m * (b - a)
          emitUpTo(math.min(math.max(cut, a), b), target)
        }
        acc += m
      }
      i += 1
    }
    bins += HistogramBin(binLo, pts.last, binNdv(binLo, pts.last, total - cum))
    Some(Histogram(total / bins.length, bins.toArray))
  }

  /** Minimal catalog entry for a PATH-based graft read (`spark.read
    * .format("graft").load(p)` has no catalog table to hang stats on).
    * Consulted by `computeStats` alone in the optimizer — identifier is
    * synthetic by construction and never resolves through the catalog. */
  private def synthetic(r: GraftRelation): CatalogTable = CatalogTable(
    identifier = TableIdentifier(
      s"graft_stats_${Integer.toHexString(r.tablePath.hashCode)}"),
    tableType = CatalogTableType.EXTERNAL,
    storage = CatalogStorageFormat.empty.copy(
      locationUri = Some(new org.apache.hadoop.fs.Path(r.tablePath).toUri),
      properties = Map("path" -> r.tablePath)),
    schema = r.schema,
    provider = Some("graft"))
}
