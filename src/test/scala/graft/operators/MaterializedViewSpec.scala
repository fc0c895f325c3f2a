package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.sources.{ManifestTable, Tables}

class MaterializedViewSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft_mv_$tag").toString

  private def orders: DataFrame =
    Tables.orders(spark, sf).select(col("o_orderkey"), col("o_orderstatus"),
      year(col("o_orderdate")).as("o_year"), col("o_totalprice"))

  /** Full recompute of the view definition over the source's CURRENT state —
    * the correctness yardstick every incremental refresh must land on
    * exactly.
    */
  private def recompute(src: String): Seq[(String, Int, Long, java.math.BigDecimal)] =
    ManifestTable.read(spark, src)
      .groupBy("o_orderstatus", "o_year")
      .agg(count(lit(1)).as("n"),
        sum(col("o_totalprice").cast("decimal(18,2)")).cast("decimal(28,2)")
          .as("sum_o_totalprice"))
      .as[(String, Int, Long, java.math.BigDecimal)].collect().sorted

  private def view(mv: String): Seq[(String, Int, Long, java.math.BigDecimal)] =
    MaterializedView.read(spark, mv)
      .select("o_orderstatus", "o_year", "n", "sum_o_totalprice")
      .as[(String, Int, Long, java.math.BigDecimal)].collect().sorted

  private def refresh(src: String, mv: String): Long =
    MaterializedView.refresh(spark, src, mv,
      keys = Seq("o_orderstatus", "o_year"), sums = Seq("o_totalprice"))

  test("full build, then incremental append / delete / append all land exactly on recompute") {
    val dir = tmp("basic"); val src = s"$dir/src"; val mv = s"$dir/mv"
    ManifestTable.overwrite(spark, src, orders.filter(col("o_orderkey") % 3 === 0),
      statsCols = Seq("o_totalprice"))
    assert(refresh(src, mv) == 1L)
    assert(view(mv) == recompute(src))

    ManifestTable.append(spark, src, orders.filter(col("o_orderkey") % 3 === 1))
    assert(refresh(src, mv) == 2L)
    assert(view(mv) == recompute(src))

    // delete rewrites files: the refresh must fold BOTH the removed and the
    // re-added rows (survivors of rewritten files cancel exactly)
    ManifestTable.delete(spark, src, col("o_totalprice") < 50000.0)
    refresh(src, mv)
    assert(view(mv) == recompute(src))

    ManifestTable.append(spark, src, orders.filter(col("o_orderkey") % 3 === 2))
    refresh(src, mv)
    assert(view(mv) == recompute(src))
  }

  test("min/max maintenance: appends fold, extreme-deleting removes rescan only suspect groups") {
    val dir = tmp("minmax"); val src = s"$dir/src"; val mv = s"$dir/mv"
    def recomputeMM(): Seq[(String, Long, Double, Double)] =
      ManifestTable.read(spark, src).groupBy("o_orderstatus")
        .agg(count(lit(1)).as("n"), min("o_totalprice").as("min_o_totalprice"),
          max("o_totalprice").as("max_o_totalprice"))
        .select(col("o_orderstatus"), col("n"),
          col("min_o_totalprice"), col("max_o_totalprice"))
        .as[(String, Long, Double, Double)].collect().sorted.toSeq
    def viewMM(): Seq[(String, Long, Double, Double)] =
      MaterializedView.read(spark, mv)
        .select(col("o_orderstatus"), col("n"),
          col("min_o_totalprice"), col("max_o_totalprice"))
        .as[(String, Long, Double, Double)].collect().sorted.toSeq
    def refreshMM(): Long = MaterializedView.refresh(spark, src, mv,
      keys = Seq("o_orderstatus"), sums = Nil,
      mins = Seq("o_totalprice"), maxs = Seq("o_totalprice"))
    ManifestTable.overwrite(spark, src, orders.filter(col("o_orderkey") % 3 === 0))
    refreshMM()
    assert(viewMM() === recomputeMM())
    // append-only: min/max fold incrementally (no extreme removed)
    ManifestTable.append(spark, src, orders.filter(col("o_orderkey") % 3 === 1))
    refreshMM()
    assert(viewMM() === recomputeMM())
    // delete every group's MAX tail: the stored extremes are removed, the
    // suspect rescan must find the new per-group maxima
    val cut = ManifestTable.read(spark, src).agg(max("o_totalprice"))
      .as[Double].head() * 0.7
    ManifestTable.delete(spark, src, col("o_totalprice") > cut)
    refreshMM()
    assert(viewMM() === recomputeMM(), "max-deleting delete must rescan")
    // delete strictly INSIDE the range: no extreme tied, no rescan needed,
    // still exact
    ManifestTable.delete(spark, src,
      col("o_totalprice") > cut * 0.4 && col("o_totalprice") < cut * 0.6)
    refreshMM()
    assert(viewMM() === recomputeMM())
    // DV-deleting the single min row of one group (ties included) is seen
    // through the DV-aware CDF and rescans that group
    val minVal = ManifestTable.read(spark, src).agg(min("o_totalprice"))
      .as[Double].head()
    ManifestTable.deleteVectorized(spark, src, col("o_totalprice") === minVal)
    refreshMM()
    assert(viewMM() === recomputeMM(), "DV delete of a group min must rescan")
  }

  test("refresh when already up to date is a no-op (view version unchanged)") {
    val dir = tmp("noop"); val src = s"$dir/src"; val mv = s"$dir/mv"
    ManifestTable.overwrite(spark, src, orders.limit(100))
    refresh(src, mv)
    val v = ManifestTable.currentVersion(spark, mv).get
    assert(refresh(src, mv) == 1L)
    assert(ManifestTable.currentVersion(spark, mv).contains(v))
  }

  test("a refresh skipping several source versions folds them in one delta") {
    val dir = tmp("skip"); val src = s"$dir/src"; val mv = s"$dir/mv"
    ManifestTable.overwrite(spark, src, orders.filter(col("o_orderkey") % 4 === 0))
    refresh(src, mv)
    ManifestTable.append(spark, src, orders.filter(col("o_orderkey") % 4 === 1))
    ManifestTable.append(spark, src, orders.filter(col("o_orderkey") % 4 === 2))
    ManifestTable.delete(spark, src, col("o_orderkey") % 8 === 0)
    assert(refresh(src, mv) == 4L)
    assert(view(mv) == recompute(src))
  }

  test("groups whose count reaches zero drop out of the view") {
    val dir = tmp("drop"); val src = s"$dir/src"; val mv = s"$dir/mv"
    val rows = Seq(("A", 2020, 10.0), ("A", 2020, 20.0), ("B", 2021, 5.0))
      .toDF("o_orderstatus", "o_year", "o_totalprice")
    ManifestTable.overwrite(spark, src, rows)
    refresh(src, mv)
    assert(view(mv).size == 2)
    ManifestTable.delete(spark, src, col("o_orderstatus") === "B")
    refresh(src, mv)
    val v = view(mv)
    assert(v.map(_._1) == Seq("A") && v.head._3 == 2L)
  }

  test("crash between intent marker and view commit resumes the pinned target") {
    val dir = tmp("crash"); val src = s"$dir/src"; val mv = s"$dir/mv"
    ManifestTable.overwrite(spark, src, orders.filter(col("o_orderkey") % 2 === 0))
    refresh(src, mv)
    ManifestTable.append(spark, src, orders.filter(col("o_orderkey") % 2 === 1))

    // simulate the crash window: the intent for view version 2 → source
    // version 2 is durable, but the view commit never happened
    val p = new org.apache.hadoop.fs.Path(s"$mv/_mv_src", f"v${2L}%012d_s${2L}%012d")
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).create(p, false).close()
    // the source moves on before the retry runs
    ManifestTable.append(spark, src,
      Seq(("X", 1999, 1.0)).toDF("o_orderstatus", "o_year", "o_totalprice")
        .select(lit(-1L).as("o_orderkey"), col("o_orderstatus"), col("o_year"),
          col("o_totalprice")))

    // one refresh call replays the pinned v2 delta, then catches up to v3
    assert(refresh(src, mv) == 3L)
    assert(view(mv) == recompute(src))
    // exactly-once: the % 2 === 1 rows were not double-applied
    assert(view(mv).map(_._3).sum == ManifestTable.read(spark, src).count())
  }

  test("a view not built by refresh, or a drifted definition, fails loudly") {
    val dir = tmp("guard"); val src = s"$dir/src"; val mv = s"$dir/mv"
    ManifestTable.overwrite(spark, src, orders.limit(50))
    ManifestTable.overwrite(spark, mv, orders.limit(5)) // no watermark marker
    val e = intercept[RuntimeException](refresh(src, mv))
    assert(e.getMessage.contains("watermark"))

    val mv2 = s"$dir/mv2"
    refresh(src, mv2)
    ManifestTable.append(spark, src, orders.limit(10))
    val e2 = intercept[IllegalArgumentException](
      MaterializedView.refresh(spark, src, mv2,
        keys = Seq("o_orderstatus"), sums = Seq("o_totalprice")))
    assert(e2.getMessage.contains("refresh"))
  }

  test("incremental refresh reads only the delta files, never the full source") {
    val dir = tmp("prune"); val src = s"$dir/src"; val mv = s"$dir/mv"
    ManifestTable.overwrite(spark, src, orders.filter(col("o_orderkey") % 2 === 0))
    refresh(src, mv)
    ManifestTable.append(spark, src, orders.filter(col("o_orderkey") % 2 === 1))
    val before = ManifestTable.readVersion(spark, src, 1L).inputFiles.toSet
    val delta = ManifestTable.readVersionDelta(spark, src, 1L, 2L)
    // the delta scan's input files are exactly the version-2 additions
    assert(delta.inputFiles.nonEmpty && delta.inputFiles.forall(!before.contains(_)))
    assert(delta.count() ==
      orders.filter(col("o_orderkey") % 2 === 1).count())
    // and the removed side of a pure append is empty
    assert(ManifestTable.readVersionRemoved(spark, src, 1L, 2L).isEmpty)
  }
}
