package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton) curve for multi-column file clustering: interleaving the
  * bits of two keys gives a single sort key under which any contiguous file
  * of rows covers a compact range in BOTH dimensions — so zone maps
  * ([[graft.sources.ManifestTable.readRange]]) prune on either column, the
  * trick single-column sorting can only offer for its leading column. This
  * is the OPTIMIZE ZORDER BY mechanism of the big table formats, as a pure
  * codegen'd column expression (shifts/masks, no UDF).
  */
object ZOrder {

  /** Morton-interleave the low `bitsPerCol` bits of N NON-NEGATIVE longs:
    * bit i of column j lands at position i·N + j (round-robin by bit
    * significance, so every column contributes equally to every curve
    * level). The budget N · bitsPerCol must stay ≤ 63 to keep the result a
    * positive long; values beyond the per-column budget cluster by their
    * low bits only (still valid, just less selective — widen `bitsPerCol`
    * or pre-quantize instead). Pure shifts/masks — stays inside
    * whole-stage codegen, no UDF.
    */
  def interleaveN(cols: Seq[Column], bitsPerCol: Int): Column = {
    val n = cols.length
    require(n >= 2, s"interleaveN needs >= 2 columns, got $n")
    require(bitsPerCol >= 1 && n * bitsPerCol <= 63,
      s"bit budget out of range: $n cols x $bitsPerCol bits")
    (for { i <- 0 until bitsPerCol; (c, j) <- cols.zipWithIndex } yield
      shiftleft(shiftright(c, i).bitwiseAND(lit(1L)), i * n + j)
    ).reduce(_ bitwiseOR _)
  }

  /** Per-column bit width that fills the positive-long budget for `n`
    * columns (21 for 2, 21 for 3, 15 for 4...). */
  def defaultBits(n: Int): Int = math.min(21, 63 / n)

  /** Two-column Morton code (bit i of `x` at 2i, of `y` at 2i+1) — the
    * N=2 instance of [[interleaveN]], kept as the common case's API. */
  def interleave2(x: Column, y: Column, bitsPerCol: Int = 21): Column =
    interleaveN(Seq(x, y), bitsPerCol)

  /** Range-repartition `df` into `numFiles` output partitions along the
    * Morton curve of `cols` — write the result to a stats-carrying table
    * and range predicates on ANY of the columns skip files. 3-4 columns is
    * the practical lakehouse sweet spot: selectivity per column decays as
    * 2^(bitsPerFile/N), so past ~4 columns each dimension's pruning power
    * thins faster than another sort key is worth.
    */
  def clusterByN(df: DataFrame, cols: Seq[String], numFiles: Int,
                 bitsPerCol: Int = 0): DataFrame = {
    val bits = if (bitsPerCol > 0) bitsPerCol else defaultBits(cols.length)
    df.withColumn("_z", interleaveN(cols.map(col), bits))
      .repartitionByRange(numFiles, col("_z"))
      .drop("_z")
  }

  /** Two-column clustering — the N=2 instance of [[clusterByN]]. */
  def clusterBy2(df: DataFrame, xCol: String, yCol: String, numFiles: Int,
                 bitsPerCol: Int = 21): DataFrame =
    clusterByN(df, Seq(xCol, yCol), numFiles, bitsPerCol)

  /** The same N-column interleave as engine-portable SQL (oracle parity). */
  def interleaveSqlN(cols: Seq[String], bitsPerCol: Int): String = {
    val n = cols.length
    (for { i <- 0 until bitsPerCol; (c, j) <- cols.zipWithIndex } yield
      s"((($c >> $i) & 1) << ${i * n + j})"
    ).mkString("(", " | ", ")")
  }

  /** The two-column interleave as DuckDB SQL (for oracle parity checks). */
  def interleaveSql(x: String, y: String, bitsPerCol: Int = 21): String =
    interleaveSqlN(Seq(x, y), bitsPerCol)
}
