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

  /** Morton-interleave the low `bitsPerCol` bits of two NON-NEGATIVE longs:
    * bit i of `x` lands at position 2i, bit i of `y` at 2i+1. 21 bits each
    * keeps the result inside a positive long with room to spare; values
    * beyond the bit budget cluster by their low bits only (still valid,
    * just less selective — widen `bitsPerCol` instead).
    */
  def interleave2(x: Column, y: Column, bitsPerCol: Int = 21): Column = {
    require(bitsPerCol >= 1 && bitsPerCol <= 31, s"bitsPerCol out of range: $bitsPerCol")
    (0 until bitsPerCol).map { i =>
      shiftleft(shiftright(x, i).bitwiseAND(lit(1L)), 2 * i)
        .bitwiseOR(shiftleft(shiftright(y, i).bitwiseAND(lit(1L)), 2 * i + 1))
    }.reduce(_ bitwiseOR _)
  }

  /** Range-repartition `df` into `numFiles` output partitions along the
    * Morton curve of (`xCol`, `yCol`) — write the result to a stats-carrying
    * table and range predicates on EITHER column skip files.
    */
  def clusterBy2(df: DataFrame, xCol: String, yCol: String, numFiles: Int,
                 bitsPerCol: Int = 21): DataFrame =
    df.withColumn("_z", interleave2(col(xCol), col(yCol), bitsPerCol))
      .repartitionByRange(numFiles, col("_z"))
      .drop("_z")

  /** The same interleave as DuckDB SQL (for oracle parity checks). */
  def interleaveSql(x: String, y: String, bitsPerCol: Int = 21): String =
    (0 until bitsPerCol).map { i =>
      s"(((($x >> $i) & 1) << ${2 * i}) | ((($y >> $i) & 1) << ${2 * i + 1}))"
    }.mkString("(", " | ", ")")
}
