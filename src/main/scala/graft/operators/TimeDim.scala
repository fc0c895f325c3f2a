package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Time-dimension derivation (reference F1-F8 + the `time` table,
  * `etl.py:173-178, 209-211`).
  *
  * The reference's ONLY UDF is a Python row-at-a-time lambda formatting
  * epoch-millis to a string that is then cast back to timestamp
  * (`etl.py:173-177`) — a `BatchEvalPython` node that breaks whole-stage
  * codegen and round-trips every row through a Python worker. Here the whole
  * derivation is native Catalyst expressions: one codegen'd projection, no
  * shuffle, no process boundary.
  *
  * Columns emitted follow README.md:41 (full set incl. `weekday`, which the
  * reference's code forgot — SURVEY §7.4.5), lowercase names.
  */
object TimeDim {

  /** Epoch-millis long → event timestamp (replaces UDF F1 at `etl.py:173`). */
  def fromEpochMillis(c: Column): Column = timestamp_millis(c)

  def columns(ts: Column): Seq[(String, Column)] = Seq(
    "hour" -> hour(ts),
    "day" -> dayofmonth(ts),
    "week" -> weekofyear(ts),
    "month" -> month(ts),
    "year" -> year(ts),
    "weekday" -> weekday(ts)) // 0 = Monday, matches DuckDB isodow(ts)-1

  /** Distinct time dimension from a timestamp column (the `time` table shape,
    * `etl.py:209-211`): one row per distinct timestamp with derived parts.
    * A single hash-aggregate shuffle on `start_time`.
    */
  def apply(df: DataFrame, tsCol: String): DataFrame = {
    val ts = col(tsCol)
    val derived = columns(ts).map { case (n, c) => c.as(n) }
    df.select((ts.as("start_time") +: derived): _*).distinct()
  }
}
