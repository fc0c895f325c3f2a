package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join: for every left row, attach the right row with the greatest
  * `rightTs` ≤ `leftTs` within the same key (left-outer semantics — no
  * match ⇒ null payload). The classic time-series enrichment operator that
  * plain SQL joins can't express without a quadratic range join.
  *
  * Implementation is the union+window plan, composed entirely from
  * built-ins (preference (a) of the custom-operator ladder — no custom
  * SparkPlan needed because the optimal physical shape IS expressible):
  * tag both sides, union, one hash-partition shuffle on the key, one sort
  * by (ts, side), then `last(payload, ignoreNulls)` over the running frame.
  * Cost ≡ a sort-merge join's shuffle+sort, with no pair enumeration —
  * exactly what a bespoke AsOfJoinExec would do, but AQE/codegen-aware for
  * free. Ties (left.ts == right.ts) match the right row, per standard
  * as-of (≥) semantics: the right copy sorts before the left copy at equal
  * timestamps.
  */
object AsOfJoin {
  def apply(left: DataFrame, right: DataFrame, keys: Seq[String],
            leftTs: String, rightTs: String,
            payload: Seq[(String, String)], // (right column, output alias)
            leftTie: String, rightTie: String): DataFrame = {
    val keyCols = keys.map(col)
    val payloadStruct = struct(payload.map { case (c, a) => col(c).as(a) }: _*)

    val lTagged = left.select(
      (keyCols :+ col(leftTs).as("__t") :+ lit(0).as("__is_r") :+
        col(leftTie).as("__tie") :+ struct(col("*")).as("__l") :+
        lit(null).cast(right.select(payloadStruct).schema.head.dataType).as("__r")): _*)
    val rTagged = right.select(
      (keyCols :+ col(rightTs).as("__t") :+ lit(1).as("__is_r") :+
        col(rightTie).as("__tie") :+
        lit(null).cast(left.select(struct(col("*"))).schema.head.dataType).as("__l") :+
        payloadStruct.as("__r")): _*)

    // right rows sort BEFORE left rows at equal __t (as-of ≥ includes ties)
    val w = Window.partitionBy(keyCols: _*)
      .orderBy(col("__t").asc, col("__is_r").desc, col("__tie").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val matched = lTagged.unionByName(rTagged)
      .withColumn("__match", last(col("__r"), ignoreNulls = true).over(w))
      .filter(col("__is_r") === 0)

    val leftCols = left.columns.map(c => col(s"__l.$c").as(c))
    val payloadCols = payload.map { case (_, a) => col(s"__match.$a").as(a) }
    matched.select((leftCols ++ payloadCols): _*)
  }
}
