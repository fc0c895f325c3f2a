package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation operators for hot keys (the 100 TB failure mode AQE
  * doesn't always catch: one key holding 1% of a 100 TB fact melts a single
  * reducer).
  *
  *  - `saltedAggregate`: two-phase aggregation — partial aggregate on
  *    (key, salt) spreads a hot key over `salts` reducers, final aggregate
  *    on key merges the partials. Works for any algebraic aggregate
  *    (sum/count/min/max — pass the merge form for the final phase).
  *  - `saltedBroadcastJoin`: replicate the SMALL side `salts` times with an
  *    explicit salt column and salt the big side randomly-but-deterministically
  *    (hash of a unique column), so a hot join key fans across reducers.
  *    Only needed when the small side is too big to broadcast outright AND
  *    keys are skewed; with a broadcastable dim, `FactEnrich` already
  *    avoids the problem entirely.
  *
  * Salting is deterministic here (hash-mod of a tie column, not rand()) so
  * results stay reproducible run-to-run.
  */
object Skew {

  /** Deterministic salt in [0, salts) from an arbitrary unique column. */
  def saltOf(unique: Column, salts: Int): Column = pmod(xxhash64(unique), lit(salts))

  /** Two-phase (salted) aggregation.
    * @param partialAggs aggregates for phase 1 over (keys, salt)
    * @param mergeAggs   merge aggregates for phase 2 over keys
    *                    (e.g. phase-1 `count(*) as n` merges as `sum(n) as n`)
    */
  def saltedAggregate(df: DataFrame, keys: Seq[String], saltCol: Column, salts: Int,
                      partialAggs: Seq[Column], mergeAggs: Seq[Column]): DataFrame = {
    val phase1 = df.withColumn("__salt", pmod(xxhash64(saltCol), lit(salts)))
      .groupBy((keys.map(col) :+ col("__salt")): _*)
      .agg(partialAggs.head, partialAggs.tail: _*)
    phase1.groupBy(keys.map(col): _*).agg(mergeAggs.head, mergeAggs.tail: _*)
  }

  /** Salted join of a skewed big side against a small (but not
    * broadcast-hint-small) dimension: the dim is exploded `salts`× so every
    * (key, salt) bucket of the big side finds its copy.
    */
  def saltedJoin(big: DataFrame, small: DataFrame, keys: Seq[String],
                 bigTieCol: Column, salts: Int, joinType: String = "inner"): DataFrame = {
    val saltedBig = big.withColumn("__salt", saltOf(bigTieCol, salts))
    val saltedSmall = small.withColumn("__salt",
      explode(sequence(lit(0L), lit(salts.toLong - 1))))
    saltedBig.join(saltedSmall, keys :+ "__salt", joinType).drop("__salt")
  }
}
