package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.util.sketch.BloomFilter

/** Runtime-filter join pruning: build a Bloom filter over the (selective)
  * build side's join keys, broadcast it, and drop probe-side rows that
  * cannot match BEFORE the join's shuffle. The subsequent real join removes
  * the filter's false positives, so the composed result is exactly the plain
  * join — only cheaper.
  *
  * This is the explicit form of the engine-level runtime row filter: at
  * 100 TB the win is that the fact table's non-matching rows (often >90%
  * after a selective dim predicate) never enter the exchange. The filter
  * itself is O(bits) ~ a few MiB for 10⁷ keys at 1% fpp, built with one
  * distributed aggregation over the build side.
  *
  * The membership probe is a closure over the broadcast sketch (Spark keeps
  * `bloom_filter_agg`/`might_contain` internal); it sits behind the
  * pushed-down scan filters and prunes rows before they are ever shuffled.
  */
object BloomPrune {

  /** `probe ⋈ build` (inner, equi on `probeKey = buildKey`) with a Bloom
    * pre-filter on the probe side. Result ≡ the plain inner join.
    */
  def join(probe: DataFrame, probeKey: String, build: DataFrame, buildKey: String,
           expectedKeys: Long, fpp: Double = 0.01): DataFrame = {
    val pruned = prune(probe, col(probeKey), build, buildKey, expectedKeys, fpp)
    pruned.join(build, col(probeKey) === col(buildKey))
  }

  /** Just the pruning step: keep probe rows whose key might be in the build
    * side's key set (plus nothing else — no join). Useful to cut a fact
    * table down before several downstream uses.
    */
  def prune(probe: DataFrame, probeKey: Column, build: DataFrame, buildKey: String,
            expectedKeys: Long, fpp: Double = 0.01): DataFrame = {
    val bf: BloomFilter = build.stat.bloomFilter(buildKey, expectedKeys, fpp)
    val bcast = probe.sparkSession.sparkContext.broadcast(bf)
    val might = udf((k: java.lang.Long) => k != null && bcast.value.mightContainLong(k))
      .withName("bloom_might_contain")
    probe.filter(might(probeKey))
  }
}
