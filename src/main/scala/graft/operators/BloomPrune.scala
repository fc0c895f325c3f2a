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
    *
    * Key typing mirrors Spark's `stat.bloomFilter`: integral keys hash via
    * `putLong`, strings via their UTF-8 bytes — the probe MUST use the
    * matching family or every lookup would miss, so anything else is
    * rejected up front rather than silently returning an empty/failed join.
    */
  def prune(probe: DataFrame, probeKey: Column, build: DataFrame, buildKey: String,
            expectedKeys: Long, fpp: Double = 0.01): DataFrame = {
    val bf: BloomFilter = build.stat.bloomFilter(buildKey, expectedKeys, fpp)
    val bcast = probe.sparkSession.sparkContext.broadcast(bf)
    import org.apache.spark.sql.types._
    val might = probe.select(probeKey).schema.head.dataType match {
      case ByteType | ShortType | IntegerType | LongType =>
        udf((k: java.lang.Long) => k != null && bcast.value.mightContainLong(k))
          .withName("bloom_might_contain")
          .apply(probeKey.cast(LongType))
      case StringType =>
        udf((k: String) => k != null && bcast.value.mightContainString(k))
          .withName("bloom_might_contain")
          .apply(probeKey)
      case other => sys.error(
        s"BloomPrune supports integral or string keys, got $other for $probeKey")
    }
    probe.filter(might)
  }
}
