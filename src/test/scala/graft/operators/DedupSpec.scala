package graft.operators

import graft.SparkSpec
import graft.sources.Tables
import org.apache.spark.sql.functions._

class DedupSpec extends SparkSpec {
  import spark.implicits._

  test("exact dedup restores the original row set") {
    val li = Tables.lineitem(spark, sf)
    assert(Dedup.exact(li.unionAll(li)).count() === li.count())
  }

  test("fingerprint groups collapse token permutations") {
    val docs = Seq(
      (1L, "alpha beta gamma"),
      (2L, "gamma beta alpha"), // permutation of 1 → same fingerprint
      (3L, "delta epsilon")
    ).toDF("doc_id", "text")
    val out = Dedup.fingerprintGroups(docs, "doc_id", "text").collect()
    assert(out.length === 2)
    val permGroup = out.find(_.getAs[Long]("n_docs") == 2L).get
    assert(permGroup.getAs[Long]("keep_id") === 1L)
  }

  test("jaccardPairs finds planted near-dups and nothing else (fixtures)") {
    val pairs = Dedup.jaccardPairs(Tables.documents(spark, sf), "doc_id", "text")
    val js = pairs.select("jaccard").as[Double].collect()
    assert(js.nonEmpty, "fixtures contain planted near-dup pairs")
    assert(js.forall(_ >= 0.7))
  }

  test("minhash LSH pairs equal exact jaccard pairs on fixtures") {
    val docs = Tables.documents(spark, sf)
    val exact = Dedup.jaccardPairs(docs, "doc_id", "text")
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    val lsh = Dedup.minhashLshPairs(docs, "doc_id", "text")
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(lsh === exact)
    // the registered q_dedup_jaccard configuration (32 bands × 4 rows)
    val lsh128 = Dedup.minhashLshPairs(docs, "doc_id", "text", numHashes = 128, bands = 32)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(lsh128 === exact)
  }

  test("jaccardPairsAgainst equals the cross slice of symmetric jaccardPairs") {
    val docs = Tables.documents(spark, sf)
    val batch = docs.filter(col("doc_id") % 2 === 0)
    val corpus = docs.filter(col("doc_id") % 2 =!= 0)
    val got = Dedup.jaccardPairsAgainst(corpus, batch, "doc_id", "text")
      .select("batch_id", "corpus_id").as[(Long, Long)].collect().toSet
    // symmetric pairs restricted to one-even-one-odd, reoriented batch-first
    val expected = Dedup.jaccardPairs(docs, "doc_id", "text")
      .select("doc_a", "doc_b").as[(Long, Long)].collect()
      .filter { case (a, b) => (a % 2 == 0) != (b % 2 == 0) }
      .map { case (a, b) => if (a % 2 == 0) (a, b) else (b, a) }.toSet
    assert(got === expected)
    assert(got.forall { case (b, c) => b % 2 == 0 && c % 2 != 0 })
  }

  test("pair operators leave no shingle-scale cached blocks behind") {
    val sc = spark.sparkContext
    val before = sc.getPersistentRDDs.keySet

    // exact path: single-pass, caches nothing at all
    Dedup.jaccardPairs(Tables.documents(spark, sf), "doc_id", "text").count()
    assert((sc.getPersistentRDDs.keySet -- before).isEmpty,
      "jaccardPairs must not leave cached RDDs")

    // LSH path: the shingle relation is unpersisted before return; only the
    // (small) localCheckpoint-backed result may remain, and the caller can
    // release it explicitly
    val pairs = Dedup.minhashLshPairs(Tables.documents(spark, sf), "doc_id", "text")
    val n = pairs.count()
    assert(n > 0)
    val residual = sc.getPersistentRDDs.keySet -- before
    assert(residual.size <= 1,
      s"only the checkpointed result may remain cached, saw ${residual.size}")
    Dedup.release(pairs)
    assert((sc.getPersistentRDDs.keySet -- before).isEmpty,
      "after releasing the result no blocks remain")
  }

  test("simhash: near-identical docs get close signatures, distinct docs do not") {
    val base = "the quick brown fox jumps over the lazy dog again and again"
    val docs = Seq(
      (1L, base),
      (2L, base + " extra"), // near-dup of 1
      (3L, "completely different vocabulary entirely unrelated words here")
    ).toDF("doc_id", "text")
    val sig = Dedup.simhashSignatures(docs, "doc_id", "text")
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("simhash")).toMap
    def hamming(a: String, b: String): Int = a.zip(b).count { case (x, y) => x != y }
    assert(sig.values.forall(s => s.length == 64 && s.forall(c => c == '0' || c == '1')))
    assert(hamming(sig(1L), sig(2L)) < hamming(sig(1L), sig(3L)))
    assert(hamming(sig(1L), sig(2L)) <= 8)
  }

  test("simhash is deterministic") {
    val docs = Tables.documents(spark, sf).limit(20)
    val a = Dedup.simhashSignatures(docs, "doc_id", "text").orderBy("doc_id").collect()
    val b = Dedup.simhashSignatures(docs, "doc_id", "text").orderBy("doc_id").collect()
    assert(a === b)
  }

  test("simhashPairs equals brute-force Hamming pairs (pigeonhole exactness)") {
    // deterministic subset (an unordered limit can pick different rows on
    // the two evaluations below)
    val docs = Tables.documents(spark, sf).filter(col("doc_id") < 200)
    val sigs = Dedup.simhashSignatures(docs, "doc_id", "text")
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("simhash"))
    def hamming(a: String, b: String) = a.zip(b).count { case (x, y) => x != y }
    val expected = (for {
      (ia, sa) <- sigs; (ib, sb) <- sigs if ia < ib
      h = hamming(sa, sb) if h <= 3
    } yield (ia, ib, h)).toSet
    val got = Dedup.simhashPairs(docs, "doc_id", "text", maxHamming = 3, bands = 4)
      .as[(Long, Long, Int)].collect().toSet
    assert(got === expected, "banded candidates + verify must equal brute force")
  }

  test("clusters computes transitive closure with canonical minimum-id keeps") {
    // component {1,2,3,4} is a 3-hop CHAIN (1-2, 2-3, 3-4): membership of 4
    // requires propagation, not just one join; {7,9} is a separate pair
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (7L, 9L)).toDF("doc_a", "doc_b")
    val got = Dedup.clusters(pairs)
      .select("doc_id", "cluster_id", "keep").as[(Long, Long, Int)]
      .collect().sortBy(_._1)
    assert(got === Array(
      (1L, 1L, 1), (2L, 1L, 0), (3L, 1L, 0), (4L, 1L, 0),
      (7L, 7L, 1), (9L, 7L, 0)))
  }

  test("clusters is partitioning-invariant and handles an empty pair list") {
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L), (11L, 12L), (12L, 13L))
      .toDF("doc_a", "doc_b")
    val one = Dedup.clusters(pairs.repartition(1)).orderBy("doc_id").collect()
    val many = Dedup.clusters(pairs.repartition(7)).orderBy("doc_id").collect()
    assert(one === many)
    val empty = Dedup.clusters(pairs.filter(col("doc_a") < 0))
    assert(empty.count() === 0)
  }

  test("clusters handles NON-numeric ids (changed-row probe, not the label sum)") {
    // a 4-hop string chain: the decimal-cast sum probe would see null sums
    // every round and either crash (ANSI) or stop after round 1 with 'd'
    // labeled 'b'; the changed-row fallback must propagate to the true min
    val pairs = Seq(("a", "b"), ("b", "c"), ("c", "d"), ("d", "e"), ("x", "y"))
      .toDF("doc_a", "doc_b")
    val got = Dedup.clusters(pairs)
      .select("doc_id", "cluster_id", "keep").as[(String, String, Int)]
      .collect().sortBy(_._1)
    assert(got === Array(
      ("a", "a", 1), ("b", "a", 0), ("c", "a", 0), ("d", "a", 0), ("e", "a", 0),
      ("x", "x", 1), ("y", "x", 0)))
  }

  test("clusters handles FRACTIONAL numeric ids (sub-quantum label moves)") {
    // every id in the chain rounds to the same decimal(38,0) value (2), so
    // the label-sum probe would see an unchanged sum after round 1 and stop
    // with 2.2/2.1 mislabeled; fractional ids must take the changed-row
    // probe and still reach the true minimum
    val pairs = Seq((2.4, 2.3), (2.3, 2.2), (2.2, 2.1), (7.5, 7.4))
      .toDF("doc_a", "doc_b")
    val got = Dedup.clusters(pairs)
      .select("doc_id", "cluster_id", "keep").as[(Double, Double, Int)]
      .collect().sortBy(_._1)
    assert(got === Array(
      (2.1, 2.1, 1), (2.2, 2.1, 0), (2.3, 2.1, 0), (2.4, 2.1, 0),
      (7.4, 7.4, 1), (7.5, 7.4, 0)))
  }

  test("clusters converges on a long chain in O(log diameter) rounds (pointer jumping)") {
    // a 65-hop pairwise-drift chain (template churn): one-hop propagation
    // would need 65 rounds; pointer jumping must finish well under maxIters
    val chain = (100L until 165L).map(i => (i, i + 1)).toDF("doc_a", "doc_b")
    val got = Dedup.clusters(chain).select("doc_id", "cluster_id", "keep")
      .as[(Long, Long, Int)].collect().sortBy(_._1)
    assert(got.length === 66)
    assert(got.forall(_._2 == 100L), "whole chain must collapse to one cluster")
    assert(got.count(_._3 == 1) === 1 && got.head === ((100L, 100L, 1)))
  }

  test("removeDupSpans cuts repeated 3-gram spans, keeping first occurrences") {
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon"),
      // shares "alpha beta gamma" + "beta gamma delta" with doc 1: doc 1 is
      // the first occurrence, so doc 2 loses tokens 2..5 (overlapping spans
      // merge into one cut)
      (2L, "x y alpha beta gamma delta z"),
      // WITHIN-doc repetition: the second "p q r s" goes
      (3L, "p q r s p q r s"),
      (4L, "one two"), // shorter than n: no grams, untouched
      (5L, "")).toDF("doc_id", "text")
    val out = Dedup.removeDupSpans(docs, "doc_id", "text", n = 3)
      .select("doc_id", "clean_text", "n_removed")
      .as[(Long, String, Int)].collect().sortBy(_._1)
    assert(out(0) === ((1L, "alpha beta gamma delta epsilon", 0)))
    assert(out(1) === ((2L, "x y z", 4)))
    assert(out(2) === ((3L, "p q r s", 4)))
    assert(out(3) === ((4L, "one two", 0)))
    assert(out(4) === ((5L, "", 0)))
  }

  test("removeDupSpans minSpanTokens floor keeps short repeats, cuts long runs") {
    val long = "one two three four five six seven eight nine ten"
    val docs = Seq(
      (1L, s"intro $long outro"),
      // repeats doc 1's 10-token run (cut: >= 8) AND a 3-token repeat of
      // its own tail ("intro x y" vs nothing)… the short repeat below
      (2L, s"prefix $long suffix"),
      (3L, "alpha beta gamma filler junk"),
      // repeats only "alpha beta gamma" (3-token span: BELOW the floor)
      (4L, "alpha beta gamma other words here")).toDF("doc_id", "text")

    val gated = Dedup.removeDupSpans(docs, "doc_id", "text", n = 3, minSpanTokens = 8)
      .select("doc_id", "clean_text", "n_removed")
      .as[(Long, String, Int)].collect().sortBy(_._1)
    assert(gated(0)._3 === 0)
    assert(gated(1) === ((2L, "prefix suffix", 10)), "long run must be cut")
    assert(gated(3) === ((4L, "alpha beta gamma other words here", 0)),
      "3-token repeat is below the 8-token floor")

    // ungated (default floor = n): the short repeat goes too
    val ungated = Dedup.removeDupSpans(docs, "doc_id", "text", n = 3)
      .select("doc_id", "n_removed").as[(Long, Int)].collect().sortBy(_._1)
    assert(ungated(3)._2 === 3)
  }

  test("removeDupSpans conserves tokens and is layout-independent (fixtures)") {
    val docs = Tables.documents(spark, sf)
    val out = Dedup.removeDupSpans(docs, "doc_id", "text", n = 3)
    val checked = out
      .join(docs.select(col("doc_id"),
        size(graft.functions.TextFunctions.tokens(col("text"))).as("n_orig")), "doc_id")
      .select(col("doc_id"),
        (size(graft.functions.TextFunctions.tokens(col("clean_text"))) + col("n_removed"))
          .as("accounted"), col("n_orig"))
    assert(checked.filter(col("accounted") =!= col("n_orig")).count() === 0)
    // the cut set is a pure function of content: physical layout cannot matter
    val re = Dedup.removeDupSpans(docs.repartition(7), "doc_id", "text", n = 3)
      .select("doc_id", "n_removed").as[(Long, Int)].collect().sortBy(_._1)
    val base = out.select("doc_id", "n_removed").as[(Long, Int)].collect().sortBy(_._1)
    assert(re.toSeq === base.toSeq)
  }
}
