package graft.operators

import graft.SparkSpec

class FuzzyJoinSpec extends SparkSpec {
  import spark.implicits._

  test("selfPairs finds substitutions, inserts, deletes, exact dups; rejects dist 2") {
    val df = Seq(
      (1L, "abc"),
      (2L, "abd"),   // substitution of 1
      (3L, "abcd"),  // insertion on 1
      (4L, "ab"),    // deletion of 1
      (5L, "abc"),   // exact duplicate of 1
      (6L, "xyz"),   // unrelated
      (7L, "xab"),
      (8L, "aby"))   // dist("xab","aby") = 2 but they SHARE variant "ab"
      .toDF("id", "name")
    val got = FuzzyJoin.selfPairs(df, "id", "name")
      .select("id_a", "id_b", "dist").as[(Long, Long, Int)].collect().toSet
    assert(got.contains((1L, 2L, 1)))
    assert(got.contains((1L, 3L, 1)))
    assert(got.contains((1L, 4L, 1)))
    assert(got.contains((1L, 5L, 0)))
    // the distance-2 candidate pair admitted by the shared variant must be
    // filtered by the levenshtein verify
    assert(!got.exists(p => p._1 == 7L && p._2 == 8L))
    assert(!got.exists(p => p._1 == 6L || p._2 == 6L))
  }

  test("selfPairs equals brute force on the customer fixture") {
    val names = spark.read.parquet(s"$sf/customer.parquet")
      .select("c_custkey", "c_name").as[(Long, String)].collect()
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
        if (i == 0) j else if (j == 0) i else 0
      }
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    val expected = (for {
      (ia, sa) <- names; (ib, sb) <- names
      if ia < ib && lev(sa, sb) <= 1
    } yield (ia, ib, lev(sa, sb))).toSet
    val got = FuzzyJoin.selfPairs(
      spark.read.parquet(s"$sf/customer.parquet").select("c_custkey", "c_name"),
      "c_custkey", "c_name")
      .select("id_a", "id_b", "dist").as[(Long, Long, Int)].collect().toSet
    assert(expected.nonEmpty && got === expected)
  }
}
