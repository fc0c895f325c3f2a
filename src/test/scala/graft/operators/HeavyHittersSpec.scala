package graft.operators

import graft.SparkSpec
import graft.sources.Tables
import org.apache.spark.sql.functions._

class HeavyHittersSpec extends SparkSpec {
  import spark.implicits._

  test("topTerms equals the exact full aggregation on the fixture corpus") {
    val docs = Tables.documents(spark, sf)
    val got = HeavyHitters.topTerms(spark, docs, "text", k = 10)
      .as[(String, Long, Int)].collect().toSeq
    val exact = docs
      .select(explode(graft.functions.TextFunctions.tokens(col("text"))).as("term"))
      .groupBy("term").count()
      .orderBy(col("count").desc, col("term")).limit(10)
      .as[(String, Long)].collect().toSeq
      .zipWithIndex.map { case ((t, n), i) => (t, n, i + 1) }
    assert(got === exact)
  }

  test("topTerms stays exact when the certificate fails (near-uniform terms)") {
    // 60 distinct terms, all count 5, sketch width 8 → N/w = 37 > every
    // count: nothing certifies, the fallback full aggregation must kick in
    val docs = (0 until 60).map(i => (i.toLong, Seq.fill(5)(f"t$i%02d").mkString(" ")))
      .toDF("doc_id", "text")
    val got = HeavyHitters.topTerms(spark, docs, "text", k = 3, width = 8)
      .as[(String, Long, Int)].collect().toSeq
    // ties broken by term ascending
    assert(got === Seq(("t00", 5L, 1), ("t01", 5L, 2), ("t02", 5L, 3)))
  }

  test("Misra-Gries keeps every term with count > N/width under any merge order") {
    val mg = new HeavyHitters.MisraGries(4)
    // N=30: 'a'x12, 'b'x9, noise x9 distinct → threshold N/w = 7.5; a and b
    // must survive any (reduce | split+merge) evaluation order
    val stream = Seq.fill(12)("a") ++ Seq.fill(9)("b") ++
      (1 to 9).map(i => s"n$i")
    val shuffled = new scala.util.Random(42).shuffle(stream)
    val whole = shuffled.foldLeft(mg.zero)(mg.reduce)
    assert(whole.contains("a") && whole.contains("b"))
    for (cut <- Seq(5, 15, 25)) {
      val (l, r) = shuffled.splitAt(cut)
      val merged = mg.merge(l.foldLeft(mg.zero)(mg.reduce), r.foldLeft(mg.zero)(mg.reduce))
      assert(merged.size <= 4, s"width exceeded: $merged")
      assert(merged.contains("a") && merged.contains("b"),
        s"heavy terms lost at split $cut: $merged")
    }
  }
}
