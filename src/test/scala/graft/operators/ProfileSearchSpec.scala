package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ProfileSearchSpec extends SparkSpec {
  import spark.implicits._

  test("Profile.numeric reports rows, nulls, distincts, extremes, and exact means per column") {
    val df = Seq(
      (Some(1.0), Some(10.0)),
      (Some(2.0), None),
      (Some(2.0), Some(30.0)),
      (None, Some(20.0))).toDF("a", "b")
    val out = Profile.numeric(df, Seq("a", "b")).collect()
      .map(r => r.getAs[String]("col_name") -> r).toMap

    val a = out("a")
    assert(a.getAs[Long]("n_rows") === 4L)
    assert(a.getAs[Long]("n_nonnull") === 3L)
    assert(a.getAs[Long]("n_distinct") === 2L)
    assert(a.getAs[Double]("min_val") === 1.0)
    assert(a.getAs[Double]("max_val") === 2.0)
    assert(a.getAs[Double]("mean_val") === 5.0 / 3)

    val b = out("b")
    assert(b.getAs[Long]("n_nonnull") === 3L)
    assert(b.getAs[Long]("n_distinct") === 3L)
    assert(b.getAs[Double]("mean_val") === 20.0)
  }

  test("Profile.histogram bins values fixed-width, floors negatives toward -inf, skips empty bins") {
    val df = Seq(-15.0, -5.0, 0.0, 3.0, 9.99, 10.0, 25.0).toDF("x")
    val out = Profile.histogram(df, "x", binWidth = 10.0).collect()
      .map(r => r.getAs[Long]("bin") -> r).toMap
    // floor(-15/10) = -2, floor(-5/10) = -1: negative bins floor DOWN
    assert(out.keySet === Set(-2L, -1L, 0L, 1L, 2L))
    assert(out(0L).getAs[Long]("n") === 3L)
    assert(out(0L).getAs[Double]("bin_min") === 0.0)
    assert(out(0L).getAs[Double]("bin_max") === 9.99)
    assert(out(1L).getAs[Long]("n") === 1L)
    assert(out(-2L).getAs[Double]("bin_lo") === -20.0)
  }

  test("Profile.histogram ignores nulls") {
    val df = Seq(Some(1.0), None, Some(2.0)).toDF("x")
    val out = Profile.histogram(df, "x", binWidth = 10.0).collect()
    assert(out.length === 1 && out.head.getAs[Long]("n") === 2L)
  }

  test("invertedIndex emits sorted postings of distinct docs and applies minDf") {
    val df = Seq(
      (30L, "b a b"), // duplicate token counts once per doc
      (10L, "a c"),
      (20L, "a b")).toDF("doc_id", "text")
    val out = TextAnalysis.invertedIndex(df, minDf = 2L).collect()
      .map(r => (r.getAs[String]("term"), (r.getAs[Long]("df"), r.getAs[String]("postings"))))
      .toMap
    assert(out === Map("a" -> ((3L, "10,20,30")), "b" -> ((2L, "20,30"))))
  }

  test("searchAll keeps exactly the docs containing every term") {
    val df = Seq(
      (1L, "join hash scan extra"),
      (2L, "join join hash hash"), // missing 'scan' — repeats don't help
      (3L, "scan hash join"),
      (4L, "nothing relevant")).toDF("doc_id", "text")
    val hits = TextAnalysis.searchAll(df, Seq("join", "hash", "scan"))
      .select("doc_id").as[Long].collect().sorted
    assert(hits === Array(1L, 3L))
  }

  test("searchAll with a single term degenerates to a contains filter") {
    val df = Seq((1L, "x y"), (2L, "y z")).toDF("doc_id", "text")
    val hits = TextAnalysis.searchAll(df, Seq("z")).select("doc_id").as[Long].collect()
    assert(hits === Array(2L))
  }

  test("ngramCounts counts bigrams corpus-wide with deterministic tie-break ranks") {
    val df = Seq(
      (1L, "a b c"),   // "a b", "b c"
      (2L, "a b"),     // "a b"
      (3L, "c"),       // too short: no bigrams
      (4L, "b c d")).toDF("doc_id", "text") // "b c", "c d"
    val out = TextAnalysis.ngramCounts(df, n = 2, k = 10).collect()
      .map(r => (r.getAs[Int]("rk"), r.getAs[String]("gram"), r.getAs[Long]("n")))
    // counts: "a b"=2, "b c"=2, "c d"=1; ties rank alphabetically
    assert(out.toSeq === Seq((1, "a b", 2L), (2, "b c", 2L), (3, "c d", 1L)))
  }

  test("ngramCounts at n=3 only emits docs long enough") {
    val df = Seq((1L, "a b"), (2L, "a b c")).toDF("doc_id", "text")
    val out = TextAnalysis.ngramCounts(df, n = 3, k = 5).collect()
    assert(out.map(r => r.getAs[String]("gram")).toSeq === Seq("a b c"))
  }

  test("Profile.numeric on an all-null column: zero counts, null extremes and mean") {
    val df = Seq((Some(1.0), Option.empty[Double]), (Some(2.0), None)).toDF("a", "b")
    val b = Profile.numeric(df, Seq("b")).collect().head
    assert(b.getAs[Long]("n_rows") === 2L)
    assert(b.getAs[Long]("n_nonnull") === 0L)
    assert(b.getAs[Long]("n_distinct") === 0L)
    assert(b.isNullAt(b.fieldIndex("min_val")))
    assert(b.isNullAt(b.fieldIndex("max_val")))
    assert(b.isNullAt(b.fieldIndex("mean_val")))
  }

  test("searchIndexed over a minDf=1 index returns exactly searchAll's doc ids") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id"), col("text"))
    val direct = TextAnalysis.searchAll(docs, Seq("join", "hash", "scan"))
      .select("doc_id").as[Long].collect().sorted
    val viaIndex = TextAnalysis.searchIndexed(
      TextAnalysis.invertedIndexArr(docs, minDf = 1L), Seq("join", "hash", "scan"))
      .as[Long].collect().sorted
    assert(direct.nonEmpty && viaIndex.toSeq === direct.toSeq)
  }

  test("searchIndexed works from a PERSISTED index (parquet round-trip)") {
    val docs = Seq((1L, "a b c"), (2L, "a b"), (3L, "b c"), (4L, "a c")).toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("graft_idx").toString
    TextAnalysis.invertedIndexArr(docs, minDf = 1L)
      .write.mode("overwrite").parquet(dir)
    val hits = TextAnalysis.searchIndexed(spark.read.parquet(dir), Seq("a", "c"))
      .as[Long].collect().sorted
    assert(hits === Array(1L, 4L))
  }
}
