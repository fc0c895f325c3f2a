package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TrainingDataSpec extends SparkSpec {
  import spark.implicits._

  test("redactPii scrubs emails, IPs, and long digit runs, and counts them") {
    val df = Seq(
      (1L, "write to alice.smith+x@corp.example.org or bob@ex.io today"),
      (2L, "server 192.168.0.17 answered, card 4111111111111111 on file"),
      (3L, "nothing sensitive here 123 12345678")).toDF("doc_id", "text")
    val out = TrainingData.redactPii(df, "text")
      .select("doc_id", "clean", "n_emails", "n_ips", "n_nums")
      .as[(Long, String, Int, Int, Int)].collect().sortBy(_._1)
    assert(out(0)._2 === "write to [EMAIL] or [EMAIL] today")
    assert(out(0)._3 === 2 && out(0)._4 === 0 && out(0)._5 === 0)
    assert(out(1)._2 === "server [IP] answered, card [NUM] on file")
    assert(out(1)._3 === 0 && out(1)._4 === 1 && out(1)._5 === 1)
    // short digit runs (< 9 digits) are NOT redacted
    assert(out(2)._2 === "nothing sensitive here 123 12345678")
  }

  test("repetitionStats survives empty and whitespace-only documents") {
    val df = Seq((1L, ""), (2L, "   "), (3L, "real words here with the usual stuff"))
      .toDF("doc_id", "text")
    val out = TrainingData.repetitionStats(df, "doc_id", "text").collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    Seq(1L, 2L).foreach { id =>
      assert(out(id).getAs[Int]("n_words") === 0)
      assert(out(id).getAs[Double]("dup_word_frac") === 0.0)
      assert(out(id).getAs[Double]("top_bigram_frac") === 0.0)
      assert(!out(id).getAs[Boolean]("gopher_ok"))
    }
    assert(out(3L).getAs[Int]("n_words") === 7)
  }

  test("redactPii does not count pre-existing redaction tokens") {
    val df = Seq((1L, "already clean: [EMAIL] and [IP] and [NUM] remain")).toDF("doc_id", "text")
    val out = TrainingData.redactPii(df, "text")
      .select("n_emails", "n_ips", "n_nums").as[(Int, Int, Int)].head()
    assert(out === ((0, 0, 0)))
  }

  test("repetitionStats flags degenerate documents and passes normal prose") {
    val df = Seq(
      (1L, "the quick brown fox jumps over the lazy dog and runs far away home"),
      (2L, "spam spam spam spam spam spam spam spam spam spam spam spam"),
      (3L, "a b")).toDF("doc_id", "text")
    val out = TrainingData.repetitionStats(df, "doc_id", "text").collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap

    val prose = out(1L)
    assert(prose.getAs[Int]("n_words") === 14)
    assert(prose.getAs[Double]("top_word_frac") === math.rint(2.0 / 14 * 1e6) / 1e6)
    assert(prose.getAs[Boolean]("gopher_ok"))

    val spam = out(2L)
    assert(spam.getAs[Double]("top_word_frac") === 1.0)
    assert(spam.getAs[Double]("dup_word_frac") === math.rint((1 - 1.0 / 12) * 1e6) / 1e6)
    assert(spam.getAs[Double]("top_bigram_frac") === 1.0)
    assert(!spam.getAs[Boolean]("gopher_ok"))

    assert(!out(3L).getAs[Boolean]("gopher_ok")) // too short
  }

  private lazy val docs = graft.sources.Tables.documents(spark, sf)

  test("splitAssign is deterministic, covers ~80/10/10, and keys never move") {
    val a = TrainingData.splitAssign(docs, "doc_id").select("doc_id", "split")
      .as[(Long, String)].collect().toMap
    val b = TrainingData.splitAssign(docs.repartition(7), "doc_id")
      .select("doc_id", "split").as[(Long, String)].collect().toMap
    assert(a === b)
    val n = a.size.toDouble
    val frac = a.values.groupBy(identity).view.mapValues(_.size / n).toMap
    assert(frac("train") > 0.7 && frac("train") < 0.9)
    assert(frac.getOrElse("val", 0.0) < 0.2 && frac.getOrElse("test", 0.0) < 0.2)
  }

  test("sampleByBucket keeps exact per-stratum rates and nests under rate cuts") {
    val out = TrainingData.sampleByBucket(docs.select("doc_id", "lang"),
      "doc_id", "lang", Map("en" -> 64, "es" -> 128))
    val full = TrainingData.splitAssign(docs.select("doc_id", "lang"), "doc_id")
      .select("doc_id", "bucket").as[(Long, Int)].collect().toMap
    out.select("doc_id", "lang", "bucket").as[(Long, String, Int)].collect()
      .foreach { case (id, lang, b) =>
        assert(b === full(id)) // same bucket function as the split
        val cap = lang match { case "en" => 64; case "es" => 128; case _ => 256 }
        assert(b < cap)
      }
    // lowering a rate is a strict subset: 32/256 en ⊂ 64/256 en
    val tighter = TrainingData.sampleByBucket(docs.select("doc_id", "lang"),
      "doc_id", "lang", Map("en" -> 32, "es" -> 128))
      .select("doc_id").as[Long].collect().toSet
    val looser = out.select("doc_id").as[Long].collect().toSet
    assert(tighter.subsetOf(looser))
  }

  test("decontaminate finds docs overlapping the benchmark and only those") {
    val corpus = Seq(
      (1L, "alpha beta gamma delta epsilon zeta"), // shares 4 trigrams with bench 100
      (2L, "one two three four five six"), // no overlap
      (3L, "delta epsilon zeta eta theta")) // shares 2 trigrams with bench 100
      .toDF("doc_id", "text")
    val bench = Seq(
      (100L, "alpha beta gamma delta epsilon zeta eta"),
      (101L, "totally unrelated benchmark prompt text"))
      .toDF("doc_id", "text")
    val pairs = TrainingData.decontaminate(corpus, bench, "doc_id", "text",
      n = 3, minShared = 3L)
      .select("doc_id", "bench_id", "n_shared")
      .as[(Long, Long, Long)].collect().toSet
    assert(pairs === Set((1L, 100L, 4L)))
    val loose = TrainingData.decontaminate(corpus, bench, "doc_id", "text",
      n = 3, minShared = 1L)
      .select("doc_id").as[Long].collect().toSet
    assert(loose === Set(1L, 3L))
  }

  test("chunkText windows tokens with overlap and never drops a token") {
    val df = Seq(
      (1L, "t0 t1 t2 t3 t4 t5 t6 t7 t8 t9"),
      (2L, "a b")).toDF("doc_id", "text")
    val out = TrainingData.chunkText(df, "doc_id", "text", window = 4, overlap = 1)
      .select("doc_id", "chunk_id", "chunk_text", "n_tokens")
      .as[(Long, Long, String, Int)].collect().sortBy(r => (r._1, r._2))
    assert(out.filter(_._1 == 1L).map(_._3).toSeq === Seq(
      "t0 t1 t2 t3", "t3 t4 t5 t6", "t6 t7 t8 t9"))
    assert(out.filter(_._1 == 2L) === Array((2L, 0L, "a b", 2)))
    // consecutive chunks overlap by exactly one token
    assert(out.filter(_._1 == 1L).forall(_._4 === 4))

    // property over the fixture corpus: the de-overlapped reconstruction
    // (chunk 0 whole + each later chunk minus its 8-token prefix) restores
    // every document's token sequence exactly — nothing dropped, reordered,
    // or duplicated
    val rebuilt = TrainingData.chunkText(docs, "doc_id", "text", 32, 8)
      .withColumn("ctoks", split(col("chunk_text"), " "))
      .withColumn("tail", when(col("chunk_id") === 0, col("ctoks"))
        .otherwise(expr("slice(ctoks, 9, size(ctoks))")))
      .groupBy(col("doc_id"))
      .agg(flatten(sort_array(collect_list(struct(col("chunk_id"), col("tail"))))
        .getField("tail")).as("all_toks"))
    val orig = docs.select(col("doc_id"),
      graft.functions.TextFunctions.tokens(col("text")).as("toks"))
    val mismatches = rebuilt.join(orig, "doc_id")
      .filter(col("all_toks") =!= col("toks")).count()
    assert(mismatches === 0)
  }

  test("contextChunks packs each shard's token stream without gaps or overlap") {
    val toks = docs.select(col("doc_id"),
      size(graft.functions.TextFunctions.tokens(col("text"))).as("n_tokens"))
    val out = TrainingData.contextChunks(toks, "doc_id", "n_tokens",
      ctxSize = 128, nShards = 8)
      .select("doc_id", "shard", "tok_offset", "tok_end", "chunk_first", "chunk_last")
      .as[(Long, Int, Long, Long, Long, Long)].collect()

    out.groupBy(_._2).foreach { case (_, docs) =>
      val sorted = docs.sortBy(_._1)
      // offsets are a gapless prefix-sum: each doc starts where the previous ended
      sorted.sliding(2).foreach {
        case Array(prev, next) => assert(next._3 === prev._4)
        case _ =>
      }
      assert(sorted.head._3 === 0L)
      sorted.foreach { case (_, _, off, end, first, last) =>
        assert(first === off / 128)
        assert(last === (end - 1) / 128)
        assert(first <= last)
      }
    }
  }

  test("deterministicShuffle is a permutation, stable under repartitioning") {
    val ids = docs.select("doc_id")
    val out = TrainingData.deterministicShuffle(ids, "doc_id", nShards = 8)
      .select("doc_id", "shard", "pos").as[(Long, Int, Long)].collect()
    assert(out.length === ids.count())
    // (shard, pos) is a bijection: dense 0..n-1 positions per shard
    out.groupBy(_._2).foreach { case (_, rows) =>
      assert(rows.map(_._3).sorted.toSeq === (0L until rows.length).toSeq)
    }
    // order is a function of ids alone: a different physical layout agrees
    val re = TrainingData.deterministicShuffle(
        ids.repartition(13), "doc_id", nShards = 8)
      .select("doc_id", "shard", "pos").as[(Long, Int, Long)].collect()
    assert(re.sortBy(_._1).toSeq === out.sortBy(_._1).toSeq)
    // and it is not the identity order (the whole point of a shuffle)
    val shard0 = out.filter(_._2 === 0).sortBy(_._3).map(_._1)
    assert(shard0.toSeq !== shard0.sorted.toSeq)
  }

  test("deterministicShuffle populates shard counts beyond 256 (32-bit basis)") {
    // a 256-bucket basis would leave shards 256..299 empty forever
    val many = spark.range(5000).toDF("doc_id")
    val shards = TrainingData.deterministicShuffle(many, "doc_id", nShards = 300)
      .select("shard").distinct().as[Int].collect().sorted
    assert(shards.toSeq === (0 until 300))
  }

  test("capPerGroup keeps exactly min(K, group size) deterministic survivors") {
    val df = docs.select("doc_id", "source")
    val sizes = df.groupBy("source").count().as[(String, Long)].collect().toMap
    val out = TrainingData.capPerGroup(df, "doc_id", "source", maxPerGroup = 40)
      .select("doc_id", "source", "grp_rank").as[(Long, String, Int)].collect()
    val kept = out.groupBy(_._2).map { case (s, rows) => s -> rows.length }
    sizes.foreach { case (s, n) =>
      assert(kept.getOrElse(s, 0) === math.min(40L, n),
        s"source $s: expected min(40, $n)")
    }
    // survivors are id-determined: re-run over a shuffled layout agrees
    val re = TrainingData.capPerGroup(df.repartition(7), "doc_id", "source", 40)
      .select("doc_id").as[Long].collect().sorted
    assert(re.toSeq === out.map(_._1).sorted.toSeq)
  }

  test("temperatureMix: integer rates match hand math; samples nest under budget") {
    // 900 'big' docs vs 100 'small': w = 30 vs 10, W = 40
    val df = ((1 to 900).map(i => (i.toLong, "big")) ++
      (1001 to 1100).map(i => (i.toLong, "small"))).toDF("doc_id", "lang")
    val out = TrainingData.temperatureMix(df, "doc_id", "lang", budget = 200L)
      .select("doc_id", "lang", "bucket", "keep256")
      .as[(Long, String, Int, Long)].collect()

    // keep256(big)   = min(256, 256·200·30 / (40·900)) = 42
    // keep256(small) = min(256, 256·200·10 / (40·100)) = 128
    val rates = out.groupBy(_._2).map { case (s, rows) => s -> rows.head._4 }
    assert(rates === Map("big" -> 42L, "small" -> 128L))
    // the kept set is exactly the bucket rule — no quota noise
    out.foreach(r => assert(r._3 < r._4))
    // square-root temperature upsamples the tail: small keeps a ~3× rate
    // while the raw corpus is 9:1

    // nested: a bigger budget only ADDS documents
    val more = TrainingData.temperatureMix(df, "doc_id", "lang", budget = 400L)
      .select("doc_id").as[Long].collect().toSet
    assert(out.map(_._1).forall(more.contains))
    assert(more.size > out.length)
  }

  test("qualityScore: exact integer weight sums, bag model, 0.5 for empty docs") {
    val df = Seq(
      (1L, "alpha beta gamma"),
      (2L, "gamma beta alpha"), // permutation: identical bag → identical score
      (3L, "alpha alpha alpha"), // occurrences count, not distinct tokens
      (4L, "")).toDF("doc_id", "text")
    val out = TrainingData.qualityScore(df, "doc_id", "text")
      .select("doc_id", "n_words", "w_sum", "q_score", "keep")
      .as[(Long, Int, Long, Double, Int)].collect().sortBy(_._1).toSeq

    // reference weights computed independently of the Spark expression tree
    def w(tok: String): Long = {
      val h = java.security.MessageDigest.getInstance("MD5")
        .digest(tok.getBytes("UTF-8")).take(2)
      val j = ((h(0) & 0xff) << 4) | ((h(1) & 0xff) >> 4) // first 3 hex chars
      (j * 2654435761L) % 1000003L - 500001L
    }
    val expected = Seq("alpha", "beta", "gamma").map(w).sum
    assert(out(0)._3 === expected)
    assert(out(1)._3 === expected)
    assert(out(1)._4 === out(0)._4 && out(1)._5 === out(0)._5)
    assert(out(2)._3 === 3 * w("alpha"))
    // empty doc: zero-sum sigmoid, kept at the default threshold
    assert(out(3) === ((4L, 0, 0L, 0.5, 1)))
    // scores sit strictly inside (0, 1)
    out.foreach(r => assert(r._4 > 0.0 && r._4 < 1.0))
  }
}
