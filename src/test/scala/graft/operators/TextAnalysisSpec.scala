package graft.operators

import graft.SparkSpec
import graft.sources.Tables
import org.apache.spark.sql.functions._

class TextAnalysisSpec extends SparkSpec {
  import spark.implicits._

  test("stats computes token counts and ratios") {
    val docs = Seq((1L, "a b b c", "en", "s", 7L)).toDF("doc_id", "text", "lang", "source", "n_chars")
    val r = TextAnalysis.stats(docs).head()
    assert(r.getAs[Int]("n_tokens") === 4)
    assert(r.getAs[Int]("n_uniq") === 3)
    assert(r.getAs[Double]("ttr") === 0.75)
    assert(r.getAs[Double]("avg_token_len") === 1.0)
  }

  test("langId votes by marker tokens") {
    val docs = Seq(
      (1L, "the cat and the dog"),
      (2L, "el gato es la mascota"),
      (3L, "xyzzy plugh")).toDF("doc_id", "text")
    val out = TextAnalysis.langId(docs).orderBy("doc_id")
      .select("pred_lang").as[String].collect()
    assert(out === Array("en", "es", "und"))
  }

  test("tokenClasses separates alpha / numeric / other runs") {
    val docs = Seq((1L, "abc 123 x7 !?")).toDF("doc_id", "text")
    val r = TextAnalysis.tokenClasses(docs).head()
    assert(r.getAs[Int]("n_alpha") === 2) // abc, x
    assert(r.getAs[Int]("n_num") === 2)   // 123, 7
    assert(r.getAs[Int]("n_other") === 2) // !, ?
  }

  test("lmPerplexity: hand-computed bigram model, smoothing, and envelope") {
    // ref corpus: d1 = [a b a b c], d2 = [a b]
    //   bigram counts: "a b"→3, "b a"→1, "b c"→1; first-token: a→3, b→2
    //   vocab {a,b,c} → V = 4
    val ref = Seq((1L, "a b a b c"), (2L, "a b")).toDF("doc_id", "text")
    val score = ref.union(Seq((3L, "c a x"), (4L, "z")).toDF("doc_id", "text"))
    val out = TextAnalysis.lmPerplexity(score, ref).orderBy("doc_id").collect()

    val d1 = out(0) // "a b"×2 (7/4), "b a" (6/2), "b c" (6/2)
    assert(d1.getAs[Long]("n_bigrams") === 4L)
    assert(d1.getAs[Long]("oov_bigrams") === 0L)
    assert(d1.getAs[Long]("am_micro") === 2375000L) // (2·1750000 + 2·3000000)/4
    assert(d1.getAs[Long]("min_q") === 1750000L)
    assert(d1.getAs[Long]("max_q") === 3000000L)

    val d2 = out(1) // single bigram: ppl is exactly 7/4
    assert(d2.getAs[Long]("n_bigrams") === 1L)
    assert(d2.getAs[Long]("am_micro") === 1750000L)
    assert(d2.getAs[Long]("min_q") === d2.getAs[Long]("max_q"))

    val d3 = out(2) // both bigrams unseen: "c a" (0+4)/1, "a x" (3+4)/1
    assert(d3.getAs[Long]("n_bigrams") === 2L)
    assert(d3.getAs[Long]("oov_bigrams") === 2L)
    assert(d3.getAs[Long]("am_micro") === 5500000L) // (4000000 + 7000000)/2
    assert(d3.getAs[Long]("min_q") === 4000000L)
    assert(d3.getAs[Long]("max_q") === 7000000L)

    val d4 = out(3) // too short for bigrams: zero row, envelope vacuous
    assert(d4.getAs[Long]("n_bigrams") === 0L)
    assert(d4.isNullAt(d4.fieldIndex("am_micro")))
    assert(out.forall(_.getAs[Boolean]("ppl_ok")))
  }

  test("lmPerplexity: OOV mass concentrates on the held-out slice") {
    val docs = Tables.documents(spark, sf)
    val out = TextAnalysis.lmPerplexity(docs, docs.filter(col("doc_id") % 10 =!= 0))
      .cache()
    try {
      // the model saw every reference bigram, so OOV can only live held-out
      assert(out.filter(col("doc_id") % 10 =!= 0)
        .filter(col("oov_bigrams") > 0).count() === 0L)
      assert(out.filter(col("ppl_ok") === false).count() === 0L)
      assert(out.count() === docs.count())
    } finally out.unpersist()
  }

  test("multimodal: synthesize → payloadMeta round-trips byte lengths") {
    val media = Multimodal.synthesize(Tables.documents(spark, sf), "doc_id", "text")
    val meta = Multimodal.payloadMeta(media)
    val joined = meta.join(Tables.documents(spark, sf),
      col("media_id") === col("doc_id"))
    assert(joined.filter(col("n_bytes") =!= length(col("text"))).count() === 0)
    assert(meta.select("payload_md5").distinct().count() === meta.count())
  }

  test("multimodal: extractFeatures byte-stat fallback for non-image payloads") {
    val media = Multimodal.synthesize(Tables.documents(spark, sf).limit(10), "doc_id", "text")
    val feats = Multimodal.extractFeatures(spark, media).collect()
    assert(feats.length === 10)
    assert(feats.forall(f => f.mean_byte > 0 && f.n_bytes > 0 && f.frames_sampled >= 1))
  }

  test("multimodal: sampleFrames emits strided frames") {
    val media = Multimodal.synthesize(Tables.documents(spark, sf).limit(5), "doc_id", "text")
    val frames = Multimodal.sampleFrames(media, frameBytes = 64, everyNth = 2)
    assert(frames.count() > 0)
    assert(frames.filter(pmod(col("frame_idx"), lit(2)) =!= 0).count() === 0)
  }

  test("multimodal: PNG/JPEG encode → header parse round-trips exactly") {
    val body = "hello media".getBytes("UTF-8")
    val png = Multimodal.parseImageHeader(Multimodal.encodePng(640, 480, 6, body)).get
    assert((png.fmt, png.width, png.height, png.channels) === (("png", 640, 480, 4)))
    assert(png.body === body)
    val jpg = Multimodal.parseImageHeader(Multimodal.encodeJpeg(123, 77, 3, body)).get
    assert((jpg.fmt, jpg.width, jpg.height, jpg.channels) === (("jpeg", 123, 77, 3)))
    assert(jpg.body === body)
    // grayscale JPEG and paletted PNG channel mapping
    assert(Multimodal.parseImageHeader(
      Multimodal.encodeJpeg(5, 5, 1, Array.emptyByteArray)).get.channels === 1)
    assert(Multimodal.parseImageHeader(
      Multimodal.encodePng(5, 5, 3, Array.emptyByteArray)).get.channels === 1)
  }

  test("multimodal: the parser rejects garbage and truncation, never throws") {
    val png = Multimodal.encodePng(64, 64, 2, "x".getBytes)
    val jpg = Multimodal.encodeJpeg(64, 64, 3, "x".getBytes)
    val bad = Seq[Array[Byte]](
      null, Array.emptyByteArray, "not an image at all".getBytes("UTF-8"),
      png.take(20), png.take(40), jpg.take(3), jpg.take(10),
      jpg.dropRight(3) // EOI cut off mid-walk
    )
    bad.foreach(b => assert(Multimodal.parseImageHeader(b).isEmpty))
    // a REAL-world-shaped JPEG — SOS entropy data before EOI — still yields
    // dimensions (body extraction alone degrades to empty)
    val withSos = {
      val bos = new java.io.ByteArrayOutputStream()
      bos.write(jpg, 0, jpg.length - 3) // keep everything up to before EOI
      bos.write(Array[Byte](0xff.toByte, 0xda.toByte, 0, 3, 1)) // SOS seg
      bos.write(Array[Byte](7, 7, 7))   // entropy-ish bytes
      bos.write(Array[Byte](0xff.toByte, 0xd9.toByte))
      bos.toByteArray
    }
    val m = Multimodal.parseImageHeader(withSos).get
    assert((m.width, m.height, m.body.length) === ((64, 64, 0)))
  }

  test("multimodal: encodeImages → imageMeta recovers the id rule from bytes") {
    val docs = Tables.documents(spark, sf).limit(50)
    val meta = Multimodal.imageMeta(spark,
      Multimodal.encodeImages(spark, docs, "doc_id", "text"))
    val rows = meta.collect()
    assert(rows.length === 50)
    rows.foreach { r =>
      val id = r.getAs[Long]("media_id")
      assert(r.getAs[String]("fmt") === (if (id % 2 == 0) "png" else "jpeg"))
      assert(r.getAs[Int]("width") === (id * 37 % 1280 + 64).toInt)
      assert(r.getAs[Int]("height") === (id * 53 % 720 + 64).toInt)
    }
  }

  test("multimodal: PNG pixel round-trip through all five row filters is exact") {
    // height ≥ 5 cycles every filter type (y % 5); all four channel counts
    for (ch <- 1 to 4) {
      val (w, h) = (13, 11)
      def rule(x: Int, y: Int, c: Int): Int = (x * 3 + y * 7 + c * 11 + ch) % 256
      val bytes = Multimodal.encodePngPixels(w, h, ch, rule)
      val img = Multimodal.decodePngPixels(bytes).get
      assert((img.width, img.height, img.channels) === ((w, h, ch)))
      for (y <- 0 until h; x <- 0 until w; c <- 0 until ch)
        assert((img.pixels((y * w + x) * ch + c) & 0xff) === rule(x, y, c),
          s"sample mismatch at ($x,$y,$c) ch=$ch")
    }
  }

  test("multimodal: decodePngPixels rejects corrupt streams, never throws") {
    val good = Multimodal.encodePngPixels(8, 8, 3, (x, y, c) => x + y + c)
    assert(Multimodal.decodePngPixels(good).isDefined)
    // truncated IDAT: container re-assembled with half the deflate stream
    val body = Multimodal.parseImageHeader(good).get.body
    val truncated = Multimodal.encodePng(8, 8, 2, body.take(body.length / 2))
    assert(Multimodal.decodePngPixels(truncated).isEmpty)
    // garbage IDAT (not zlib at all)
    assert(Multimodal.decodePngPixels(
      Multimodal.encodePng(8, 8, 2, "not zlib data".getBytes)).isEmpty)
    // jpeg payload routed to the png decoder
    assert(Multimodal.decodePngPixels(
      Multimodal.encodeJpeg(8, 8, 3, Array.emptyByteArray)).isEmpty)
    // declared dims disagree with the stream length
    val wrongDims = Multimodal.encodePng(9, 9, 2, body)
    assert(Multimodal.decodePngPixels(wrongDims).isEmpty)
    assert(Multimodal.decodePngPixels(null).isEmpty)
  }

  test("multimodal: encodePngPixelTable → pngPixelStats matches the rule") {
    val docs = Tables.documents(spark, sf).limit(40)
    val stats = Multimodal.pngPixelStats(spark,
      Multimodal.encodePngPixelTable(spark, docs, "doc_id")).collect()
    assert(stats.length === 40)
    stats.foreach { r =>
      val id = r.getAs[Long]("media_id")
      val (w, h, ch) = ((id % 32 + 8).toInt, (id % 24 + 8).toInt, (id % 4 + 1).toInt)
      val expSum = (for (x <- 0 until w; y <- 0 until h; c <- 0 until ch)
        yield (id + 3L * x + 7L * y + 11L * c) % 256).sum
      assert(r.getAs[Int]("width") === w)
      assert(r.getAs[Int]("height") === h)
      assert(r.getAs[Int]("channels") === ch)
      assert(r.getAs[Long]("n_samples") === w.toLong * h * ch)
      assert(r.getAs[Long]("sum_val") === expSum)
      assert(r.getAs[Double]("mean_val") === expSum.toDouble / (w.toLong * h * ch))
    }
  }

  test("bpeTokenize applies merges in rank order: hand-computed symbols") {
    val df = Seq(
      (1L, "the thinking"), // 'the'->1 symbol; ' thinking'->[' ',th,in,k,ing]=5
      (2L, "and 123 ..."),  // only 'and' is alphabetic; an+d -> 1 symbol
      (3L, ""))             // token-less
      .toDF("doc_id", "text")
    val out = TextAnalysis.bpeTokenize(df, "doc_id", "text",
      graft.SparkEntry.BpePreTokenRe, graft.SparkEntry.BpeMerges)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Int]("n_alpha_tokens"), r.getAs[Long]("n_symbols"),
          r.getAs[Long]("n_alpha_chars"), r.getAs[Double]("chars_per_symbol")))).toMap
    assert(out(1L) === ((2, 6L, 12L, 2.0)))
    assert(out(2L) === ((1, 1L, 3L, 3.0)))
    assert(out(3L) === ((0, 0L, 0L, 0.0)))
  }

  test("bpeTrain learns hand-computable merges and tie-breaks deterministically") {
    // single-word docs so no GPT-2 leading-space symbols complicate the
    // hand computation. vocabulary: "aab" x3, "ab" x2, "ba" x1
    // round 1 pairs: (a,a)=3, (a,b)=3+2=5, (b,a)=1 -> merge (a,b) cnt 5
    // round 2 ("a(ab)" x3, "(ab)" x2, "ba" x1): (a,ab)=3, (b,a)=1 -> (a,ab) 3
    // round 3: only (b,a)=1 remains -> (b,a) 1; round 4: no pairs -> stops
    val df = Seq("aab", "aab", "aab", "ab", "ab", "ba").zipWithIndex
      .map { case (w, i) => (i.toLong, w) }.toDF("doc_id", "text")
    val out = TextAnalysis.bpeTrain(spark, df, "text",
      graft.SparkEntry.BpePreTokenRe, rounds = 6)
      .as[(Int, String, String, Long)].collect().sortBy(_._1)
    assert(out === Array((1, "a", "b", 5L), (2, "a", "ab", 3L), (3, "b", "a", 1L)))
    // the learned table feeds the application layer: "aab" -> [a+ab] = 1 symbol
    val applied = TextAnalysis.bpeTokenize(Seq((1L, "aab")).toDF("doc_id", "text"),
      "doc_id", "text", graft.SparkEntry.BpePreTokenRe,
      out.map(m => m._2 -> m._3).toSeq)
      .select("n_symbols").as[Long].head()
    assert(applied === 1L)
  }

  test("stripHtml removes blocks and tags, decodes entities, counts tags") {
    val df = Seq(
      (1L, "<html><body><p>hello <b>world</b></p><script>if (a<b) x();" +
        "</script>&amp;, &lt;tag&gt; &quot;q&quot; &#39;s&#39;</body></html>"),
      (2L, "plain text, no markup"),
      (3L, "<style a=\"b\">p { color: red }</style>stay"),
      // double-encoded: &amp;lt; is the TEXT "&lt;", never "<"
      (4L, "safe: &amp;lt;b&amp;gt;")).toDF("doc_id", "text")
    val out = TextAnalysis.stripHtml(df)
      .select("doc_id", "clean_text", "n_tags")
      .as[(Long, String, Int)].collect().sortBy(_._1)
    // script CONTENT (with its bare '<') is gone entirely, not just the tags
    assert(out(0) === ((1L, "hello world &, <tag> \"q\" 's'", 8)))
    assert(out(1) === ((2L, "plain text, no markup", 0)))
    assert(out(2) === ((3L, "stay", 0)))
    assert(out(3) === ((4L, "safe: &lt;b&gt;", 0)))
  }
}
