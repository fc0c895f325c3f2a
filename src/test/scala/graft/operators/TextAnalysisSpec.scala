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

  test("multimodal: synthesize → payloadMeta round-trips byte lengths") {
    val media = Multimodal.synthesize(Tables.documents(spark, sf), "doc_id", "text")
    val meta = Multimodal.payloadMeta(media)
    val joined = meta.join(Tables.documents(spark, sf),
      col("media_id") === col("doc_id"))
    assert(joined.filter(col("n_bytes") =!= length(col("text"))).count() === 0)
    assert(meta.select("payload_md5").distinct().count() === meta.count())
  }

  test("multimodal: extractFeatures runs the decode stub per partition") {
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
}
