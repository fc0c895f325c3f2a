package graft.operators

import graft.SparkSpec
import graft.sources.Tables
import org.apache.spark.sql.functions._

/** Baseline JPEG codec: deterministic round trips inside the documented
  * quality-100 error bound, cross-validation against the JDK's
  * INDEPENDENT ImageIO codec in both directions, foreign-table decode,
  * and robustness on garbage. No image library in the engine path —
  * ImageIO appears only here, as the reference implementation.
  */
class JpegSpec extends SparkSpec {

  private def rule(id: Long)(x: Int, y: Int, c: Int): Int =
    ((id + 3L * x + 7L * y + 11L * c) % 256).toInt

  private def maxErr(img: Multimodal.PixelImage, id: Long): Int = {
    var m = 0
    var i = 0
    while (i < img.pixels.length) {
      val c = i % img.channels
      val x = (i / img.channels) % img.width
      val y = i / (img.channels * img.width)
      m = math.max(m, math.abs((img.pixels(i) & 0xff) - rule(id)(x, y, c)))
      i += 1
    }
    m
  }

  test("quality-100 round trip stays inside the DCT round-off bound, all channel counts") {
    for (id <- 0L to 40L) { // sweeps w 8-39, h 8-31, ch 1-4, incl. non-×8 dims
      val w = (id % 32 + 8).toInt; val h = (id % 24 + 8).toInt; val ch = (id % 4 + 1).toInt
      val img = Jpeg.decode(Jpeg.encode(w, h, ch, 100, rule(id)))
        .getOrElse(fail(s"decode failed for id $id"))
      assert((img.width, img.height, img.channels) === ((w, h, ch)))
      val e = maxErr(img, id)
      assert(e <= 2, s"id $id: quality-100 max error $e exceeds the bound")
    }
  }

  test("decode is bit-deterministic") {
    val b = Jpeg.encode(20, 14, 3, 95, rule(5L))
    val a1 = Jpeg.decode(b).get.pixels
    val a2 = Jpeg.decode(b).get.pixels
    assert(java.util.Arrays.equals(a1, a2))
    assert(java.util.Arrays.equals(b, Jpeg.encode(20, 14, 3, 95, rule(5L))))
  }

  test("the JDK's ImageIO decodes our files and agrees with our decoder (grayscale)") {
    val w = 40; val h = 32
    val ours = Jpeg.encode(w, h, 1, 100, rule(9L))
    val jdk = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(ours))
    assert(jdk != null, "ImageIO rejected our jpeg — container or entropy bug")
    assert((jdk.getWidth, jdk.getHeight) === ((w, h)))
    val our = Jpeg.decode(ours).get
    for (y <- 0 until h; x <- 0 until w) {
      val d = math.abs(jdk.getRaster.getSample(x, y, 0) - (our.pixels(y * w + x) & 0xff))
      assert(d <= 1, s"($x,$y): ImageIO and our decoder differ by $d")
    }
  }

  test("our decoder reads a FOREIGN jpeg (JDK-encoded, standard Annex-K tables)") {
    val w = 33; val h = 17 // non-multiples of 8 on purpose
    val bi = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    for (y <- 0 until h; x <- 0 until w)
      bi.getRaster.setSample(x, y, 0, rule(3L)(x, y, 0))
    val bos = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(bi, "jpg", bos))
    val bytes = bos.toByteArray
    val ours = Jpeg.decode(bytes).getOrElse(fail("foreign decode failed"))
    assert((ours.width, ours.height, ours.channels) === ((w, h, 1)))
    // same file through the JDK's own decoder: both lossy decodes of one
    // stream must agree sample-for-sample within IDCT tolerance
    val jdk = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    for (y <- 0 until h; x <- 0 until w) {
      val d = math.abs(jdk.getRaster.getSample(x, y, 0) - (ours.pixels(y * w + x) & 0xff))
      assert(d <= 1, s"($x,$y): foreign-file decode differs from ImageIO by $d")
    }
  }

  test("quality scaling: q50 is the Annex-K table; lower quality shrinks files") {
    assert(Jpeg.quantTable(50).take(8) === Array(16, 11, 10, 16, 24, 40, 51, 61))
    assert(Jpeg.quantTable(100).forall(_ == 1))
    val big = Jpeg.encode(32, 32, 1, 95, rule(11L)).length
    val small = Jpeg.encode(32, 32, 1, 25, rule(11L)).length
    assert(small < big, s"quality 25 ($small B) not smaller than quality 95 ($big B)")
  }

  test("decode returns None on garbage, truncation, and unsupported processes") {
    assert(Jpeg.decode(null).isEmpty)
    assert(Jpeg.decode(Array[Byte](1, 2, 3)).isEmpty)
    assert(Jpeg.decode("not a jpeg at all".getBytes).isEmpty)
    val good = Jpeg.encode(16, 16, 1, 100, rule(2L))
    for (cut <- Seq(4, good.length / 4, good.length / 2, good.length - 3))
      assert(Jpeg.decode(good.take(cut)).isEmpty, s"truncation at $cut decoded")
    // flip SOF0 to SOF2 (progressive): must refuse, not mis-decode
    val prog = good.clone()
    val sofAt = (0 until prog.length - 1).find(i =>
      (prog(i) & 0xff) == 0xFF && (prog(i + 1) & 0xff) == 0xC0).get
    prog(sofAt + 1) = 0xC2.toByte
    assert(Jpeg.decode(prog).isEmpty)
  }

  test("jpegRoundTripCheck: distributed audit table, every image in bound") {
    val out = Multimodal.jpegRoundTripCheck(spark,
      Tables.documents(spark, sf).limit(50), "doc_id").cache()
    try {
      assert(out.count() === 50)
      assert(out.filter(!col("err_in_bound")).count() === 0)
      assert(out.filter(col("n_samples") =!=
        col("width") * col("height") * col("channels")).count() === 0)
    } finally out.unpersist(): Unit
  }
}
