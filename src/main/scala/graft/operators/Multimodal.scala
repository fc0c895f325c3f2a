package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing (north-star): treat image/audio/video as
  * opaque `binary` payloads with typed metadata, and run decode /
  * feature-extract / frame-sample as partition-local batch functions.
  *
  * The CONTAINER layer is real: [[encodeImages]] writes structurally valid
  * PNG (signature, CRC-correct IHDR/IDAT/IEND chunks) and JPEG (SOI, APP0,
  * COM, SOF0, EOI segments) bytes, and [[parseImageHeader]] is an honest
  * pure-JVM parser — PNG chunk walk, JPEG marker-segment walk — that
  * recovers format, dimensions, channel count and the payload body with no
  * image library.
  *
  * The PIXEL layers are real too, both of them: [[encodePngPixels]] /
  * [[decodePngPixels]] write and read genuine 8-bit zlib-deflated
  * scanlines exercising all five PNG row filters (`java.util.zip` only),
  * and [[Jpeg.encode]] / [[Jpeg.decode]] are a complete baseline
  * sequential JPEG codec — quantization, 8×8 DCT, zigzag, Huffman
  * entropy coding, byte stuffing — pure JVM, cross-validated against the
  * JDK's independent ImageIO decoder in the specs. Nothing in the
  * multimodal stack is stubbed; payloads that are not decodable images
  * fall back to payload-level byte statistics in [[extractFeatures]],
  * which is the honest operation for opaque non-image media. Decode
  * stays `mapPartitions` (batch-amortized codec init, executor-local, no
  * shuffle).
  */
object Multimodal {

  /** Canonical multimodal record schema: opaque payload + typed metadata. */
  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType),
    StructField("payload", BinaryType),
    StructField("meta", StructType(Seq(
      StructField("modality", StringType),
      StructField("width", IntegerType),
      StructField("height", IntegerType),
      StructField("codec", StringType))))))

  /** Manufacture a deterministic media table from any (id, text) table —
    * payload = utf-8 bytes, metadata derived from the id. Lets every
    * downstream op be exercised on fixture data without real media files.
    */
  def synthesize(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(
      col(idCol).as("media_id"),
      to_binary(col(textCol), lit("utf-8")).as("payload"),
      struct(
        element_at(array(lit("image"), lit("audio"), lit("video")),
          (pmod(col(idCol), lit(3)) + 1).cast("int")).as("modality"),
        (pmod(col(idCol) * 37, lit(1280)) + 64).cast("int").as("width"),
        (pmod(col(idCol) * 53, lit(720)) + 64).cast("int").as("height"),
        lit("fake/v1").as("codec")).as("meta"))

  /** Payload-level metadata extraction — pure expressions, no decode:
    * byte length + content hashes (dedup keys for binary columns).
    */
  def payloadMeta(media: DataFrame): DataFrame =
    media.select(
      col("media_id"),
      col("meta.modality").as("modality"),
      octet_length(col("payload")).as("n_bytes"),
      md5(col("payload")).as("payload_md5"),
      sha2(col("payload"), 256).as("payload_sha256"))

  // ---------------------------------------------------------------------
  // Real image containers: pure-JVM encode + header parse (no libraries)

  final case class ImageMeta(fmt: String, width: Int, height: Int,
                             channels: Int, body: Array[Byte])

  private def be32(v: Int) = Array[Byte](
    (v >>> 24).toByte, (v >>> 16).toByte, (v >>> 8).toByte, v.toByte)
  private def be16(v: Int) = Array[Byte]((v >>> 8).toByte, v.toByte)

  /** Structurally valid PNG: signature + CRC-correct IHDR/IDAT/IEND chunks.
    * `body` rides as the IDAT payload (NOT zlib pixel data — the pixel
    * layer is the stubbed part; the container is real).
    * Layout: 8 (sig) + 25 (IHDR) + 12+|body| (IDAT) + 12 (IEND). */
  def encodePng(width: Int, height: Int, colorType: Int, body: Array[Byte]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream(57 + body.length)
    def chunk(typ: String, data: Array[Byte]): Unit = {
      val tb = typ.getBytes("US-ASCII")
      val crc = new java.util.zip.CRC32()
      crc.update(tb); crc.update(data)
      bos.write(be32(data.length)); bos.write(tb); bos.write(data)
      bos.write(be32(crc.getValue.toInt))
    }
    bos.write(Array[Byte](0x89.toByte, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a))
    chunk("IHDR", be32(width) ++ be32(height) ++ Array[Byte](8, colorType.toByte, 0, 0, 0))
    chunk("IDAT", body)
    chunk("IEND", Array.emptyByteArray)
    bos.toByteArray
  }

  /** Structurally valid JPEG: SOI, APP0(JFIF), COM, SOF0, EOI; `body` rides
    * after EOI (trailing data, as real-world files often carry). The COM
    * segment before SOF0 forces any parser to WALK segments rather than
    * read a fixed offset. Layout: 2 + 18 + 9 + (10+3·nComp) + 2 + |body|. */
  def encodeJpeg(width: Int, height: Int, nComp: Int, body: Array[Byte]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream(41 + 3 * nComp + body.length)
    def seg(marker: Int, data: Array[Byte]): Unit = {
      bos.write(0xff); bos.write(marker)
      bos.write(be16(data.length + 2)); bos.write(data)
    }
    bos.write(0xff); bos.write(0xd8) // SOI
    seg(0xe0, Array[Byte]('J', 'F', 'I', 'F', 0, 1, 1, 0, 0, 1, 0, 1, 0, 0))
    seg(0xfe, "graft".getBytes("US-ASCII")) // COM
    seg(0xc0, Array[Byte](8) ++ be16(height) ++ be16(width) ++
      Array(nComp.toByte) ++
      (1 to nComp).flatMap(c => Seq(c.toByte, 0x11.toByte, 0.toByte)))
    bos.write(0xff); bos.write(0xd9) // EOI
    bos.write(body, 0, body.length)
    bos.toByteArray
  }

  /** Honest header parse from magic bytes — no image library:
    *   - PNG: verify the 8-byte signature, require IHDR first (per spec),
    *     read width/height/color type, then WALK the chunk list collecting
    *     IDAT data (the body) until IEND.
    *   - JPEG: verify SOI, then WALK marker segments (skipping APP/COM/
    *     anything variable-length, handling standalone markers) to the
    *     first SOF frame header for (height, width, components); the body
    *     is whatever trails the EOI marker.
    * Truncated/garbage/unsupported inputs → None, never a throw. */
  def parseImageHeader(b: Array[Byte]): Option[ImageMeta] = {
    if (b == null) return None
    def u8(i: Int) = b(i) & 0xff
    def rd16(i: Int) = (u8(i) << 8) | u8(i + 1)
    def rd32(i: Int) = (u8(i) << 24) | (u8(i + 1) << 16) | (u8(i + 2) << 8) | u8(i + 3)
    val pngSig = Array(0x89, 'P'.toInt, 'N'.toInt, 'G'.toInt, 0x0d, 0x0a, 0x1a, 0x0a)
    if (b.length >= 33 && pngSig.indices.forall(i => u8(i) == pngSig(i))) {
      if (rd32(8) != 13 || new String(b, 12, 4, "US-ASCII") != "IHDR") return None
      val (w, h, colorType) = (rd32(16), rd32(20), u8(25))
      val channels = colorType match {
        case 0 | 3 => 1; case 2 => 3; case 4 => 2; case 6 => 4; case _ => return None
      }
      if (w <= 0 || h <= 0) return None
      val body = new java.io.ByteArrayOutputStream()
      var i = 33 // first chunk after IHDR
      while (i + 8 <= b.length) {
        val len = rd32(i)
        val typ = new String(b, i + 4, 4, "US-ASCII")
        // long arithmetic: a corrupt len near Int.MaxValue must fail the
        // bounds check, not wrap negative and crash the write below
        if (len < 0 || i.toLong + 12 + len > b.length) return None
        if (typ == "IEND") return Some(ImageMeta("png", w, h, channels, body.toByteArray))
        if (typ == "IDAT") body.write(b, i + 8, len)
        i += 12 + len
      }
      None // ran off the end without IEND
    } else if (b.length >= 4 && u8(0) == 0xff && u8(1) == 0xd8) {
      var i = 2
      var sof: Option[(Int, Int, Int)] = None
      while (i + 1 < b.length) {
        if (u8(i) != 0xff) return None // desynced
        val m = u8(i + 1)
        if (m == 0xd9) { // EOI: body is the trailing data
          return sof.map { case (w, h, n) =>
            ImageMeta("jpeg", w, h, n, java.util.Arrays.copyOfRange(b, i + 2, b.length))
          }
        } else if (m == 0x01 || (m >= 0xd0 && m <= 0xd7)) i += 2 // standalone
        else {
          if (i + 3 >= b.length) return None
          val len = rd16(i + 2)
          if (len < 2 || i.toLong + 2 + len > b.length) return None
          if (m == 0xda) // SOS: entropy-coded data follows, not walkable —
            return sof.map { case (w, h, n) => // dims yes, trailing body no
              ImageMeta("jpeg", w, h, n, Array.emptyByteArray)
            }
          val isSof = m >= 0xc0 && m <= 0xcf && m != 0xc4 && m != 0xc8 && m != 0xcc
          if (isSof) {
            if (sof.isDefined || len < 8) return None // two frames → not ours
            val (h, w, n) = (rd16(i + 5), rd16(i + 7), u8(i + 9))
            if (w <= 0 || h <= 0 || n <= 0) return None
            sof = Some((w, h, n))
          }
          i += 2 + len
        }
      }
      None
    } else None
  }

  /** Deterministic image-table synthesizer over real containers: even ids
    * encode as PNG (RGBA every 4th id, RGB otherwise), odd ids as JPEG
    * (grayscale where id % 4 == 1, 3-component otherwise); dimensions
    * follow the same (id·37, id·53) rule as [[synthesize]]; the document
    * text rides as the body. The generation rule is restated by the DuckDB
    * oracle, so `parse(encode(rule(id))) == rule(id)` is hash-checked
    * end-to-end — the parsing is what's under test, not the rule. */
  def encodeImages(spark: SparkSession, docs: DataFrame,
                   idCol: String, textCol: String): DataFrame = {
    import spark.implicits._
    docs.select(col(idCol).cast("long"), col(textCol).cast("string"))
      .as[(Long, String)]
      .mapPartitions(_.map { case (id, text) =>
        // non-negative ids only: truncated % (Scala and DuckDB alike)
        // diverges from floorMod below zero, so a negative id would make
        // the rule unmirrorable — fail loudly rather than diverge silently.
        // Null text is EMPTY media (the oracle coalesces to '' to match).
        require(id >= 0, s"encodeImages: negative media id $id")
        val body = if (text == null) Array.emptyByteArray else text.getBytes("UTF-8")
        val w = (id * 37 % 1280 + 64).toInt
        val h = (id * 53 % 720 + 64).toInt
        val payload =
          if (id % 2 == 0) encodePng(w, h, if (id % 4 == 0) 6 else 2, body)
          else encodeJpeg(w, h, if (id % 4 == 1) 1 else 3, body)
        (id, payload)
      }).toDF("media_id", "payload")
  }

  /** Parsed-header metadata: one partition-local pass (the codec-init slot)
    * recovers format/dimensions/channels/body from the BYTES, then content
    * hashes are computed on the recovered body — unparseable payloads keep
    * their id with null metadata rather than vanishing. */
  def imageMeta(spark: SparkSession, media: DataFrame): DataFrame = {
    import spark.implicits._
    media.select(col("media_id"), col("payload")).as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, p) =>
        val m = parseImageHeader(p)
        (id, m.map(_.fmt).orNull, m.map(_.width), m.map(_.height),
          m.map(_.channels), if (p == null) 0 else p.length, m.map(_.body).orNull)
      })
      .toDF("media_id", "fmt", "width", "height", "channels", "n_bytes", "body")
      .select(col("media_id"), col("fmt"), col("width"), col("height"),
        col("channels"), col("n_bytes"),
        md5(col("body")).as("body_md5"), sha2(col("body"), 256).as("body_sha256"))
  }

  // ---------------------------------------------------------------------
  // Real PNG pixel layer: deflate/inflate + the five PNG row filters

  /** Raw 8-bit samples, row-major (y, then x, then channel):
    * `pixels.length == width * height * channels`. */
  final case class PixelImage(width: Int, height: Int, channels: Int,
                              pixels: Array[Byte])

  /** PNG Paeth predictor (spec §9, Filtering). */
  private def paeth(a: Int, b: Int, c: Int): Int = {
    val p = a + b - c
    val pa = math.abs(p - a); val pb = math.abs(p - b); val pc = math.abs(p - c)
    if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
  }

  private def colorTypeOf(channels: Int): Int = channels match {
    case 1 => 0; case 2 => 4; case 3 => 2; case 4 => 6
    case n => throw new IllegalArgumentException(s"channels must be 1-4, got $n")
  }

  /** REAL PNG encode: 8-bit samples from `pixel(x, y, c)` (low 8 bits
    * taken), per-row filter cycling through all five filter types
    * (y % 5: none/sub/up/average/paeth — so a round-trip exercises every
    * unfilter path), zlib-deflated into a single IDAT inside the
    * CRC-correct container of [[encodePng]]. A standards-compliant PNG
    * reader renders these bytes.
    */
  def encodePngPixels(width: Int, height: Int, channels: Int,
                      pixel: (Int, Int, Int) => Int): Array[Byte] = {
    require(width > 0 && height > 0, s"bad dims ${width}x$height")
    val bpp = channels // 8-bit samples: bytes-per-pixel = channel count
    val stride = width * channels
    val raw = new Array[Byte](height * (1 + stride))
    val cur = new Array[Int](stride)
    val prior = new Array[Int](stride)
    var y = 0
    while (y < height) {
      var i = 0
      while (i < stride) { cur(i) = pixel(i / channels, y, i % channels) & 0xff; i += 1 }
      val f = y % 5
      val rowOff = y * (1 + stride)
      raw(rowOff) = f.toByte
      i = 0
      while (i < stride) {
        val a = if (i >= bpp) cur(i - bpp) else 0
        val b = if (y > 0) prior(i) else 0
        val c = if (y > 0 && i >= bpp) prior(i - bpp) else 0
        val v = cur(i)
        val filtered = f match {
          case 0 => v
          case 1 => v - a
          case 2 => v - b
          case 3 => v - ((a + b) >> 1)
          case 4 => v - paeth(a, b, c)
        }
        raw(rowOff + 1 + i) = (filtered & 0xff).toByte
        i += 1
      }
      System.arraycopy(cur, 0, prior, 0, stride)
      y += 1
    }
    val def_ = new java.util.zip.Deflater()
    val bos = new java.io.ByteArrayOutputStream(raw.length / 2 + 64)
    try {
      def_.setInput(raw); def_.finish()
      val buf = new Array[Byte](8192)
      while (!def_.finished()) bos.write(buf, 0, def_.deflate(buf))
    } finally def_.end()
    encodePng(width, height, colorTypeOf(channels), bos.toByteArray)
  }

  /** REAL PNG pixel decode: container walk ([[parseImageHeader]]) → zlib
    * inflate of the concatenated IDAT stream → per-row unfilter
    * (none/sub/up/average/paeth) back to raw 8-bit samples. Pure JVM
    * (`java.util.zip.Inflater`), no image library. Returns None for
    * non-PNG, 16-bit/interlaced (not written by our encoder), truncated,
    * corrupt, or wrong-length streams — never throws.
    */
  def decodePngPixels(b: Array[Byte]): Option[PixelImage] = {
    val parsed = parseImageHeader(b)
    if (parsed.isEmpty || parsed.get.fmt != "png") return None
    val m = parsed.get
    // our encoder writes bit depth 8, no interlace (IHDR bytes 24/28)
    if ((b(24) & 0xff) != 8 || (b(28) & 0xff) != 0) return None
    val stride = m.width * m.channels
    val expected = m.height * (1 + stride)
    val raw = new Array[Byte](expected)
    val inf = new java.util.zip.Inflater()
    try {
      inf.setInput(m.body)
      var off = 0
      while (off < expected && !inf.finished()) {
        val n = inf.inflate(raw, off, expected - off)
        if (n == 0 && (inf.needsInput() || inf.needsDictionary())) return None // truncated
        off += n
      }
      if (off != expected || !inf.finished()) return None // short or trailing data
    } catch {
      case _: java.util.zip.DataFormatException => return None
    } finally inf.end()
    val bpp = m.channels
    val px = new Array[Byte](m.height * stride)
    var y = 0
    while (y < m.height) {
      val rowOff = y * (1 + stride)
      val outOff = y * stride
      val f = raw(rowOff) & 0xff
      if (f > 4) return None // unknown filter type
      var i = 0
      while (i < stride) {
        val x = raw(rowOff + 1 + i) & 0xff
        val a = if (i >= bpp) px(outOff + i - bpp) & 0xff else 0
        val up = if (y > 0) px(outOff - stride + i) & 0xff else 0
        val c = if (y > 0 && i >= bpp) px(outOff - stride + i - bpp) & 0xff else 0
        val v = f match {
          case 0 => x
          case 1 => x + a
          case 2 => x + up
          case 3 => x + ((a + up) >> 1)
          case 4 => x + paeth(a, up, c)
        }
        px(outOff + i) = (v & 0xff).toByte
        i += 1
      }
      y += 1
    }
    Some(PixelImage(m.width, m.height, m.channels, px))
  }

  /** Deterministic REAL-pixel PNG table: per id, a small image (the
    * modulus rule keeps ≤ ~5k samples each) whose sample at (x, y, c) is
    * `(id + 3x + 7y + 11c) mod 256`, encoded through the full filter +
    * deflate + container stack. The rule is restated by the DuckDB oracle
    * (a generate_series enumeration), so the decode in [[pngPixelStats]]
    * is checked end-to-end: any container-walk, inflate, or unfilter bug
    * breaks the sample sums.
    */
  def encodePngPixelTable(spark: SparkSession, docs: DataFrame,
                          idCol: String): DataFrame = {
    import spark.implicits._
    // same scan-parallelism guard as [[jpegRoundTripCheck]]
    Spread(docs.select(col(idCol).cast("long").as("__mid")), col("__mid")).as[Long]
      .mapPartitions(_.map { id =>
        require(id >= 0, s"encodePngPixelTable: negative media id $id")
        val w = (id % 32 + 8).toInt
        val h = (id % 24 + 8).toInt
        val ch = (id % 4 + 1).toInt
        (id, encodePngPixels(w, h, ch,
          (x, y, c) => ((id + 3L * x + 7L * y + 11L * c) % 256).toInt))
      }).toDF("media_id", "payload")
  }

  /** Decoded-pixel statistics: one partition-local decode pass (the codec
    * slot) per payload; undecodable payloads keep their id with null
    * stats. `mean_val` is one IEEE division of exact integers — the
    * cross-engine float discipline.
    */
  def pngPixelStats(spark: SparkSession, media: DataFrame): DataFrame = {
    import spark.implicits._
    media.select(col("media_id"), col("payload")).as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, p) =>
        decodePngPixels(p) match {
          case Some(img) =>
            var s = 0L
            var i = 0
            while (i < img.pixels.length) { s += img.pixels(i) & 0xff; i += 1 }
            (id, Some(img.width), Some(img.height), Some(img.channels),
              Some(img.pixels.length.toLong), Some(s),
              Some(s.toDouble / img.pixels.length))
          case None => (id, None, None, None, None, None, None)
        }
      }).toDF("media_id", "width", "height", "channels",
        "n_samples", "sum_val", "mean_val")
  }

  final case class MediaFeature(media_id: Long, modality: String, n_bytes: Int,
                                mean_byte: Double, frames_sampled: Int)

  /** Payload byte statistics — the decode fallback for payloads that are
    * not decodable images (raw sensor dumps, opaque audio, synthetic
    * fixtures): mean byte value + strided frame count. Not a stub: for an
    * opaque payload this IS the feature extraction.
    */
  private def byteStats(payload: Array[Byte], frameStride: Int): (Double, Int) = {
    // null payloads reach decode when the source row had null content
    // (synthesize maps null text → null binary); treat as empty media
    if (payload == null || payload.isEmpty) (0.0, 0)
    else {
      var s = 0L; var i = 0
      while (i < payload.length) { s += payload(i) & 0xff; i += 1 }
      (s.toDouble / payload.length, (payload.length + frameStride - 1) / frameStride)
    }
  }

  /** Decode/feature-extract via mapPartitions: decodable images (PNG via
    * [[decodePngPixels]], baseline JPEG via [[Jpeg.decode]] — both real
    * codecs) yield decoded-sample statistics; everything else falls back
    * to [[byteStats]]. The shape is the Spark idiom for expensive per-row
    * codec calls: partition-local, batch-amortized init, no shuffle.
    */
  def extractFeatures(spark: SparkSession, media: DataFrame,
                      frameStride: Int = 256): Dataset[MediaFeature] = {
    import spark.implicits._
    media.select("media_id", "meta.modality", "payload").as[(Long, String, Array[Byte])]
      .mapPartitions { rows =>
        // per-partition codec init would go here
        rows.map { case (id, modality, payload) =>
          val decoded = decodePngPixels(payload).orElse(Jpeg.decode(payload))
          val (meanVal, frames) = decoded match {
            case Some(img) =>
              var s = 0L; var i = 0
              while (i < img.pixels.length) { s += img.pixels(i) & 0xff; i += 1 }
              (if (img.pixels.isEmpty) 0.0 else s.toDouble / img.pixels.length, 1)
            case None => byteStats(payload, frameStride)
          }
          MediaFeature(id, modality, if (payload == null) 0 else payload.length,
            meanVal, frames)
        }
      }
  }

  /** End-to-end JPEG round-trip audit table: per id, encode the
    * deterministic sample rule `(id + 3x + 7y + 11c) mod 256` (same rule
    * as the PNG pixel table) through the full baseline JPEG stack at the
    * given quality, decode it back, and report exact dimensions plus the
    * error contract. JPEG is lossy, so unlike PNG the samples are not
    * bit-reproducible in SQL — instead `err_in_bound` asserts the
    * documented quality-100 reconstruction bound (DCT round-off only; see
    * [[Jpeg]]), the same error-contract oracle style as the sketches.
    * `max_abs_err` is measured but intentionally NOT emitted (engine-
    * specific); the specs assert on it directly.
    */
  def jpegRoundTripCheck(spark: SparkSession, docs: DataFrame, idCol: String,
                         quality: Int = 100, bound: Int = 4): DataFrame = {
    import spark.implicits._
    // scan-parallelism guard (no-op at scale): the per-id encode+decode
    // is pure CPU and ran single-threaded off a one-split input
    Spread(docs.select(col(idCol).cast("long").as("__mid")), col("__mid")).as[Long]
      .mapPartitions(_.map { id =>
        require(id >= 0, s"jpegRoundTripCheck: negative media id $id")
        val w = (id % 32 + 8).toInt
        val h = (id % 24 + 8).toInt
        val ch = (id % 4 + 1).toInt
        def rule(x: Int, y: Int, c: Int) = ((id + 3L * x + 7L * y + 11L * c) % 256).toInt
        val img = Jpeg.decode(Jpeg.encode(w, h, ch, quality, rule))
          .getOrElse(sys.error(s"jpeg round trip failed to decode for id $id"))
        var maxErr = 0
        var i = 0
        while (i < img.pixels.length) {
          val c = i % ch; val x = (i / ch) % w; val y = i / (ch * w)
          val e = math.abs((img.pixels(i) & 0xff) - rule(x, y, c))
          if (e > maxErr) maxErr = e
          i += 1
        }
        (id, img.width, img.height, img.channels,
          img.pixels.length.toLong, maxErr <= bound)
      }).toDF("media_id", "width", "height", "channels", "n_samples", "err_in_bound")
  }

  /** Frame sampling as pure expressions: cut the payload into fixed-stride
    * "frames" and keep every `everyNth` one — the plan shape of video
    * frame-sampling (generator + projection), minus the codec.
    */
  def sampleFrames(media: DataFrame, frameBytes: Int, everyNth: Int): DataFrame = {
    val nFrames = ceil(octet_length(col("payload")).cast("double") / frameBytes).cast("int")
    media
      .select(col("media_id"), col("payload"),
        explode(sequence(lit(0), greatest(nFrames - 1, lit(0)))).as("frame_idx"))
      .filter(pmod(col("frame_idx"), lit(everyNth)) === 0)
      .select(col("media_id"), col("frame_idx"),
        col("payload").substr(col("frame_idx") * frameBytes + 1, lit(frameBytes))
          .as("frame_bytes"))
  }
}
