package graft.operators

import graft.operators.Multimodal.PixelImage

/** Baseline sequential JPEG (ITU-T T.81 / ISO 10918-1) encoder + decoder,
  * pure JVM — no image library. This replaces the last stubbed layer of
  * the multimodal stack: the container walk, quantization, 8×8 DCT,
  * zigzag, and Huffman entropy coding are all real. A standards-compliant
  * JPEG viewer renders [[encode]]'s output; [[decode]] reads any baseline
  * 4:4:4 stream (tables come from the file's own DQT/DHT segments, so
  * files written with the standard Annex-K tables decode too).
  *
  * Scope (documented, loud): baseline DCT process only — 8-bit samples,
  * sampling factors 1×1 (4:4:4, no chroma subsampling), no progressive
  * (SOF2) scans, no restart intervals, 1-4 components. Components are
  * coded as independent planes per the spec; no RGB↔YCbCr transform is
  * applied on either side (color space is metadata in JFIF, not part of
  * the coding process — callers hand planes in, planes come back).
  *
  * Determinism + error contract: encode→decode is bit-deterministic
  * (fixed tables, IEEE double DCT). At quality 100 the quantization table
  * is all ones, so reconstruction error is DCT round-off only — bounded
  * by ±0.5 per coefficient ⇒ per-sample error ≤ 4 in the worst case,
  * empirically ≤ 2 on the fixtures. The registered query's oracle checks
  * exact dimensions plus that bound (the sketch-style error contract).
  *
  * Huffman tables are GENERATED uniform-length canonical tables (all 12
  * DC categories at 4 bits; all 162 AC run/size symbols at 8 bits) rather
  * than transcribed Annex-K frequency-tuned ones — legal (they ride in
  * DHT; Kraft sums 12/16 and 162/256, all-ones codes unused), simpler to
  * audit, and symmetric: the decoder rebuilds whatever tables the file
  * carries via the spec's canonical mincode/maxcode/valptr algorithm.
  */
object Jpeg {

  // natural-order index of each zigzag position (T.81 figure A.6)
  private val Zigzag: Array[Int] = Array(
    0, 1, 8, 16, 9, 2, 3, 10,
    17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63)

  /** Annex-K.1 luminance quantization table (natural order). */
  private val StdQuant: Array[Int] = Array(
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99)

  /** IJG quality scaling: 100 → all ones (DCT round-off only), 50 → the
    * Annex-K table verbatim, lower → coarser. */
  def quantTable(quality: Int): Array[Int] = {
    require(quality >= 1 && quality <= 100, s"quality must be 1-100, got $quality")
    val scale = if (quality < 50) 5000 / quality else 200 - 2 * quality
    StdQuant.map(q => math.min(255, math.max(1, (q * scale + 50) / 100)))
  }

  /** Canonical Huffman table: `bits(i)` = number of codes of length i+1,
    * `vals` = symbols in code order. */
  private final case class HuffSpec(bits: Array[Int], vals: Array[Int])

  // all 12 DC magnitude categories at 4 bits (12 of 16 codes used)
  private val DcSpec = HuffSpec(
    Array(0, 0, 0, 12, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0), (0 to 11).toArray)

  // all 162 baseline AC symbols at 8 bits: EOB, (run,size) for run 0-15 /
  // size 1-10, ZRL — in that fixed order (162 of 256 codes used)
  private val AcSpec = HuffSpec(
    Array(0, 0, 0, 0, 0, 0, 0, 162, 0, 0, 0, 0, 0, 0, 0, 0),
    (Array(0x00) ++
      (for (run <- 0 to 15; size <- 1 to 10) yield (run << 4) | size) ++
      Array(0xF0)).map(identity))

  /** Encode-side code assignment: symbol → (code, length). */
  private def encodeTable(spec: HuffSpec): Array[Array[Int]] = {
    val out = Array.fill(256)(null: Array[Int])
    var code = 0
    var k = 0
    var len = 1
    while (len <= 16) {
      var i = 0
      while (i < spec.bits(len - 1)) {
        out(spec.vals(k)) = Array(code, len)
        code += 1; k += 1; i += 1
      }
      code <<= 1
      len += 1
    }
    out
  }

  private val DcEnc = encodeTable(DcSpec)
  private val AcEnc = encodeTable(AcSpec)

  // cosine basis and normalization for the reference DCT
  private val Cos: Array[Array[Double]] =
    Array.tabulate(8, 8)((x, u) => math.cos((2 * x + 1) * u * math.Pi / 16))
  private val Cn: Array[Double] =
    Array.tabulate(8)(u => if (u == 0) 1.0 / math.sqrt(2.0) else 1.0)

  /** Magnitude category of a DC difference / AC value (0 = zero). */
  private def category(v: Int): Int = {
    var a = math.abs(v); var n = 0
    while (a != 0) { a >>= 1; n += 1 }
    n
  }

  private final class BitWriter(bos: java.io.ByteArrayOutputStream) {
    private var acc = 0
    private var nbits = 0
    def put(code: Int, len: Int): Unit = {
      var i = len - 1
      while (i >= 0) {
        acc = (acc << 1) | ((code >>> i) & 1)
        nbits += 1
        if (nbits == 8) {
          bos.write(acc)
          if (acc == 0xFF) bos.write(0x00) // byte stuffing
          acc = 0; nbits = 0
        }
        i -= 1
      }
    }
    def flush(): Unit = if (nbits > 0) { // pad with 1-bits per spec
      acc = (acc << (8 - nbits)) | ((1 << (8 - nbits)) - 1)
      bos.write(acc)
      if (acc == 0xFF) bos.write(0x00)
      acc = 0; nbits = 0
    }
  }

  /** Real baseline JPEG encode of 8-bit planes. `pixel(x, y, c)` supplies
    * samples (low 8 bits taken); blocks at the right/bottom edge pad by
    * edge replication (standard practice — padding never reaches the
    * decoded crop).
    */
  def encode(width: Int, height: Int, channels: Int, quality: Int,
             pixel: (Int, Int, Int) => Int): Array[Byte] = {
    require(width > 0 && height > 0, s"bad dims ${width}x$height")
    require(channels >= 1 && channels <= 4, s"channels must be 1-4, got $channels")
    val quant = quantTable(quality)
    val bos = new java.io.ByteArrayOutputStream(1024)
    def be16(v: Int): Unit = { bos.write((v >>> 8) & 0xff); bos.write(v & 0xff) }
    def seg(marker: Int, data: Array[Int]): Unit = {
      bos.write(0xFF); bos.write(marker); be16(data.length + 2)
      data.foreach(bos.write)
    }
    bos.write(0xFF); bos.write(0xD8) // SOI
    seg(0xE0, Array('J', 'F', 'I', 'F', 0, 1, 1, 0, 0, 1, 0, 1, 0, 0))
    // DQT: table 0, 8-bit precision, zigzag order
    seg(0xDB, Array(0x00) ++ Zigzag.map(quant))
    // SOF0: baseline, 8-bit, all components 1x1 sampling, quant table 0
    seg(0xC0, Array(8, height >>> 8, height & 0xff, width >>> 8, width & 0xff,
      channels) ++ (1 to channels).flatMap(c => Seq(c, 0x11, 0)))
    // DHT: DC table 0 then AC table 0 (class<<4 | id)
    seg(0xC4, Array(0x00) ++ DcSpec.bits ++ DcSpec.vals)
    seg(0xC4, Array(0x10) ++ AcSpec.bits ++ AcSpec.vals)
    // SOS: every component uses DC 0 / AC 0; spectral selection 0-63
    seg(0xDA, Array(channels) ++ (1 to channels).flatMap(c => Seq(c, 0x00)) ++
      Array(0, 63, 0))

    val bw = new BitWriter(bos)
    val bw8 = (width + 7) / 8
    val bh8 = (height + 7) / 8
    val dcPred = new Array[Int](channels)
    val block = new Array[Double](64)
    val coef = new Array[Int](64)
    var by = 0
    while (by < bh8) {
      var bx = 0
      while (bx < bw8) {
        var c = 0
        while (c < channels) { // MCU: one 4:4:4 block per component
          // load + level shift, edge-replicated
          var y = 0
          while (y < 8) {
            val sy = math.min(by * 8 + y, height - 1)
            var x = 0
            while (x < 8) {
              val sx = math.min(bx * 8 + x, width - 1)
              block(y * 8 + x) = (pixel(sx, sy, c) & 0xff) - 128.0
              x += 1
            }
            y += 1
          }
          // reference FDCT + quantize (natural order)
          var v = 0
          while (v < 8) {
            var u = 0
            while (u < 8) {
              var s = 0.0
              var yy = 0
              while (yy < 8) {
                var xx = 0
                while (xx < 8) {
                  s += block(yy * 8 + xx) * Cos(xx)(u) * Cos(yy)(v)
                  xx += 1
                }
                yy += 1
              }
              val q = quant(v * 8 + u)
              coef(v * 8 + u) = math.round(0.25 * Cn(u) * Cn(v) * s / q).toInt
              u += 1
            }
            v += 1
          }
          // entropy: DC diff then AC run-lengths, zigzag order
          val dc = coef(0)
          val diff = dc - dcPred(c)
          dcPred(c) = dc
          val dcat = category(diff)
          bw.put(DcEnc(dcat)(0), DcEnc(dcat)(1))
          if (dcat > 0) {
            val bits = if (diff >= 0) diff else diff + (1 << dcat) - 1
            bw.put(bits, dcat)
          }
          var run = 0
          var k = 1
          while (k < 64) {
            val ac = coef(Zigzag(k))
            if (ac == 0) run += 1
            else {
              while (run >= 16) { bw.put(AcEnc(0xF0)(0), AcEnc(0xF0)(1)); run -= 16 }
              val s = category(ac)
              require(s <= 10, s"AC coefficient $ac out of baseline range")
              val sym = (run << 4) | s
              bw.put(AcEnc(sym)(0), AcEnc(sym)(1))
              val bits = if (ac >= 0) ac else ac + (1 << s) - 1
              bw.put(bits, s)
              run = 0
            }
            k += 1
          }
          if (run > 0) bw.put(AcEnc(0x00)(0), AcEnc(0x00)(1)) // EOB
          c += 1
        }
        bx += 1
      }
      by += 1
    }
    bw.flush()
    bos.write(0xFF); bos.write(0xD9) // EOI
    bos.toByteArray
  }

  // --- decoder ------------------------------------------------------------

  /** Decode-side canonical table (T.81 F.2.2.3): mincode/maxcode/valptr
    * per code length. */
  private final class HuffDec(bits: Array[Int], vals: Array[Int]) {
    val minCode = new Array[Int](17)
    val maxCode = Array.fill(17)(-1)
    val valPtr = new Array[Int](17)
    locally {
      var code = 0
      var k = 0
      var l = 1
      while (l <= 16) {
        if (bits(l - 1) > 0) {
          valPtr(l) = k
          minCode(l) = code
          code += bits(l - 1); k += bits(l - 1)
          maxCode(l) = code - 1
        }
        code <<= 1
        l += 1
      }
    }
    def value(len: Int, code: Int): Int = vals(valPtr(len) + code - minCode(len))
  }

  /** Entropy-segment bit reader with 0xFF00 unstuffing; hitting a real
    * marker (incl. EOI) ends the stream. */
  private final class BitReader(b: Array[Byte], start: Int) {
    private var pos = start
    private var acc = 0
    private var nbits = 0
    var hitMarker = false
    def bit(): Int = {
      if (nbits == 0) {
        if (pos >= b.length) { hitMarker = true; return -1 }
        var byte = b(pos) & 0xff
        pos += 1
        if (byte == 0xFF) {
          if (pos >= b.length) { hitMarker = true; return -1 }
          val next = b(pos) & 0xff
          if (next == 0x00) pos += 1 // stuffed 0xFF data byte
          else { hitMarker = true; return -1 } // a marker: scan is over
        }
        acc = byte; nbits = 8
      }
      nbits -= 1
      (acc >>> nbits) & 1
    }
    def receive(n: Int): Int = {
      var v = 0
      var i = 0
      while (i < n) {
        val x = bit(); if (x < 0) return Int.MinValue
        v = (v << 1) | x; i += 1
      }
      v
    }
    def decodeSym(t: HuffDec): Int = {
      var code = 0
      var l = 0
      while (l < 16) {
        val x = bit(); if (x < 0) return -1
        code = (code << 1) | x
        l += 1
        if (t.maxCode(l) >= 0 && code <= t.maxCode(l) && code >= t.minCode(l))
          return t.value(l, code)
      }
      -1
    }
  }

  private def extend(v: Int, size: Int): Int =
    if (size == 0) 0 else if (v < (1 << (size - 1))) v - (1 << size) + 1 else v

  /** Decode a baseline 4:4:4 JPEG back to raw planes. Returns None (never
    * throws) for: non-JPEG bytes, progressive or arithmetic scans,
    * subsampled components, restart intervals, 12-bit precision,
    * truncated or corrupt entropy data, or missing tables.
    */
  def decode(b: Array[Byte]): Option[PixelImage] = {
    if (b == null || b.length < 4 || (b(0) & 0xff) != 0xFF || (b(1) & 0xff) != 0xD8)
      return None
    try {
      val quants = new Array[Array[Int]](4) // natural order
      val dcTabs = new Array[HuffDec](4)
      val acTabs = new Array[HuffDec](4)
      var width = 0; var height = 0; var nComp = 0
      var compQ: Array[Int] = null // per-component quant table id
      var scanOrder: Array[(Int, Int, Int)] = null // (comp, dcId, acId)
      var pos = 2
      var scanStart = -1
      def u8(i: Int) = b(i) & 0xff
      def rd16(i: Int) = (u8(i) << 8) | u8(i + 1)
      while (scanStart < 0) {
        if (pos + 4 > b.length) return None
        if (u8(pos) != 0xFF) return None
        val marker = u8(pos + 1)
        if (marker == 0xD8 || (marker >= 0xD0 && marker <= 0xD7)) { pos += 2 }
        else if (marker == 0xD9) return None // EOI before any scan
        else {
          val len = rd16(pos + 2)
          if (len < 2 || pos + 2 + len > b.length) return None
          val seg = pos + 4
          marker match {
            case 0xDB => // DQT: one or more tables per segment
              var p = seg
              while (p < pos + 2 + len) {
                val prec = u8(p) >> 4; val id = u8(p) & 0x0f
                if (prec != 0 || id > 3) return None // 8-bit tables only
                val t = new Array[Int](64)
                var k = 0
                while (k < 64) { t(Zigzag(k)) = u8(p + 1 + k); k += 1 }
                quants(id) = t
                p += 65
              }
            case 0xC4 => // DHT: one or more tables per segment
              var p = seg
              while (p < pos + 2 + len) {
                val cls = u8(p) >> 4; val id = u8(p) & 0x0f
                if (cls > 1 || id > 3) return None
                val bits = Array.tabulate(16)(i => u8(p + 1 + i))
                val n = bits.sum
                if (n > 256 || p + 17 + n > pos + 2 + len) return None
                val vals = Array.tabulate(n)(i => u8(p + 17 + i))
                val t = new HuffDec(bits, vals)
                if (cls == 0) dcTabs(id) = t else acTabs(id) = t
                p += 17 + n
              }
            case 0xC0 | 0xC1 => // baseline (and extended-sequential) SOF
              if (u8(seg) != 8) return None // 8-bit precision only
              height = rd16(seg + 1); width = rd16(seg + 3); nComp = u8(seg + 5)
              if (nComp < 1 || nComp > 4) return None
              compQ = new Array[Int](nComp)
              var c = 0
              while (c < nComp) {
                if (u8(seg + 7 + 3 * c) != 0x11) return None // 4:4:4 only
                compQ(c) = u8(seg + 8 + 3 * c)
                c += 1
              }
            case 0xC2 | 0xC3 | 0xC5 | 0xC6 | 0xC7 | 0xC9 | 0xCA | 0xCB |
                 0xCD | 0xCE | 0xCF =>
              return None // progressive/arithmetic/lossless processes
            case 0xDD => return None // restart intervals unsupported
            case 0xDA => // SOS
              if (nComp == 0) return None // no SOF seen
              val ns = u8(seg)
              if (ns != nComp) return None // single interleaved scan only
              scanOrder = Array.tabulate(ns) { i =>
                (i, u8(seg + 2 + 2 * i) >> 4, u8(seg + 2 + 2 * i) & 0x0f)
              }
              scanStart = pos + 2 + len
            case _ => () // APPn / COM / others: skip
          }
          pos += 2 + len
        }
      }
      if (width <= 0 || height <= 0) return None
      for ((c, d, a) <- scanOrder)
        if (dcTabs(d) == null || acTabs(a) == null || quants(compQ(c)) == null)
          return None
      val br = new BitReader(b, scanStart)
      val bw8 = (width + 7) / 8
      val bh8 = (height + 7) / 8
      val planes = Array.fill(nComp)(new Array[Byte](width * height))
      val dcPred = new Array[Int](nComp)
      val coef = new Array[Int](64)
      var by = 0
      while (by < bh8) {
        var bx = 0
        while (bx < bw8) {
          for ((c, dId, aId) <- scanOrder) {
            java.util.Arrays.fill(coef, 0)
            val dSym = br.decodeSym(dcTabs(dId))
            if (dSym < 0 || dSym > 11) return None
            val dBits = br.receive(dSym)
            if (dBits == Int.MinValue) return None
            dcPred(c) += extend(dBits, dSym)
            coef(0) = dcPred(c)
            var k = 1
            while (k < 64) {
              val sym = br.decodeSym(acTabs(aId))
              if (sym < 0) return None
              if (sym == 0x00) k = 64 // EOB
              else if (sym == 0xF0) k += 16 // ZRL
              else {
                k += sym >> 4
                val size = sym & 0x0f
                if (k > 63) return None
                val bits = br.receive(size)
                if (bits == Int.MinValue) return None
                coef(Zigzag(k)) = extend(bits, size)
                k += 1
              }
            }
            // dequantize + reference IDCT + level shift into the plane crop
            val q = quants(compQ(c))
            val plane = planes(c)
            var y = 0
            while (y < 8) {
              val sy = by * 8 + y
              var x = 0
              while (x < 8) {
                val sx = bx * 8 + x
                if (sx < width && sy < height) {
                  var s = 0.0
                  var v = 0
                  while (v < 8) {
                    var u = 0
                    while (u < 8) {
                      val cf = coef(v * 8 + u)
                      if (cf != 0)
                        s += Cn(u) * Cn(v) * cf * q(v * 8 + u) * Cos(x)(u) * Cos(y)(v)
                      u += 1
                    }
                    v += 1
                  }
                  val px = math.round(0.25 * s + 128.0).toInt
                  plane(sy * width + sx) =
                    math.max(0, math.min(255, px)).toByte
                }
                x += 1
              }
              y += 1
            }
          }
          bx += 1
        }
        by += 1
      }
      // interleave planes back to (x, y, c) sample order
      val out = new Array[Byte](width * height * nComp)
      var i = 0
      while (i < width * height) {
        var c = 0
        while (c < nComp) { out(i * nComp + c) = planes(c)(i); c += 1 }
        i += 1
      }
      Some(PixelImage(width, height, nComp, out))
    } catch {
      case _: ArrayIndexOutOfBoundsException => None
    }
  }
}
