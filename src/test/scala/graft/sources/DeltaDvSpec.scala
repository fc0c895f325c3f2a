package graft.sources

import org.scalatest.funsuite.AnyFunSuite
import org.apache.hadoop.fs.Path

/** The [[DeltaDv]] codec: Base85 (RFC 1924 alphabet), the portable
  * 64-bit roaring-bitmap-array serialization, and the framed DV file
  * format — every channel round-trips, every redundant check (size,
  * CRC, magic, key order) fails loudly on tampering. The codec is the
  * load-bearing piece of DV'd-Delta conversion: a silent drift here
  * would commit a wrong live row set, so the spec leans on adversarial
  * arms, not just happy paths.
  */
class DeltaDvSpec extends AnyFunSuite {

  private def localFs = new Path("/tmp").getFileSystem(
    new org.apache.hadoop.conf.Configuration())

  test("base85 round-trips, rejects bad lengths and illegal characters") {
    val rnd = new scala.util.Random(7)
    for (len <- Seq(4, 8, 16, 64, 4096)) {
      val bytes = Array.fill(len)(rnd.nextInt().toByte)
      val enc = DeltaDv.encode85(bytes)
      assert(enc.length === len / 4 * 5)
      assert(DeltaDv.decode85(enc, len).toSeq === bytes.toSeq)
    }
    // padded decode: true length recovers, nonzero pad refuses
    val three = Array[Byte](1, 2, 3)
    val padded = java.util.Arrays.copyOf(three, 4)
    val enc = DeltaDv.encode85(padded)
    assert(DeltaDv.decode85(enc, 3).toSeq === three.toSeq)
    intercept[IllegalArgumentException](DeltaDv.encode85(three))
    intercept[IllegalArgumentException](DeltaDv.decode85("abc", 2))
    intercept[IllegalArgumentException](DeltaDv.decode85("ab\"cd", 4))
    // a nonzero byte hiding past the declared length must refuse —
    // truncation would silently change the bitmap
    val enc2 = DeltaDv.encode85(Array[Byte](1, 2, 3, 4))
    intercept[IllegalArgumentException](DeltaDv.decode85(enc2, 3))
  }

  test("uuid round-trips at exactly 20 chars; storageType-u paths derive with and without prefix") {
    for (_ <- 1 to 20) {
      val u = java.util.UUID.randomUUID()
      val enc = DeltaDv.encodeUUID(u)
      assert(enc.length === 20)
      assert(DeltaDv.decodeUUID(enc) === u)
    }
    val u = java.util.UUID.fromString("00000000-0000-0001-0000-000000000002")
    assert(DeltaDv.relativePathOf(DeltaDv.encodeUUID(u)) ===
      s"deletion_vector_$u.bin")
    assert(DeltaDv.relativePathOf("ab" + DeltaDv.encodeUUID(u)) ===
      s"ab/deletion_vector_$u.bin")
  }

  test("portable bitmap round-trips: single key, multi-key (>2^32), empty; native magic and bad keys refuse") {
    val small = Array(0L, 3L, 7L, 1000000L)
    assert(DeltaDv.positionsOf(DeltaDv.serializeBitmap(small)).toSeq ===
      small.toSeq)
    // positions spanning multiple 32-bit keys — the array part of the
    // format (explicit int32 keys, strictly increasing)
    val multi = Array(5L, (1L << 32) + 9L, (1L << 32) + 10L, (3L << 32) + 1L)
    assert(DeltaDv.positionsOf(DeltaDv.serializeBitmap(multi)).toSeq ===
      multi.toSeq)
    assert(DeltaDv.positionsOf(DeltaDv.serializeBitmap(Array.empty[Long]))
      .isEmpty)
    // dense run (tests run-optimized container round-trip)
    val run = (100L until 5000L).toArray
    assert(DeltaDv.positionsOf(DeltaDv.serializeBitmap(run)).toSeq ===
      run.toSeq)
    // the NATIVE serialization magic refuses by NAME
    val native = DeltaDv.serializeBitmap(small).clone()
    val bb = java.nio.ByteBuffer.wrap(native)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.putInt(0, 1681511376)
    val eNative = intercept[IllegalArgumentException](
      DeltaDv.positionsOf(native))
    assert(eNative.getMessage.contains("NATIVE"))
    // garbage magic refuses too
    bb.putInt(0, 12345)
    intercept[IllegalArgumentException](DeltaDv.positionsOf(native))
  }

  test("DV file framing: write/read with descriptor offsets, size and CRC tampering refuse") {
    val dir = java.nio.file.Files.createTempDirectory("dvfile").toString
    val p = new Path(dir, "dv.bin")
    // RAW local fs: no hadoop-side .crc sidecar, so the tamper arm
    // exercises the CODEC's own CRC-32, not the wrapper's
    val f = new org.apache.hadoop.fs.RawLocalFileSystem()
    f.initialize(java.net.URI.create("file:///"),
      new org.apache.hadoop.conf.Configuration())
    val b1 = DeltaDv.serializeBitmap(Array(1L, 2L, 3L))
    val b2 = DeltaDv.serializeBitmap((0L until 2000L by 3L).toArray)
    val offs = DeltaDv.writeDvFile(f, p, Seq(b1, b2))
    assert(offs.head._1 === 1L, "first blob sits right after the version byte")
    offs.zip(Seq(b1, b2)).foreach { case ((off, size), blob) =>
      assert(size === blob.length)
      assert(DeltaDv.readBlob(f, p, off, size).toSeq === blob.toSeq)
      assert(DeltaDv.positionsOf(DeltaDv.readBlob(f, p, off, size)).toSeq ===
        DeltaDv.positionsOf(blob).toSeq)
    }
    // descriptor size that disagrees with the frame refuses
    val eSize = intercept[IllegalArgumentException](
      DeltaDv.readBlob(f, p, offs.head._1, offs.head._2 + 1))
    assert(eSize.getMessage.contains("size mismatch"))
    // flip one payload byte: CRC catches it
    val bytes = java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(dir, "dv.bin"))
    bytes(7) = (bytes(7) ^ 0x40).toByte
    java.nio.file.Files.write(java.nio.file.Paths.get(dir, "dv.bin"), bytes)
    val eCrc = intercept[IllegalArgumentException](
      DeltaDv.readBlob(f, p, offs.head._1, offs.head._2))
    assert(eCrc.getMessage.contains("checksum"))
  }

  test("descriptor resolution: inline decodes without IO; u resolves under the table root") {
    val conf = new org.apache.hadoop.conf.Configuration()
    val pos = Array(4L, 9L, 11L)
    val blob = DeltaDv.serializeBitmap(pos)
    val padded = java.util.Arrays.copyOf(blob, (blob.length + 3) / 4 * 4)
    val inline = DeltaDv.Desc("i", DeltaDv.encode85(padded), 0L,
      blob.length, 3L)
    assert(DeltaDv.positionsOf(inline, "/nowhere", conf).toSeq === pos.toSeq)

    val root = java.nio.file.Files.createTempDirectory("dvu").toString
    val uuid = java.util.UUID.randomUUID()
    val target = new Path(root, s"deletion_vector_$uuid.bin")
    val Seq((off, size)) = DeltaDv.writeDvFile(localFs, target, Seq(blob))
    val onDisk = DeltaDv.Desc("u", DeltaDv.encodeUUID(uuid), off, size, 3L)
    assert(DeltaDv.positionsOf(onDisk, root, conf).toSeq === pos.toSeq)
    val eType = intercept[RuntimeException](DeltaDv.positionsOf(
      onDisk.copy(storageType = "z"), root, conf))
    assert(eType.getMessage.contains("storageType"))
  }
}
