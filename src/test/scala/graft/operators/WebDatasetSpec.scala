package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._
import java.nio.charset.StandardCharsets
import java.nio.file.Files

class WebDatasetSpec extends SparkSpec {
  import spark.implicits._

  test("round-trips binary payloads incl. 0-byte and exact-512-byte edge cases") {
    val dir = Files.createTempDirectory("wds_rt").toString
    val rows = Seq(
      ("a", Array[Byte]()),                       // empty payload
      ("b", Array.fill[Byte](512)(7)),            // exactly one block
      ("c", Array.fill[Byte](513)(-1)),           // one block + 1 (padding path)
      ("d", "héllo wörld".getBytes(StandardCharsets.UTF_8)))
    rows.toDF("k", "p").createOrReplaceTempView("wds_in")
    WebDataset.packShards(spark.table("wds_in"), "k", "p", dir, numShards = 2, ext = "bin")
    val back = WebDataset.readShards(spark, dir)
      .as[(String, Array[Byte])].collect().toMap
    assert(back.keySet === rows.map(r => s"${r._1}.bin").toSet)
    rows.foreach { case (k, p) =>
      assert(java.util.Arrays.equals(back(s"$k.bin"), p), s"payload mismatch for $k")
    }
  }

  test("export is deterministic: two packs produce byte-identical shards") {
    val d1 = Files.createTempDirectory("wds_d1").toString
    val d2 = Files.createTempDirectory("wds_d2").toString
    val df = spark.range(200).select(col("id").cast("string").as("k"),
      concat(lit("payload-"), col("id")).as("p"))
    WebDataset.packShards(df.repartition(7), "k", "p", d1, numShards = 3)
    WebDataset.packShards(df.repartition(3), "k", "p", d2, numShards = 3)
    val s1 = new java.io.File(d1).listFiles()
      .filter(_.getName.endsWith(".tar")).sortBy(_.getName)
    val s2 = new java.io.File(d2).listFiles()
      .filter(_.getName.endsWith(".tar")).sortBy(_.getName)
    assert(s1.map(_.getName).toSeq === s2.map(_.getName).toSeq)
    s1.zip(s2).foreach { case (a, b) =>
      assert(java.util.Arrays.equals(
        Files.readAllBytes(a.toPath), Files.readAllBytes(b.toPath)),
        s"${a.getName} differs between runs")
    }
  }

  test("shards are valid POSIX tar: GNU tar lists and extracts them") {
    val dir = Files.createTempDirectory("wds_gnu").toString
    Seq(("doc1", "alpha"), ("doc2", "beta\nlines"), ("doc3", ""))
      .toDF("k", "p").createOrReplaceTempView("wds_gnu_in")
    WebDataset.packShards(spark.table("wds_gnu_in"), "k", "p", dir, numShards = 1)
    val shard = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".tar")).head
    // list: entry names round-trip through an independent implementation
    val list = new ProcessBuilder("tar", "-tf", shard.getAbsolutePath).start()
    val names = scala.io.Source.fromInputStream(list.getInputStream).getLines().toList
    assert(list.waitFor() === 0, "GNU tar rejected the shard")
    assert(names.sorted === List("doc1.txt", "doc2.txt", "doc3.txt"))
    // extract: payload bytes agree
    val ex = Files.createTempDirectory("wds_ex").toFile
    val extract = new ProcessBuilder("tar", "-xf", shard.getAbsolutePath, "-C",
      ex.getAbsolutePath).start()
    assert(extract.waitFor() === 0, "GNU tar could not extract the shard")
    assert(new String(Files.readAllBytes(new java.io.File(ex, "doc2.txt").toPath),
      StandardCharsets.UTF_8) === "beta\nlines")
  }

  test("shard membership and order are key-determined (range partitioning)") {
    val dir = Files.createTempDirectory("wds_ord").toString
    val df = spark.range(100).select(
      format_string("k%03d", col("id")).as("k"), lit("x").as("p"))
    WebDataset.packShards(df, "k", "p", dir, numShards = 4)
    val back = WebDataset.readShards(spark, dir).select("entry").as[String].collect()
    assert(back.length === 100)
    // every shard holds a contiguous key range, in order
    val perShard = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".tar")).sortBy(_.getName).map { f =>
      val p = new ProcessBuilder("tar", "-tf", f.getAbsolutePath).start()
      val names = scala.io.Source.fromInputStream(p.getInputStream).getLines().toList
      p.waitFor(); names
    }
    perShard.foreach(names => assert(names === names.sorted, "intra-shard order"))
    val flat = perShard.flatten.toList
    assert(flat === flat.sorted, "shards tile the key range contiguously")
  }
}
