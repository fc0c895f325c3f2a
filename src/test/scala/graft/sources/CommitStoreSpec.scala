package graft.sources

import graft.SparkSpec
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** The [[CommitStore]] seam: the commit protocol's atomicity reduces to
  * one put-if-absent primitive, and the difference between having it and
  * not having it is OBSERVABLE — a doctored exists()+PUT store (the S3
  * shape: non-atomic check-then-write) lets two successful committers
  * claim the same version and silently loses one of them, while the
  * default CAS store turns the same race into a loud retry that lands
  * both. Also pins the selection plumbing (registry + reflection) and
  * tag create-exclusivity through the seam.
  */
/** Stand-in for hadoop-aws's precondition-failure surface exception —
  * file-scoped so its RUNTIME simple name is exactly
  * "RemoteFileChangedException", the name [[ConditionalPutCommitStore]]
  * matches (a method-local class would compile to `...$1`). */
private class RemoteFileChangedException(msg: String)
  extends java.io.IOException(msg)

/** Stand-in for an AWS SDK service exception: recognized STRUCTURALLY via
  * its `statusCode()` accessor, never via message text. */
private class FakeSdkServiceException(msg: String) extends RuntimeException(msg) {
  def statusCode(): Int = 412
}

class CommitStoreSpec extends SparkSpec {

  import spark.implicits._

  /** S3-PUT-shaped store: exists() check, then an UNCONDITIONAL create —
    * the TOCTOU window is `between`, where a test injects a concurrent
    * winner. Exactly what "rename" compiles to on an object store with
    * no CAS. */
  object TocTouStore extends CommitStore {
    @volatile var between: () => Unit = () => ()
    override def putIfAbsent(f: FileSystem, dir: Path, name: String,
                             bytes: Array[Byte]): Boolean = {
      if (f.exists(new Path(dir, name))) false
      else {
        val hook = between
        between = () => ()      // fire once — the injected commit itself
        hook()                  // must route through the store unhooked
        val out = f.create(new Path(dir, name), true)
        try out.write(bytes) finally out.close()
        true
      }
    }
  }
  CommitStore.register("toctou", TocTouStore)

  private def withStore[A](name: String)(body: => A): A = {
    spark.conf.set(CommitStore.ConfKey, name)
    try body finally spark.conf.unset(CommitStore.ConfKey)
  }

  test("non-atomic exists+PUT store: two committers both 'win' one version and a commit silently vanishes") {
    val path = Files.createTempDirectory("cs_toctou").toString + "/t"
    ManifestTable.overwrite(spark, path,
      Seq((1L, "base")).toDF("k", "v"))
    withStore("toctou") {
      // writer A enters the TOCTOU window (version 2 not yet taken);
      // writer B commits version 2 INSIDE it; A's blind PUT then clobbers
      TocTouStore.between = () =>
        ManifestTable.append(spark, path, Seq((3L, "B")).toDF("k", "v")): Unit
      val vA = ManifestTable.append(spark, path, Seq((2L, "A")).toDF("k", "v"))
      // both writers reported success at the same version — the broken
      // invariant a CAS-less object store deployment would ship
      assert(vA === 2L, "writer A believes it committed version 2")
      assert(ManifestTable.currentVersion(spark, path).contains(2L))
      val rows = ManifestTable.read(spark, path)
        .select("v").as[String].collect().toSet
      assert(rows === Set("base", "A"),
        s"writer B's successful commit must have silently vanished, got $rows")
    }
  }

  test("default CAS store: the same race loses loudly and rebases — both commits land") {
    val path = Files.createTempDirectory("cs_cas").toString + "/t"
    ManifestTable.overwrite(spark, path, Seq((1L, "base")).toDF("k", "v"))
    // same dance through a store that delegates to the REAL primitive but
    // injects writer B inside writer A's window: A's putIfAbsent then
    // returns false, commit throws ConcurrentModificationException, and
    // append's rebase loop re-attempts at version 3 — nothing vanishes
    object HookedRename extends CommitStore {
      @volatile var between: () => Unit = () => ()
      override def putIfAbsent(f: FileSystem, dir: Path, name: String,
                               bytes: Array[Byte]): Boolean = {
        val hook = between
        between = () => ()
        hook()
        RenameCommitStore.putIfAbsent(f, dir, name, bytes)
      }
    }
    CommitStore.register("hooked-rename", HookedRename)
    withStore("hooked-rename") {
      HookedRename.between = () =>
        ManifestTable.append(spark, path, Seq((3L, "B")).toDF("k", "v")): Unit
      val vA = ManifestTable.append(spark, path, Seq((2L, "A")).toDF("k", "v"))
      assert(vA === 3L, "writer A must have rebased past writer B's version 2")
      val rows = ManifestTable.read(spark, path)
        .select("v").as[String].collect().toSet
      assert(rows === Set("base", "A", "B"), "both commits land under CAS")
      assert(ManifestTable.currentVersion(spark, path).contains(3L))
    }
  }

  test("raw primitive: of N same-name putIfAbsent calls exactly one wins; bytes are the winner's") {
    val dir = new Path(Files.createTempDirectory("cs_prim").toString, "_manifests")
    val f = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val results = (1 to 8).map(i =>
      RenameCommitStore.putIfAbsent(f, dir, "m1.txt",
        s"writer-$i".getBytes("UTF-8")))
    assert(results.count(identity) === 1, s"exactly one winner, got $results")
    val winner = s"writer-${results.indexOf(true) + 1}"
    assert(new String(RenameCommitStore.read(f, dir, "m1.txt"), "UTF-8") === winner,
      "published bytes are exactly the winner's")
    // loser scratch must not accumulate
    val tmp = new Path(dir.getParent, "_tmp")
    assert(!f.exists(tmp) || f.listStatus(tmp).isEmpty,
      "losing putIfAbsent attempts must clean their scratch")
  }

  test("tag creation routes through the seam: concurrent CREATE of one name loses loudly") {
    val path = Files.createTempDirectory("cs_tag").toString + "/t"
    ManifestTable.overwrite(spark, path, Seq((1L, "x")).toDF("k", "v"))
    ManifestTable.createTag(spark, path, "release")
    val e = intercept[RuntimeException](
      ManifestTable.createTag(spark, path, "release"))
    assert(e.getMessage.contains("already exists"))
    // CREATE OR REPLACE still moves it (the swap-pin path)
    ManifestTable.append(spark, path, Seq((2L, "y")).toDF("k", "v"))
    ManifestTable.createTag(spark, path, "release", replace = true)
    assert(ManifestTable.tagVersion(spark, path, "release").contains(2L))
  }

  test("rename store refuses non-atomic object-store schemes loudly unless explicitly allowed") {
    // a local filesystem WEARING an s3a:// URI — the guard keys on the
    // scheme, which is exactly what a misconfigured deployment presents
    class FakeS3Fs extends org.apache.hadoop.fs.RawLocalFileSystem {
      override def getUri: java.net.URI = java.net.URI.create("s3a://fake-bucket")
    }
    val local = Files.createTempDirectory("cs_s3guard").toString
    val fake = new FakeS3Fs
    fake.initialize(java.net.URI.create("s3a://fake-bucket"),
      spark.sparkContext.hadoopConfiguration)
    val dir = new Path(local, "_manifests")
    val e = intercept[RuntimeException](
      RenameCommitStore.putIfAbsent(fake, dir, "m1.txt", "x".getBytes("UTF-8")))
    assert(e.getMessage.contains("s3a") &&
      e.getMessage.contains("conditional-put") &&
      e.getMessage.contains(RenameCommitStore.AllowNonAtomicKey),
      s"the refusal must name the scheme, the CAS alternative, and the opt-out: ${e.getMessage}")
    assert(!fake.exists(new Path(dir, "m1.txt")), "nothing may land on refusal")
    // the explicit opt-out accepts single-writer semantics
    spark.conf.set(RenameCommitStore.AllowNonAtomicKey, "true")
    try {
      assert(RenameCommitStore.putIfAbsent(fake, dir, "m1.txt",
        "x".getBytes("UTF-8")))
      assert(new String(RenameCommitStore.read(fake, dir, "m1.txt"),
        "UTF-8") === "x")
    } finally spark.conf.unset(RenameCommitStore.AllowNonAtomicKey)
  }

  test("conditional-put store: exclusive create claims, one winner of N, precondition failure at close is a clean loss") {
    val dir = new Path(Files.createTempDirectory("cs_cput").toString, "_manifests")
    val f = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // one winner of N same-name puts; the bytes are the winner's
    val results = (1 to 8).map(i =>
      ConditionalPutCommitStore.putIfAbsent(f, dir, "m1.txt",
        s"writer-$i".getBytes("UTF-8")))
    assert(results.count(identity) === 1, s"exactly one winner, got $results")
    val winner = s"writer-${results.indexOf(true) + 1}"
    assert(new String(ConditionalPutCommitStore.read(f, dir, "m1.txt"),
      "UTF-8") === winner)

    // the real S3 conditional-PUT shape: the object uploads AT CLOSE and
    // the precondition check fails there. Losses are recognized by TYPE,
    // never by message text: the S3A surface exception (matched by class
    // name — hadoop-aws is optional) and an SDK service exception whose
    // statusCode() structurally reads 412
    def failingFs(boom: => Throwable) = new org.apache.hadoop.fs.RawLocalFileSystem {
      override def create(p: Path, overwrite: Boolean,
                          bufferSize: Int, replication: Short, blockSize: Long,
                          progress: org.apache.hadoop.util.Progressable):
          org.apache.hadoop.fs.FSDataOutputStream =
        new org.apache.hadoop.fs.FSDataOutputStream(
          new java.io.ByteArrayOutputStream() {
            override def close(): Unit = throw boom
          }, null)
    }
    def init(f: org.apache.hadoop.fs.RawLocalFileSystem) = {
      f.initialize(java.net.URI.create("file:///"),
        spark.sparkContext.hadoopConfiguration); f
    }
    val fsS3a = init(failingFs(new RemoteFileChangedException(
      "PUT on m2.txt: precondition failed")))
    assert(!ConditionalPutCommitStore.putIfAbsent(fsS3a, dir, "m2.txt",
      "y".getBytes("UTF-8")),
      "the S3A precondition surface exception is a clean loss")
    val fs412 = init(failingFs(new java.io.IOException("upload failed",
      new FakeSdkServiceException("PreconditionFailed"))))
    assert(!ConditionalPutCommitStore.putIfAbsent(fs412, dir, "m2b.txt",
      "y".getBytes("UTF-8")),
      "a structural statusCode()==412 in the cause chain is a clean loss")

    // an UNRECOGNIZED failure at close leaves the outcome unknown — it
    // must propagate, never masquerade as a clean loss. That includes a
    // message that merely CONTAINS 412-ish text (a proxy error embedding
    // a status code must not read as 'nothing landed')
    val fsNet = init(failingFs(new java.io.IOException("connection reset by peer")))
    val e = intercept[java.io.IOException](
      ConditionalPutCommitStore.putIfAbsent(fsNet, dir, "m3.txt",
        "z".getBytes("UTF-8")))
    assert(e.getMessage.contains("connection reset"))
    val fsProxy = init(failingFs(new java.io.IOException(
      "proxy error: upstream returned 412; temp path already exists")))
    val e2 = intercept[java.io.IOException](
      ConditionalPutCommitStore.putIfAbsent(fsProxy, dir, "m4.txt",
        "z".getBytes("UTF-8")))
    assert(e2.getMessage.contains("proxy error"),
      "free-text 412/already-exists must rethrow, not classify as loss")
  }

  test("conditional-put store refuses object-store schemes whose conditional create is undeclared") {
    // a local filesystem WEARING an s3a:// URI and declaring nothing —
    // create(overwrite=false) there is HEAD-then-PUT, the condemned race
    class FakeS3Fs extends org.apache.hadoop.fs.RawLocalFileSystem {
      override def getUri: java.net.URI = java.net.URI.create("s3a://fake-bucket")
    }
    val local = Files.createTempDirectory("cs_cput_guard").toString
    val dir = new Path(local, "_manifests")
    def fresh() = {
      val f = new FakeS3Fs
      f.initialize(java.net.URI.create("s3a://fake-bucket"),
        new org.apache.hadoop.conf.Configuration(
          spark.sparkContext.hadoopConfiguration))
      f
    }
    val bare = fresh()
    val e = intercept[RuntimeException](
      ConditionalPutCommitStore.putIfAbsent(bare, dir, "m1.txt",
        "x".getBytes("UTF-8")))
    assert(e.getMessage.contains("s3a") &&
      e.getMessage.contains(ConditionalPutCommitStore.ConditionalCreateConf) &&
      e.getMessage.contains(ConditionalPutCommitStore.AssumeConditionalKey),
      s"the refusal must name the scheme, the knob, and the override: ${e.getMessage}")
    assert(!bare.exists(new Path(dir, "m1.txt")), "nothing may land on refusal")
    // the connector conf declares conditional create → proceeds
    val declared = fresh()
    declared.getConf.setBoolean(
      ConditionalPutCommitStore.ConditionalCreateConf, true)
    assert(ConditionalPutCommitStore.putIfAbsent(declared, dir, "m1.txt",
      "x".getBytes("UTF-8")))
    assert(new String(ConditionalPutCommitStore.read(declared, dir, "m1.txt"),
      "UTF-8") === "x")
    // the operator override accepts undeclared-but-atomic connectors
    spark.conf.set(ConditionalPutCommitStore.AssumeConditionalKey, "true")
    try assert(ConditionalPutCommitStore.putIfAbsent(fresh(), dir, "m2.txt",
      "x".getBytes("UTF-8")))
    finally spark.conf.unset(ConditionalPutCommitStore.AssumeConditionalKey)
    // HDFS/POSIX schemes need no declaration (create-exclusive is native)
    val plain = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(ConditionalPutCommitStore.putIfAbsent(plain, dir, "m3.txt",
      "x".getBytes("UTF-8")))
  }

  test("conditional-put store end-to-end: the injected race rebases loudly and both commits land") {
    val path = Files.createTempDirectory("cs_cput_e2e").toString + "/t"
    ManifestTable.overwrite(spark, path, Seq((1L, "base")).toDF("k", "v"))
    object HookedCput extends CommitStore {
      @volatile var between: () => Unit = () => ()
      override def putIfAbsent(f: FileSystem, dir: Path, name: String,
                               bytes: Array[Byte]): Boolean = {
        val hook = between
        between = () => ()
        hook()
        ConditionalPutCommitStore.putIfAbsent(f, dir, name, bytes)
      }
    }
    CommitStore.register("hooked-cput", HookedCput)
    withStore("hooked-cput") {
      HookedCput.between = () =>
        ManifestTable.append(spark, path, Seq((3L, "B")).toDF("k", "v")): Unit
      val vA = ManifestTable.append(spark, path, Seq((2L, "A")).toDF("k", "v"))
      assert(vA === 3L, "writer A must have rebased past writer B's version 2")
      val rows = ManifestTable.read(spark, path)
        .select("v").as[String].collect().toSet
      assert(rows === Set("base", "A", "B"), "both commits land under CAS")
    }
  }

  test("store selection: registry name, reflection fallback, and a loud unknown") {
    assert(CommitStore.forSession(spark) eq RenameCommitStore)
    withStore("toctou") {
      assert(CommitStore.forSession(spark) eq TocTouStore)
    }
    withStore("graft.sources.RenameCommitStore$") {
      assert(CommitStore.forSession(spark) eq RenameCommitStore)
    }
    withStore("no.such.Store") {
      val e = intercept[RuntimeException](CommitStore.forSession(spark))
      assert(e.getMessage.contains("no.such.Store"))
    }
  }
}
