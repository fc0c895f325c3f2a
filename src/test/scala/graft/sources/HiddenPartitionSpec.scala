package graft.sources

import graft.SparkSpec
import graft.sources.ManifestTable.PartitionTransform
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Generated partition columns (hidden partitioning, Delta generated-
  * columns shape): the table derives `days(ts)` / `bucket(n, id)` /
  * `trunc(k, s)` partition values at write, and source-column predicates
  * prune partitions automatically at read.
  */
class HiddenPartitionSpec extends SparkSpec {
  import spark.implicits._

  private def days30(tag: String): String = {
    val path = Files.createTempDirectory(s"hp_$tag").toString + "/t"
    val df = spark.range(300).select(col("id"),
      expr("timestamp '2024-01-01 00:00:00' + make_interval(0,0,0,0,CAST(id AS INT),0,0)").as("ts"),
      (col("id") % 7).as("k"))
    // 300 hourly events → 13 day partitions
    ManifestTable.overwrite(spark, path, df,
      transforms = Seq(PartitionTransform("ts_day", "days", 0, "ts")))
    path
  }

  test("days(): table partitions by derived day; writers never supply it") {
    val path = days30("days")
    val m = ManifestTable.readManifest(spark, path, 1L)
    assert(m.partitionCols === Seq("ts_day"))
    assert(m.transforms === Seq(PartitionTransform("ts_day", "days", 0, "ts")))
    val got = ManifestTable.read(spark, path)
    assert(got.columns.contains("ts_day"))
    assert(got.count() === 300L)
    // derived value always agrees with the source column
    assert(got.filter(col("ts_day") =!= date_format(col("ts"), "yyyy-MM-dd"))
      .count() === 0L)
    // append WITHOUT the derived column: injected automatically
    ManifestTable.append(spark, path,
      Seq((999L, java.sql.Timestamp.valueOf("2024-02-01 12:00:00"), 1L))
        .toDF("id", "ts", "k"))
    assert(ManifestTable.read(spark, path).filter(col("id") === 999L)
      .select("ts_day").as[String].head() === "2024-02-01")
  }

  test("source-column range predicate prunes day partitions (implied filter → PartitionFilters)") {
    import org.apache.spark.sql.sources.{GreaterThanOrEqual, LessThan}
    val path = days30("prune")
    // SQL end-to-end result first
    spark.sql("DROP TABLE IF EXISTS hp_t")
    spark.sql(s"CREATE TABLE hp_t USING graft OPTIONS (path '$path')")
    try {
      assert(spark.sql(
        "SELECT id FROM hp_t WHERE ts >= TIMESTAMP '2024-01-10 00:00:00' " +
          "AND ts < TIMESTAMP '2024-01-12 00:00:00'").count() === 48L)
    } finally spark.sql("DROP TABLE IF EXISTS hp_t"): Unit
    // the inner scan (what buildScan executes) carries the implied
    // ts_day partition filter and opens only the 2 matching day dirs
    val rel = new GraftRelation(spark.sqlContext, path, None)
    val inner = rel.innerScan(Array("id"), Array(
      GreaterThanOrEqual("ts", java.sql.Timestamp.valueOf("2024-01-10 00:00:00")),
      LessThan("ts", java.sql.Timestamp.valueOf("2024-01-12 00:00:00"))))
    assert(inner.count() === 48L)
    val plan = inner.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [") && plan.contains("ts_day"),
      s"expected ts_day partition filters in:\n${plan.take(1500)}")
    // count opened DAY DIRECTORIES (a day may hold several files)
    def days(df: org.apache.spark.sql.DataFrame): Long = df
      .select(regexp_extract(input_file_name(), "ts_day=([0-9-]+)", 1).as("d"))
      .distinct().count()
    val opened = days(inner)
    val total = days(ManifestTable.read(spark, path))
    assert(total >= 13L && opened === 2L, s"opened $opened of $total day dirs")
  }

  test("hours(): a 2-hour source predicate opens exactly 2 hour dirs; months()/years() derive and prune too") {
    import org.apache.spark.sql.sources.{GreaterThanOrEqual, LessThan}
    val path = Files.createTempDirectory("hp_hours").toString + "/t"
    // 288 events at 10-minute steps → 48 hour dirs over 2 days
    val df = spark.range(288).select(col("id"),
      expr("timestamp '2024-01-01 00:00:00' + make_interval(0,0,0,0,0,CAST(id*10 AS INT),0)").as("ts"))
    ManifestTable.overwrite(spark, path, df,
      transforms = Seq(PartitionTransform("ts_hour", "hours", 0, "ts")))
    val got = ManifestTable.read(spark, path)
    assert(got.count() === 288L)
    assert(got.filter(col("ts_hour") =!= date_format(col("ts"), "yyyy-MM-dd-HH"))
      .count() === 0L, "derived hour always agrees with the source")
    val rel = new GraftRelation(spark.sqlContext, path, None)
    val inner = rel.innerScan(Array("id"), Array(
      GreaterThanOrEqual("ts", java.sql.Timestamp.valueOf("2024-01-01 05:00:00")),
      LessThan("ts", java.sql.Timestamp.valueOf("2024-01-01 07:00:00"))))
    assert(inner.count() === 12L) // 2 hours × 6 events
    val plan = inner.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [") && plan.contains("ts_hour"),
      s"expected ts_hour partition filters in:\n${plan.take(1500)}")
    def hours(d: org.apache.spark.sql.DataFrame): Long = d
      .select(regexp_extract(input_file_name(), "ts_hour=([0-9-]+)", 1).as("h"))
      .distinct().count()
    val opened = hours(inner)
    val total = hours(ManifestTable.read(spark, path))
    assert(total === 48L && opened === 2L, s"opened $opened of $total hour dirs")
    // a NON-boundary strict upper bound must widen to include its hour
    val widened = rel.innerScan(Array("id"), Array(
      LessThan("ts", java.sql.Timestamp.valueOf("2024-01-01 05:00:01"))))
    assert(hours(widened) === 6L, "05:00:01 strict bound still opens hour 05")

    // months(): 90 daily events → 3 month dirs; a 1-month range opens 1
    val mpath = Files.createTempDirectory("hp_months").toString + "/t"
    ManifestTable.overwrite(spark, mpath,
      spark.range(90).select(col("id"),
        expr("timestamp '2024-01-01 00:00:00' + make_interval(0,0,0,CAST(id AS INT),0,0,0)").as("ts")),
      transforms = Seq(PartitionTransform("ts_month", "months", 0, "ts")))
    val mrel = new GraftRelation(spark.sqlContext, mpath, None)
    val minner = mrel.innerScan(Array("id"), Array(
      GreaterThanOrEqual("ts", java.sql.Timestamp.valueOf("2024-02-01 00:00:00")),
      LessThan("ts", java.sql.Timestamp.valueOf("2024-03-01 00:00:00"))))
    assert(minner.count() === 29L) // Feb 2024
    assert(minner.select(regexp_extract(input_file_name(), "ts_month=([0-9-]+)", 1))
      .distinct().count() === 1L)

    // years(): 3 yearly rows → year dirs, equality opens one
    val ypath = Files.createTempDirectory("hp_years").toString + "/t"
    ManifestTable.overwrite(spark, ypath,
      Seq((1L, java.sql.Timestamp.valueOf("2022-06-01 00:00:00")),
        (2L, java.sql.Timestamp.valueOf("2023-06-01 00:00:00")),
        (3L, java.sql.Timestamp.valueOf("2024-06-01 00:00:00")))
        .toDF("id", "ts"),
      transforms = Seq(PartitionTransform("ts_year", "years", 0, "ts")))
    val yrel = new GraftRelation(spark.sqlContext, ypath, None)
    val yinner = yrel.innerScan(Array("id"), Array(
      GreaterThanOrEqual("ts", java.sql.Timestamp.valueOf("2023-01-01 00:00:00")),
      LessThan("ts", java.sql.Timestamp.valueOf("2024-01-01 00:00:00"))))
    assert(yinner.as[Long].collect() === Array(2L))
    assert(yinner.select(input_file_name()).distinct().count() === 1L)
  }

  test("bucket(): equality on the source key prunes to one bucket") {
    import org.apache.spark.sql.sources.EqualTo
    val path = Files.createTempDirectory("hp_bucket").toString + "/t"
    ManifestTable.overwrite(spark, path,
      spark.range(1000).select(col("id"), (col("id") * 3).as("v")),
      transforms = Seq(PartitionTransform("id_bucket", "bucket", 8, "id")))
    spark.sql("DROP TABLE IF EXISTS hp_b")
    spark.sql(s"CREATE TABLE hp_b USING graft OPTIONS (path '$path')")
    try {
      assert(spark.sql("SELECT v FROM hp_b WHERE id = 123").as[Long]
        .collect() === Array(369L))
    } finally spark.sql("DROP TABLE IF EXISTS hp_b"): Unit
    val rel = new GraftRelation(spark.sqlContext, path, None)
    val inner = rel.innerScan(Array("v"), Array(EqualTo("id", 123L)))
    assert(inner.as[Long].collect() === Array(369L))
    val opened = inner.select(input_file_name()).distinct().count()
    val total = ManifestTable.read(spark, path)
      .select(input_file_name()).distinct().count()
    assert(total >= 8L && opened * 4 <= total,
      s"bucket pruning should open ~1/8 of files, opened $opened/$total")
  }

  test("trunc(): prefix and range predicates on the source prune prefix partitions") {
    import org.apache.spark.sql.sources.{StringStartsWith, GreaterThanOrEqual}
    val path = Files.createTempDirectory("hp_trunc").toString + "/t"
    // keys aa-0 … ee-249 → 25 two-char-prefix partitions
    val df = spark.range(250).select(col("id"),
      expr("concat(char(97 + CAST(id % 5 AS INT)), " +
        "char(97 + CAST((id DIV 5) % 5 AS INT)), '-', id)").as("k"))
    ManifestTable.overwrite(spark, path, df,
      transforms = Seq(PartitionTransform("k2", "trunc", 2, "k")))
    val rel = new GraftRelation(spark.sqlContext, path, None)
    def dirs(d: org.apache.spark.sql.DataFrame): Long = d
      .select(regexp_extract(input_file_name(), "k2=([a-z]+)", 1)).distinct().count()
    val all = ManifestTable.read(spark, path)
    // LIKE 'ab%' (prefix ≥ trunc width) pins ONE partition
    val pre = rel.innerScan(Array("id"), Array(StringStartsWith("k", "ab")))
    assert(pre.select("id").as[Long].collect().sorted ===
      all.filter(col("k").startsWith("ab")).select("id").as[Long].collect().sorted)
    assert(dirs(pre) === 1L, "a full-width prefix must open exactly its partition")
    // k >= 'ca' opens only prefixes >= 'ca' (truncation is monotone)
    val rng = rel.innerScan(Array("id"), Array(GreaterThanOrEqual("k", "ca")))
    assert(rng.select("id").as[Long].collect().sorted ===
      all.filter(col("k") >= "ca").select("id").as[Long].collect().sorted)
    assert(dirs(rng) === 15L, s"expected the 15 c*/d*/e* dirs, got ${dirs(rng)}")
  }

  test("merge and update re-derive: a source-column change moves the partition") {
    val path = days30("move")
    // merge a replacement whose ts moved to another day
    ManifestTable.merge(spark, path,
      Seq((5L, java.sql.Timestamp.valueOf("2024-03-03 00:00:00"), 0L))
        .toDF("id", "ts", "k"),
      keys = Seq("id"))
    val afterMerge = ManifestTable.read(spark, path).filter(col("id") === 5L)
    assert(afterMerge.select("ts_day").as[String].head() === "2024-03-03")
    // update SET ts: derived col follows
    ManifestTable.update(spark, path, col("id") === 6L,
      Seq("ts" -> lit(java.sql.Timestamp.valueOf("2024-04-04 00:00:00"))))
    assert(ManifestTable.read(spark, path).filter(col("id") === 6L)
      .select("ts_day").as[String].head() === "2024-04-04")
    // direct SET of the generated column is rejected
    val e = intercept[RuntimeException] {
      ManifestTable.update(spark, path, col("id") === 7L,
        Seq("ts_day" -> lit("1999-01-01")))
    }
    assert(e.getMessage.contains("generated partition column"))
  }

  test("transforms declare through the DataFrame writer option") {
    val path = Files.createTempDirectory("hp_opt").toString + "/t"
    spark.range(50).select(col("id"),
        expr("timestamp '2024-06-01 00:00:00' + make_interval(0,0,0,CAST(id AS INT),0,0,0)").as("ts"))
      .write.format("graft")
      .option("path", path)
      .option("transforms", "ts_day:days:0:ts")
      .mode("overwrite").save()
    val m = ManifestTable.readManifest(spark, path, 1L)
    assert(m.transforms === Seq(PartitionTransform("ts_day", "days", 0, "ts")))
    assert(ManifestTable.read(spark, path)
      .filter(col("ts_day") =!= date_format(col("ts"), "yyyy-MM-dd")).count() === 0L)
    // appends through the writer inherit the table's transforms
    Seq((100L, java.sql.Timestamp.valueOf("2024-08-08 00:00:00")))
      .toDF("id", "ts").write.format("graft")
      .option("path", path).mode("append").save()
    assert(ManifestTable.read(spark, path).filter(col("id") === 100L)
      .select("ts_day").as[String].head() === "2024-08-08")
  }

  test("composition: deletion vectors, constraints and time travel on a transform-partitioned table") {
    val path = days30("comp")
    ManifestTable.addConstraint(spark, path, "k_small", "k < 100")
    // DV delete on the transform-partitioned table: no file rewritten,
    // partition dirs untouched, reads correct
    val v = ManifestTable.deleteVectorized(spark, path, col("id") < 24)
    assert(ManifestTable.read(spark, path).count() === 276L)
    assert(ManifestTable.read(spark, path)
      .filter(col("ts_day") === "2024-01-01").count() === 0L,
      "day 1's 24 rows are all DV-deleted")
    // time travel under the partition transform
    assert(ManifestTable.readVersion(spark, path, 1L).count() === 300L)
    // constraint still gates an append, and the append carries the DVs
    intercept[RuntimeException] {
      ManifestTable.append(spark, path,
        Seq((500L, java.sql.Timestamp.valueOf("2024-01-20 00:00:00"), 999L))
          .toDF("id", "ts", "k"))
    }
    ManifestTable.append(spark, path,
      Seq((500L, java.sql.Timestamp.valueOf("2024-01-20 00:00:00"), 9L))
        .toDF("id", "ts", "k"))
    assert(ManifestTable.read(spark, path).count() === 277L)
    assert(ManifestTable.read(spark, path).filter(col("id") < 24).count() === 0L,
      "DV-deleted rows must stay deleted across the append")
    // PURGE materializes and the history surface saw every step
    ManifestTable.rewriteDeletes(spark, path)
    assert(ManifestTable.read(spark, path).count() === 277L)
    assert(ManifestTable.history(spark, path).count() === v + 2)
  }

  test("transform-partitioned writes cluster by the derived columns: one file per bucket dir") {
    val path = Files.createTempDirectory("hp_cluster").toString + "/t"
    // a deliberately mis-clustered source: a range-by-key layout never
    // aligns with the xxhash64 bucketing, so without table-side
    // clustering every source task writes every bucket dir (~8×16
    // files). The table must hash-cluster on the DERIVED bucket itself.
    ManifestTable.overwrite(spark, path,
      spark.range(0, 10000, 1, 8).select(col("id"), (col("id") * 3).as("v"))
        .repartitionByRange(8, col("id")),
      transforms = Seq(PartitionTransform("id_bucket", "bucket", 16, "id")))
    val m = ManifestTable.readManifest(spark, path, 1L)
    assert(m.files.size === 16,
      s"expected one file per bucket dir, got ${m.files.size}")
    // appends get the same discipline from the table, not the caller
    ManifestTable.append(spark, path,
      spark.range(10000, 20000, 1, 8).select(col("id"), (col("id") * 3).as("v")))
    val m2 = ManifestTable.readManifest(spark, path, 2L)
    assert(m2.files.size === 32,
      s"append should add one file per bucket, got ${m2.files.size - 16}")
    assert(ManifestTable.read(spark, path).count() === 20000L)
  }

  test("a narrow-typed append derives buckets at the DECLARED type; pruned reads find the rows") {
    import org.apache.spark.sql.sources.EqualTo
    val path = Files.createTempDirectory("hp_narrow").toString + "/t"
    // id declared LONG
    ManifestTable.overwrite(spark, path,
      spark.range(100).select(col("id"), (col("id") * 3).as("v")),
      transforms = Seq(PartitionTransform("id_bucket", "bucket", 4, "id")))
    // the batch arrives with id as INT — accepted (lossless upcast), but
    // xxhash64(int) != xxhash64(long): the table must cast to the
    // declared type BEFORE hashing or the row lands in a directory the
    // pruned read (which hashes its literal at the declared type) never
    // opens
    ManifestTable.append(spark, path,
      Seq((1000, 9L)).toDF("id", "v"))
    assert(ManifestTable.read(spark, path).filter(col("id") === 1000L).count() === 1L)
    val rel = new GraftRelation(spark.sqlContext, path, None)
    val inner = rel.innerScan(Array("v"), Array(EqualTo("id", 1000L)))
    assert(inner.as[Long].collect() === Array(9L),
      "the narrow batch's row must sit in the directory the implied bucket filter opens")
  }

  test("widening a partition-transform source column is rejected") {
    val path = Files.createTempDirectory("hp_widen").toString + "/t"
    // id declared INT
    ManifestTable.overwrite(spark, path,
      spark.range(100).select(col("id").cast("int").as("id"), (col("id") * 3).as("v")),
      transforms = Seq(PartitionTransform("id_bucket", "bucket", 4, "id")))
    val e = intercept[IllegalArgumentException] {
      ManifestTable.append(spark, path,
        Seq((1000L, 9L)).toDF("id", "v")) // id LONG: would widen the declared type
    }
    assert(e.getMessage.contains("partition-transform source"),
      s"expected the transform-widening rejection, got: ${e.getMessage.take(200)}")
  }

  test("a caller-supplied derived value is ignored and re-derived") {
    val path = days30("lie")
    // batch CLAIMS day 1999-01-01 for a 2024 timestamp — the table's
    // derivation must win or pruning would silently miss the row
    ManifestTable.append(spark, path,
      Seq((777L, java.sql.Timestamp.valueOf("2024-05-05 08:00:00"), 2L, "1999-01-01"))
        .toDF("id", "ts", "k", "ts_day"))
    assert(ManifestTable.read(spark, path).filter(col("id") === 777L)
      .select("ts_day").as[String].head() === "2024-05-05")
  }
}
