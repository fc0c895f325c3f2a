package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Round-18 optimization internals: the scan-parallelism guard and the
  * codegen'd vector folds that replaced interpreted HOF lambdas on the
  * PQ path. Pins (a) the guard's fire/no-op condition, (b) value
  * identity of the codegen folds against the HOF forms they replaced —
  * including the null/mismatch/empty edge semantics the PQ oracle
  * relies on.
  */
class SpreadSpec extends SparkSpec {
  import spark.implicits._

  test("Spread fires on a narrow input and no-ops at-or-above core count") {
    val narrow = Seq.tabulate(100)(i => (i.toLong, s"t$i")).toDF("id", "t")
      .coalesce(1)
    val spreadOut = Spread(narrow, col("id"))
    assert(spreadOut.rdd.getNumPartitions ===
      spark.sparkContext.defaultParallelism,
      "a 1-partition input must fan out to the session's cores")
    // results are the same multiset
    assert(spreadOut.collect().map(_.toSeq).sortBy(_.toString) ===
      narrow.collect().map(_.toSeq).sortBy(_.toString))

    val wide = narrow.repartition(spark.sparkContext.defaultParallelism + 2,
      col("id"))
    assert(Spread(wide, col("id")) eq wide,
      "an input already at/above core count must pass through untouched")
  }

  test("DotProduct/L2Squared match the interpreted HOF folds bit-for-bit") {
    val rnd = new scala.util.Random(7)
    val rows = Seq.tabulate(200)(i =>
      (i.toLong, Array.fill(16)(rnd.nextFloat() * 2 - 1),
        Array.fill(16)(rnd.nextFloat() * 2 - 1))).toDF("id", "a", "b")
    def hofDot = aggregate(zip_with(col("a"), col("b"),
      (x, y) => x.cast("double") * y.cast("double")), lit(0.0), (acc, v) => acc + v)
    def hofL2 = aggregate(zip_with(col("a"), col("b"),
      (x, y) => (x.cast("double") - y.cast("double")) *
        (x.cast("double") - y.cast("double"))), lit(0.0), (acc, v) => acc + v)
    val got = rows.select(col("id"),
      graft.functions.VectorDistances.dotProduct(col("a"), col("b")).as("d"),
      graft.functions.VectorDistances.l2Squared(col("a"), col("b")).as("l"),
      hofDot.as("hd"), hofL2.as("hl")).collect()
    got.foreach { r =>
      // bit-identical, not approximately equal: both are the same strict
      // left-to-right double fold
      assert(java.lang.Double.doubleToLongBits(r.getDouble(1)) ===
        java.lang.Double.doubleToLongBits(r.getDouble(3)), s"dot @id=${r.getLong(0)}")
      assert(java.lang.Double.doubleToLongBits(r.getDouble(2)) ===
        java.lang.Double.doubleToLongBits(r.getDouble(4)), s"l2 @id=${r.getLong(0)}")
    }
  }

  test("MaxAbs matches the interpreted greatest/abs HOF bit-for-bit") {
    val rnd = new scala.util.Random(11)
    val rows = Seq.tabulate(200)(i =>
      (i.toLong, Array.fill(16)(rnd.nextFloat() * 4 - 2))).toDF("id", "a")
    def hof = aggregate(col("a"), lit(0.0),
      (acc, y) => greatest(acc, abs(y.cast("double"))))
    rows.select(col("id"), graft.functions.VectorDistances.maxAbs(col("a")).as("m"),
      hof.as("h")).collect().foreach { r =>
      assert(java.lang.Double.doubleToLongBits(r.getDouble(1)) ===
        java.lang.Double.doubleToLongBits(r.getDouble(2)), s"id=${r.getLong(0)}")
    }
    // edge semantics mirror the HOF: empty -> 0.0, null array -> null,
    // null ELEMENT skipped (greatest ignores nulls)
    val edges = spark.sql(
      "SELECT 1L AS id, array(CAST(-3.5 AS FLOAT), CAST(NULL AS FLOAT)) AS a " +
        "UNION ALL SELECT 2L, array() " +
        "UNION ALL SELECT 3L, CAST(NULL AS ARRAY<FLOAT>)")
    val got = edges.select(col("id"),
      graft.functions.VectorDistances.maxAbs(col("a")).as("m"),
      aggregate(col("a"), lit(0.0),
        (acc, y) => greatest(acc, abs(y.cast("double")))).as("h")).collect()
      .map(r => r.getLong(0) ->
        ((if (r.isNullAt(1)) None else Some(r.getDouble(1))),
          (if (r.isNullAt(2)) None else Some(r.getDouble(2))))).toMap
    assert(got(1L)._1 === got(1L)._2); assert(got(1L)._1 === Some(3.5))
    assert(got(2L)._1 === got(2L)._2); assert(got(2L)._1 === Some(0.0))
    assert(got(3L)._1 === got(3L)._2); assert(got(3L)._1 === None)
  }

  test("vector fold edge semantics: mismatch/null-element null, empty 0.0") {
    import graft.functions.VectorDistances._
    val df = Seq(
      (1L, Array(1f, 2f), Array(3f, 4f)),          // plain
      (2L, Array(1f, 2f, 3f), Array(3f, 4f)),      // length mismatch -> null
      (3L, Array.empty[Float], Array.empty[Float]) // empty -> 0.0
    ).toDF("id", "a", "b")
      .union(Seq((4L, Array(1f, 2f), null.asInstanceOf[Array[Float]]))
        .toDF("id", "a", "b")) // null array -> null
    val out = df.select(col("id"), dotProduct(col("a"), col("b")).as("d"))
      .collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getDouble(1))))
      .toMap
    assert(out(1L) === Some(11.0))
    assert(out(2L) === None)
    assert(out(3L) === Some(0.0))
    assert(out(4L) === None)
    // null ELEMENT -> null (mirror of zip_with's null propagation)
    val withNullElem = spark.sql(
      "SELECT array(CAST(1.0 AS FLOAT), CAST(NULL AS FLOAT)) AS a, " +
        "array(CAST(1.0 AS FLOAT), CAST(2.0 AS FLOAT)) AS b")
      .select(dotProduct(col("a"), col("b")).as("d")).collect()
    assert(withNullElem(0).isNullAt(0))
  }
}
