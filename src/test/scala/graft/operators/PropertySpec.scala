package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property-based specs (SURVEY §5 test strategy: "time-dimension derivation
  * matches java.time ground truth (property-based over random epochs)";
  * anti-join and dedup invariants over generated inputs).
  */
class PropertySpec extends SparkSpec {

  /** Deterministic sampling from a ScalaCheck generator (the
    * scalatest-scalacheck bridge isn't on the offline classpath; raw Gen +
    * fixed seeds keeps the property style and reproducibility).
    */
  private def samples[A](gen: Gen[A], n: Int): Seq[A] =
    (1 to n).flatMap(i => gen.apply(Gen.Parameters.default, Seed(i.toLong)))

  import spark.implicits._

  private val epochMillisGen: Gen[Long] =
    Gen.choose(0L, 4102444800000L) // 1970..2100

  test("TimeDim parts match java.time for random epochs") {
    samples(Gen.listOfN(20, epochMillisGen), 8).foreach { epochs =>
      {
        val df = epochs.toDF("ms").select(TimeDim.fromEpochMillis(col("ms")).as("ts"))
        val rows = TimeDim(df, "ts").collect()
        rows.foreach { r =>
          val ldt = r.getTimestamp(0).toInstant.atZone(java.time.ZoneOffset.UTC)
          assert(r.getAs[Int]("hour") === ldt.getHour)
          assert(r.getAs[Int]("day") === ldt.getDayOfMonth)
          assert(r.getAs[Int]("month") === ldt.getMonthValue)
          assert(r.getAs[Int]("year") === ldt.getYear)
          assert(r.getAs[Int]("weekday") === ldt.getDayOfWeek.getValue - 1)
          assert(r.getAs[Int]("week") ===
            ldt.get(java.time.temporal.WeekFields.ISO.weekOfWeekBasedYear()))
        }
      }
    }
  }

  test("anti-join invariants: disjoint from existing, union covers staged") {
    val keyGen = Gen.listOfN(60, Gen.choose(0, 30))
    samples(Gen.zip(keyGen, keyGen), 8).foreach { case (stagedKeys, existingKeys) =>
      {
        val staged = stagedKeys.distinct.toDF("k")
        val existing = existingKeys.distinct.toDF("k")
        val out = AntiJoinInsert.newRows(staged, existing, Seq("k"))
          .as[Int].collect().toSet
        assert(out.intersect(existingKeys.toSet).isEmpty)
        assert(out.union(existingKeys.toSet).intersect(stagedKeys.toSet) === stagedKeys.toSet)
      }
    }
  }

  test("exact dedup is idempotent and order-insensitive") {
    samples(Gen.listOfN(50, Gen.choose(0, 12)), 8).foreach { xs =>
      {
        val df = xs.toDF("v")
        val once = Dedup.exact(df).as[Int].collect().sorted.toSeq
        val twice = Dedup.exact(Dedup.exact(df)).as[Int].collect().sorted.toSeq
        assert(once === twice)
        assert(once === xs.distinct.sorted)
      }
    }
  }

  test("clusters matches union-find ground truth on random pair graphs") {
    val pairGen = Gen.listOfN(40,
      Gen.zip(Gen.choose(0L, 30L), Gen.choose(0L, 30L)).suchThat(p => p._1 != p._2))
    samples(pairGen, 6).foreach { raw =>
      val pairs = raw.map { case (a, b) => (math.min(a, b), math.max(a, b)) }.distinct
      // in-memory union-find ground truth
      val parent = scala.collection.mutable.Map[Long, Long]()
      def find(x: Long): Long = {
        val p = parent.getOrElseUpdate(x, x)
        if (p == x) x else { val r = find(p); parent(x) = r; r }
      }
      pairs.foreach { case (a, b) => parent(find(a)) = find(b) }
      val nodes = pairs.flatMap(p => Seq(p._1, p._2)).distinct
      val expected = nodes
        .groupBy(find).values
        .flatMap { members =>
          val root = members.min
          members.map(m => (m, root, if (m == root) 1 else 0))
        }.toSet

      val got = Dedup.clusters(pairs.toDF("doc_a", "doc_b"))
        .as[(Long, Long, Int)].collect().toSet
      assert(got === expected, s"pairs=$pairs")
    }
  }
}
