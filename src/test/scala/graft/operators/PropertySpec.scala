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

  // tokens deliberately include regex metacharacters: the phrase regex must
  // treat them literally (Pattern.quote), or "a.b" would match "axb"
  private val nastyTokenGen: Gen[String] =
    Gen.oneOf("a", "b", "c", "a.b", "x(", ")+", "[z]", "$1", "^", "\\d")

  test("searchPhrase(regex) matches the n-gram-array derivation on adversarial tokens") {
    val docGen = Gen.listOfN(8, nastyTokenGen).map(_.mkString(" "))
    samples(Gen.listOfN(30, docGen), 6).foreach { texts =>
      val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
      samples(Gen.listOfN(2, nastyTokenGen), 4).foreach { p =>
        val phrase = p.mkString(" ")
        val viaRegex = Search.searchPhrase(docs, phrase)
          .select("doc_id").as[Long].collect().toSet
        // independent ground truth: explicit bigram scan over split tokens
        val expected = texts.zipWithIndex.collect {
          case (t, i) if t.split("\\s+").filter(_.nonEmpty).sliding(p.length)
            .exists(_.toSeq == p.toSeq) => i.toLong
        }.toSet
        assert(viaRegex === expected, s"phrase='$phrase'")
      }
    }
  }

  test("pageRank conserves mass on random out-complete graphs") {
    val scale = 1L << 32
    val edgeGen = for {
      n <- Gen.choose(2, 12)
      // guarantee every node an out-edge: i → (i+1) % n, plus random extras
      extras <- Gen.listOfN(10, Gen.zip(Gen.choose(0, n - 1), Gen.choose(0, n - 1)))
    } yield (0 until n).map(i => (i.toLong, ((i + 1) % n).toLong)) ++
      extras.map { case (a, b) => (a.toLong, b.toLong) }
    samples(edgeGen, 6).foreach { edges =>
      val distinctEdges = edges.distinct
      val e = distinctEdges.toDF("src", "dst")
      val nNodes = edges.flatMap(p => Seq(p._1, p._2)).distinct.size
      val total = Graph.pageRank(e, iters = 4, scale = scale)
        .agg(sum("pr")).as[Long].head()
      // per round, each node loses < 1 unit to EACH of its two floors
      // (base truncation + damping floor) and each contribution edge
      // loses < 1 to its integer division — so slack = (E + 2N) per round
      val slack = (distinctEdges.size + 2L * nNodes) * 4
      assert(math.abs(total - scale) <= slack, s"edges=$edges total=$total")
    }
  }

  test("upsertIndex equals a full rebuild for any corpus split") {
    val docGen = Gen.listOfN(6, Gen.oneOf("a", "b", "c", "d")).map(_.mkString(" "))
    val corpusGen = for {
      texts <- Gen.listOfN(20, docGen)
      mod <- Gen.choose(2, 5)
    } yield (texts, mod)
    samples(corpusGen, 6).foreach { case (texts, mod) =>
      val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
      val base = docs.filter(col("doc_id") % mod =!= 0)
      val batch = docs.filter(col("doc_id") % mod === 0)
      def norm(df: org.apache.spark.sql.DataFrame) = df.collect().map(r =>
        (r.getAs[String]("term"), r.getAs[Long]("df"),
          r.getSeq[org.apache.spark.sql.Row](r.fieldIndex("postings")).toList))
        .sortBy(_._1).toSeq
      assert(norm(Search.upsertIndex(Search.searchIndex(base), batch))
        === norm(Search.searchIndex(docs)), s"mod=$mod")
    }
  }
}
