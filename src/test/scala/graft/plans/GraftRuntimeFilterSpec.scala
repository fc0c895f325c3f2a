package graft.plans

import graft.SparkSpec
import graft.sources.{GraftRelation, ManifestTable, MorDmlSpec}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.expressions.{In, InSet}
import org.apache.spark.sql.execution.datasources.LogicalRelation
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Runtime file skipping on join keys ([[GraftRuntimeFilterRule]]): a
  * broadcast-fit build side's collected keys seed the graft probe scan,
  * and zone maps/Blooms then open strictly fewer files — with results
  * identical to the rule disabled. Also pins the stand-downs (outer
  * preserved sides, anti joins, non-deterministic builds) and the range
  * fallback past the key cap.
  */
class GraftRuntimeFilterSpec extends SparkSpec {

  private lazy val s = MorDmlSpec.extSpark
  import s.implicits._

  /** Range-clustered graft fact: 8 files, ids 0..79999 in disjoint runs. */
  private def mkFact(tag: String, n: Int = 80000, files: Int = 8): String = {
    val path = Files.createTempDirectory(s"rtf_$tag").toString + "/t"
    ManifestTable.overwrite(s, path, s.range(n).select(col("id"),
      (col("id") % 97).as("v")).repartitionByRange(files, col("id")),
      statsCols = Seq("id"))
    path
  }

  private def relOf(df: DataFrame): GraftRelation =
    df.queryExecution.optimizedPlan.collectFirst {
      case lr: LogicalRelation if lr.relation.isInstanceOf[GraftRelation] =>
        lr.relation.asInstanceOf[GraftRelation]
    }.getOrElse(fail("no graft relation in the plan"))

  /** A membership seed in ANY of the shapes the optimizer leaves it in:
    * `In` as seeded, `InSet` past the conversion threshold, or `EqualTo`
    * — `OptimizeIn` rewrites a ONE-key seed to an equality in the same
    * batch (pre-r16 the guard missed that shape and a stacked re-seeded
    * `In` hid it; with the loop fixed, the equality IS the seed). */
  private def hasKeySeed(df: DataFrame): Boolean =
    df.queryExecution.optimizedPlan.exists {
      case f: org.apache.spark.sql.catalyst.plans.logical.Filter =>
        f.condition.exists {
          case _: In | _: InSet => true
          case org.apache.spark.sql.catalyst.expressions.EqualTo(
            _: org.apache.spark.sql.catalyst.expressions.AttributeReference,
            _: org.apache.spark.sql.catalyst.expressions.Literal) => true
          case _ => false
        }
      case _ => false
    }

  private def withRule[A](on: Boolean)(body: => A): A = {
    s.conf.set("spark.graft.runtimeFilter.enabled", on.toString)
    try body finally s.conf.unset("spark.graft.runtimeFilter.enabled")
  }

  test("inner join with a selective dim opens strictly fewer files, identical results") {
    val fact = mkFact("inner")
    // a 3-key dim, all keys inside one file's id range
    val dim = Seq((10L, "a"), (20L, "b"), (30L, "c")).toDF("k", "name")
    dim.createOrReplaceTempView("rtf_dim")
    s.sql(s"CREATE OR REPLACE TEMPORARY VIEW rtf_fact USING graft OPTIONS (path '$fact')")
    def q = s.sql("SELECT f.id, f.v, d.name FROM rtf_fact f JOIN rtf_dim d ON f.id = d.k")
    val expected = withRule(on = false) {
      val df = q
      val out = df.orderBy("id").collect().toSeq
      assert(relOf(df).lastScanFileCount === 8, "baseline scans every file")
      out
    }
    withRule(on = true) {
      val df = q
      assert(hasKeySeed(df), "the rule must seed the probe with an IN/InSet")
      val got = df.orderBy("id").collect().toSeq
      val rel = relOf(df)
      assert(got === expected, "seeded results must be identical")
      assert(rel.lastScanFileCount >= 0 && rel.lastScanFileCount < 8,
        s"strictly fewer files opened, got ${rel.lastScanFileCount} of 8")
      assert(rel.lastScanFileCount <= 2,
        s"3 clustered keys should open ~1 file, got ${rel.lastScanFileCount}")
    }
  }

  test("left-outer preserves the graft left side untouched; prunes a graft right side") {
    val fact = mkFact("outer", n = 20000, files = 4)
    val dim = Seq((5L, "x")).toDF("k", "name")
    s.sql(s"CREATE OR REPLACE TEMPORARY VIEW rtf_fact2 USING graft OPTIONS (path '$fact')")
    dim.createOrReplaceTempView("rtf_dim2")
    withRule(on = true) {
      // graft on the PRESERVED left of a left-outer: every fact row
      // survives — the rule must not touch it
      val keep = s.sql("SELECT f.id, d.name FROM rtf_fact2 f LEFT JOIN rtf_dim2 d ON f.id = d.k")
      assert(!hasKeySeed(keep), "preserved side must not be seeded")
      assert(keep.count() === 20000L)
      // graft on the FILTERED right of a left-outer: prunable
      val pruned = s.sql("SELECT d.name, f.v FROM rtf_dim2 d LEFT JOIN rtf_fact2 f ON d.k = f.id")
      assert(hasKeySeed(pruned), "filtered right side seeds")
      assert(pruned.collect().map(_.getString(0)).toSeq === Seq("x"))
      assert(relOf(pruned).lastScanFileCount < 4)
      // anti join: never seeded (it preserves NON-matching rows)
      val anti = s.sql("SELECT * FROM rtf_fact2 f WHERE NOT EXISTS (SELECT 1 FROM rtf_dim2 d WHERE d.k = f.id)")
      assert(!hasKeySeed(anti), "anti join must not be seeded")
      assert(anti.count() === 19999L)
    }
  }

  test("past maxKeys the seed degrades to a zone-range BETWEEN; empty builds short-circuit") {
    val fact = mkFact("range", n = 40000, files = 8)
    s.sql(s"CREATE OR REPLACE TEMPORARY VIEW rtf_fact3 USING graft OPTIONS (path '$fact')")
    // 60 keys clustered in [1000, 1059] with the cap forced to 16 →
    // BETWEEN 1000 AND 1059, still one file's range
    s.range(1000, 1060).select(col("id").as("k")).createOrReplaceTempView("rtf_dim3")
    withRule(on = true) {
      s.conf.set("spark.graft.runtimeFilter.maxKeys", "16")
      try {
        val df = s.sql("SELECT count(*) AS n FROM rtf_fact3 f JOIN rtf_dim3 d ON f.id = d.k")
        assert(df.collect().head.getLong(0) === 60L)
        val rel = df.queryExecution.optimizedPlan.collectFirst {
          case lr: LogicalRelation if lr.relation.isInstanceOf[GraftRelation] =>
            lr.relation.asInstanceOf[GraftRelation]
        }.get
        assert(rel.lastScanFileCount < 8,
          s"the range seed must zone-prune, got ${rel.lastScanFileCount} of 8")
      } finally s.conf.unset("spark.graft.runtimeFilter.maxKeys")
      // empty build side: the probe scan plans zero files
      s.range(0).select(col("id").as("k")).createOrReplaceTempView("rtf_dim4")
      val empty = s.sql("SELECT * FROM rtf_fact3 f JOIN rtf_dim4 d ON f.id = d.k")
      assert(empty.count() === 0L)
    }
  }

  test("composite-key joins seed EVERY eligible key column from one collect") {
    val path = Files.createTempDirectory("rtf_multi").toString + "/t"
    ManifestTable.overwrite(s, path, s.range(40000).select(col("id"),
      (col("id") % 16).as("grp"), (col("id") % 97).as("v"))
      .repartitionByRange(8, col("id")),
      statsCols = Seq("id", "grp"))
    s.sql(s"CREATE OR REPLACE TEMPORARY VIEW rtf_mfact USING graft OPTIONS (path '$path')")
    Seq((100L, 100L % 16, "a"), (200L, 200L % 16, "b"))
      .toDF("k", "g", "name").createOrReplaceTempView("rtf_mdim")
    withRule(on = true) {
      val df = s.sql("SELECT f.id, d.name FROM rtf_mfact f JOIN rtf_mdim d " +
        "ON f.id = d.k AND f.grp = d.g")
      val seeds = df.queryExecution.optimizedPlan.collect {
        case fl: org.apache.spark.sql.catalyst.plans.logical.Filter =>
          fl.condition.collect {
            case In(x: org.apache.spark.sql.catalyst.expressions.AttributeReference, _) => x.name
            case InSet(x: org.apache.spark.sql.catalyst.expressions.AttributeReference, _) => x.name
          }
      }.flatten.toSet
      assert(seeds.contains("id") && seeds.contains("grp"),
        s"both key columns must seed, got $seeds")
      assert(df.orderBy("id").collect().map(_.getLong(0)).toSeq === Seq(100L, 200L))
      assert(relOf(df).lastScanFileCount < 8)
    }
  }

  test("SELECT DISTINCT dim-key builds (grouping-only Aggregate) seed — r15's dead arm, alive") {
    val fact = mkFact("dist")
    // dim with DUPLICATE keys: the natural `SELECT DISTINCT key FROM dim
    // WHERE …` derivation, which ReplaceDistinctWithAggregate rewrites
    // into a grouping-only Aggregate before the rule ever sees it
    Seq((10L, "a"), (10L, "a2"), (20L, "b"), (20L, "b2"), (30L, "c"))
      .toDF("k", "name").createOrReplaceTempView("rtf_ddim")
    s.sql(s"CREATE OR REPLACE TEMPORARY VIEW rtf_dfact USING graft OPTIONS (path '$fact')")
    def q = s.sql("SELECT f.id, f.v FROM rtf_dfact f JOIN " +
      "(SELECT DISTINCT k FROM rtf_ddim WHERE k < 100) d ON f.id = d.k")
    val expected = withRule(on = false)(q.orderBy("id").collect().toSeq)
    withRule(on = true) {
      val df = q
      assert(hasKeySeed(df), "a DISTINCT-derived build must seed")
      assert(df.orderBy("id").collect().toSeq === expected)
      assert(relOf(df).lastScanFileCount <= 2,
        s"3 clustered keys open ~1 file, got ${relOf(df).lastScanFileCount}")
    }
  }

  test("a user's ONE-SIDED range on the join key no longer suppresses seeding (r15 over-suppression)") {
    val fact = mkFact("rguard")
    Seq((10L, "a"), (20L, "b")).toDF("k", "name")
      .createOrReplaceTempView("rtf_rgdim")
    s.sql(s"CREATE OR REPLACE TEMPORARY VIEW rtf_rgfact USING graft OPTIONS (path '$fact')")
    withRule(on = true) {
      val df = s.sql("SELECT f.id, d.name FROM rtf_rgfact f JOIN rtf_rgdim d " +
        "ON f.id = d.k WHERE f.id >= 5")
      assert(hasKeySeed(df),
        "an unrelated `id >= 5` beside the join must not stand the rule down")
      assert(df.orderBy("id").collect().map(_.getLong(0)).toSeq === Seq(10L, 20L))
      assert(relOf(df).lastScanFileCount <= 2)
    }
  }

  test("one-key builds seed once: OptimizeIn's EqualTo rewrite is recognized, no predicate stacking") {
    val fact = mkFact("onekey", n = 20000, files = 4)
    Seq((42L, "only")).toDF("k", "name").createOrReplaceTempView("rtf_1dim")
    s.sql(s"CREATE OR REPLACE TEMPORARY VIEW rtf_1fact USING graft OPTIONS (path '$fact')")
    withRule(on = true) {
      val df = s.sql("SELECT f.id, d.name FROM rtf_1fact f JOIN rtf_1dim d ON f.id = d.k")
      assert(df.collect().map(_.getLong(0)).toSeq === Seq(42L))
      // the seeded 1-element In is rewritten to EqualTo by OptimizeIn in
      // the SAME batch; the guard must recognize it or every further
      // iteration re-collects and stacks another In on top (ADVICE r15)
      import org.apache.spark.sql.catalyst.expressions.{AttributeReference, EqualTo, Literal}
      val keyPreds = df.queryExecution.optimizedPlan.collect {
        case fl: org.apache.spark.sql.catalyst.plans.logical.Filter =>
          fl.condition.collect {
            case In(x: AttributeReference, _) if x.name == "id" => 1
            case InSet(x: AttributeReference, _) if x.name == "id" => 1
            case EqualTo(x: AttributeReference, _: Literal) if x.name == "id" => 1
            case EqualTo(_: Literal, x: AttributeReference) if x.name == "id" => 1
          }.sum
      }.sum
      assert(keyPreds === 1,
        s"exactly ONE membership predicate on the key, got $keyPreds (stacked re-seeds)")
      assert(relOf(df).lastScanFileCount <= 1)
    }
  }

  test("past the IN cap, Bloom-backed columns keep a membership seed: 10k keys prune an UNCLUSTERED probe") {
    // files interleave ids MOD 8 (every file's [min,max] spans the whole
    // domain — zone maps prune nothing); per-file distinct count is kept
    // small (250) so the per-file Bloom's fpp stays far below 1/candidates
    // and membership pruning is decisive where range pruning cannot be
    val path = Files.createTempDirectory("rtf_bloom").toString + "/t"
    ManifestTable.overwrite(s, path,
      s.range(2000).select(col("id"), (col("id") % 97).as("v"))
        .repartition(8, col("id") % 8),
      bloomCols = Seq("id"))
    s.sql(s"CREATE OR REPLACE TEMPORARY VIEW rtf_bfact USING graft OPTIONS (path '$path')")
    // 10 000 distinct build keys, all ≡ 0 (mod 8): only one fact file can
    // hold any of them
    s.range(10000).select((col("id") * 8).as("k"))
      .createOrReplaceTempView("rtf_bdim")
    def q = s.sql("SELECT f.id, f.v FROM rtf_bfact f JOIN rtf_bdim d ON f.id = d.k")
    val expected = withRule(on = false)(q.orderBy("id").collect().toSeq)
    withRule(on = true) {
      s.conf.set("spark.graft.runtimeFilter.maxKeys", "1000")
      try {
        val df = q
        assert(hasKeySeed(df),
          "10k keys exceed maxKeys but the Bloom-backed column keeps a membership seed")
        assert(df.orderBy("id").collect().toSeq === expected,
          "zero false negatives: seeded results identical")
        val opened = relOf(df).lastScanFileCount
        assert(opened >= 1 && opened <= 2,
          s"Blooms must prune the 7 key-free files, got $opened of 8")
      } finally s.conf.unset("spark.graft.runtimeFilter.maxKeys")
    }
  }

  test("ABOVE the broadcast threshold: the pre-job sizes the build's keys, seeds membership or range, and the kill switch stands down") {
    val fact = mkFact("prejob")
    s.sql(s"CREATE OR REPLACE TEMPORARY VIEW rtf_factp USING graft OPTIONS (path '$fact')")
    // a BIG build (200k rows — far over the forced threshold below) whose
    // distinct keys are few and clustered: membership tier via pre-job
    val narrowPath = Files.createTempDirectory("rtf_bignarrow").toString + "/t"
    ManifestTable.overwrite(s, narrowPath, s.range(200000)
      .select((col("id") % 200 + 1000).as("k"), col("id").as("payload")))
    s.sql(s"CREATE OR REPLACE TEMPORARY VIEW rtf_bignarrow USING graft OPTIONS (path '$narrowPath')")
    // and a big HIGH-NDV build (40k distinct > maxBloomKeys) confined to
    // the fact's lower half: range tier from the pre-job's min/max alone
    val widePath = Files.createTempDirectory("rtf_bigwide").toString + "/t"
    ManifestTable.overwrite(s, widePath, s.range(200000)
      .select((col("id") % 40000).as("k"), col("id").as("payload")))
    s.sql(s"CREATE OR REPLACE TEMPORARY VIEW rtf_bigwide USING graft OPTIONS (path '$widePath')")
    def qNarrow = s.sql(
      "SELECT f.id, f.v, d.payload FROM rtf_factp f JOIN rtf_bignarrow d ON f.id = d.k")
    def qWide = s.sql(
      "SELECT f.id, f.v FROM rtf_factp f JOIN rtf_bigwide d ON f.id = d.k")
    s.conf.set("spark.sql.autoBroadcastJoinThreshold", "1024")
    try {
      val expNarrow = withRule(on = false)(
        qNarrow.collect().map(_.toString).sorted.toSeq)
      val expWide = withRule(on = false)(qWide.count())
      withRule(on = true) {
        val dfN = qNarrow
        assert(hasKeySeed(dfN),
          "a bounded-NDV over-threshold build must seed membership via the pre-job")
        assert(dfN.collect().map(_.toString).sorted.toSeq === expNarrow)
        assert(relOf(dfN).lastScanFileCount <= 2,
          s"200 clustered keys open ~1 of 8 files, got ${relOf(dfN).lastScanFileCount}")
        val dfW = qWide
        assert(dfW.count() === expWide)
        val wideFiles = relOf(dfW).lastScanFileCount
        assert(wideFiles >= 1 && wideFiles <= 5,
          s"the pre-job min/max must confine the scan to the lower half, got $wideFiles of 8")
        // kill switch: over-threshold builds never execute early
        s.conf.set("spark.graft.runtimeFilter.preJob.enabled", "false")
        try {
          val off = qNarrow
          assert(!hasKeySeed(off), "preJob.enabled=false must stand down")
          assert(off.collect().map(_.toString).sorted.toSeq === expNarrow)
        } finally s.conf.unset("spark.graft.runtimeFilter.preJob.enabled")
        // byte cap: a build estimating past preJob.maxBytes stands down
        s.conf.set("spark.graft.runtimeFilter.preJob.maxBytes", "1")
        try assert(!hasKeySeed(qNarrow), "a build past preJob.maxBytes never runs early")
        finally s.conf.unset("spark.graft.runtimeFilter.preJob.maxBytes")
      }
    } finally s.conf.unset("spark.sql.autoBroadcastJoinThreshold")
  }

  test("past ALL caps (r18): interval refinement opens only the build's key regions; the compact Bloom rides as a row-level cut — zero key collect") {
    import org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain
    val fact = mkFact("overcap")
    s.sql(s"CREATE OR REPLACE TEMPORARY VIEW rtf_facto USING graft OPTIONS (path '$fact')")
    // a big build whose ~34k distinct keys (> maxBloomKeys 32768) live in
    // TWO far-apart clusters of the fact's id space: the global range
    // seed would span (and open) almost everything, the interval-refined
    // seed opens only the two touched regions
    val twoPath = Files.createTempDirectory("rtf_overcap").toString + "/t"
    // 40000 distinct keys (> maxBloomKeys 32768) in bands [0, 20000) and
    // [60000, 80000) — the fact's first and seventh file regions
    ManifestTable.overwrite(s, twoPath, s.range(200000).select(
      when(col("id") % 40000 < 20000, col("id") % 40000)
        .otherwise(col("id") % 40000 + 40000).as("k"),
      col("id").as("payload")))
    s.sql(s"CREATE OR REPLACE TEMPORARY VIEW rtf_twoband USING graft OPTIONS (path '$twoPath')")
    def q = s.sql(
      "SELECT f.id, f.v FROM rtf_facto f JOIN rtf_twoband d ON f.id = d.k")
    def hasBloomSeed(df: DataFrame): Boolean =
      df.queryExecution.optimizedPlan.exists {
        case f: org.apache.spark.sql.catalyst.plans.logical.Filter =>
          f.condition.exists(_.isInstanceOf[BloomFilterMightContain])
        case _ => false
      }
    def hasOrRangeSeed(df: DataFrame): Boolean =
      df.queryExecution.optimizedPlan.exists {
        case f: org.apache.spark.sql.catalyst.plans.logical.Filter =>
          f.condition.exists {
            case org.apache.spark.sql.catalyst.expressions.Or(_, _) => true
            case _ => false
          }
        case _ => false
      }
    s.conf.set("spark.sql.autoBroadcastJoinThreshold", "1024")
    try {
      val expected = withRule(on = false)(q.count())
      withRule(on = true) {
        val df = q
        assert(hasOrRangeSeed(df),
          "the interval-refined seed must be an OR of region ranges")
        assert(hasBloomSeed(df),
          "the compact Bloom must ride as a row-level membership probe")
        assert(!hasKeySeed(df), "no key list may be collected past the caps")
        assert(df.count() === expected, "seeded results must be identical")
        val files = relOf(df).lastScanFileCount
        assert(files <= 6,
          s"two key regions must not open the whole 8-file span, got $files")
        // the fixpoint guard recognizes its own seed — no STACKING: no
        // single Filter carries two bloom probes for one attribute
        // (InferFiltersFromConstraints may legitimately mirror the seed
        // across the equi-join, so the per-plan total can exceed one)
        val perFilter = df.queryExecution.optimizedPlan.collect {
          case f: org.apache.spark.sql.catalyst.plans.logical.Filter =>
            f.condition.collect { case b: BloomFilterMightContain => b }.size
        }
        assert(perFilter.forall(_ <= 1),
          s"a re-fired rule would stack blooms in one Filter: $perFilter")
        // kill switch: no bloom, interval refinement alone still seeds
        s.conf.set("spark.graft.runtimeFilter.bloomSeed.enabled", "false")
        try {
          val noBloom = q
          assert(!hasBloomSeed(noBloom) && hasOrRangeSeed(noBloom))
          assert(noBloom.count() === expected)
        } finally s.conf.unset("spark.graft.runtimeFilter.bloomSeed.enabled")
        // maxSeedRanges=1 forces the refinement to stand down (everything
        // merges past the cap) — the global range still seeds, results hold
        s.conf.set("spark.graft.runtimeFilter.maxSeedRanges", "1")
        try assert(q.count() === expected)
        finally s.conf.unset("spark.graft.runtimeFilter.maxSeedRanges")
      }
    } finally s.conf.unset("spark.sql.autoBroadcastJoinThreshold")
  }

  test("non-deterministic builds stand down; results stay correct under DVs and eq-deletes") {
    val fact = mkFact("dv", n = 20000, files = 4)
    s.sql(s"CREATE OR REPLACE TEMPORARY VIEW rtf_fact5 USING graft OPTIONS (path '$fact')")
    // rand() in the build: executing it twice could disagree — stand down
    withRule(on = true) {
      val nd = s.sql("SELECT * FROM rtf_fact5 f JOIN " +
        "(SELECT CAST(rand()*10 AS BIGINT) AS k FROM range(3)) d ON f.id = d.k")
      assert(!hasKeySeed(nd), "non-deterministic build must not be collected")
      // an AGGREGATE-shaped build estimates small but can cost a full
      // shuffle to EVALUATE — never executed at plan time
      val agg = s.sql("SELECT * FROM rtf_fact5 f JOIN " +
        "(SELECT id % 7 AS k, count(*) AS c FROM range(100) GROUP BY 1) d " +
        "ON f.id = d.k")
      assert(!hasKeySeed(agg), "aggregate builds must stand down")
      assert(agg.count() === 7L)
    }
    // correctness composes with row-level deletes: DV one key, eq-delete
    // another, then join — the seeded scan must still apply both
    ManifestTable.deleteVectorized(s, fact, col("id") === 10L)
    s.conf.set(ManifestTable.DmlModeKey, "eq")
    try ManifestTable.merge(s, fact, s.range(0)
      .select(col("id"), (col("id") % 97).as("v")),
      keys = Seq("id"), deleteKeys = Some(Seq(20L).toDF("id")))
    finally s.conf.unset(ManifestTable.DmlModeKey)
    s.sql(s"CREATE OR REPLACE TEMPORARY VIEW rtf_fact5 USING graft OPTIONS (path '$fact')")
    Seq(10L, 20L, 30L).toDF("k").createOrReplaceTempView("rtf_dim5")
    withRule(on = true) {
      val df = s.sql("SELECT f.id FROM rtf_fact5 f JOIN rtf_dim5 d ON f.id = d.k")
      assert(hasKeySeed(df))
      assert(df.collect().map(_.getLong(0)).toSeq.sorted === Seq(30L),
        "DV'd and eq-deleted keys stay deleted under the seeded scan")
    }
  }
}
