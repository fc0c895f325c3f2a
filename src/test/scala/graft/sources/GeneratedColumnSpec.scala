package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** GENERATED COLUMNS (`graft.generated.*`) and the predicate-derivation
  * rule ([[graft.plans.GraftGeneratedDeriveRule]]): the interim variant-
  * hot-path answer — a declared deterministic expression materializes as
  * a stored, zone-mappable column on every write path, and a query
  * predicate on the EXPRESSION prunes files through the stored column
  * without the user naming it. The spec pins the soundness invariant
  * from every side: recompute on append/merge/update (writer values
  * overwritten, SET refused), declaration validation, rename/drop
  * rejection, and the rewrite's exactness (identical results, strictly
  * fewer files).
  */
class GeneratedColumnSpec extends SparkSpec {

  private lazy val s = MorDmlSpec.extSpark
  import s.implicits._

  private def mkVariantTable(tag: String): String = {
    val path = Files.createTempDirectory(s"gen_$tag").toString + "/t"
    // 4000 docs; the variant carries a score the table derives back out
    // into a generated long, range-clustered so the hot path zone-prunes
    val docs = s.range(4000).select(col("id"),
      parse_json(concat(lit("""{"score": """), (col("id") % 100).cast("string"),
        lit(""", "src": "s"}"""))).as("props"))
    ManifestTable.overwrite(s, path,
      docs.repartitionByRange(8, col("id") % 100),
      statsCols = Seq("score"),
      generated = Map("score" -> "try_variant_get(props, '$.score', 'long')"))
    path
  }

  private def relOf(df: org.apache.spark.sql.DataFrame): GraftRelation =
    df.queryExecution.optimizedPlan.collectFirst {
      case lr: org.apache.spark.sql.execution.datasources.LogicalRelation
          if lr.relation.isInstanceOf[GraftRelation] =>
        lr.relation.asInstanceOf[GraftRelation]
    }.getOrElse(fail("no graft relation in the plan"))

  private def withRule[A](on: Boolean)(body: => A): A = {
    s.conf.set("spark.graft.generatedDerive.enabled", on.toString)
    try body finally s.conf.unset("spark.graft.generatedDerive.enabled")
  }

  test("a variant-path range predicate opens a strict subset of files, identical results") {
    val path = mkVariantTable("prune")
    s.sql("DROP TABLE IF EXISTS gen_t1")
    s.sql(s"CREATE TABLE gen_t1 USING graft OPTIONS (path '$path')")
    def q = s.sql(
      """SELECT id, try_variant_get(props, '$.score', 'long') AS sc
        |FROM gen_t1
        |WHERE try_variant_get(props, '$.score', 'long') >= 90""".stripMargin)
    val (expected, allFiles) = withRule(on = false) {
      val df = q
      (df.orderBy("id").collect().toSeq, relOf(df).lastScanFileCount)
    }
    assert(allFiles === 8, "without derivation the variant predicate scans every file")
    withRule(on = true) {
      val df = q
      val got = df.orderBy("id").collect().toSeq
      assert(got === expected, "derivation must not change results")
      assert(got.nonEmpty && got.forall(_.getLong(1) >= 90))
      val opened = relOf(df).lastScanFileCount
      assert(opened > 0 && opened < 8,
        s"the stored generated column must zone-prune, got $opened of 8")
      // the derived conjunct is a plain attribute comparison on `score`
      val derived = df.queryExecution.optimizedPlan.exists {
        case f: org.apache.spark.sql.catalyst.plans.logical.Filter =>
          f.condition.exists {
            case org.apache.spark.sql.catalyst.expressions.GreaterThanOrEqual(
              a: org.apache.spark.sql.catalyst.expressions.AttributeReference, _)
              if a.name == "score" => true
            case _ => false
          }
        case _ => false
      }
      assert(derived, "the rule must add `score >= 90` beside the variant predicate")
    }
  }

  test("derivation stands down when a projection below pruned the stored column away") {
    val path = mkVariantTable("pruned_col")
    s.sql("DROP TABLE IF EXISTS gen_t_sub")
    s.sql(s"CREATE TABLE gen_t_sub USING graft OPTIONS (path '$path')")
    // the subquery projects ONLY the variant — the stored generated
    // column is not in the Filter's child output, so adding a conjunct
    // on it would be an invalid plan; the rule must stand down and the
    // query still answers exactly
    def q = s.sql(
      """SELECT count(*) AS n FROM
        |  (SELECT props FROM gen_t_sub)
        |WHERE try_variant_get(props, '$.score', 'long') >= 90""".stripMargin)
    val expected = withRule(on = false)(q.head.getLong(0))
    withRule(on = true) {
      assert(q.head.getLong(0) === expected)
      assert(expected === 400L, "10 of 100 score values over 4000 rows")
    }
  }

  test("read-path derivation: projecting or aggregating the declared expression reads the stored column, no variant decode") {
    val path = mkVariantTable("subst")
    s.sql("DROP TABLE IF EXISTS gen_sub_t")
    s.sql(s"CREATE TABLE gen_sub_t USING graft OPTIONS (path '$path')")
    def hasVariantGet(df: org.apache.spark.sql.DataFrame): Boolean =
      df.queryExecution.optimizedPlan.exists(
        _.expressions.exists(_.exists(
          _.getClass.getName.contains("VariantGet"))))
    // projection: SELECT of the declared path substitutes the stored attr
    def qp = s.sql(
      """SELECT id, try_variant_get(props, '$.score', 'long') AS sc
        |FROM gen_sub_t WHERE id < 100""".stripMargin)
    val expected = withRule(on = false)(qp.orderBy("id").collect().toSeq)
    withRule(on = true) {
      val df = qp
      assert(df.orderBy("id").collect().toSeq === expected)
      assert(!hasVariantGet(df),
        "a projected declared path must read the stored column, not decode the variant")
    }
    // aggregation: sum over the declared path substitutes too
    def qa = s.sql(
      """SELECT sum(try_variant_get(props, '$.score', 'long')) AS total
        |FROM gen_sub_t""".stripMargin)
    val expTotal = withRule(on = false)(qa.head.getLong(0))
    withRule(on = true) {
      val df = qa
      assert(df.head.getLong(0) === expTotal)
      assert(!hasVariantGet(df))
    }
  }

  test("an outer join's null-supplied side never derives: null-extended rows survive a null-tolerant generated predicate") {
    val path = Files.createTempDirectory("gen_oj").toString + "/t"
    val docs = s.range(4000).select(col("id"),
      parse_json(concat(lit("""{"score": """), (col("id") % 100).cast("string"),
        lit("}"))).as("props"))
    // a NULL-TOLERANT declaration: over an outer join's all-NULL
    // extension the expression evaluates -1 while the stored column
    // reads NULL — deriving there would silently drop every such row
    ManifestTable.overwrite(s, path, docs.repartitionByRange(8, col("id") % 100),
      statsCols = Seq("score"),
      generated = Map("score" ->
        "coalesce(try_variant_get(props, '$.score', 'long'), -1L)"))
    s.sql("DROP TABLE IF EXISTS gen_oj_t")
    s.sql(s"CREATE TABLE gen_oj_t USING graft OPTIONS (path '$path')")
    s.range(3990, 4100).createOrReplaceTempView("gen_oj_probe")
    // ids 4000..4099 null-extend; the predicate KEEPS exactly those rows
    def q = s.sql(
      """SELECT p.id FROM gen_oj_probe p
        |LEFT JOIN gen_oj_t g ON p.id = g.id
        |WHERE coalesce(try_variant_get(g.props, '$.score', 'long'), -1L) = -1L
        |""".stripMargin)
    val expected = withRule(on = false)(q.collect().map(_.getLong(0)).sorted.toSeq)
    assert(expected === (4000L until 4100L), "the null-extended rows are the answer")
    withRule(on = true) {
      assert(q.collect().map(_.getLong(0)).sorted.toSeq === expected,
        "deriving onto the stored column across the outer join would drop every null-extended row")
    }
  }

  test("a cast-narrowed stored type stands the rewrite down: wrap-around values stay exact") {
    val path = Files.createTempDirectory("gen_narrow").toString + "/t"
    s.sql("DROP TABLE IF EXISTS gen_narrow_t")
    // declared INT, expression type BIGINT: the store holds cast(k+1 AS
    // INT), which WRAPS for k near 2³¹ — col != expr(row), so neither
    // face may rewrite through it
    s.sql(
      s"""CREATE TABLE gen_narrow_t (k BIGINT, txt STRING, n INT)
         |USING graft
         |OPTIONS (path '$path', `generated.n` '(k + 1L)')""".stripMargin)
    // ANSI would refuse the wrapping write loudly (also fine); the
    // legacy-cast session is the one that actually stores a wrapped value
    s.conf.set("spark.sql.ansi.enabled", "false")
    try {
      s.sql("INSERT INTO gen_narrow_t SELECT 3000000000L, 'a', 0")
      s.sql("INSERT INTO gen_narrow_t SELECT 5L, 'b', 0")
    } finally s.conf.unset("spark.sql.ansi.enabled")
    def q = s.sql("SELECT k FROM gen_narrow_t WHERE k + 1L = 3000000001L")
    withRule(on = true) {
      assert(q.collect().map(_.getLong(0)).toSeq === Seq(3000000000L),
        "the wrapped stored value must not be consulted")
      val usesStored = q.queryExecution.optimizedPlan.exists {
        case f: org.apache.spark.sql.catalyst.plans.logical.Filter =>
          f.condition.references.exists(_.name == "n")
        case _ => false
      }
      assert(!usesStored, "type-mismatched declarations must stand down")
    }
  }

  test("a window-function declaration rejects: per-batch recompute would break the invariant") {
    val dir = Files.createTempDirectory("gen_win").toString + "/t"
    val df = Seq((1L, "a"), (2L, "b")).toDF("k", "txt")
    val e = intercept[RuntimeException](ManifestTable.overwrite(s, dir, df,
      generated = Map("rn" -> "row_number() over (order by k)")))
    assert(e.getMessage.contains("row-by-row"),
      s"window declarations must reject at creation: ${e.getMessage}")
  }

  test("every write path recomputes: append fills, writer values are overwritten, merge and UPDATE re-derive") {
    val path = Files.createTempDirectory("gen_write").toString + "/t"
    ManifestTable.overwrite(s, path,
      Seq((1L, "ab"), (2L, "abcd")).toDF("k", "txt"),
      generated = Map("n_chars" -> "length(txt)"))
    def byK = ManifestTable.read(s, path).orderBy("k")
      .select("k", "txt", "n_chars").collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getInt(2)))).toMap
    assert(byK === Map(1L -> (("ab", 2)), 2L -> (("abcd", 4))))
    // append WITHOUT the column: filled
    ManifestTable.append(s, path, Seq((3L, "x")).toDF("k", "txt"))
    assert(byK(3L) === (("x", 1)))
    // append WITH a wrong writer-supplied value: the derivation wins
    ManifestTable.append(s, path,
      Seq((4L, "xyz", 999)).toDF("k", "txt", "n_chars"))
    assert(byK(4L) === (("xyz", 3)), "writer-supplied generated values are overwritten")
    // merge upsert changing the source column: re-derived
    ManifestTable.merge(s, path,
      Seq((1L, "abcdef")).toDF("k", "txt"), keys = Seq("k"))
    assert(byK(1L) === (("abcdef", 6)))
    // COW UPDATE of the source column: re-derived
    ManifestTable.update(s, path, col("k") === 2L, Seq("txt" -> lit("zz")))
    assert(byK(2L) === (("zz", 2)))
    // MOR UPDATE too
    s.conf.set(ManifestTable.DmlModeKey, "mor")
    try ManifestTable.update(s, path, col("k") === 3L, Seq("txt" -> lit("wxyz")))
    finally s.conf.unset(ManifestTable.DmlModeKey)
    assert(byK(3L) === (("wxyz", 4)))
    // SET of the generated column itself refuses
    val e = intercept[IllegalArgumentException](
      ManifestTable.update(s, path, col("k") === 1L, Seq("n_chars" -> lit(7))))
    assert(e.getMessage.contains("GENERATED"))
  }

  test("declaration validation: non-deterministic, aggregating, unresolvable, colliding exprs reject") {
    val dir = () => Files.createTempDirectory("gen_bad").toString + "/t"
    val df = Seq((1L, "a")).toDF("k", "txt")
    val nd = intercept[RuntimeException](ManifestTable.overwrite(s, dir(), df,
      generated = Map("r" -> "rand()")))
    assert(nd.getMessage.contains("non-deterministic"))
    val ag = intercept[RuntimeException](ManifestTable.overwrite(s, dir(), df,
      generated = Map("c" -> "count(k)")))
    assert(ag.getMessage.contains("aggregates"))
    val missing = intercept[RuntimeException](ManifestTable.overwrite(s, dir(), df,
      generated = Map("g" -> "length(no_such_col)")))
    assert(missing.getMessage.contains("does not resolve"))
    val collide = intercept[IllegalArgumentException](ManifestTable.overwrite(s, dir(), df,
      generated = Map("kb" -> "length(txt)"),
      transforms = Seq(ManifestTable.PartitionTransform("kb", "bucket", 4, "k"))))
    assert(collide.getMessage.contains("collides"))
  }

  test("SQL face: CTAS OPTIONS (generated.<col> '<expr>') declares; empty CREATE + INSERT recomputes; SET TBLPROPERTIES rejects; SHOW CREATE replays") {
    val path = Files.createTempDirectory("gen_sql").toString + "/t"
    s.sql("DROP TABLE IF EXISTS gen_sql_t")
    s.sql(
      s"""CREATE TABLE gen_sql_t USING graft
         |OPTIONS (path '$path', statscols 'n_chars',
         |         `generated.n_chars` 'length(txt)')
         |AS SELECT id AS k, repeat('x', CAST(id AS INT) + 1) AS txt
         |FROM range(3)""".stripMargin)
    assert(s.sql("SELECT k, n_chars FROM gen_sql_t ORDER BY k")
      .collect().map(r => (r.getLong(0), r.getInt(1))).toSeq
      === Seq((0L, 1), (1L, 2), (2L, 3)))
    // INSERT through SQL recomputes (writer omits the column)
    s.sql("INSERT INTO gen_sql_t SELECT 9L AS k, 'abcd' AS txt")
    assert(s.sql("SELECT n_chars FROM gen_sql_t WHERE k = 9").head.getInt(0) === 4)
    // the generic property channel REJECTS declarations — the one door
    // that could break the every-row invariant stays shut in SQL too
    val e = intercept[Exception](s.sql(
      "ALTER TABLE gen_sql_t SET TBLPROPERTIES ('graft.generated.bad' = 'k + 1')"))
    assert(e.getMessage.contains("generated"))
    // SHOW CREATE TABLE prints the declaration as a CREATE option (the
    // only channel that can replay it), not as a SET TBLPROPERTIES
    val ddl = s.sql("SHOW CREATE TABLE gen_sql_t").head.getString(0)
    assert(ddl.contains("generated.n_chars 'length(txt)'"), ddl)
    assert(!ddl.contains("TBLPROPERTIES ('graft.generated"), ddl)
    // empty CREATE TABLE with a typed column list: the declared type
    // wins, INSERTed rows recompute, and the derive rule prunes SQL-only
    val path2 = Files.createTempDirectory("gen_sql2").toString + "/t"
    s.sql("DROP TABLE IF EXISTS gen_sql_t2")
    s.sql(
      s"""CREATE TABLE gen_sql_t2 (k BIGINT, txt STRING, n_chars BIGINT)
         |USING graft
         |OPTIONS (path '$path2', `generated.n_chars` 'length(txt)')""".stripMargin)
    s.sql("INSERT INTO gen_sql_t2 SELECT 1L, 'abc', 999L")
    val row = s.sql("SELECT n_chars FROM gen_sql_t2").head
    assert(row.getLong(0) === 3L, "declared BIGINT kept, writer value overwritten")
  }

  test("addGeneratedColumn backfills an existing table atomically: every vintage materializes, deletes stay deleted, later writes recompute") {
    val path = Files.createTempDirectory("gen_backfill").toString + "/t"
    ManifestTable.overwrite(s, path, Seq((1L, "ab"), (2L, "abc")).toDF("k", "txt"))
    ManifestTable.append(s, path, Seq((3L, "abcd")).toDF("k", "txt"))
    ManifestTable.deleteVectorized(s, path, col("k") === 2L)
    // one atomic commit: rewritten files + declaration + zone maps
    val v = ManifestTable.addGeneratedColumn(s, path, "n_chars",
      "length(txt)", stats = true)
    val got = ManifestTable.read(s, path).orderBy("k")
      .select("k", "n_chars").collect().map(r => (r.getLong(0), r.getInt(1)))
    assert(got.toSeq === Seq((1L, 2), (3L, 4)),
      "both vintages materialize; the DV'd row stays deleted")
    // the declaration is live: a later append recomputes
    ManifestTable.append(s, path, Seq((9L, "xyzxy")).toDF("k", "txt"))
    assert(ManifestTable.read(s, path).filter(col("k") === 9L)
      .select("n_chars").head.getInt(0) === 5)
    // declared stats landed in the SAME commit as the rewrite
    val m = ManifestTable.readManifest(s, path, v)
    assert(m.statsCols.contains("n_chars"),
      s"stats declaration must ride the backfill commit: ${m.statsCols}")
    assert(m.props.get(ManifestTable.GeneratedPropPrefix + "n_chars")
      .contains("length(txt)"))
    // re-declaring the same name rejects
    val e = intercept[IllegalArgumentException](
      ManifestTable.addGeneratedColumn(s, path, "n_chars", "length(txt) + 1"))
    assert(e.getMessage.contains("already exists"))
  }

  test("rename/drop of the generated column or its sources rejects; CDF composes across a generated write") {
    val path = Files.createTempDirectory("gen_ren").toString + "/t"
    ManifestTable.overwrite(s, path,
      Seq((1L, "ab")).toDF("k", "txt"),
      generated = Map("n_chars" -> "length(txt)"))
    val e1 = intercept[IllegalArgumentException](
      ManifestTable.renameColumn(s, path, "txt", "body"))
    assert(e1.getMessage.contains("generated"))
    val e2 = intercept[IllegalArgumentException](
      ManifestTable.renameColumn(s, path, "n_chars", "len"))
    assert(e2.getMessage.contains("generated"))
    // the change feed across a generated-column append is a plain insert
    ManifestTable.append(s, path, Seq((2L, "xyz")).toDF("k", "txt"))
    val feed = ManifestTable.readChanges(s, path, 1L, 2L)
      .select("k", "n_chars", "_change_type").collect()
    assert(feed.map(r => (r.getLong(0), r.getInt(1), r.getString(2))).toSeq ===
      Seq((2L, 3, "insert")))
  }
}
