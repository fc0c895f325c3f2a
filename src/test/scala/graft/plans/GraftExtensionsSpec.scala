package graft.plans

import graft.SparkSpec
import graft.sources.Tables

class GraftExtensionsSpec extends SparkSpec {

  test("cosine_similarity is callable from SQL after registration") {
    GraftExtensions.register(spark)
    Tables.embeddings(spark, sf).createOrReplaceTempView("emb")
    val row = spark.sql(
      """SELECT a.vec_id, b.vec_id, cosine_similarity(a.embedding, b.embedding) AS c
        |FROM emb a JOIN emb b ON a.vec_id = 0 AND b.vec_id = 0""".stripMargin).head()
    assert(math.abs(row.getDouble(2) - 1.0) < 1e-9) // self-similarity ≈ 1
  }

  test("cosine_similarity rejects wrong arity and wrong types in SQL") {
    GraftExtensions.register(spark)
    Tables.embeddings(spark, sf).createOrReplaceTempView("emb")
    intercept[Exception] {
      spark.sql("SELECT cosine_similarity(embedding) FROM emb").collect()
    }
    intercept[Exception] {
      spark.sql("SELECT cosine_similarity(vec_id, vec_id) FROM emb").collect()
    }
  }
}
