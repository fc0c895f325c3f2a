package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.types.StructType

/** CSV source/sink — same discipline as the JSON source: explicit schema,
  * FAILFAST for correctness runs. Exists for interchange completeness; at
  * 100 TB columnar parquet is the working format (CSV can't prune columns
  * or push filters), so CSV is an ingest edge, not a pipeline format.
  */
object Csv {
  def read(spark: SparkSession, schema: StructType, paths: String*): DataFrame =
    spark.read.schema(schema)
      .option("header", "true")
      .option("mode", "FAILFAST")
      .option("timestampFormat", "yyyy-MM-dd HH:mm:ss[.SSSSSS]")
      .csv(paths: _*)

  def write(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite)
      .option("header", "true")
      .option("timestampFormat", "yyyy-MM-dd HH:mm:ss.SSSSSS")
      .csv(path)
}
