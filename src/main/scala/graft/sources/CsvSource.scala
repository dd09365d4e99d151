package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** CSV source/sink with the same production posture as [[JsonLines]]:
  * explicit schema always (inference is an extra full pass at 100 TB
  * and silently widens types), malformed rows quarantined in a corrupt
  * -record column instead of failing the job or being dropped
  * (PERMISSIVE — a third-party feed's bad 0.001% must not kill a
  * 1000-executor run, and silently losing it is worse). Reading a
  * directory of part files is the same call as one file.
  *
  * Quarantine-inspection caveat (applies to [[JsonLines]] too): Spark
  * refuses a query that references ONLY `_corrupt_record` from a raw
  * CSV/JSON read (AnalysisException since 2.3 — the parser never
  * materializes the raw line unless another column forces the row).
  * `read(...).filter($"_corrupt_record".isNotNull).count()` therefore
  * fails unless the frame is first `.cache()`d (which materializes all
  * columns) or the filter also touches a data column. */
object CsvSource {

  def write(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").option("header", "true").csv(path)

  def read(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read
      .schema(schema.add("_corrupt_record", "string"))
      .option("header", "true")
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .csv(path)
}
