package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** JSON-lines source/sink — the reference's interchange format
  * (save_sessions_to_bucket writes one JSON object per line,
  * handler.py:240; raw posts are JSON documents).
  *
  * Reading always passes an explicit schema: at 100 TB schema inference
  * is a full extra pass over the data, and silent type widening from
  * inference is how pipelines corrupt downstream tables.
  */
object JsonLines {

  /** Write one JSON object per line (spark's json sink is exactly the
    * reference's put_json_lines layout, parallelized). */
  def write(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").json(path)

  /** Read with a required schema; corrupt lines land in a quarantine
    * column instead of failing the job (PERMISSIVE + columnNameOfCorruptRecord
    * is the production posture for third-party feeds). */
  def read(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read
      .schema(schema.add("_corrupt_record", "string"))
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .json(path)
}
