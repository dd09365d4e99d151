package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** ORC source/sink with the same production posture as [[CsvSource]] /
  * [[JsonLines]] (the reference ingests interchange files and lands
  * them through one staging surface; ORC is the columnar member of
  * that trio). Differences from the text sources follow from the
  * format, not the posture:
  *
  *  - ORC files are self-describing and type-checked at write time, so
  *    there is no malformed-row lane — the failure mode a corrupt-
  *    record column guards against cannot occur. The explicit-schema
  *    overload still matters: it pins the EXPECTED shape, so a
  *    producer-side column rename/retype fails the read loudly at
  *    analysis instead of silently propagating a drifted schema
  *    downstream (100 TB pipelines die from silent drift, not parse
  *    errors).
  *  - Filters and column pruning push into the ORC reader the same as
  *    parquet (`PushedFilters` in the scan node — asserted by
  *    ScalePatternsSpec); row-group (stripe) skipping makes selective
  *    reads IO-proportional to the predicate, which is the property
  *    that survives a 1000-executor scan.
  *
  * Reading a directory of part files is the same call as one file. */
object OrcSource {

  def write(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").orc(path)

  /** Schema-pinned read: analysis fails if the files can't serve the
    * expected columns/types (missing column → null-filled only when
    * the files genuinely lack it; a retyped column errors). */
  def read(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema).orc(path)

  /** Discovery read (schema from file footers) — for exploration, not
    * production pipelines; see the explicit-schema overload. */
  def read(spark: SparkSession, path: String): DataFrame =
    spark.read.orc(path)
}
