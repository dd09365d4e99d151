package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Last-writer-wins keyed merge (upsert) + small-file compaction — the
  * other half of the reference's idempotent persistence story
  * (IdempotentSink is first-writer-wins): MERGE INTO semantics done as
  * a plain parquet rewrite, the pattern Delta/Iceberg implement with a
  * transaction log.
  *
  * Scale posture: the merge is one unioned window per key (shuffle on
  * the key only); compaction bounds output files via repartition —
  * at cluster scale the target would be key-partitioned so the rewrite
  * touches only affected partitions. The swap is
  * write-temp-then-rename, the classic job-commit shape (a real
  * deployment swaps via the table format's atomic commit instead of a
  * filesystem rename).
  */
object MergeSink {

  /** Upsert `batch` into the parquet at `path`: per key, the row with
    * the highest (version, is-incoming) wins — incoming beats existing
    * at equal version. Returns the merged row count. `numFiles` bounds
    * the rewritten file count (compaction). */
  def mergeKeyed(batch: DataFrame, keyCol: String, versionCol: String,
                 path: String, numFiles: Int = 1): Long = {
    val spark = batch.sparkSession
    val incoming = batch.withColumn("__src", lit(1))
    val existing =
      try spark.read.parquet(path).withColumn("__src", lit(0))
      catch {
        case e: org.apache.spark.sql.AnalysisException
          if e.getCondition != null && e.getCondition == "PATH_NOT_FOUND" => null
      }
    val all = if (existing == null) incoming
              else existing.unionByName(incoming)
    val w = Window.partitionBy(keyCol)
      .orderBy(col(versionCol).desc, col("__src").desc)
    val merged = all
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn", "__src")
      .repartition(numFiles)
      .persist()
    try {
      val n = merged.count()
      // write beside, then swap — never a partial in-place overwrite
      val tmp = path + ".__merge_tmp"
      merged.write.mode(SaveMode.Overwrite).parquet(tmp)
      val fs = new java.io.File(path)
      if (fs.exists()) {
        val old = new java.io.File(path + ".__merge_old")
        if (old.exists()) delete(old)
        require(fs.renameTo(old), s"could not stage old $path")
        require(new java.io.File(tmp).renameTo(fs), s"could not swap $tmp")
        delete(old)
      } else {
        require(new java.io.File(tmp).renameTo(fs), s"could not move $tmp")
      }
      n
    } finally merged.unpersist()
  }

  private def delete(f: java.io.File): Unit = {
    if (f.isDirectory) f.listFiles().foreach(delete)
    f.delete()
  }
}
