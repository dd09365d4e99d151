package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Small-file compaction — the routine table-maintenance job every
  * continuous-ingest deployment runs: streaming sinks and incremental
  * merges fragment a table into thousands of small files, and at
  * 100 TB the scan cost of a fragmented table is dominated by file
  * OPEN overhead and footer reads, not bytes (Spark packs splits by
  * `files.maxPartitionBytes` + `files.openCostInBytes` — the latter
  * exists precisely because small files are this expensive).
  *
  * Two modes, chosen by whether a sort key is given:
  *  - UNSORTED (size-only): `coalesce(n)` — NO shuffle; each output
  *    task concatenates input splits. The cheapest possible rewrite,
  *    right when the table has no dominant access predicate.
  *  - SORTED (layout-building): `repartitionByRange(n, key) +
  *    sortWithinPartitions(key)` — ONE range shuffle buys near-disjoint
  *    per-file key ranges, so parquet row-group min/max stats prune
  *    whole files for key predicates (spec-proven: a point filter on
  *    the sorted layout returns rows from exactly one file). This is
  *    the same economics as the bucketed-twin rule (§SparkEntry
  *    .layoutPrimary): pay one shuffle at write time, delete scan work
  *    on every read after.
  *
  * Output file count = ceil(input bytes / targetBytes), computed from
  * the REAL file listing, never a row-count guess — compression ratio
  * differences between source and target are the caller's targetBytes
  * calibration concern (the report carries both byte totals so the
  * calibration loop has its data).
  *
  * Reference analogue: none — the reference's Lambda pipeline writes
  * one S3 object per run (handler.py persist step); this is the
  * operation its data lake would need at three more orders of
  * magnitude.
  */
object Compaction {

  /** What the job did — inputs for the caller's next calibration. */
  case class CompactReport(filesBefore: Long, bytesBefore: Long,
                           filesAfter: Long, bytesAfter: Long,
                           rows: Long, targetBytes: Long)

  private def listParquet(spark: SparkSession, dir: String): Seq[(String, Long)] = {
    val p = new Path(dir)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(p)) Seq.empty
    else fs.listStatus(p).toSeq
      .filter(st => st.isFile && st.getPath.getName.endsWith(".parquet"))
      .map(st => (st.getPath.toString, st.getLen))
  }

  /** Compact `srcDir` into `dstDir`. `sortKeys` empty → shuffle-free
    * coalesce; non-empty → range-partition + sort within partitions on
    * those keys. Returns the before/after report. */
  def compact(spark: SparkSession, srcDir: String, dstDir: String,
              targetBytes: Long = 128L * 1024 * 1024,
              sortKeys: Seq[String] = Nil): CompactReport = {
    require(targetBytes > 0, "targetBytes must be positive")
    val before = listParquet(spark, srcDir)
    require(before.nonEmpty, s"no parquet files under $srcDir")
    val bytesBefore = before.map(_._2).sum
    val n = math.max(1L, (bytesBefore + targetBytes - 1) / targetBytes).toInt
    val df = spark.read.parquet(srcDir)
    val out =
      if (sortKeys.isEmpty) df.coalesce(n)
      else df.repartitionByRange(n, sortKeys.map(col): _*)
        .sortWithinPartitions(sortKeys.map(col): _*)
    out.write.mode("overwrite").parquet(dstDir)
    val after = listParquet(spark, dstDir)
    val rows = spark.read.parquet(dstDir).count()
    CompactReport(before.size.toLong, bytesBefore,
      after.size.toLong, after.map(_._2).sum, rows, targetBytes)
  }
}
