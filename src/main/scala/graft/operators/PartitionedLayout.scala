package graft.operators

import graft.Tables._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Partitioned-layout twin of the bucketed-layout story: the fact table
  * saved `partitionBy(ship month)`, so a date-windowed query reads ONLY
  * the partitions inside its window — the scan shows PartitionFilters
  * and a pruned partition count instead of a full-table read. At 100 TB
  * date-partitioning is the first layout decision anyone makes; this
  * demonstrates the engine plans it correctly (directory-level pruning
  * happens at planning time, before a single row is read — cheaper even
  * than row-group skipping, which still opens every file's footer).
  * Plan body shared with OlapQueries.q6From — one definition, two
  * physical layouts, same oracle-checked result. */
object PartitionedLayout {

  /** One partitioned save per (warehouse, sf dir): lineitem partitioned
    * by derived ship month. Same collision-safe pattern as
    * BucketedQueries.ensureBucketed (sf-tagged name, orphaned-location
    * sweep, once per session). */
  def ensurePartitioned(s: SparkSession, d: String): String = {
    val tag = d.replaceAll("[^0-9a-zA-Z]", "_")
    val lt = s"lineitem_part_$tag"
    this.synchronized {
      if (!s.catalog.tableExists(lt)) {
        val loc = new org.apache.hadoop.fs.Path(
          s.conf.get("spark.sql.warehouse.dir"), lt.toLowerCase)
        val fs = loc.getFileSystem(s.sessionState.newHadoopConf())
        if (fs.exists(loc)) fs.delete(loc, true)
        // Timezone coupling: date_format renders in the WRITING
        // session's spark.sql.session.timeZone (the harness pins UTC,
        // build.sbt). A persisted warehouse read under a different
        // session timezone would shift month-boundary rows relative to
        // q6_forecast's timestamp window; a cross-timezone deployment
        // should derive the partition value timezone-explicitly, e.g.
        // date_format(to_utc_timestamp(l_shipdate, sessionTz), ...).
        lineitem(s, d)
          .withColumn("l_shipmonth", date_format(col("l_shipdate"), "yyyy-MM"))
          .write.partitionBy("l_shipmonth").mode("overwrite").saveAsTable(lt)
      }
    }
    lt
  }

  /** Q6 against the partitioned layout: the month predicate prunes to
    * the 12 partitions of 1996 at planning time; the row-level
    * shipdate/discount/quantity predicates still push into the pruned
    * files. Identical result to q6_forecast by construction. */
  def q6Partitioned(s: SparkSession, d: String): DataFrame = {
    val lt = ensurePartitioned(s, d)
    OlapQueries.q6From(
      s.table(lt).filter(col("l_shipmonth").between("1996-01", "1996-12")))
  }

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q6_partitioned" -> (q6Partitioned _)
  )
}
