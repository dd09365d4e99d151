package graft.operators

import graft.SparkTestBase

/** The date-partitioned layout must change the SCAN (planning-time
  * partition pruning: a PartitionFilters entry and a pruned partition
  * count) without changing a single result cell. */
class PartitionedLayoutSpec extends SparkTestBase {

  test("q6 over the partitioned layout: partition filter present, result identical to the plain scan") {
    val df = PartitionedLayout.q6Partitioned(spark, sf)
    val scan = df.queryExecution.executedPlan.toString
    assert(scan.contains("PartitionFilters: ["),
      s"partitioned scan must carry a partition filter:\n$scan")
    assert("PartitionFilters: \\[\\]".r.findFirstIn(scan).isEmpty,
      s"the month window must actually reach PartitionFilters:\n$scan")
    val got = df.head()
    val want = OlapQueries.q6Forecast(spark, sf).head()
    assert(got.getAs[Double]("revenue") == want.getAs[Double]("revenue"))
    assert(got.getAs[Long]("n_items") == want.getAs[Long]("n_items"))
  }

  test("pruning is real: the partitioned scan reads fewer partitions than the table holds") {
    import org.apache.spark.sql.execution.FileSourceScanExec
    // AQE wraps the plan adaptively and hides the scan node until
    // execution; a plain session exposes FileSourceScanExec directly
    val s = spark.newSession()
    s.conf.set("spark.sql.adaptive.enabled", "false")
    val lt = PartitionedLayout.ensurePartitioned(s, sf)
    val nTotal = s.table(lt)
      .select("l_shipmonth").distinct().count()
    val scans = PartitionedLayout.q6Partitioned(s, sf)
      .queryExecution.executedPlan.collect { case f: FileSourceScanExec => f }
    assert(scans.nonEmpty)
    val read = scans.head.selectedPartitions.partitionCount
    assert(read <= 12 && read < nTotal,
      s"expected <=12 of $nTotal month partitions read, got $read")
  }
}
