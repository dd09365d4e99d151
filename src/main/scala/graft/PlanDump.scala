package graft

/** Writes `explain("formatted")` of declared queries to files — the
  * optimization rounds' plan-evidence artifact (`plans/rNN/<q>_{before,
  * after}.txt`). Session confs mirror Bench so the dumped plan is the
  * plan the bench actually times.
  *
  * Usage: PlanDump <sfDir> <outDir> <suffix> <query> [query...]
  * writes <outDir>/<query>_<suffix>.txt for each. Building the
  * DataFrame executes any driver-side loop a lane contains (PageRank /
  * GD / Lloyd), so the dump carries the final plan exactly as a bench
  * pass would produce it.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val (sfDir, outDir, suffix) = (args(0), args(1), args(2))
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val s = org.apache.spark.sql.SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.autoBroadcastJoinThreshold", "10m")
      .config("spark.sql.adaptive.autoBroadcastJoinThreshold", "64m")
      .config("spark.sql.files.maxPartitionBytes", "16m")
      .config("spark.sql.files.openCostInBytes", "1m")
      .config("spark.sql.join.preferSortMergeJoin", "false")
      .config("spark.sql.legacy.bucketedTableScan.outputOrdering", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.warehouse.dir",
        java.nio.file.Files.createTempDirectory("graft_plandump_wh").toString)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    new java.io.File(outDir).mkdirs()
    args.drop(3).foreach { q =>
      val df = SparkEntry.queries(q)(s, sfDir)
      val txt = df.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
      java.nio.file.Files.write(
        java.nio.file.Paths.get(s"$outDir/${q}_$suffix.txt"),
        txt.getBytes(java.nio.charset.StandardCharsets.UTF_8)): Unit
      println(s"dumped $q -> $outDir/${q}_$suffix.txt")
    }
    s.stop()
  }
}
