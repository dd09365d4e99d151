package graft
object PlanProbe {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val s = org.apache.spark.sql.SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.autoBroadcastJoinThreshold", "10m")
      .config("spark.sql.adaptive.autoBroadcastJoinThreshold", "64m")
      .config("spark.sql.files.maxPartitionBytes", "16m")
      .config("spark.sql.files.openCostInBytes", "1m")
      .config("spark.sql.join.preferSortMergeJoin", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    args.tail.foreach { q =>
      val t0 = System.nanoTime()
      val df = SparkEntry.queries(q)(s, args.head)
      df.collect()
      println(f"==== $q: ${(System.nanoTime()-t0)/1e9}%.2f s ====")
      def walk(p: org.apache.spark.sql.execution.SparkPlan, depth: Int): Unit = {
        val interesting = p.metrics.filter { case (_, m) =>
          m.value > 0 && (m.metricType == "timing" || m.metricType == "nsTiming" ||
            m.name.exists(nm => nm.contains("rows") || nm.contains("spill") ||
              nm.contains("data size") || nm.contains("time")))
        }.map { case (k, m) => s"$k=${m.value}" }.mkString(" ")
        println("  " * depth + p.nodeName + (if (interesting.nonEmpty) s" [$interesting]" else ""))
        val kids = p match {
          case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec => Seq(a.executedPlan)
          case qe: org.apache.spark.sql.execution.adaptive.QueryStageExec => Seq(qe.plan)
          case r: org.apache.spark.sql.execution.ReusedSubqueryExec => Seq(r.child)
          case b: org.apache.spark.sql.execution.exchange.ReusedExchangeExec => Seq(b.child)
          case other => other.children
        }
        kids.foreach(walk(_, depth + 1))
      }
      walk(df.queryExecution.executedPlan, 1)
    }
    s.stop()
  }
}
