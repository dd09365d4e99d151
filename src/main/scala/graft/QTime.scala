package graft
import org.apache.spark.sql.SparkSession

/** Dev tool: time individual queries by name (after one warm-up run at
  * sf0.001, mirroring Bench's steady-state protocol).
  *
  * Usage: runMain graft.QTime <sfDir> <query> [<query> ...]
  */
object QTime {
  def main(args: Array[String]): Unit = {
    val sfDir = args.head
    val names = args.tail.toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    names.foreach { n =>
      val fn = SparkEntry.queries(n)
      try fn(spark, "/root/testdata/sf0.001").count()
      catch { case _: Throwable => () }
      val t0 = System.nanoTime()
      val cnt = fn(spark, sfDir).count()
      println(f"QTIME $n%-24s ${(System.nanoTime() - t0) / 1e9}%8.2f s  rows=$cnt")
    }
    spark.stop()
  }
}
