package graft
import org.apache.spark.sql.SparkSession

/** Dev tool: time individual queries by name (warm-up run + min of two
  * timed passes, mirroring Bench's steady-state protocol). Resolves
  * declared queries AND the bucketed-layout variants (q3_bucketed ...),
  * so scale runs can time both physical layouts of the same plan.
  *
  * Usage: runMain graft.QTime <sfDir> <query> [<query> ...]
  * Warm-up dir defaults to Bench's sf0.001 convention; override with
  * SPARK_GRAFT_WARMUP_DIR (skipped when absent or equal to sfDir).
  * SPARK_GRAFT_QTIME_OUT=<file> additionally writes one JSON object
  * {"sf":…, "queries":{name:{sec,rows},…}} — the machine-readable
  * artifact for scale benches.
  */
object QTime {
  def main(args: Array[String]): Unit = {
    val sfDir = args.head
    val names = args.tail.toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val warmupDir = sys.env.getOrElse("SPARK_GRAFT_WARMUP_DIR", "/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      // same split broadcast thresholds as Bench (see rationale there):
      // conservative static (compressed-size estimates), node-sized AQE
      // (measured sizes)
      .config("spark.sql.autoBroadcastJoinThreshold",
        sys.env.getOrElse("SPARK_GRAFT_BROADCAST_THRESHOLD", "10m"))
      .config("spark.sql.adaptive.autoBroadcastJoinThreshold",
        sys.env.getOrElse("SPARK_GRAFT_AQE_BROADCAST_THRESHOLD", "64m"))
      // split/pack file scans toward one task per ~16 MB rather than
      // the 128 MB default that packs a 32-file scale table into 4
      // tasks on a 32-thread node; openCost ~0 on local NVMe/page
      // cache (same settings as Bench — see rationale there)
      .config("spark.sql.files.maxPartitionBytes", "16m")
      .config("spark.sql.files.openCostInBytes", "1m")
      .config("spark.sql.join.preferSortMergeJoin", "false")
      // set at construction (not lazily in ensureBucketed) so plan
      // shapes are identical whether or not a bucketed query ran first
      // in this session — see BucketedQueries.ensureBucketed
      .config("spark.sql.legacy.bucketedTableScan.outputOrdering", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // events.ts NTZ->TZ normalization (Tables.tsToNanos) is exact only
      // under a pinned UTC session timezone
      .config("spark.sql.session.timeZone", "UTC")
      // fresh warehouse per run: bucketed saves from a previous JVM
      // would otherwise collide (Bench.scala has the same rationale)
      .config("spark.sql.warehouse.dir",
        java.nio.file.Files.createTempDirectory("graft_qtime_wh").toString)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val registry = SparkEntry.queries ++ operators.BucketedQueries.all ++
      operators.PartitionedLayout.all
    val out = scala.collection.mutable.LinkedHashMap.empty[String, (Double, Long)]
    names.foreach { n =>
      val fn = registry(n)
      if (new java.io.File(warmupDir).isDirectory && warmupDir != sfDir)
        // warm-up failure (e.g. a query that can't run at the tiny SF)
        // is a skip, not an abort — mirror Bench's protocol
        try fn(spark, warmupDir).collect(): Unit
        catch { case scala.util.control.NonFatal(_) => () }
      // Timed action is collect(), NOT count(): count() over a final
      // aggregate/projection lets Catalyst column-prune every value
      // expression the row count doesn't need (OptimizeOneRowPlan +
      // ColumnPruning) — measured at sf10, q1_agg's six aggregate
      // sums were never evaluated under count() (1.1 s) while the
      // honest evaluation costs many times that. collect() needs every
      // output column, so nothing is pruned — and it is the exact
      // analogue of the DuckDB baseline's fetchall(). Each pass builds
      // a FRESH DataFrame: re-collecting one Dataset instance replays
      // its already-materialized shuffle stages and measures nothing.
      var cnt = 0L
      def timed(): Double = {
        val t0 = System.nanoTime()
        cnt = fn(spark, sfDir).collect().length.toLong
        (System.nanoTime() - t0) / 1e9
      }
      // min-of-N (SPARK_GRAFT_QTIME_PASSES, default 2): single runs on
      // this VM swing 1.5-2× on 1-4 s queries; scale artifacts use 3
      val passes = sys.env.getOrElse("SPARK_GRAFT_QTIME_PASSES", "2").toInt
      val ts = (1 to passes).map(_ => timed())
      out(n) = (ts.min, cnt)
      val detail = ts.zipWithIndex.map { case (t, i) => f"p${i + 1}=$t%.2f" }.mkString(" ")
      println(f"QTIME $n%-24s ${ts.min}%8.2f s  ($detail) rows=$cnt")
      // SPARK_GRAFT_QTIME_EXPLAIN=1: dump the POST-execution physical
      // plan (AQE's final shape — coalesced reads, runtime join picks —
      // which a pre-execution explain never shows)
      if (sys.env.contains("SPARK_GRAFT_QTIME_EXPLAIN")) {
        val executed = fn(spark, sfDir)
        executed.collect(): Unit
        println(executed.queryExecution.executedPlan.toString)
      }
    }
    sys.env.get("SPARK_GRAFT_QTIME_OUT").foreach { f =>
      val qs = out.map { case (k, (sec, rows)) =>
        s""""$k":{"sec":${math.rint(sec * 10000) / 10000},"rows":$rows}"""
      }.mkString("{", ",", "}")
      java.nio.file.Files.write(java.nio.file.Paths.get(f),
        s"""{"sf":"$sfDir","cpus":$cpus,"queries":$qs}"""
          .getBytes(java.nio.charset.StandardCharsets.UTF_8)): Unit
    }
    spark.stop()
  }
}
