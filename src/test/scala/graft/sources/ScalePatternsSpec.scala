package graft.sources

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** The storage-layout patterns that matter at cluster scale, proven on
  * the local engine: bucketed co-located joins (no Exchange), partition
  * pruning on date-partitioned output, and streaming ingestion into the
  * idempotent sink. */
class ScalePatternsSpec extends SparkTestBase {

  test("bucketed tables join WITHOUT a shuffle (co-located join)") {
    // isolated SQL conf: disable auto-broadcast so the join would
    // otherwise need a shuffle; newSession shares the context but not
    // conf mutations with the other suites.
    val s = spark.newSession()
    s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    s.conf.set("spark.sql.adaptive.enabled", "false")
    s.read.parquet(s"$sf/orders.parquet")
      .write.mode("overwrite").bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .saveAsTable("orders_bucketed")
    s.read.parquet(s"$sf/lineitem.parquet")
      .write.mode("overwrite").bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .saveAsTable("lineitem_bucketed")
    val joined = s.table("lineitem_bucketed")
      .join(s.table("orders_bucketed"), col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_orderstatus").agg(count(lit(1)).as("n"))
    val plan = joined.queryExecution.executedPlan.toString
    // the join itself must not exchange: both sides are pre-bucketed on
    // the join key (only the final 1-key aggregation may shuffle)
    val joinSection = plan.split("HashAggregate").last
    assert(!joinSection.contains("Exchange hashpartitioning(l_orderkey") &&
           !joinSection.contains("Exchange hashpartitioning(o_orderkey"),
      s"bucketed join must not shuffle join keys:\n$plan")
    assert(joined.collect().map(_.getAs[Long]("n")).sum ==
      s.read.parquet(s"$sf/lineitem.parquet").count())
  }

  test("date-partitioned output prunes partitions on read") {
    val dir = java.nio.file.Files.createTempDirectory("graft_part").toString + "/weekly"
    val records = graft.etl.WodEtl.pipelineE2E(spark, sf)
    records.write.mode("overwrite").partitionBy("date").parquet(dir)
    val someDate = records.select("date").head().getString(0)
    val pruned = spark.read.parquet(dir).filter(col("date") === someDate)
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(date"),
      s"expected partition filter in scan:\n${plan.take(1500)}")
    assert(pruned.count() == records.filter(col("date") === someDate).count())
  }

  test("streaming batches land through the idempotent sink exactly once") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.{OutputMode, Trigger}
    import graft.streaming.Ev
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft_stream_sink").toString + "/t"
    val input = MemoryStream[Ev]
    val q = input.toDS().writeStream
      .outputMode(OutputMode.Append()).trigger(Trigger.ProcessingTime(0))
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[Ev], _: Long) =>
        IdempotentSink.writeKeyed(
          batch.toDF().withColumn("idem_key",
            sha2(concat(lit("ev:"), col("user_id"), lit(":"), col("ts_s")), 256)),
          "idem_key", "ts_s", dir): Unit
      }
      .start()
    input.addData(Ev(1, 100, 1.0), Ev(1, 200, 1.0))
    q.processAllAvailable()
    // replayed batch (same keys) plus one genuinely new event
    input.addData(Ev(1, 100, 1.0), Ev(1, 200, 1.0), Ev(2, 300, 1.0))
    q.processAllAvailable()
    q.stop()
    val out = spark.read.parquet(dir)
    assert(out.count() == 3, "replayed events must not duplicate")
    assert(out.select("idem_key").distinct().count() == 3)
  }
}
