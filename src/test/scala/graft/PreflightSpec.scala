package graft

import org.apache.spark.sql.functions._

class PreflightSpec extends SparkTestBase {

  test("contract holds on the driver's testdata") {
    assert(Preflight.check(spark, sf).isEmpty)
    Preflight.assertContract(spark, sf) // must not throw
  }

  test("a drifted table produces ONE named finding, not opaque per-query errors") {
    val dir = java.nio.file.Files.createTempDirectory("graft_drift").toString
    try {
      // copy the real tables, then drift events: drop `value`, retype ts
      for (t <- Seq("region", "nation", "customer", "supplier", "part",
                    "orders", "lineitem", "documents", "embeddings"))
        Tables.t(spark, sf, t).write.parquet(s"$dir/$t.parquet")
      Tables.t(spark, sf, "events")
        .drop("value")
        .withColumn("ts", col("ts").cast("string"))
        .write.parquet(s"$dir/events.parquet")
      val drift = Preflight.check(spark, dir)
      assert(drift.exists(_.startsWith("events.value: MISSING")), drift.mkString("; "))
      assert(drift.exists(_.startsWith("events.ts: type drift")), drift.mkString("; "))
      // only the drifted table is implicated
      assert(drift.forall(_.startsWith("events.")), drift.mkString("; "))
      val ex = intercept[IllegalStateException](Preflight.assertContract(spark, dir))
      assert(ex.getMessage.contains("events.ts"))
    } finally {
      // full testdata copies must not accumulate in /tmp across runs
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) Option(f.listFiles).foreach(_.foreach(rm))
        f.delete(): Unit
      }
      rm(new java.io.File(dir))
    }
  }

  test("ts layout variants all normalize to long nanos") {
    import org.apache.spark.sql.types._
    // current driver layout: timestamp (read via the parquet reader the
    // contract actually exercises)
    val fromTs = Tables.events(spark, sf)
    assert(fromTs.schema("ts").dataType == LongType)
    // legacy layout: already long nanos — passes through untouched
    val legacy = spark.range(3).select(
      (col("id") * 1000000000L + 1700000000000000000L).as("ts"))
    assert(Tables.normalizeEventTs(legacy).schema("ts").dataType == LongType)
    // value check: ts values are µs-precision instants; nanos div 1000
    // must equal unix_micros of the raw column read as timestamp
    val raw = Tables.eventsRaw(spark, sf)
      .select(col("event_id"), unix_micros(col("ts").cast("timestamp")).as("us"))
    val normalized = fromTs.select(col("event_id"), expr("ts div 1000").as("us"))
    assert(normalized.except(raw).isEmpty && raw.except(normalized).isEmpty)
  }

  test("cent-grid guard: on-grid money passes, off-grid money is named") {
    val s = spark
    import s.implicits._
    // exact 2-decimal values (the data model) — clean
    val clean = Seq(1.0, 0.07, 12345.99, 0.0).toDF("l_extendedprice")
    assert(Preflight.centGridViolations(clean, Seq("l_extendedprice")).isEmpty)
    // a value off the grid by more than half a cent would be silently
    // mis-rounded into Money.scala's "exact" long sums — must be named
    val dirty = Seq(1.0, 0.015, 2.123).toDF("l_extendedprice")
    val found = Preflight.centGridViolations(dirty, Seq("l_extendedprice"))
    assert(found.size == 1 && found.head.startsWith("l_extendedprice: 2 "))
  }
}
