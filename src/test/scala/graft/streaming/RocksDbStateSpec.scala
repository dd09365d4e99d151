package graft.streaming

import graft.SparkTestBase
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.{OutputMode, Trigger}

/** The stateful operators must run UNCHANGED on the RocksDB state
  * store — the production backend for large state (the default
  * HDFS-backed in-memory provider holds every key in executor heap;
  * a 100 TB ingest's join/session state does not fit there). Output
  * identity under the provider swap is the whole contract: state
  * semantics live in the operators, the store is a pluggable K/V. */
class RocksDbStateSpec extends SparkTestBase {

  private val ROCKS =
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"

  private def withRocksDb[T](body: => T): T = {
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key, ROCKS)
    try body
    finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }

  test("gap sessionization output is identical on the RocksDB provider") {
    val default = StreamOps.queries("stream_sessions")(spark, sf)
      .collect().map(_.toString).sorted.toSeq
    val rocks = withRocksDb {
      StreamOps.queries("stream_sessions")(spark, sf)
        .collect().map(_.toString).sorted.toSeq
    }
    assert(rocks == default)
    assert(rocks.nonEmpty)
  }

  test("stream-stream join output is identical on the RocksDB provider") {
    val default = StreamOps.queries("stream_join")(spark, sf)
      .collect().map(_.toString).sorted.toSeq
    val rocks = withRocksDb {
      StreamOps.queries("stream_join")(spark, sf)
        .collect().map(_.toString).sorted.toSeq
    }
    assert(rocks == default)
    assert(rocks.nonEmpty)
  }

  test("watermarked dedup state evicts on RocksDB too (bounded state, same rows)") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
    withRocksDb {
      def tts(sec: Long) = new java.sql.Timestamp(sec * 1000L)
      val in = MemoryStream[(Long, java.sql.Timestamp)]
      val deduped = in.toDF().toDF("id", "t")
        .withWatermark("t", "10 seconds")
        .dropDuplicatesWithinWatermark("id")
      val q = deduped.writeStream.format("memory").queryName("rocks_dedup")
        .outputMode(OutputMode.Append()).trigger(Trigger.ProcessingTime(0)).start()
      in.addData((1L, tts(100)), (1L, tts(101)), (2L, tts(100)))
      q.processAllAvailable()
      assert(spark.table("rocks_dedup").count() == 2)
      // advance the watermark far past id 1's window, then twice more
      // so the eviction pass runs; a re-delivery of id 1 is then a NEW
      // row (state evicted — the bounded-state contract, not a bug)
      in.addData((9L, tts(10000)))
      q.processAllAvailable()
      in.addData((8L, tts(10010)))
      q.processAllAvailable()
      val st = q.lastProgress.stateOperators(0).numRowsTotal
      assert(st <= 3, s"evicted state must not accumulate: $st rows")
      q.stop()
    }
  }
}
