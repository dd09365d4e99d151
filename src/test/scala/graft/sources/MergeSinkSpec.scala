package graft.sources

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import java.nio.file.Files

class MergeSinkSpec extends SparkTestBase {

  private def tmpTarget(): String = {
    val dir = Files.createTempDirectory("graft_merge").toFile
    dir.deleteOnExit()
    s"${dir.getAbsolutePath}/t.parquet"
  }

  test("merge upserts by key: higher version wins, new keys append") {
    val s = spark
    import s.implicits._
    val path = tmpTarget()
    val b1 = Seq((1L, 1L, "a"), (2L, 1L, "b")).toDF("k", "v", "payload")
    assert(MergeSink.mergeKeyed(b1, "k", "v", path) == 2)
    // batch 2: update k=1 with higher version, stale k=2, new k=3
    val b2 = Seq((1L, 2L, "a2"), (2L, 0L, "stale"), (3L, 1L, "c"))
      .toDF("k", "v", "payload")
    assert(MergeSink.mergeKeyed(b2, "k", "v", path) == 3)
    val out = spark.read.parquet(path).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getString(2))).toMap
    assert(out(1L) == (2L, "a2"))   // updated
    assert(out(2L) == (1L, "b"))    // stale incoming ignored
    assert(out(3L) == (1L, "c"))    // inserted
  }

  test("equal versions: incoming row wins (deterministic tiebreak)") {
    val s = spark
    import s.implicits._
    val path = tmpTarget()
    MergeSink.mergeKeyed(Seq((1L, 5L, "old")).toDF("k", "v", "p"), "k", "v", path)
    MergeSink.mergeKeyed(Seq((1L, 5L, "new")).toDF("k", "v", "p"), "k", "v", path)
    val out = spark.read.parquet(path).collect()
    assert(out.length == 1 && out.head.getString(2) == "new")
  }

  test("compaction bounds the file count after many merges") {
    val s = spark
    import s.implicits._
    val path = tmpTarget()
    (1 to 5).foreach { i =>
      MergeSink.mergeKeyed(
        Seq((i.toLong, 1L, s"p$i")).toDF("k", "v", "p"), "k", "v", path)
    }
    assert(spark.read.parquet(path).count() == 5)
    val files = new java.io.File(path).listFiles()
      .count(_.getName.endsWith(".parquet"))
    assert(files == 1, s"expected 1 compacted file, got $files")
  }
}
