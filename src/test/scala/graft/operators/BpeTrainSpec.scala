package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** The distributed BPE trainer must reproduce, merge for merge, a
  * straightforward JVM reference implementation run on the same
  * word-frequency map with the same tiebreak — the q_sketch
  * discipline for ops whose loop has no SQL mirror. */
class BpeTrainSpec extends SparkTestBase {

  /** Reference BPE: greedy left-to-right merges, count desc then
    * (a, b) lexicographic tiebreak, overlapping pair counts. */
  private def referenceBpe(freqs: Map[String, Long],
                           nMerges: Int): Seq[(String, String, Long)] = {
    var vocab: Map[Vector[String], Long] =
      freqs.map { case (w, f) => w.map(_.toString).toVector -> f }
    val out = Seq.newBuilder[(String, String, Long)]
    var done = false
    var i = 0
    while (!done && i < nMerges) {
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      for ((syms, f) <- vocab; j <- 0 until syms.length - 1)
        counts((syms(j), syms(j + 1))) = counts.getOrElse((syms(j), syms(j + 1)), 0L) + f
      val best = counts.toSeq
        .sortBy { case ((a, b), c) => (-c, a, b) }.headOption
      best match {
        case Some(((a, b), c)) if c >= 2 =>
          out += ((a, b, c))
          i += 1
          vocab = vocab.groupBy { case (syms, _) =>
            val acc = Vector.newBuilder[String]
            var last: String = null
            for (x <- syms) {
              if (last == a && x == b) { last = a + b }
              else { if (last != null) acc += last; last = x }
            }
            if (last != null) acc += last
            acc.result()
          }.map { case (k, vs) => k -> vs.values.sum }
        case _ => done = true
      }
    }
    out.result()
  }

  test("merge sequence equals the JVM reference on the corpus vocab") {
    val got = BpeTrain.textBpeTrain(spark, sf).collect()
      .map(r => (r.getAs[Long]("rank"), r.getAs[String]("a"),
        r.getAs[String]("b"), r.getAs[Long]("pair_count")))
      .sortBy(_._1)
    val freqs = graft.Tables.documents(spark, sf)
      .select(explode(split(col("text"), " ")).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy("w").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val want = referenceBpe(freqs, BpeTrain.MERGES)
    assert(got.length == want.length, s"${got.length} vs ${want.length} merges")
    got.zip(want).zipWithIndex.foreach { case (((rk, a, b, c), (wa, wb, wc)), i) =>
      assert(rk == i + 1)
      assert((a, b, c) == (wa, wb, wc), s"merge ${i + 1}: ($a,$b,$c) vs ($wa,$wb,$wc)")
    }
    // the trained rules are non-trivial: multi-char symbols appear on
    // the left side within the budget (merges compose)
    assert(got.exists(_._2.length > 1), "expected composed merges")
  }

  test("driver-gated rank-1 lane equals the trainer's first merge") {
    val r1 = BpeTrain.textBpeRank1(spark, sf).collect()
    assert(r1.length == 1)
    val first = BpeTrain.textBpeTrain(spark, sf)
      .filter(col("rank") === 1L).head()
    assert((r1.head.getAs[Long]("rank"), r1.head.getAs[String]("a"),
      r1.head.getAs[String]("b"), r1.head.getAs[Long]("pair_count")) ==
      ((first.getAs[Long]("rank"), first.getAs[String]("a"),
        first.getAs[String]("b"), first.getAs[Long]("pair_count"))))
  }
}
