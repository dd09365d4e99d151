package graft.etl

import graft.SparkTestBase
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Property-based check: the window-function sessionization agrees with
  * the reference's pairwise list-walking (transforms.py:115) on
  * ARBITRARY token sequences, not just the fixture corpus. */
class SessionizePropertySpec extends SparkTestBase {

  private val markers = Set("stream", "window")
  private val vocab = Gen.oneOf("stream", "window", "agg", "sort", "the",
    "data", "row", "key", "join", "merge")

  private def referenceGrouping(toks: List[String]): List[List[String]] = {
    val idx = toks.zipWithIndex.collect { case (t, i) if markers(t) => i }
    // True pairwise walk (transforms.py:19-30): a single marker yields
    // NO pairs, and the end-capture append is guarded on non-emptiness —
    // so one-marker docs produce zero groups.
    val pairs = idx.zip(idx.drop(1))
    if (pairs.isEmpty) Nil
    else (pairs :+ ((idx.last, toks.length))).map { case (a, b) => toks.slice(a, b) }
  }

  private def sparkGrouping(docs: List[List[String]]): Map[(Int, Long), String] = {
    val s = spark
    import s.implicits._
    val df = docs.zipWithIndex.map { case (t, i) => (i, t.mkString(" ")) }
      .toDF("doc_id", "text")
    val cum = Window.partitionBy("doc_id").orderBy("pos")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val isMarker = when(col("tok").isin(markers.toSeq.map(lit): _*), 1).otherwise(0)
    df.select(col("doc_id"), posexplode(split(col("text"), " ")).as(Seq("pos", "tok")))
      .withColumn("session_id", sum(isMarker).over(cum))
      .withColumn("n_markers",
        sum(isMarker).over(Window.partitionBy("doc_id")))
      .filter(col("session_id") >= 1 && col("n_markers") >= 2)
      .groupBy("doc_id", "session_id")
      .agg(concat_ws(" ",
        transform(array_sort(collect_list(struct(col("pos").as("p"), col("tok").as("t")))),
          x => x.getField("t"))).as("session_text"))
      .collect()
      .map(r => (r.getAs[Int]("doc_id"), r.getAs[Long]("session_id")) ->
        r.getAs[String]("session_text"))
      .toMap
  }

  test("window-function sessionization == reference pairwise walk on random input") {
    val docGen = Gen.listOfN(30, vocab)
    val corpusGen = Gen.listOfN(8, docGen).suchThat(_.forall(_.nonEmpty))
    val prop = Prop.forAllNoShrink(corpusGen) { docs =>
      val expected = docs.zipWithIndex.flatMap { case (t, i) =>
        referenceGrouping(t).zipWithIndex.map { case (g, gi) =>
          (i, (gi + 1).toLong) -> g.mkString(" ")
        }
      }.toMap
      sparkGrouping(docs) == expected
    }
    val result = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(10), prop)
    assert(result.passed, result.status.toString)
  }
}
