package graft.plans

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Unit equivalence of the native one-sweep gram expressions against
  * the declarative split/explode forms they replaced — localized, so a
  * byte-sweep regression fails HERE instead of only end-to-end at the
  * oracle gate (r12 advice). Edge cases target the tokenization
  * contract: every 0x20 separates, EMPTY TOKENS PRESERVED (split
  * semantics), so leading/trailing/double spaces all produce empty
  * tokens that must count like any other token. */
class GramExprSpec extends SparkTestBase {

  // the contract's hard cases + a unicode row (multi-byte chars: char
  // length ≠ byte length for sum_tok_len) + real corpus docs below
  private val edges = Seq(
    "",                         // one empty token after split
    " ",                        // two empty tokens
    "solo",                     // single token: no bigram
    "a b",                      // minimal bigram
    " lead",                    // leading space → empty first token
    "trail ",                   // trailing space → empty last token
    "double  space",            // empty middle token
    "a a a b b a",              // repeats: top_cnt/dup_inst exercise
    "héllo wörld héllo",        // multi-byte tokens, a repeat
    "  ")                       // three empty tokens: all grams equal

  private def edgeDf = {
    val s = spark
    import s.implicits._
    edges.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "text")
  }

  // filter, not limit: a keyed predicate picks the SAME docs on every
  // scan (limit's pick order is not a cross-job guarantee)
  private def corpusDf = spark.read.parquet(s"$sf/documents.parquet")
    .select(col("doc_id").as("id"), col("text"))
    .filter(col("id") < 50)

  private def checkStats(df: org.apache.spark.sql.DataFrame, n: Int): Unit = {
    GramStatsExpr.register(spark)
    val got = df.select(col("id"), expr(s"graft_gram_stats(text, $n)").as("g"))
      .select(col("id"), col("g.n_grams"), col("g.n_distinct"),
        col("g.top_cnt"), col("g.dup_inst"), col("g.sum_tok_len"))
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))).toMap
    // the declarative original: split → slide → joined-string grams
    val tokMap = df.select(col("id"), split(col("text"), " ").as("tk"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    tokMap.foreach { case (id, tk) =>
      val grams = if (tk.length < n) Seq.empty[String]
        else tk.sliding(n).map(_.mkString(" ")).toSeq
      val cnts = grams.groupBy(identity).view.mapValues(_.size.toLong).toMap
      val nGrams = grams.size.toLong
      val nDistinct = cnts.size.toLong
      val topCnt = if (cnts.isEmpty) 0L else cnts.values.max
      val dupInst = nGrams - cnts.count(_._2 == 1L)
      val sumTokLen = tk.map(_.length.toLong).sum
      assert(got(id) == ((nGrams, nDistinct, topCnt, dupInst, sumTokLen)),
        s"id=$id n=$n text=${tokMap(id).mkString("|")}: " +
          s"native=${got(id)} ref=${(nGrams, nDistinct, topCnt, dupInst, sumTokLen)}")
    }
  }

  test("graft_gram_stats equals the declarative recompute on edge strings (n=1,2,3)") {
    Seq(1, 2, 3).foreach(checkStats(edgeDf, _))
  }

  test("graft_gram_stats equals the declarative recompute on corpus docs (n=1,2)") {
    Seq(1, 2).foreach(checkStats(corpusDf, _))
  }

  private def checkHashes(df: org.apache.spark.sql.DataFrame, n: Int): Unit = {
    GramHashExpr.register(spark)
    val got = df
      .select(col("id"), explode(expr(s"graft_gram_hash_counts(text, $n)")).as("g"))
      .select(col("id"), col("g.h1"), col("g.h2"), col("g.c"))
      .collect()
      .groupBy(_.getLong(0))
      .view.mapValues(_.map(r => (r.getLong(1), r.getLong(2), r.getLong(3))).toSet)
      .toMap
    // the declarative original: explode token instances, hash with
    // Spark's own xxhash64 (seed-chained for bigrams), count per gram
    val toks = df.select(col("id"),
        posexplode(split(col("text"), " ")).as(Seq("pos", "tok")))
    val ref = (if (n == 1)
        toks.select(col("id"), xxhash64(col("tok")).as("h1"), lit(0L).as("h2"))
      else {
        val nxt = toks.select(col("id").as("id2"), (col("pos") - 1).as("pos2"),
          col("tok").as("tok2"))
        toks.join(nxt, col("id") === col("id2") && col("pos") === col("pos2"))
          .select(col("id"), xxhash64(col("tok")).as("h1"),
            xxhash64(col("tok"), col("tok2")).as("h2"))
      })
      .groupBy("id", "h1", "h2").agg(count(lit(1)).as("c"))
      .collect()
      .groupBy(_.getLong(0))
      .view.mapValues(_.map(r => (r.getLong(1), r.getLong(2), r.getLong(3))).toSet)
      .toMap
    val ids = df.select("id").collect().map(_.getLong(0))
    ids.foreach { id =>
      val g = got.getOrElse(id, Set.empty)
      val r = ref.getOrElse(id, Set.empty)
      assert(g == r, s"id=$id n=$n: native-only=${(g -- r).take(3)} " +
        s"ref-only=${(r -- g).take(3)}")
    }
  }

  test("graft_gram_hash_counts hash identities and counts equal the declarative form (n=1,2)") {
    Seq(1, 2).foreach(checkHashes(edgeDf, _))
    Seq(1, 2).foreach(checkHashes(corpusDf, _))
  }
}
