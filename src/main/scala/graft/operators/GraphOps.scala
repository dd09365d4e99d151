package graft.operators

import graft.Tables._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Link-graph analytics over the document corpus — the web-graph
  * quality signals a pretraining pipeline computes next to its text
  * signals (PageRank-family centrality is the classic crawl-priority /
  * page-quality feature).
  *
  * The corpus carries no real hyperlink column, so the edge set is
  * derived DETERMINISTICALLY from doc ids (k md5-hash targets per doc,
  * the repo's portable-hash idiom) — both engines rebuild the identical
  * graph, which keeps an iterative float-free PageRank oracle-checkable
  * bit-for-bit. On a real crawl the edge table comes from
  * text_html_links resolved against a URL→doc index; everything from
  * the edge table down is unchanged.
  *
  * Scale posture: each iteration is ONE hash aggregate over the edge
  * stream (3N rows) joined map-side against the previous rank vector
  * (N rows, AQE-broadcast while ranks fit, shuffle-join beyond that) —
  * the standard distributed PageRank step, linear per iteration, no
  * driver-side state. Iteration count is FIXED (not convergence-tested)
  * so the plan depth is bounded and both engines run the same number of
  * steps; production materializes the edge projection once (the
  * memoized-table pattern dedup_canonical uses) instead of re-deriving
  * it per iteration. Ranks are integer fixed-point (1e12 total mass,
  * integer division only), so no float accumulation order can diverge
  * between engines — the same exactness discipline as Money.
  */
object GraphOps {

  private val SCALE = 1000000000000L // total rank mass, fixed-point
  private val K = 3                  // out-degree of every doc
  private val ITERS = 3              // fixed iteration count
  private val TOP = 100              // result rows (total-order tiebreak)

  /** PageRank with damping 0.85 over the derived K-regular link graph:
    * p'(v) = (15·(SCALE div N)) div 100 + (85·Σ_{u→v} p(u) div K) div 100,
    * ITERS fixed steps from the uniform vector, all arithmetic on
    * longs. Output: top-TOP docs by (pr desc, doc_id) with in-degree. */
  def qPagerank(s: SparkSession, d: String): DataFrame = {
    val nDocs = documents(s, d).agg(count(lit(1)).as("n_docs"))
    val ids = documents(s, d).select(col("doc_id")).crossJoin(broadcast(nDocs))
    val edges = ids.select(col("doc_id").as("src"),
      explode(array((1 to K).map(k =>
        conv(substring(md5(concat(lit("pr:"), col("doc_id"), lit(s":$k"))), 1, 8), 16, 10)
          .cast("long") % col("n_docs")): _*)).as("dst"))
    var ranks = ids.select(col("doc_id").as("rid"),
      expr(s"$SCALE DIV n_docs").as("p"))
    for (_ <- 1 to ITERS) {
      val insum = edges.join(ranks, col("src") === col("rid"))
        .groupBy(col("dst")).agg(sum(expr(s"p DIV $K")).as("insum"))
      ranks = ids.join(insum, col("doc_id") === col("dst"), "left")
        .select(col("doc_id").as("rid"),
          (expr(s"(15 * ($SCALE DIV n_docs)) DIV 100") +
            expr("(85 * coalesce(insum, 0)) DIV 100")).as("p"))
    }
    val indeg = edges.groupBy(col("dst").as("ind_id"))
      .agg(count(lit(1)).as("in_deg"))
    ids.select(col("doc_id"))
      .join(indeg, col("doc_id") === col("ind_id"), "left")
      .join(ranks, col("doc_id") === col("rid"))
      .select(col("doc_id"),
        coalesce(col("in_deg"), lit(0L)).as("in_deg"),
        col("p").as("pr"))
      .orderBy(col("pr").desc, col("doc_id").asc)
      .limit(TOP)
  }

  /** DuckDB parse of the first 8 md5 hex digits as a BIGINT — the
    * oracle-side mirror of conv(substring(md5(x), 1, 8), 16, 10). */
  private def hex8(m: String): String =
    (1 to 8).map(i =>
      s"CAST(strpos('0123456789abcdef', substr($m, $i, 1)) - 1 AS BIGINT) * ${1L << (4 * (8 - i))}")
      .mkString(" + ")

  private def rankStep(prev: String, next: String): String =
    s"""$next AS (SELECT ids.doc_id AS rid,
       |    (15 * ($SCALE // (SELECT n FROM nn))) // 100
       |    + (85 * COALESCE(s.insum, 0)) // 100 AS p
       |  FROM ids LEFT JOIN (
       |    SELECT e.dst, SUM($prev.p // $K) AS insum
       |    FROM e JOIN $prev ON e.src = $prev.rid GROUP BY e.dst) s
       |  ON ids.doc_id = s.dst)""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_pagerank" -> (qPagerank _)
  )

  val oracle: Map[String, String] = Map(
    "q_pagerank" ->
      s"""WITH nn AS (SELECT count(*) AS n FROM documents),
         |ids AS (SELECT doc_id FROM documents),
         |em AS (SELECT doc_id AS src, md5('pr:' || doc_id || ':' || k) AS m
         |  FROM ids, (SELECT unnest([${(1 to K).mkString(", ")}]) AS k) ks),
         |e AS (SELECT src,
         |    (${hex8("m")}) % (SELECT n FROM nn) AS dst FROM em),
         |r0 AS (SELECT doc_id AS rid, $SCALE // (SELECT n FROM nn) AS p FROM ids),
         |${rankStep("r0", "r1")},
         |${rankStep("r1", "r2")},
         |${rankStep("r2", "r3")},
         |indeg AS (SELECT dst, count(*) AS in_deg FROM e GROUP BY dst)
         |SELECT ids.doc_id, COALESCE(indeg.in_deg, 0) AS in_deg,
         |  CAST(r3.p AS BIGINT) AS pr
         |FROM ids LEFT JOIN indeg ON ids.doc_id = indeg.dst
         |JOIN r3 ON ids.doc_id = r3.rid
         |ORDER BY pr DESC, ids.doc_id LIMIT $TOP""".stripMargin
  )
}
