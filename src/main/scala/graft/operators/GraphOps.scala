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
  * driver-side state. [[qPagerank]] runs a FIXED 3 steps (cheap smoke
  * twin, bounded plan depth); [[qPagerankConverged]] is the production
  * form — integer-mass delta stopping rule, checkpointed iterates, the
  * oracle mirroring the RULE rather than a pinned depth. Both
  * materialize the edge projection once (the memoized-table pattern
  * dedup_canonical uses) instead of re-deriving it per iteration.
  * Ranks are integer fixed-point (1e12 total mass, integer division
  * only), so no float accumulation order can diverge between engines —
  * the same exactness discipline as Money.
  */
object GraphOps {

  private val SCALE = 1000000000000L // total rank mass, fixed-point
  private[operators] val K = 3       // out-degree of every doc (specs reuse it)
  private[operators] val ITERS_SMOKE = 3 // fixed iteration count (q_pagerank)
  private val TOP = 100              // result rows (total-order tiebreak)
  // convergence-driven form: stop when the total absolute rank change
  // (integer mass units) drops to ≤ EPS = SCALE·1e-6, hard-bounded at
  // MAX_ITERS. Deltas halve per step from ~0.36·SCALE (measured r16,
  // sf0.001→sf1), so the rule fires around step 20 at every tested SF;
  // 26 bounds the pathological case.
  private[operators] val PR_EPS = SCALE / 1000000L
  private[operators] val PR_MAX = 26

  /** doc ids with the corpus count attached (scalar broadcast) — the
    * shared root of every derived-graph operator. */
  private def idsFor(s: SparkSession, d: String): DataFrame = {
    val nDocs = documents(s, d).agg(count(lit(1)).as("n_docs"))
    documents(s, d).select(col("doc_id")).crossJoin(broadcast(nDocs))
  }

  /** The deterministic K-regular edge set (src, dst) both engines
    * rebuild identically — see the object scaladoc. */
  private def edgesFor(ids: DataFrame): DataFrame =
    ids.select(col("doc_id").as("src"),
      explode(array((1 to K).map(k =>
        conv(substring(md5(concat(lit("pr:"), col("doc_id"), lit(s":$k"))), 1, 8), 16, 10)
          .cast("long") % col("n_docs")): _*)).as("dst"))

  /** PageRank with damping 0.85 over the derived K-regular link graph:
    * p'(v) = (15·(SCALE div N)) div 100 + (85·Σ_{u→v} p(u) div K) div 100,
    * ITERS fixed steps from the uniform vector, all arithmetic on
    * longs. Output: top-TOP docs by (pr desc, doc_id) with in-degree.
    *
    * One static co-partitioned plan at every size (r16; unlike the
    * converged loop, no size gear): ids/edges repartition once on the
    * join keys inside the SINGLE plan — 3 fixed steps need no
    * checkpoints, the reused exchange plays the checkpoint's role —
    * with shuffle-hash hints, so no O(n) rank vector is broadcast per
    * step (the posture that survives 100×). AQE stays ON: the hints
    * carry the no-broadcast guarantee into adaptive replanning (a
    * session-conf toggle around a LAZY DataFrame would not — the
    * caller's action runs outside any scoped conf; r17, per advice).
    * Measured: sf10 4.9 → 4.3 s, sf0.1 parity; the gear machinery's
    * metadata count job costs more than it saves at smoke depth. */
  def qPagerank(s: SparkSession, d: String): DataFrame = {
    val ids = idsFor(s, d).repartition(col("doc_id"))
    val edges = edgesFor(ids).repartition(col("src"))
    def hinted(df: DataFrame): DataFrame = df.hint("shuffle_hash")
    var ranks = ids.select(col("doc_id").as("rid"),
      expr(s"$SCALE DIV n_docs").as("p"))
    for (_ <- 1 to ITERS_SMOKE) {
      val insum = edges.join(hinted(ranks), col("src") === col("rid"))
        .groupBy(col("dst")).agg(sum(expr(s"p DIV $K")).as("insum"))
      ranks = ids.join(hinted(insum), col("doc_id") === col("dst"), "left")
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

  /** PageRank run to CONVERGENCE — the production form of
    * [[qPagerank]] (which keeps its fixed 3 steps as the cheap
    * smoke-depth twin). The loop applies the identical integer
    * fixed-point step, but stops on an integer-mass delta rule:
    * Σ|p_i − p_{i−1}| ≤ PR_EPS (1e-6 of total mass), hard-bounded at
    * PR_MAX. Per iteration the driver sees ONE scalar (the delta) —
    * the CC-loop posture; edges and each iterate are
    * lineage-truncated (localCheckpoint; `spark.graft.checkpointDir`
    * upgrades to reliable checkpoints on a cluster) so iteration d
    * never recomputes iterations 1..d−1, and the delta job itself
    * materializes the lazily-checkpointed iterate — one job per step.
    *
    * The ORACLE mirrors the stopping rule, not a pinned depth: the
    * chained-CTE rank steps unroll to PR_MAX, per-step deltas are
    * scalar CTEs, and the final select picks the vector at
    * min{i : delta_i ≤ EPS} (PR_MAX if none) — so both engines choose
    * the same depth BY THE SAME RULE at any SF, and the converged
    * depth rides the output as n_iters. Integer arithmetic end to end:
    * no float accumulation can diverge, and the rounding floor that
    * keeps delta from ever reaching exactly 0 (measured: the tail
    * flattens near O(n_docs) mass units) is why the rule is a
    * threshold, not a fixpoint test.
    *
    * TWO physical gears, picked by a metadata row count (both produce
    * identical rows — spec-asserted):
    *  - small corpora (≤ PR_COPART_DOCS): AQE + broadcast loop joins,
    *    shuffle partitions scoped to 8 — at bench scale the wall is
    *    per-job overhead, not work (sf0.1: 10.5 s at 32 parts → 4.4 s);
    *  - large corpora: ids/edges/ranks CO-PARTITIONED once on the join
    *    keys (localCheckpoint preserves partitioning), shuffle-hash
    *    hints, AQE off inside the loop — every iteration then has
    *    exactly ONE exchange (the groupBy(dst)) and ZERO per-iteration
    *    broadcast builds of the O(n) rank vector, which is what ate the
    *    AQE gear at sf10 (three 500k-row broadcasts per step: 33.8 s →
    *    13.8 s measured). The co-partitioned gear IS the 100 TB shape:
    *    broadcast-per-iteration dies first at scale. */
  def qPagerankConverged(s: SparkSession, d: String): DataFrame = {
    val nDocs = documents(s, d).count() // one metadata count serves both gear checks
    prConverged(s, d, copart = nDocs > PR_COPART_DOCS, nDocs = nDocs)
  }

  private[operators] val PR_COPART_DOCS = 100000L

  private[operators] def prConverged(s: SparkSession, d: String,
      copart: Boolean, nDocs: Long = -1L): DataFrame = {
    import DedupOps.TruncOps
    val sessionParts = s.conf.get("spark.sql.shuffle.partitions")
    val prevAqe = s.conf.get("spark.sql.adaptive.enabled")
    val loopParts =
      if (!copart) 8
      else math.max(8, math.min(sessionParts.toInt,
        ((if (nDocs >= 0) nDocs else documents(s, d).count()) /
          PR_COPART_DOCS).toInt * 8))
    def keyed(df: DataFrame, key: String): DataFrame =
      if (copart) df.repartition(loopParts, col(key)) else df
    def hinted(df: DataFrame): DataFrame =
      if (copart) df.hint("shuffle_hash") else df
    s.conf.set("spark.sql.shuffle.partitions", loopParts.toString)
    if (copart) s.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val ids = keyed(idsFor(s, d), "doc_id").truncEager
      val edges = keyed(edgesFor(ids), "src").truncEager
      var ranks = ids.select(col("doc_id").as("rid"),
        expr(s"$SCALE DIV n_docs").as("p")).truncEager
      var it = 0
      var converged = false
      while (!converged && it < PR_MAX) {
        val insum = edges.join(hinted(ranks), col("src") === col("rid"))
          .groupBy(col("dst")).agg(sum(expr(s"p DIV $K")).as("insum"))
        val next = ids.join(hinted(insum), col("doc_id") === col("dst"), "left")
          .select(col("doc_id").as("rid"),
            (expr(s"(15 * ($SCALE DIV n_docs)) DIV 100") +
              expr("(85 * coalesce(insum, 0)) DIV 100")).as("p"))
          .truncLazy
        // the one scalar the driver sees per step; this action also
        // materializes `next`'s checkpoint (no separate job)
        val delta = next
          .join(hinted(ranks.select(col("rid").as("rid0"), col("p").as("p0"))),
            col("rid") === col("rid0"))
          .agg(sum(abs(col("p") - col("p0")))).head().getLong(0)
        ranks = next
        it += 1
        converged = delta <= PR_EPS
      }
      val indeg = edges.groupBy(col("dst").as("ind_id"))
        .agg(count(lit(1)).as("in_deg"))
      ids.select(col("doc_id"))
        .join(indeg, col("doc_id") === col("ind_id"), "left")
        .join(ranks, col("doc_id") === col("rid"))
        .select(col("doc_id"),
          coalesce(col("in_deg"), lit(0L)).as("in_deg"),
          col("p").as("pr"),
          lit(it.toLong).as("n_iters"))
        .orderBy(col("pr").desc, col("doc_id").asc)
        .limit(TOP)
    } finally {
      s.conf.set("spark.sql.shuffle.partitions", sessionParts)
      s.conf.set("spark.sql.adaptive.enabled", prevAqe)
    }
  }

  /** Triangle + wedge census of the derived link graph (global
    * clustering coefficient — the graph-cohesion profile next to
    * PageRank's centrality): undirected-distinct edges canonicalized
    * a<b, triangles {a<b<c} enumerated once via the two-path join
    * e(a,b)⋈e(b,c) semi-joined against the closing edge e(a,c) — the
    * MapReduce triangle-counting shape (Suri & Vassilvitskii, WWW'11).
    * Wedge work per center is (smaller-neighbors)·(larger-neighbors) ≤
    * deg²; here in-degrees are hash-uniform (Poisson(K), max
    * O(log n/log log n)) so id-ordering already bounds the join width —
    * on a power-law graph the same plan orients edges by (degree, id)
    * instead, which caps the width at O(√m) per node; everything else
    * is unchanged. Three shuffles total (distinct, wedge join, closing
    * semi-join), output one row. */
  def qTriangleCount(s: SparkSession, d: String): DataFrame = {
    val und = edgesFor(idsFor(s, d))
      .filter(col("src") =!= col("dst"))
      .select(least(col("src"), col("dst")).as("a"),
        greatest(col("src"), col("dst")).as("b"))
      .distinct()
    val tri = und.as("x")
      .join(und.as("y"), col("x.b") === col("y.a"))
      .select(col("x.a").as("wa"), col("x.b").as("wb"), col("y.b").as("wc"))
      .join(und.as("z"),
        col("wa") === col("z.a") && col("wc") === col("z.b"), "left_semi")
      .agg(count(lit(1)).as("n_triangles"))
    val wedges = und.select(col("a").as("node"))
      .unionAll(und.select(col("b").as("node")))
      .groupBy("node").agg(count(lit(1)).as("dg"))
      .agg(sum(expr("dg * (dg - 1) DIV 2")).as("n_wedges"))
    tri.crossJoin(broadcast(wedges))
      .select(col("n_triangles"), col("n_wedges"),
        (floor(lit(3.0) * col("n_triangles") / col("n_wedges") * 1e6 + 0.5) / 1e6)
          .as("closure"))
  }

  /** DuckDB parse of the first 8 md5 hex digits as a BIGINT — the
    * oracle-side mirror of conv(substring(md5(x), 1, 8), 16, 10). */
  private def hex8(m: String): String =
    (1 to 8).map(i =>
      s"CAST(strpos('0123456789abcdef', substr($m, $i, 1)) - 1 AS BIGINT) * ${1L << (4 * (8 - i))}")
      .mkString(" + ")

  /** Materialized variant for the converged chain: every r_i is read
    * 3–4 times (next step, two delta terms, allr) — DuckDB 1.0 inlines
    * plain CTEs per REFERENCE, which is exponential in chain depth
    * (the dedup_semantic lesson; the plain 26-step chain hung at 500
    * docs). */
  private def rankStepM(prev: String, next: String): String =
    s"""$next AS MATERIALIZED (SELECT ids.doc_id AS rid,
       |    (15 * ($SCALE // (SELECT n FROM nn))) // 100
       |    + (85 * COALESCE(s.insum, 0)) // 100 AS p
       |  FROM ids LEFT JOIN (
       |    SELECT e.dst, SUM($prev.p // $K) AS insum
       |    FROM e JOIN $prev ON e.src = $prev.rid GROUP BY e.dst) s
       |  ON ids.doc_id = s.dst)""".stripMargin

  private def rankStep(prev: String, next: String): String =
    s"""$next AS (SELECT ids.doc_id AS rid,
       |    (15 * ($SCALE // (SELECT n FROM nn))) // 100
       |    + (85 * COALESCE(s.insum, 0)) // 100 AS p
       |  FROM ids LEFT JOIN (
       |    SELECT e.dst, SUM($prev.p // $K) AS insum
       |    FROM e JOIN $prev ON e.src = $prev.rid GROUP BY e.dst) s
       |  ON ids.doc_id = s.dst)""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_pagerank" -> (qPagerank _),
    "q_pagerank_converged" -> (qPagerankConverged _),
    "q_triangle_count" -> (qTriangleCount _)
  )

  /** the derived-edge CTE chain shared by every graph oracle — the SQL
    * mirror of [[edgesFor]]. */
  private def edgeCtes: String =
    s"""nn AS (SELECT count(*) AS n FROM documents),
       |ids AS (SELECT doc_id FROM documents),
       |em AS (SELECT doc_id AS src, md5('pr:' || doc_id || ':' || k) AS m
       |  FROM ids, (SELECT unnest([${(1 to K).mkString(", ")}]) AS k) ks),
       |e AS (SELECT src,
       |    (${hex8("m")}) % (SELECT n FROM nn) AS dst FROM em)""".stripMargin

  val oracle: Map[String, String] = Map(
    "q_triangle_count" ->
      s"""WITH $edgeCtes,
         |und AS (SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
         |  FROM e WHERE src <> dst),
         |tri AS (SELECT count(*) AS n_triangles FROM und x
         |  JOIN und y ON x.b = y.a
         |  JOIN und z ON z.a = x.a AND z.b = y.b),
         |deg AS (SELECT node, count(*) AS dg FROM (
         |  SELECT a AS node FROM und UNION ALL SELECT b AS node FROM und) u
         |  GROUP BY 1),
         |wed AS (SELECT CAST(SUM(dg * (dg - 1) // 2) AS BIGINT) AS n_wedges FROM deg)
         |SELECT n_triangles, n_wedges,
         |  floor(3.0 * n_triangles / n_wedges * 1e6 + 0.5) / 1e6 AS closure
         |FROM tri, wed""".stripMargin,
    "q_pagerank" ->
      s"""WITH $edgeCtes,
         |r0 AS (SELECT doc_id AS rid, $SCALE // (SELECT n FROM nn) AS p FROM ids),
         |${rankStep("r0", "r1")},
         |${rankStep("r1", "r2")},
         |${rankStep("r2", "r3")},
         |indeg AS (SELECT dst, count(*) AS in_deg FROM e GROUP BY dst)
         |SELECT ids.doc_id, COALESCE(indeg.in_deg, 0) AS in_deg,
         |  CAST(r3.p AS BIGINT) AS pr
         |FROM ids LEFT JOIN indeg ON ids.doc_id = indeg.dst
         |JOIN r3 ON ids.doc_id = r3.rid
         |ORDER BY pr DESC, ids.doc_id LIMIT $TOP""".stripMargin,
    // the convergence-driven twin: the STOPPING RULE is mirrored in
    // SQL, not a pinned depth — rank steps unroll to PR_MAX, per-step
    // deltas are scalar CTEs, and the final vector is the one at
    // min{i : delta_i <= EPS} (PR_MAX if none), so both engines choose
    // the same depth by the same rule at any SF
    "q_pagerank_converged" -> {
      val steps = (1 to PR_MAX).map(i => rankStepM(s"r${i - 1}", s"r$i"))
        .mkString(",\n")
      val deltas = (1 to PR_MAX).map(i =>
        s"SELECT $i AS i, SUM(ABS(a.p - b.p)) AS dv FROM r$i a JOIN r${i - 1} b ON a.rid = b.rid")
        .mkString("\n  UNION ALL ")
      val allr = (1 to PR_MAX).map(i => s"SELECT $i AS i, rid, p FROM r$i")
        .mkString("\n  UNION ALL ")
      s"""WITH $edgeCtes,
         |r0 AS MATERIALIZED (SELECT doc_id AS rid, $SCALE // (SELECT n FROM nn) AS p FROM ids),
         |$steps,
         |dl AS MATERIALIZED ($deltas),
         |pick AS (SELECT COALESCE(MIN(i), $PR_MAX) AS ic FROM dl WHERE dv <= $PR_EPS),
         |allr AS ($allr),
         |indeg AS (SELECT dst, count(*) AS in_deg FROM e GROUP BY dst)
         |SELECT ids.doc_id, COALESCE(indeg.in_deg, 0) AS in_deg,
         |  CAST(fr.p AS BIGINT) AS pr,
         |  CAST((SELECT ic FROM pick) AS BIGINT) AS n_iters
         |FROM ids LEFT JOIN indeg ON ids.doc_id = indeg.dst
         |JOIN (SELECT rid, p FROM allr WHERE i = (SELECT ic FROM pick)) fr
         |  ON ids.doc_id = fr.rid
         |ORDER BY pr DESC, ids.doc_id LIMIT $TOP""".stripMargin
    }
  )
}
