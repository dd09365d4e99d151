package graft.etl

import graft.Tables._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The reference pipeline (bdolly/weightlifting-WOD-ETL) re-expressed as
  * declarative Spark plans.
  *
  * Reference semantics covered (file:line refs into /root/reference):
  *  - strip_post_html (handler.py:167): HTML → text + entity decode.
  *  - group_post_content_by_day / group_source_by (transforms.py:115,131):
  *    partition an ordered sequence at marker-regex matches; content
  *    before the first marker is dropped, last group runs to the end.
  *  - segment_days (transforms.py:176): second-level segmentation inside
  *    each group; a segment's key is its marker element, its value the
  *    join of the rest; duplicate keys resolve last-wins
  *    (dict-comprehension semantics, transforms.py:250-255).
  *  - extract_date_range_from_slug_or_title (transforms.py:42):
  *    `month-d1-d2-yyyy` regex → date range.
  *  - sessions_to_json_records_by_day (transforms.py:211): anchor the
  *    week at `start - isoweekday(start)` (the Sunday before) and assign
  *    `anchor + session_index` to each session.
  *  - clean_sessions_df_records (transforms.py:289): rename segment keys
  *    to fixed columns, fill missing with '', null session → 'Rest Day',
  *    dates normalized to yyyy-MM-dd.
  *  - idempotency keys (services/idempotency_service.py:30):
  *    sha256("op:identifier").
  *  - save_sessions_to_bucket (handler.py:194): min/max date per group →
  *    weekly partition path.
  *
  * The reference walks Python lists pairwise on a single machine; here
  * every step is a window/groupBy plan partitioned by `doc_id`, so the
  * same pipeline scales linearly across executors — the only shuffles
  * are one per sessionization level, all on the document key.
  *
  * The `documents` table stands in for the post corpus: each document's
  * whitespace token stream is the "lines" of a post; `stream|window`
  * tokens are the day markers (weekday lines) and `agg|sort|merge`
  * tokens are the segment markers (`Session|Suggested Warm-Up|^[A-F].$`).
  * A deterministic slug (month-d1-d2-yyyy) is derived per document to
  * exercise the date-range extraction exactly as the reference does.
  */
object WodEtl {

  private val sessionMarkers = Seq("stream", "window")
  private val segmentMarkers = Seq("agg", "sort", "merge")
  private val monthNames = Seq("january", "february", "march", "april",
    "may", "june", "july", "august", "september", "october", "november",
    "december")

  /** Deterministic synthetic slug per document (exercises the
    * `month-d1-d2-yyyy` parse of transforms.py:42). */
  private def withSlug(df: DataFrame): DataFrame = {
    val month = element_at(
      array(monthNames.map(lit): _*), (col("doc_id") % 12 + 1).cast("int"))
    val d1 = col("doc_id") % 20 + 1
    val d2 = d1 + 6
    val year = col("doc_id") % 5 + 2020
    df.withColumn("slug",
      concat_ws("-", month, d1, d2, year, lit("5-day-weightlifting-program")))
  }

  /** Month-name → number and date-range columns parsed back OUT of the
    * slug via the reference's regex (never from the arithmetic above —
    * the parse is the operator under test). */
  private def withDateRange(df: DataFrame): DataFrame = {
    val pat = "([a-z]+)-(\\d+)-(\\d+)-(\\d{4})"
    val monthName = regexp_extract(col("slug"), pat, 1)
    val monthNum = monthNames.zipWithIndex.foldLeft(lit(null).cast("int")) {
      case (acc, (name, idx)) => when(monthName === name, lit(idx + 1)).otherwise(acc)
    }
    df.withColumn("start_date",
        make_date(regexp_extract(col("slug"), pat, 4).cast("int"), monthNum,
                  regexp_extract(col("slug"), pat, 2).cast("int")))
      .withColumn("end_date",
        make_date(regexp_extract(col("slug"), pat, 4).cast("int"), monthNum,
                  regexp_extract(col("slug"), pat, 3).cast("int")))
  }

  /** Token stream: one row per (doc_id, pos, tok), pos is 1-based. */
  private def tokens(s: SparkSession, d: String): DataFrame =
    documents(s, d)
      .select(col("doc_id"), posexplode(split(col("text"), " ")).as(Seq("pos0", "tok")))
      .withColumn("pos", (col("pos0") + 1).cast("int"))
      .drop("pos0")

  private val cumWindow =
    Window.partitionBy("doc_id").orderBy("pos")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

  /** group_source_by: cumulative count of markers = group id; rows
    * before the first marker (id 0) are dropped. Docs with exactly ONE
    * marker yield ZERO groups, replicating the reference's pairwise
    * index walk (transforms.py:19-30 via 115-128: pairwise of a single
    * index is empty and the tail-append is guarded), not the "one
    * session to end-of-doc" a bare cumulative sum would emit. */
  private def sessionized(s: SparkSession, d: String): DataFrame = {
    val isMarker = when(col("tok").isin(sessionMarkers: _*), 1).otherwise(0)
    // Same partition+order spec as cumWindow, whole-partition frame:
    // both sums evaluate in ONE WindowExec pass (one shuffle, one sort)
    // instead of adding a second window stage.
    val totalWindow = Window.partitionBy("doc_id").orderBy("pos")
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    tokens(s, d)
      .withColumn("session_id", sum(isMarker).over(cumWindow))
      .withColumn("n_markers", sum(isMarker).over(totalWindow))
      .filter(col("session_id") >= 1 && col("n_markers") >= 2)
      .drop("n_markers")
  }

  /** Ordered string re-assembly after a shuffle: sort collected
    * (pos, tok) structs — deterministic, unlike raw collect_list. */
  private def orderedJoin(posCol: Column, tokCol: Column): Column =
    concat_ws(" ",
      transform(array_sort(collect_list(struct(posCol.as("p"), tokCol.as("t")))),
        x => x.getField("t")))

  /** Second-level segmentation inside each session. The reference runs
    * the same group_source_by walk per session (transforms.py:176-188),
    * so the single-marker → zero-groups rule applies here too. */
  private def segmented(s: SparkSession, d: String): DataFrame = {
    val perSession = Window.partitionBy("doc_id", "session_id").orderBy("pos")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val segStartW = Window.partitionBy("doc_id", "session_id", "seg_id")
    val isSeg = when(col("tok").isin(segmentMarkers: _*), 1).otherwise(0)
    // whole-partition frame on the same spec as perSession → one pass
    val perSessionTotal = Window.partitionBy("doc_id", "session_id")
      .orderBy("pos")
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    sessionized(s, d)
      .withColumn("seg_id", sum(isSeg).over(perSession))
      .withColumn("n_seg_markers", sum(isSeg).over(perSessionTotal))
      .filter(col("seg_id") >= 1 && col("n_seg_markers") >= 2)
      .drop("n_seg_markers")
      .withColumn("seg_start", min("pos").over(segStartW))
      .groupBy("doc_id", "session_id", "seg_id")
      .agg(
        min_by(col("tok"), col("pos")).as("segment_key"),
        coalesce(orderedJoin(
          when(col("pos") > col("seg_start"), col("pos")),
          when(col("pos") > col("seg_start"), col("tok"))), lit("")).as("segment_value"))
  }

  // ---- queries ------------------------------------------------------

  /** strip_post_html: HTML wrap is synthesized deterministically, then
    * stripped — tags → space, entities decoded, whitespace collapsed. */
  def stripHtml(s: SparkSession, d: String): DataFrame = {
    val wrapped = concat(lit("<p><strong>"), col("text"),
      lit("</strong><br /> &#8211; fin</p>"))
    documents(s, d)
      .select(col("doc_id"),
        trim(regexp_replace(regexp_replace(regexp_replace(wrapped,
          "<[^>]*>", " "), "&#8211;|&ndash;", "-"), "\\s+", " ")).as("clean_text"))
      .withColumn("n_chars_clean", length(col("clean_text")))
  }

  /** Date-range extraction from the slug (transforms.py:42). */
  def dateExtract(s: SparkSession, d: String): DataFrame =
    withDateRange(withSlug(documents(s, d)))
      .select(col("doc_id"), col("slug"), col("start_date"), col("end_date"))

  /** Date-range extraction from the TITLE format ("April 1-7, 2024
    * &#8211; ..."), the reference's fallback path (transforms.py:55-57,
    * 74-79): decode the &#8211;/&ndash; entities, then parse
    * `Month d1-d2, yyyy` — mirrored here including the entity cleanup. */
  def titleDateExtract(s: SparkSession, d: String): DataFrame = {
    val month = element_at(
      array(monthNames.map(lit): _*), (col("doc_id") % 12 + 1).cast("int"))
    val cap = concat(upper(substring(month, 1, 1)), substring(month, 2, 20))
    val d1 = col("doc_id") % 20 + 1
    val year = col("doc_id") % 5 + 2020
    val titled = documents(s, d).withColumn("title",
      concat(cap, lit(" "), d1, lit("-"), d1 + 6, lit(", "), year,
        lit(" &#8211; 5 Day Weightlifting Program")))
    val cleaned = regexp_replace(col("title"), "&#8211;|&ndash;", "-")
    val pat = "([a-zA-Z]+)\\s+(\\d+)-(\\d+)[,\\s]+(\\d{4})"
    val monthName = lower(regexp_extract(cleaned, pat, 1))
    val monthNum = monthNames.zipWithIndex.foldLeft(lit(null).cast("int")) {
      case (acc, (name, idx)) => when(monthName === name, lit(idx + 1)).otherwise(acc)
    }
    titled.select(col("doc_id"), col("title"),
      make_date(regexp_extract(cleaned, pat, 4).cast("int"), monthNum,
        regexp_extract(cleaned, pat, 2).cast("int")).as("start_date"),
      make_date(regexp_extract(cleaned, pat, 4).cast("int"), monthNum,
        regexp_extract(cleaned, pat, 3).cast("int")).as("end_date"))
  }

  /** Marker-based sessionization of the token stream. */
  def sessionizeText(s: SparkSession, d: String): DataFrame =
    sessionized(s, d)
      .groupBy("doc_id", "session_id")
      .agg(count(lit(1)).as("n_tokens"),
           orderedJoin(col("pos"), col("tok")).as("session_text"))

  /** Segment extraction: (doc, session, seg) → key + joined value. */
  def segments(s: SparkSession, d: String): DataFrame =
    segmented(s, d)

  /** Week-anchored date assignment (transforms.py:211): anchor =
    * start - isoweekday(start); record date = anchor + session_id. */
  def dateRecords(s: SparkSession, d: String): DataFrame = {
    val anchored = withDateRange(withSlug(documents(s, d)))
      .withColumn("week_anchor",
        date_add(col("start_date"), -(weekday(col("start_date")) + 1)))
      .select("doc_id", "week_anchor")
    sessionizeText(s, d).select("doc_id", "session_id")
      .join(anchored, "doc_id")
      .select(col("doc_id"), col("session_id"),
        date_add(col("week_anchor"), col("session_id").cast("int")).as("record_date"))
  }

  /** clean_sessions_df_records: last-wins key pivot into fixed columns,
    * missing → '', session name from the day-marker token. */
  def cleanRecords(s: SparkSession, d: String): DataFrame = {
    val lastWins = Window.partitionBy("doc_id", "session_id", "segment_key")
      .orderBy(col("seg_id").desc)
    val pivoted = segmented(s, d)
      .withColumn("rn", row_number().over(lastWins))
      .filter(col("rn") === 1)
      .groupBy("doc_id", "session_id")
      .agg(
        coalesce(max(when(col("segment_key") === "agg", col("segment_value"))), lit("")).as("warm_up"),
        coalesce(max(when(col("segment_key") === "sort", col("segment_value"))), lit("")).as("segment_a"),
        coalesce(max(when(col("segment_key") === "merge", col("segment_value"))), lit("")).as("segment_b"))
    // The LEFT join below makes the optimizer infer isnotnull(doc_id)
    // on the `pivoted` side only, pushed all the way into its scan —
    // which breaks canonical equality between this side's exchange and
    // pivoted's (same scan→explode→shuffle prefix otherwise), so the
    // whole sessionize pipeline ran TWICE. Adding the same (vacuously
    // true — doc_id is the key) filter here re-enables AQE exchange
    // reuse: one scan+explode+shuffle serves both join sides (r20 opt
    // round, guide §2.4; plan evidence in plans/r20/etl_clean_records_*).
    val names = sessionized(s, d).filter(col("doc_id").isNotNull)
      .groupBy("doc_id", "session_id")
      .agg(min_by(col("tok"), col("pos")).as("session"))
    names.join(pivoted, Seq("doc_id", "session_id"), "left")
      .select(col("doc_id"), col("session_id"),
        coalesce(col("session"), lit("Rest Day")).as("session"),
        coalesce(col("warm_up"), lit("")).as("warm_up"),
        coalesce(col("segment_a"), lit("")).as("segment_a"),
        coalesce(col("segment_b"), lit("")).as("segment_b"))
  }

  /** Idempotency keys (idempotency_service.py:30 + handler.py:127):
    * sha256("dump_post_to_bucket:" + raw bucket path). */
  def idempotencyKeys(s: SparkSession, d: String): DataFrame =
    withDateRange(withSlug(documents(s, d)))
      .withColumn("bucket_path",
        concat(lit("raw/"), date_format(col("start_date"), "yyyy-MM-dd"),
          lit("__"), col("slug"), lit("__raw.json")))
      .select(col("doc_id"), col("bucket_path"),
        sha2(concat(lit("dump_post_to_bucket:"), col("bucket_path")), 256).as("idem_key"))

  /** Paginated ingestion (get_invictus_post's posts_per_page/page,
    * handler.py:108-113): a deterministic page slice over the ordered
    * corpus, as the classic ORDER BY + OFFSET/LIMIT page. Kept as the
    * oracle-parity twin of `paginateKeyset` — OFFSET forces a global
    * ordering of everything before the page, the wrong shape at scale. */
  def paginate(s: SparkSession, d: String): DataFrame =
    documents(s, d)
      .select(col("doc_id"), col("source"), col("lang"))
      .orderBy("doc_id")
      .offset(100)
      .limit(50)

  /** The same page as a KEYSET cursor — the declared form at scale:
    * `doc_id > last_seen ORDER BY doc_id LIMIT n`. The cursor predicate
    * pushes down to the parquet scan (PushedFilters) and the limit runs
    * as TakeOrderedAndProject — per-partition top-n then a k-row merge,
    * never a global sort, never a scan of the skipped prefix. The
    * cursor (99) is the previous page's last doc_id: doc_ids are the
    * dense 0..N-1 ingest sequence, so the keyset page IS the OFFSET-100
    * page — same rows, same oracle result shape, different plan. */
  def paginateKeyset(s: SparkSession, d: String): DataFrame =
    documents(s, d)
      .select(col("doc_id"), col("source"), col("lang"))
      .filter(col("doc_id") > 99)
      .orderBy("doc_id")
      .limit(50)

  /** save_sessions_to_bucket path derivation (handler.py:225-229):
    * weekly partition path from min/max record date per document. */
  def weeklyRollup(s: SparkSession, d: String): DataFrame =
    dateRecords(s, d)
      .groupBy("doc_id")
      .agg(min("record_date").as("week_start"), max("record_date").as("week_end"),
           count(lit(1)).as("n_sessions"))
      .select(col("doc_id"), col("week_start"), col("week_end"), col("n_sessions"),
        concat(lit("weekly/"), date_format(col("week_start"), "yyyy-MM-dd"),
          lit("__"), date_format(col("week_end"), "yyyy-MM-dd"),
          lit("--5-day-weightlifting-program.json")).as("bucket_path"))

  /** Full chain 3→7 as one declarative plan: sessionize → segment →
    * pivot/clean → dated records. The flagship `entry`. */
  def pipelineE2E(s: SparkSession, d: String): DataFrame = {
    val anchored = withDateRange(withSlug(documents(s, d)))
      .withColumn("week_anchor",
        date_add(col("start_date"), -(weekday(col("start_date")) + 1)))
      .select("doc_id", "week_anchor")
    cleanRecords(s, d)
      .join(anchored, "doc_id")
      .select(col("doc_id"),
        date_format(date_add(col("week_anchor"), col("session_id").cast("int")), "yyyy-MM-dd").as("date"),
        col("session"), col("warm_up"), col("segment_a"), col("segment_b"))
  }

  // ---- oracle -------------------------------------------------------

  private val tokensCte =
    """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS ts FROM documents),
      |tokens AS (SELECT doc_id, unnest(range(1, len(ts)+1)) AS pos, unnest(ts) AS tok FROM toks),
      |marked AS (SELECT doc_id, pos, tok,
      |  CAST(sum(CASE WHEN tok IN ('stream','window') THEN 1 ELSE 0 END)
      |    OVER (PARTITION BY doc_id ORDER BY pos ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id,
      |  sum(CASE WHEN tok IN ('stream','window') THEN 1 ELSE 0 END)
      |    OVER (PARTITION BY doc_id) AS n_markers
      |  FROM tokens),
      |insess AS (SELECT doc_id, pos, tok, session_id FROM marked
      |  WHERE session_id >= 1 AND n_markers >= 2),
      |seg AS (SELECT doc_id, pos, tok, session_id,
      |  CAST(sum(CASE WHEN tok IN ('agg','sort','merge') THEN 1 ELSE 0 END)
      |    OVER (PARTITION BY doc_id, session_id ORDER BY pos ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS seg_id,
      |  sum(CASE WHEN tok IN ('agg','sort','merge') THEN 1 ELSE 0 END)
      |    OVER (PARTITION BY doc_id, session_id) AS n_seg_markers
      |  FROM insess),
      |segstart AS (SELECT doc_id, pos, tok, session_id, seg_id,
      |    min(pos) OVER (PARTITION BY doc_id, session_id, seg_id) AS seg_start
      |  FROM seg WHERE seg_id >= 1 AND n_seg_markers >= 2),
      |segments AS (SELECT doc_id, session_id, seg_id,
      |  arg_min(tok, pos) AS segment_key,
      |  coalesce(string_agg(tok, ' ' ORDER BY pos) FILTER (WHERE pos > seg_start), '') AS segment_value
      |  FROM segstart GROUP BY doc_id, session_id, seg_id)""".stripMargin

  private val slugCte =
    """slugged AS (SELECT doc_id,
      |  concat_ws('-', (['january','february','march','april','may','june','july','august','september','october','november','december'])[CAST(doc_id % 12 + 1 AS INT)],
      |    doc_id % 20 + 1, doc_id % 20 + 7, doc_id % 5 + 2020, '5-day-weightlifting-program') AS slug
      |  FROM documents),
      |dated AS (SELECT doc_id, slug,
      |  make_date(CAST(regexp_extract(slug, '([a-z]+)-(\d+)-(\d+)-(\d{4})', 4) AS INT),
      |    CASE regexp_extract(slug, '([a-z]+)-(\d+)-(\d+)-(\d{4})', 1)
      |      WHEN 'january' THEN 1 WHEN 'february' THEN 2 WHEN 'march' THEN 3
      |      WHEN 'april' THEN 4 WHEN 'may' THEN 5 WHEN 'june' THEN 6
      |      WHEN 'july' THEN 7 WHEN 'august' THEN 8 WHEN 'september' THEN 9
      |      WHEN 'october' THEN 10 WHEN 'november' THEN 11 WHEN 'december' THEN 12 END,
      |    CAST(regexp_extract(slug, '([a-z]+)-(\d+)-(\d+)-(\d{4})', 2) AS INT)) AS start_date,
      |  make_date(CAST(regexp_extract(slug, '([a-z]+)-(\d+)-(\d+)-(\d{4})', 4) AS INT),
      |    CASE regexp_extract(slug, '([a-z]+)-(\d+)-(\d+)-(\d{4})', 1)
      |      WHEN 'january' THEN 1 WHEN 'february' THEN 2 WHEN 'march' THEN 3
      |      WHEN 'april' THEN 4 WHEN 'may' THEN 5 WHEN 'june' THEN 6
      |      WHEN 'july' THEN 7 WHEN 'august' THEN 8 WHEN 'september' THEN 9
      |      WHEN 'october' THEN 10 WHEN 'november' THEN 11 WHEN 'december' THEN 12 END,
      |    CAST(regexp_extract(slug, '([a-z]+)-(\d+)-(\d+)-(\d{4})', 3) AS INT)) AS end_date
      |  FROM slugged)""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "etl_strip_html" -> (stripHtml _),
    "etl_date_extract" -> (dateExtract _),
    "etl_title_date_extract" -> (titleDateExtract _),
    "etl_sessionize_text" -> (sessionizeText _),
    "etl_segments" -> (segments _),
    "etl_date_records" -> (dateRecords _),
    "etl_clean_records" -> (cleanRecords _),
    "etl_idempotency_keys" -> (idempotencyKeys _),
    "etl_weekly_rollup" -> (weeklyRollup _),
    "etl_paginate" -> (paginate _),
    "etl_paginate_keyset" -> (paginateKeyset _),
    "etl_pipeline_e2e" -> (pipelineE2E _)
  )

  val oracle: Map[String, String] = Map(
    "etl_strip_html" ->
      """SELECT doc_id,
        |  trim(regexp_replace(regexp_replace(regexp_replace(
        |    concat('<p><strong>', text, '</strong><br /> &#8211; fin</p>'),
        |    '<[^>]*>', ' ', 'g'), '&#8211;|&ndash;', '-', 'g'), '\s+', ' ', 'g')) AS clean_text,
        |  length(trim(regexp_replace(regexp_replace(regexp_replace(
        |    concat('<p><strong>', text, '</strong><br /> &#8211; fin</p>'),
        |    '<[^>]*>', ' ', 'g'), '&#8211;|&ndash;', '-', 'g'), '\s+', ' ', 'g'))) AS n_chars_clean
        |FROM documents""".stripMargin,
    "etl_date_extract" ->
      s"""WITH $slugCte
         |SELECT doc_id, slug, start_date, end_date FROM dated""".stripMargin,
    "etl_title_date_extract" ->
      """WITH months AS (SELECT ['january','february','march','april','may','june','july','august','september','october','november','december'] AS mn),
        |titled AS (SELECT doc_id,
        |  concat(upper(substr(mn[CAST(doc_id % 12 + 1 AS INT)], 1, 1)),
        |         substr(mn[CAST(doc_id % 12 + 1 AS INT)], 2),
        |         ' ', doc_id % 20 + 1, '-', doc_id % 20 + 7, ', ', doc_id % 5 + 2020,
        |         ' &#8211; 5 Day Weightlifting Program') AS title
        |  FROM documents, months),
        |cleaned AS (SELECT doc_id, title,
        |  regexp_replace(title, '&#8211;|&ndash;', '-', 'g') AS ct FROM titled),
        |parsed AS (SELECT doc_id, title,
        |  lower(regexp_extract(ct, '([a-zA-Z]+)\s+(\d+)-(\d+)[,\s]+(\d{4})', 1)) AS m,
        |  CAST(regexp_extract(ct, '([a-zA-Z]+)\s+(\d+)-(\d+)[,\s]+(\d{4})', 2) AS INT) AS d1,
        |  CAST(regexp_extract(ct, '([a-zA-Z]+)\s+(\d+)-(\d+)[,\s]+(\d{4})', 3) AS INT) AS d2,
        |  CAST(regexp_extract(ct, '([a-zA-Z]+)\s+(\d+)-(\d+)[,\s]+(\d{4})', 4) AS INT) AS y
        |  FROM cleaned)
        |SELECT doc_id, title,
        |  make_date(y, CASE m WHEN 'january' THEN 1 WHEN 'february' THEN 2
        |    WHEN 'march' THEN 3 WHEN 'april' THEN 4 WHEN 'may' THEN 5
        |    WHEN 'june' THEN 6 WHEN 'july' THEN 7 WHEN 'august' THEN 8
        |    WHEN 'september' THEN 9 WHEN 'october' THEN 10
        |    WHEN 'november' THEN 11 WHEN 'december' THEN 12 END, d1) AS start_date,
        |  make_date(y, CASE m WHEN 'january' THEN 1 WHEN 'february' THEN 2
        |    WHEN 'march' THEN 3 WHEN 'april' THEN 4 WHEN 'may' THEN 5
        |    WHEN 'june' THEN 6 WHEN 'july' THEN 7 WHEN 'august' THEN 8
        |    WHEN 'september' THEN 9 WHEN 'october' THEN 10
        |    WHEN 'november' THEN 11 WHEN 'december' THEN 12 END, d2) AS end_date
        |FROM parsed""".stripMargin,
    "etl_sessionize_text" ->
      s"""$tokensCte
         |SELECT doc_id, session_id, count(*) AS n_tokens,
         |  string_agg(tok, ' ' ORDER BY pos) AS session_text
         |FROM insess GROUP BY doc_id, session_id""".stripMargin,
    "etl_segments" ->
      s"""$tokensCte
         |SELECT doc_id, session_id, seg_id, segment_key, segment_value FROM segments""".stripMargin,
    "etl_date_records" ->
      s"""$tokensCte,
         |$slugCte,
         |anchored AS (SELECT doc_id,
         |  start_date - CAST(isodow(start_date) AS INT) AS week_anchor FROM dated),
         |sess AS (SELECT DISTINCT doc_id, session_id FROM insess)
         |SELECT sess.doc_id AS doc_id, session_id,
         |  week_anchor + CAST(session_id AS INT) AS record_date
         |FROM sess JOIN anchored ON sess.doc_id = anchored.doc_id""".stripMargin,
    "etl_clean_records" ->
      s"""$tokensCte,
         |ranked AS (SELECT doc_id, session_id, seg_id, segment_key, segment_value,
         |  row_number() OVER (PARTITION BY doc_id, session_id, segment_key ORDER BY seg_id DESC) AS rn
         |  FROM segments),
         |pivoted AS (SELECT doc_id, session_id,
         |  coalesce(max(CASE WHEN segment_key = 'agg' THEN segment_value END), '') AS warm_up,
         |  coalesce(max(CASE WHEN segment_key = 'sort' THEN segment_value END), '') AS segment_a,
         |  coalesce(max(CASE WHEN segment_key = 'merge' THEN segment_value END), '') AS segment_b
         |  FROM ranked WHERE rn = 1 GROUP BY doc_id, session_id),
         |names AS (SELECT doc_id, session_id, arg_min(tok, pos) AS session
         |  FROM insess GROUP BY doc_id, session_id)
         |SELECT names.doc_id AS doc_id, names.session_id AS session_id,
         |  coalesce(session, 'Rest Day') AS session,
         |  coalesce(warm_up, '') AS warm_up,
         |  coalesce(segment_a, '') AS segment_a,
         |  coalesce(segment_b, '') AS segment_b
         |FROM names LEFT JOIN pivoted
         |  ON names.doc_id = pivoted.doc_id AND names.session_id = pivoted.session_id""".stripMargin,
    "etl_paginate" ->
      """SELECT doc_id, source, lang FROM documents
        |ORDER BY doc_id LIMIT 50 OFFSET 100""".stripMargin,
    "etl_paginate_keyset" ->
      """SELECT doc_id, source, lang FROM documents
        |WHERE doc_id > 99 ORDER BY doc_id LIMIT 50""".stripMargin,
    "etl_idempotency_keys" ->
      s"""WITH $slugCte,
         |paths AS (SELECT doc_id,
         |  concat('raw/', strftime(start_date, '%Y-%m-%d'), '__', slug, '__raw.json') AS bucket_path
         |  FROM dated)
         |SELECT doc_id, bucket_path,
         |  sha256(concat('dump_post_to_bucket:', bucket_path)) AS idem_key
         |FROM paths""".stripMargin,
    "etl_weekly_rollup" ->
      s"""$tokensCte,
         |$slugCte,
         |anchored AS (SELECT doc_id,
         |  start_date - CAST(isodow(start_date) AS INT) AS week_anchor FROM dated),
         |sess AS (SELECT DISTINCT doc_id, session_id FROM insess),
         |recs AS (SELECT sess.doc_id AS doc_id, session_id,
         |  week_anchor + CAST(session_id AS INT) AS record_date
         |  FROM sess JOIN anchored ON sess.doc_id = anchored.doc_id)
         |SELECT doc_id, min(record_date) AS week_start, max(record_date) AS week_end,
         |  count(*) AS n_sessions,
         |  concat('weekly/', strftime(min(record_date), '%Y-%m-%d'), '__',
         |    strftime(max(record_date), '%Y-%m-%d'),
         |    '--5-day-weightlifting-program.json') AS bucket_path
         |FROM recs GROUP BY doc_id""".stripMargin,
    "etl_pipeline_e2e" ->
      s"""$tokensCte,
         |ranked AS (SELECT doc_id, session_id, seg_id, segment_key, segment_value,
         |  row_number() OVER (PARTITION BY doc_id, session_id, segment_key ORDER BY seg_id DESC) AS rn
         |  FROM segments),
         |pivoted AS (SELECT doc_id, session_id,
         |  coalesce(max(CASE WHEN segment_key = 'agg' THEN segment_value END), '') AS warm_up,
         |  coalesce(max(CASE WHEN segment_key = 'sort' THEN segment_value END), '') AS segment_a,
         |  coalesce(max(CASE WHEN segment_key = 'merge' THEN segment_value END), '') AS segment_b
         |  FROM ranked WHERE rn = 1 GROUP BY doc_id, session_id),
         |names AS (SELECT doc_id, session_id, arg_min(tok, pos) AS session
         |  FROM insess GROUP BY doc_id, session_id),
         |cleaned AS (SELECT names.doc_id AS doc_id, names.session_id AS session_id,
         |  coalesce(session, 'Rest Day') AS session,
         |  coalesce(warm_up, '') AS warm_up,
         |  coalesce(segment_a, '') AS segment_a,
         |  coalesce(segment_b, '') AS segment_b
         |  FROM names LEFT JOIN pivoted
         |    ON names.doc_id = pivoted.doc_id AND names.session_id = pivoted.session_id),
         |$slugCte,
         |anchored AS (SELECT doc_id,
         |  start_date - CAST(isodow(start_date) AS INT) AS week_anchor FROM dated)
         |SELECT cleaned.doc_id AS doc_id,
         |  strftime(week_anchor + CAST(session_id AS INT), '%Y-%m-%d') AS date,
         |  session, warm_up, segment_a, segment_b
         |FROM cleaned JOIN anchored ON cleaned.doc_id = anchored.doc_id""".stripMargin
  )
}
