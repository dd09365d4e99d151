package graft.operators

import graft.Tables._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deduplication family for a training-data pipeline: exact, MinHash+LSH,
  * SimHash, and bounded-bucket n-gram Jaccard.
  *
  * Scale posture (the whole point of these shapes at 100 TB):
  *  - exact: one shuffle on a uniform 256-bit hash — no skew by design.
  *  - MinHash+LSH: candidate pairs come from an EQUI-join on
  *    (band_id, band_hash) buckets, never a cross join; the verification
  *    Jaccard runs only on candidates. Cost is O(n·bands + candidates),
  *    not O(n²).
  *  - SimHash: map-side signature, then a groupBy on the 16-bit key.
  *  - n-gram Jaccard: pairs are generated only inside small blocking
  *    buckets (lang), the classic blocking pattern; at real scale the
  *    bucket key would be (lang, length-band) + LSH.
  *
  * The hash family is md5 (codegen'd builtin, identical hex in every
  * engine) so every step is oracle-checkable.
  */
object DedupOps {

  private val H = 8 // minhash functions
  private val BANDS = 4 // 4 bands × 2 rows

  private def toks: Column = split(col("text"), " ")

  private def shingleArr: Column =
    when(size(toks) < 3, array().cast("array<string>"))
      .otherwise(transform(sequence(lit(1), size(toks) - 2),
        i => concat_ws(" ", element_at(toks, i), element_at(toks, i + 1),
          element_at(toks, i + 2))))

  /** Distinct (doc_id, 3-token shingle) pairs. */
  private def shingles(s: SparkSession, d: String): DataFrame =
    documents(s, d)
      .select(col("doc_id"), explode(shingleArr).as("shingle"))
      .distinct()

  /** Exact dedup: content-hash groupBy; keeper = min doc_id
    * (first-writer-wins, the reference's idempotent-write semantics). */
  def dedupExact(s: SparkSession, d: String): DataFrame =
    documents(s, d)
      .groupBy(sha2(col("text"), 256).as("content_hash"))
      .agg(count(lit(1)).as("n_copies"), min("doc_id").as("keeper_id"))

  /** MinHash signatures: h_i = min over shingles of md5(i ++ ":" ++ s).
    * Lexicographic min over hex == uniform min-hash, and is portable. */
  private def signatures(s: SparkSession, d: String): DataFrame =
    shingles(s, d)
      .groupBy("doc_id")
      .agg(
        min(md5(concat(lit("0:"), col("shingle")))).as("h0"),
        (1 until H).map(i =>
          min(md5(concat(lit(s"$i:"), col("shingle")))).as(s"h$i")): _*)

  /** LSH band keys: md5 of each 2-row slice of the signature. */
  private def bands(s: SparkSession, d: String): DataFrame = {
    val bandStructs = (0 until BANDS).map(b =>
      struct(lit(b).as("band_id"),
        md5(concat(col(s"h${2 * b}"), col(s"h${2 * b + 1}"))).as("band_hash")))
    signatures(s, d)
      .select(col("doc_id"), explode(array(bandStructs: _*)).as("bk"))
      .select(col("doc_id"), col("bk.band_id"), col("bk.band_hash"))
  }

  /** Full MinHash-LSH near-dup detection: band-bucket candidate join →
    * exact Jaccard verification → threshold. */
  def dedupMinhashLsh(s: SparkSession, d: String): DataFrame = {
    val b = bands(s, d)
    val ba = b.select(col("band_id"), col("band_hash"), col("doc_id").as("doc_a"))
    val bb = b.select(col("band_id").as("band_id_b"), col("band_hash").as("band_hash_b"),
      col("doc_id").as("doc_b"))
    val cand = ba.join(bb,
        ba("band_id") === bb("band_id_b") && ba("band_hash") === bb("band_hash_b") &&
        ba("doc_a") < bb("doc_b"))
      .select("doc_a", "doc_b").distinct()
    val sh = shingles(s, d)
    val cnt = sh.groupBy("doc_id").agg(count(lit(1)).as("n_sh"))
    val shA = sh.select(col("doc_id").as("doc_a"), col("shingle"))
    val shB = sh.select(col("doc_id").as("doc_b2"), col("shingle").as("shingle_b"))
    val inter = cand
      .join(shA, "doc_a")
      .join(shB, col("doc_b") === col("doc_b2") && col("shingle") === col("shingle_b"))
      .groupBy("doc_a", "doc_b")
      .agg(count(lit(1)).as("n_inter"))
    inter
      .join(cnt.select(col("doc_id").as("doc_a"), col("n_sh").as("n_a")), "doc_a")
      .join(cnt.select(col("doc_id").as("doc_b"), col("n_sh").as("n_b")), "doc_b")
      .withColumn("jaccard", round(col("n_inter").cast("double") /
        (col("n_a") + col("n_b") - col("n_inter")), 4))
      .filter(col("jaccard") >= 0.6)
      .select("doc_a", "doc_b", "jaccard")
  }

  /** 16-bit SimHash from md5-nibble hyperplanes: bit j of a doc is the
    * sign of Σ_tokens (2·(nibble_j(md5(tok)) mod 2) − 1). */
  def dedupSimhash(s: SparkSession, d: String): DataFrame = {
    val tok = documents(s, d)
      .select(col("doc_id"), explode(toks).as("tok"))
    val bitSums = (1 to 16).map { j =>
      sum(expr(s"2 * ((instr('0123456789abcdef', substring(md5(tok), $j, 1)) - 1) % 2) - 1"))
        .as(s"s$j")
    }
    tok.groupBy("doc_id")
      .agg(bitSums.head, bitSums.tail: _*)
      .select(col("doc_id"),
        concat((1 to 16).map(j =>
          when(col(s"s$j") >= 0, lit("1")).otherwise(lit("0"))): _*).as("simhash"))
  }

  /** Blocked n-gram Jaccard: pairwise only inside (lang) buckets. */
  def dedupNgramJaccard(s: SparkSession, d: String): DataFrame = {
    val meta = documents(s, d).select(col("doc_id"), col("lang"))
    val sh = shingles(s, d).join(meta, "doc_id")
    val cnt = sh.groupBy("doc_id").agg(count(lit(1)).as("n_sh"))
    val a = sh.select(col("lang"), col("doc_id").as("doc_a"), col("shingle"))
    val b = sh.select(col("lang").as("lang_b"), col("doc_id").as("doc_b"),
      col("shingle").as("shingle_b"))
    val inter = a.join(b,
        a("lang") === b("lang_b") && a("shingle") === b("shingle_b") &&
        a("doc_a") < b("doc_b"))
      .groupBy("doc_a", "doc_b")
      .agg(count(lit(1)).as("n_inter"))
    inter
      .join(cnt.select(col("doc_id").as("doc_a"), col("n_sh").as("n_a")), "doc_a")
      .join(cnt.select(col("doc_id").as("doc_b"), col("n_sh").as("n_b")), "doc_b")
      .withColumn("jaccard", round(col("n_inter").cast("double") /
        (col("n_a") + col("n_b") - col("n_inter")), 4))
      .filter(col("jaccard") >= 0.5)
      .select("doc_a", "doc_b", "jaccard")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "dedup_exact" -> (dedupExact _),
    "dedup_minhash_lsh" -> (dedupMinhashLsh _),
    "dedup_simhash" -> (dedupSimhash _),
    "dedup_ngram_jaccard" -> (dedupNgramJaccard _)
  )

  private val shinglesCte =
    """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS ts FROM documents),
      |sh0 AS (SELECT doc_id, unnest(list_transform(range(1, greatest(len(ts)-1, 1)),
      |  i -> ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2])) AS shingle FROM toks),
      |sh AS (SELECT DISTINCT doc_id, shingle FROM sh0)""".stripMargin

  val oracle: Map[String, String] = Map(
    "dedup_exact" ->
      """SELECT sha256(text) AS content_hash, count(*) AS n_copies,
        |  min(doc_id) AS keeper_id
        |FROM documents GROUP BY sha256(text)""".stripMargin,
    "dedup_minhash_lsh" ->
      s"""$shinglesCte,
         |sig AS (SELECT doc_id,
         |  min(md5('0:' || shingle)) AS h0, min(md5('1:' || shingle)) AS h1,
         |  min(md5('2:' || shingle)) AS h2, min(md5('3:' || shingle)) AS h3,
         |  min(md5('4:' || shingle)) AS h4, min(md5('5:' || shingle)) AS h5,
         |  min(md5('6:' || shingle)) AS h6, min(md5('7:' || shingle)) AS h7
         |  FROM sh GROUP BY doc_id),
         |bands AS (
         |  SELECT doc_id, 0 AS band_id, md5(h0 || h1) AS band_hash FROM sig UNION ALL
         |  SELECT doc_id, 1 AS band_id, md5(h2 || h3) AS band_hash FROM sig UNION ALL
         |  SELECT doc_id, 2 AS band_id, md5(h4 || h5) AS band_hash FROM sig UNION ALL
         |  SELECT doc_id, 3 AS band_id, md5(h6 || h7) AS band_hash FROM sig),
         |cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
         |  FROM bands a JOIN bands b
         |    ON a.band_id = b.band_id AND a.band_hash = b.band_hash
         |   AND a.doc_id < b.doc_id),
         |cnt AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
         |inter AS (SELECT doc_a, doc_b, count(*) AS n_inter
         |  FROM cand JOIN sh sa ON sa.doc_id = doc_a
         |            JOIN sh sb ON sb.doc_id = doc_b AND sa.shingle = sb.shingle
         |  GROUP BY doc_a, doc_b)
         |SELECT doc_a, doc_b,
         |  round(CAST(n_inter AS DOUBLE) / (ca.n_sh + cb.n_sh - n_inter), 4) AS jaccard
         |FROM inter JOIN cnt ca ON ca.doc_id = doc_a JOIN cnt cb ON cb.doc_id = doc_b
         |WHERE round(CAST(n_inter AS DOUBLE) / (ca.n_sh + cb.n_sh - n_inter), 4) >= 0.6""".stripMargin,
    "dedup_simhash" ->
      """WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents),
        |sums AS (SELECT doc_id,
        |  sum(2 * ((strpos('0123456789abcdef', substr(md5(tok), 1, 1)) - 1) % 2) - 1) AS s1,
        |  sum(2 * ((strpos('0123456789abcdef', substr(md5(tok), 2, 1)) - 1) % 2) - 1) AS s2,
        |  sum(2 * ((strpos('0123456789abcdef', substr(md5(tok), 3, 1)) - 1) % 2) - 1) AS s3,
        |  sum(2 * ((strpos('0123456789abcdef', substr(md5(tok), 4, 1)) - 1) % 2) - 1) AS s4,
        |  sum(2 * ((strpos('0123456789abcdef', substr(md5(tok), 5, 1)) - 1) % 2) - 1) AS s5,
        |  sum(2 * ((strpos('0123456789abcdef', substr(md5(tok), 6, 1)) - 1) % 2) - 1) AS s6,
        |  sum(2 * ((strpos('0123456789abcdef', substr(md5(tok), 7, 1)) - 1) % 2) - 1) AS s7,
        |  sum(2 * ((strpos('0123456789abcdef', substr(md5(tok), 8, 1)) - 1) % 2) - 1) AS s8,
        |  sum(2 * ((strpos('0123456789abcdef', substr(md5(tok), 9, 1)) - 1) % 2) - 1) AS s9,
        |  sum(2 * ((strpos('0123456789abcdef', substr(md5(tok), 10, 1)) - 1) % 2) - 1) AS s10,
        |  sum(2 * ((strpos('0123456789abcdef', substr(md5(tok), 11, 1)) - 1) % 2) - 1) AS s11,
        |  sum(2 * ((strpos('0123456789abcdef', substr(md5(tok), 12, 1)) - 1) % 2) - 1) AS s12,
        |  sum(2 * ((strpos('0123456789abcdef', substr(md5(tok), 13, 1)) - 1) % 2) - 1) AS s13,
        |  sum(2 * ((strpos('0123456789abcdef', substr(md5(tok), 14, 1)) - 1) % 2) - 1) AS s14,
        |  sum(2 * ((strpos('0123456789abcdef', substr(md5(tok), 15, 1)) - 1) % 2) - 1) AS s15,
        |  sum(2 * ((strpos('0123456789abcdef', substr(md5(tok), 16, 1)) - 1) % 2) - 1) AS s16
        |  FROM tok GROUP BY doc_id)
        |SELECT doc_id,
        |  concat(
        |    CASE WHEN s1 >= 0 THEN '1' ELSE '0' END, CASE WHEN s2 >= 0 THEN '1' ELSE '0' END,
        |    CASE WHEN s3 >= 0 THEN '1' ELSE '0' END, CASE WHEN s4 >= 0 THEN '1' ELSE '0' END,
        |    CASE WHEN s5 >= 0 THEN '1' ELSE '0' END, CASE WHEN s6 >= 0 THEN '1' ELSE '0' END,
        |    CASE WHEN s7 >= 0 THEN '1' ELSE '0' END, CASE WHEN s8 >= 0 THEN '1' ELSE '0' END,
        |    CASE WHEN s9 >= 0 THEN '1' ELSE '0' END, CASE WHEN s10 >= 0 THEN '1' ELSE '0' END,
        |    CASE WHEN s11 >= 0 THEN '1' ELSE '0' END, CASE WHEN s12 >= 0 THEN '1' ELSE '0' END,
        |    CASE WHEN s13 >= 0 THEN '1' ELSE '0' END, CASE WHEN s14 >= 0 THEN '1' ELSE '0' END,
        |    CASE WHEN s15 >= 0 THEN '1' ELSE '0' END, CASE WHEN s16 >= 0 THEN '1' ELSE '0' END
        |  ) AS simhash
        |FROM sums""".stripMargin,
    "dedup_ngram_jaccard" ->
      s"""$shinglesCte,
         |shl AS (SELECT sh.doc_id AS doc_id, lang, shingle
         |  FROM sh JOIN documents USING (doc_id)),
         |cnt AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
         |inter AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_inter
         |  FROM shl a JOIN shl b
         |    ON a.lang = b.lang AND a.shingle = b.shingle AND a.doc_id < b.doc_id
         |  GROUP BY a.doc_id, b.doc_id)
         |SELECT doc_a, doc_b,
         |  round(CAST(n_inter AS DOUBLE) / (ca.n_sh + cb.n_sh - n_inter), 4) AS jaccard
         |FROM inter JOIN cnt ca ON ca.doc_id = doc_a JOIN cnt cb ON cb.doc_id = doc_b
         |WHERE round(CAST(n_inter AS DOUBLE) / (ca.n_sh + cb.n_sh - n_inter), 4) >= 0.5""".stripMargin
  )
}
