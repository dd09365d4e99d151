package graft.operators

import graft.Tables._
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: media payloads are opaque `binary`
  * columns with typed metadata travelling alongside. The decode step is
  * STUBBED (no image/audio libs in this container) behind
  * [[FakeDecoder]] — a deterministic stand-in with the same shape a real
  * decoder would have — while the Spark-side plumbing (schema, per-
  * partition batching, feature schema) is real and tested.
  *
  * At 100 TB: payload bytes never shuffle — metadata extraction and
  * feature extraction are map-side; only the (small) feature vectors
  * ever move. Partitioning stays whatever the scan gave us.
  */
object MultimodalOps {

  /** Deterministic stand-in for an image/audio decoder: 16-bin byte
    * histogram normalized to [0,1] — the shape (bytes → fixed-size
    * float feature vector + dims) of a real decode+featurize. */
  object FakeDecoder {
    val FeatureDim = 16
    def decode(payload: Array[Byte]): (Int, Int, Array[Float]) = {
      val hist = new Array[Int](FeatureDim)
      payload.foreach(b => hist((b & 0xff) % FeatureDim) += 1)
      val n = math.max(payload.length, 1)
      val feats = hist.map(c => c.toFloat / n)
      // fake "decoded dimensions" derived from content, deterministically
      val w = 16 + (payload.length % 64)
      val h = 16 + ((payload.length / 64) % 64)
      (w, h, feats)
    }
  }

  /** Opaque binary payload + typed metadata, fully oracle-checkable:
    * byte length, content md5, and a media-kind tag. */
  def mmBinaryStats(s: SparkSession, d: String): DataFrame =
    documents(s, d)
      .select(col("doc_id"), col("text").cast("binary").as("payload"))
      .select(
        col("doc_id"),
        length(col("payload")).cast("long").as("byte_len"),
        md5(col("payload")).as("content_md5"),
        when(length(col("payload")) % 3 === 0, "image")
          .when(length(col("payload")) % 3 === 1, "audio")
          .otherwise("video").as("media_kind"))

  private val featureSchema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("byte_len", IntegerType),
    StructField("features", ArrayType(FloatType))))

  /** Per-partition decode → feature extraction over the binary column.
    * `mapPartitions` keeps the (stubbed) decoder's init cost per
    * partition, the way a real codec/model handle would be reused.
    * Output exposes the first two histogram bins as exact integer
    * counts (float ratio × length rounds back exactly for any document
    * size < 2^23), which is what makes the decode oracle-checkable. */
  def mmDecodeFeatures(s: SparkSession, d: String): DataFrame = {
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(featureSchema)
    documents(s, d)
      .select(col("doc_id"), col("text").cast("binary").as("payload"))
      .mapPartitions { it =>
        it.map { r =>
          val payload = r.getAs[Array[Byte]]("payload")
          val (w, h, f) = FakeDecoder.decode(payload)
          Row(r.getAs[Long]("doc_id"), w, h, payload.length, f.toSeq)
        }
      }(enc)
      .select(col("doc_id"), col("width"), col("height"),
        round(element_at(col("features"), 1) * col("byte_len")).cast("long").as("bin0_count"),
        round(element_at(col("features"), 2) * col("byte_len")).cast("long").as("bin1_count"))
  }

  /** Frame sampling over an opaque media payload: the binary column is
    * treated as a sequence of fixed 32-byte frames; every 4th frame is
    * extracted by byte-offset substring and fingerprinted. This is the
    * video-style access pattern (seek + slice, no full decode) — all
    * map-side, payload bytes never shuffle; only (doc_id, frame_id,
    * md5) rows move. */
  def mmFrameSample(s: SparkSession, d: String): DataFrame = {
    val frameLen = 32
    val stride = 4
    documents(s, d)
      .select(col("doc_id"), col("text").cast("binary").as("payload"))
      .withColumn("n_frames", (length(col("payload")) / frameLen).cast("int"))
      .filter(col("n_frames") >= 1)
      .select(col("doc_id"), col("payload"),
        explode(sequence(lit(0), col("n_frames") - 1, lit(stride))).as("frame_id"))
      .select(col("doc_id"), col("frame_id"),
        md5(expr(s"substring(payload, frame_id * $frameLen + 1, $frameLen)"))
          .as("frame_md5"))
  }

  /** Resize in feature space: the decoder's 16-bin histogram
    * downsampled to 8 bins by summing adjacent pairs — the
    * shape of an image/audio resize running AFTER decode, map-side over
    * the same per-partition batches. Counts recovered from the resized
    * floats are exact (pair-sum float error ≪ 0.5 at any document
    * size here), so the whole decode→resize chain is oracle-checkable;
    * total_check = byte_len proves no mass is lost by resizing. */
  def mmResizeFeatures(s: SparkSession, d: String): DataFrame = {
    val outDim = FakeDecoder.FeatureDim / 2
    val resizedSchema = StructType(Seq(
      StructField("doc_id", LongType),
      StructField("byte_len", IntegerType),
      StructField("resized", ArrayType(FloatType))))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(resizedSchema)
    documents(s, d)
      .select(col("doc_id"), col("text").cast("binary").as("payload"))
      .mapPartitions { it =>
        it.map { r =>
          val payload = r.getAs[Array[Byte]]("payload")
          val (_, _, f) = FakeDecoder.decode(payload)
          val res = Array.tabulate(outDim)(i => f(2 * i) + f(2 * i + 1))
          Row(r.getAs[Long]("doc_id"), payload.length, res.toSeq)
        }
      }(enc)
      .select(col("doc_id"),
        round(element_at(col("resized"), 1) * col("byte_len")).cast("long").as("rbin0_count"),
        round(element_at(col("resized"), 2) * col("byte_len")).cast("long").as("rbin1_count"),
        (0 until outDim).map(i =>
          round(element_at(col("resized"), i + 1) * col("byte_len")).cast("long"))
          .reduce(_ + _).as("total_check"))
  }

  /** Perceptual-hash near-dup buckets over the decoded features — image
    * dedup, the multimodal twin of the text dedup family. The hash is
    * the feature histogram's above-uniform sign pattern (bit i set ⇔
    * bin i holds more than 1/16 of the mass), computed from EXACT
    * integer counts recovered from the decode (float ratio × length is
    * exact below 2^23 bytes), so both engines agree bit-for-bit.
    * Same shape as dedup_exact downstream: hash groupBy → keeper
    * election; payload bytes never shuffle — only (doc_id, phash). A
    * production pipeline verifies candidates inside each bucket
    * (feature L1 distance), exactly like the LSH families verify
    * theirs.
    *
    * Contract with the oracle, made explicit by the `length > 0` guard
    * on BOTH sides: (a) the corpus is ASCII (the Spark side buckets
    * UTF-8 BYTES, the oracle per-CHARACTER ascii() — they agree only
    * when bytes == chars, true for the synthetic corpus and for real
    * image/audio payloads, which are bytes on both sides by nature);
    * (b) empty payloads are excluded — unguarded, Spark would emit
    * phash=0 for an empty doc while the oracle's unnest(range(1,1))
    * drops it, diverging bucket 0's count. */
  def mmDedupPhash(s: SparkSession, d: String): DataFrame = {
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(featureSchema)
    val decoded = documents(s, d)
      .filter(length(col("text")) > 0)
      .select(col("doc_id"), col("text").cast("binary").as("payload"))
      .mapPartitions { it =>
        it.map { r =>
          val payload = r.getAs[Array[Byte]]("payload")
          val (w, h, f) = FakeDecoder.decode(payload)
          Row(r.getAs[Long]("doc_id"), w, h, payload.length, f.toSeq)
        }
      }(enc)
    val phash = (0 until FakeDecoder.FeatureDim).map { i =>
      when(round(element_at(col("features"), i + 1) * col("byte_len"))
        .cast("long") * 16 > col("byte_len"), lit(1L << i)).otherwise(lit(0L))
    }.reduce(_ + _)
    decoded
      .select(col("doc_id"), phash.as("phash"))
      .groupBy("phash")
      .agg(count(lit(1)).as("n_docs"), min("doc_id").as("keeper_id"))
      .filter(col("n_docs") >= 2)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "mm_binary_stats" -> (mmBinaryStats _),
    "mm_decode_features" -> (mmDecodeFeatures _),
    "mm_resize_features" -> (mmResizeFeatures _),
    "mm_frame_sample" -> (mmFrameSample _),
    "mm_dedup_phash" -> (mmDedupPhash _)
  )

  val oracle: Map[String, String] = Map(
    // strlen(text) > 0 mirrors the Spark-side guard (see mmDedupPhash
    // scaladoc); without it the two sides diverge on empty docs
    "mm_dedup_phash" ->
      """WITH chars AS (SELECT doc_id, strlen(text) AS n, text,
        |  unnest(range(1, strlen(text)+1)) AS i FROM documents WHERE strlen(text) > 0),
        |bins AS (SELECT doc_id, n, ascii(substr(text, i, 1)) % 16 AS b FROM chars),
        |cnts AS (SELECT doc_id, any_value(n) AS n, b, count(*) AS c
        |  FROM bins GROUP BY doc_id, b),
        |ph AS (SELECT doc_id,
        |  CAST(sum(CASE WHEN c * 16 > n THEN (CAST(1 AS BIGINT) << b) ELSE 0 END) AS BIGINT) AS phash
        |  FROM cnts GROUP BY doc_id)
        |SELECT phash, count(*) AS n_docs, min(doc_id) AS keeper_id
        |FROM ph GROUP BY phash HAVING count(*) >= 2""".stripMargin,
    "mm_resize_features" ->
      """WITH chars AS (SELECT doc_id, strlen(text) AS n, text,
        |  unnest(range(1, strlen(text)+1)) AS i FROM documents),
        |buckets AS (SELECT doc_id, n,
        |  (ascii(substr(text, i, 1)) % 16) // 2 AS rb FROM chars)
        |SELECT doc_id,
        |  CAST(count(*) FILTER (WHERE rb = 0) AS BIGINT) AS rbin0_count,
        |  CAST(count(*) FILTER (WHERE rb = 1) AS BIGINT) AS rbin1_count,
        |  CAST(count(*) AS BIGINT) AS total_check
        |FROM buckets GROUP BY doc_id""".stripMargin,
    "mm_frame_sample" ->
      """WITH framed AS (
        |  SELECT doc_id, text, CAST(strlen(text) // 32 AS INT) AS n_frames
        |  FROM documents WHERE strlen(text) >= 32)
        |SELECT doc_id,
        |  CAST(f.frame_id AS INT) AS frame_id,
        |  md5(substr(text, CAST(f.frame_id AS INT) * 32 + 1, 32)) AS frame_md5
        |FROM framed, LATERAL (
        |  SELECT unnest(range(0, n_frames, 4)) AS frame_id) f""".stripMargin,
    "mm_decode_features" ->
      """WITH chars AS (SELECT doc_id, strlen(text) AS n, text,
        |  unnest(range(1, strlen(text)+1)) AS i FROM documents),
        |buckets AS (SELECT doc_id, n, ascii(substr(text, i, 1)) % 16 AS b FROM chars)
        |SELECT doc_id,
        |  CAST(16 + any_value(n) % 64 AS INT) AS width,
        |  CAST(16 + (any_value(n) // 64) % 64 AS INT) AS height,
        |  CAST(count(*) FILTER (WHERE b = 0) AS BIGINT) AS bin0_count,
        |  CAST(count(*) FILTER (WHERE b = 1) AS BIGINT) AS bin1_count
        |FROM buckets GROUP BY doc_id""".stripMargin,
    "mm_binary_stats" ->
      """SELECT doc_id,
        |  CAST(strlen(text) AS BIGINT) AS byte_len,
        |  md5(text) AS content_md5,
        |  CASE WHEN strlen(text) % 3 = 0 THEN 'image'
        |       WHEN strlen(text) % 3 = 1 THEN 'audio'
        |       ELSE 'video' END AS media_kind
        |FROM documents""".stripMargin
  )
}
