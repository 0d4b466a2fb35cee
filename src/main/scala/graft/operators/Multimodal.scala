package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables._

/** One media object: opaque binary payload + typed metadata. In a real
  * pipeline `payload` holds image/audio/video bytes read from parquet
  * binary columns; here it is synthesized from `documents.text` (the
  * container ships no codec libraries — see decode stub below). */
case class MediaRecord(doc_id: Long, payload: Array[Byte], format: String, n_bytes: Int)

/** Features the (stubbed) decoder extracts per media object. */
case class MediaFeatures(doc_id: Long, n_bytes: Int, byte_sum: Long,
                         first_byte: Int, frame_sum: Long)

/** Multimodal column plumbing: binary payloads with typed metadata,
  * processed batch-wise in executor-side partitions.
  *
  * The Spark-side shape is the real thing — a typed
  * `Dataset[MediaRecord]` flowing through `mapPartitions` so a decoder
  * amortizes per-batch setup (model load, codec init) across a whole
  * partition, exactly how an image/audio decode stage runs at 100 TB
  * (binary parquet columns partition-pruned by metadata, decode
  * embarrassingly parallel, no shuffle).
  *
  * DECODE STUB: the container has no image/audio libraries, so
  * `decodeStub` stands in for the real codec with a deterministic
  * byte-level "decode" (byte sum, first byte, every-64th-byte "frame
  * sample"). Because the fake is deterministic arithmetic over bytes,
  * the whole path is still end-to-end oracle-checked from DuckDB.
  */
object Multimodal {

  /** Stand-in for a real decoder (e.g. JPEG → pixel stats). Runs once
    * per record inside a partition iterator — per-partition setup would
    * go right before the `it.map`. */
  private def decodeStub(r: MediaRecord): MediaFeatures = {
    val bytes = r.payload
    var sum = 0L; var frame = 0L; var i = 0
    while (i < bytes.length) {
      val b = bytes(i) & 0xff
      sum += b
      if (i % 64 == 0) frame += b  // "frame sampling": every 64th byte
      i += 1
    }
    MediaFeatures(r.doc_id, r.n_bytes, sum, if (bytes.isEmpty) -1 else bytes(0) & 0xff, frame)
  }

  /** mm1: synthesize the media table (text bytes as payload + typed
    * metadata), decode batch-wise, return per-object features. */
  def mm1MediaFeatures(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val media = documents(s, d)
      .select(col("doc_id"),
        col("text").cast("binary").as("payload"),
        lit("txt").as("format"),
        octet_length(col("text")).as("n_bytes"))
      .as[MediaRecord]
    media.mapPartitions { it =>
      // real pipeline: initialize codec / model once per partition here
      it.map(decodeStub)
    }.toDF()
      .orderBy(col("doc_id"))
  }

  /** The oracle replays the byte arithmetic in SQL (text is pure ASCII
    * in this corpus, so ord(char) == byte — asserted in PipelineSpec).
    * LEFT JOIN + COALESCE so a zero-length payload yields the same row
    * the Spark side emits (byte_sum=0, first_byte=-1) instead of
    * silently dropping from the oracle result. */
  val mm1Sql: String =
    """WITH b AS (
      |  SELECT doc_id, i, ord(substr(text, i, 1)) AS byte
      |  FROM documents, unnest(generate_series(1, length(text))) AS u(i))
      |SELECT d.doc_id,
      |  length(d.text) AS n_bytes,
      |  CAST(COALESCE(SUM(b.byte), 0) AS BIGINT) AS byte_sum,
      |  CASE WHEN length(d.text) = 0 THEN -1 ELSE ord(substr(d.text, 1, 1)) END AS first_byte,
      |  CAST(COALESCE(SUM(CASE WHEN (b.i - 1) % 64 = 0 THEN b.byte ELSE 0 END), 0) AS BIGINT) AS frame_sum
      |FROM documents d LEFT JOIN b ON b.doc_id = d.doc_id
      |GROUP BY d.doc_id, d.text ORDER BY d.doc_id""".stripMargin

  /** mm2 output: fixed-size frame decomposition of one payload. */
  case class MediaWindows(doc_id: Long, n_windows: Int, peak_window: Long, peak_energy: Long)

  /** Stand-in for frame extraction / audio windowing: split the payload
    * into fixed 256-byte frames, compute per-frame energy (Σ byte²),
    * keep the argmax frame (first-wins on ties). A real video pipeline
    * does exactly this shape — deterministic frame boundaries from
    * metadata, per-frame feature, per-object reduction — with the codec
    * swapped in for the byte arithmetic. */
  private def windowStub(r: MediaRecord): MediaWindows = {
    val bytes = r.payload
    val W = 256
    val n = math.max(1, (bytes.length + W - 1) / W)
    var peakW = 0L; var peakE = -1L
    var w = 0
    while (w < n) {
      var e = 0L; var i = w * W
      val end = math.min(bytes.length, (w + 1) * W)
      while (i < end) { val b = bytes(i) & 0xff; e += b.toLong * b; i += 1 }
      if (e > peakE) { peakE = e; peakW = w }
      w += 1
    }
    MediaWindows(r.doc_id, n, peakW, peakE)
  }

  /** mm2: frame-sample each payload batch-wise (same `mapPartitions`
    * shape as mm1 — decode amortized per partition, no shuffle). */
  def mm2FrameSample(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    documents(s, d)
      .select(col("doc_id"),
        col("text").cast("binary").as("payload"),
        lit("txt").as("format"),
        octet_length(col("text")).as("n_bytes"))
      .as[MediaRecord]
      .mapPartitions(_.map(windowStub))
      .toDF()
      .orderBy(col("doc_id"))
  }

  /** LEFT JOIN against documents so a zero-length payload yields the
    * degenerate single empty window (n_windows=1, energy 0) the Spark
    * side emits. */
  val mm2Sql: String =
    """WITH b AS (
      |  SELECT doc_id, i, ord(substr(text, i, 1)) AS byte
      |  FROM documents, unnest(generate_series(1, length(text))) AS u(i)),
      |w AS (
      |  SELECT doc_id, CAST(floor((i - 1) / 256.0) AS BIGINT) AS win,
      |         SUM(byte * byte) AS energy
      |  FROM b GROUP BY 1, 2),
      |ranked AS (
      |  SELECT doc_id, win, energy,
      |         COUNT(*) OVER (PARTITION BY doc_id) AS n_windows,
      |         ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY energy DESC, win) AS rn
      |  FROM w)
      |SELECT d.doc_id, CAST(COALESCE(r.n_windows, 1) AS INT) AS n_windows,
      |       COALESCE(r.win, 0) AS peak_window,
      |       CAST(COALESCE(r.energy, 0) AS BIGINT) AS peak_energy
      |FROM documents d
      |LEFT JOIN (SELECT * FROM ranked WHERE rn = 1) r ON r.doc_id = d.doc_id
      |ORDER BY d.doc_id""".stripMargin

  /** mm3 output: a downsampled payload's identity + sizes. */
  case class ResizedMedia(doc_id: Long, orig_bytes: Int, resized_bytes: Int,
                          resized_md5: String)

  /** Stand-in for resize: nearest-neighbor ×4 downsample (keep every
    * 4th byte), emitting the new size and the content hash of the
    * resized payload — in a real pipeline the resized binary itself is
    * written back as a new column; hashing it keeps the oracle able to
    * verify the exact output bytes without storing them twice. */
  private def resizeStub(r: MediaRecord): ResizedMedia = {
    val b = r.payload
    val out = new Array[Byte]((b.length + 3) / 4)
    var i = 0
    while (i * 4 < b.length) { out(i) = b(i * 4); i += 1 }
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(out).map(x => f"${x & 0xff}%02x").mkString
    ResizedMedia(r.doc_id, b.length, out.length, hex)
  }

  /** mm3: batch-wise resize (same partition-amortized shape). */
  def mm3Resize(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    documents(s, d)
      .select(col("doc_id"),
        col("text").cast("binary").as("payload"),
        lit("txt").as("format"),
        octet_length(col("text")).as("n_bytes"))
      .as[MediaRecord]
      .mapPartitions(_.map(resizeStub))
      .toDF()
      .orderBy(col("doc_id"))
  }

  /** LEFT JOIN + COALESCE('' ) so a zero-length payload hashes to the
    * md5 of the empty string, matching the Spark-side resize of an
    * empty byte array. */
  val mm3Sql: String =
    """WITH s AS (
      |  SELECT doc_id, i, substr(text, i, 1) AS ch
      |  FROM documents, unnest(generate_series(1, length(text), 4)) AS u(i))
      |SELECT d.doc_id, length(d.text) AS orig_bytes,
      |  CAST(COUNT(s.i) AS INT) AS resized_bytes,
      |  md5(COALESCE(string_agg(s.ch, '' ORDER BY s.i), '')) AS resized_md5
      |FROM documents d LEFT JOIN s ON s.doc_id = d.doc_id
      |GROUP BY d.doc_id, d.text ORDER BY d.doc_id""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "mm1_media_features" -> (mm1MediaFeatures _),
    "mm2_frame_sample"   -> (mm2FrameSample _),
    "mm3_resize"         -> (mm3Resize _))

  val oracles: Map[String, String] = Map(
    "mm1_media_features" -> mm1Sql,
    "mm2_frame_sample"   -> mm2Sql,
    "mm3_resize"         -> mm3Sql)
}
