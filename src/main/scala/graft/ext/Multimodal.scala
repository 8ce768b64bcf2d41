package graft.ext

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Multimodal-column plumbing for a training-data pipeline: media payloads
  * travel as opaque `binary` columns + typed metadata, and per-item decode
  * / feature-extraction runs as typed `mapPartitions` over the binary
  * batches — the Spark-side shape (schema, encoders, partition-local batch
  * loop) is real and tested; only the codec call itself is stubbed.
  *
  * STUB BOUNDARY: this container has no image/audio codecs, so
  * [[FakeCodec]] is a clearly-marked deterministic stand-in for a real
  * decoder (e.g. libjpeg/ffmpeg via JNI). Its outputs are pure integer
  * functions of the payload bytes, which is what makes the DuckDB oracle
  * possible. Swapping in a real codec changes ONE function, not the
  * pipeline.
  *
  * Scale notes: payloads stay in executor space end-to-end (no collect);
  * decode is embarrassingly parallel per partition; metadata-only
  * consumers never deserialize the payload column thanks to parquet
  * column pruning. At 100 TB the binary column dominates I/O, so the
  * pipelines below project it away as early as the decode allows.
  */
object Multimodal {

  /** One media row: payload + the typed metadata a real pipeline carries. */
  case class MediaRow(doc_id: Long, media_type: String, payload: Array[Byte])

  /** Decoded metadata (fake-decoded; see STUB BOUNDARY above). */
  case class MediaMeta(doc_id: Long, media_type: String, n_bytes: Long,
      width: Long, height: Long, n_frames: Long)

  /** One sampled frame: fixed-stride offsets + a window checksum — the
    * shape of a video frame-sampling stage. */
  case class FrameSample(doc_id: Long, frame_idx: Long, off: Long,
      checksum: Long)

  /** The deterministic decode stand-in. A real implementation would parse
    * the container header / run the codec here. */
  object FakeCodec {
    private def byteAt(payload: Array[Byte], i: Int): Long =
      if (i < payload.length) (payload(i) & 0xffL) else 0L

    /** "Header parse": dimensions derived from the first payload bytes. */
    def meta(row: MediaRow): MediaMeta = {
      val b0 = byteAt(row.payload, 0)
      val b1 = byteAt(row.payload, 1)
      val b2 = byteAt(row.payload, 2)
      MediaMeta(
        doc_id = row.doc_id,
        media_type = row.media_type,
        n_bytes = row.payload.length.toLong,
        width = 64 + (b0 * 31 + b1) % 448,
        height = 64 + (b1 * 31 + b2) % 448,
        n_frames = 1 + row.payload.length.toLong % 30)
    }

    val FrameStride = 32
    val FrameWindow = 16

    /** "Frame sampling": one sample per 32-byte stride, checksum = byte
      * sum of a 16-byte window at the offset. */
    def frames(row: MediaRow): Iterator[FrameSample] = {
      val n = row.payload.length
      Iterator.range(0, n, FrameStride).zipWithIndex.map { case (off, idx) =>
        var s = 0L
        var i = off
        while (i < math.min(off + FrameWindow, n)) {
          s += row.payload(i) & 0xffL
          i += 1
        }
        FrameSample(row.doc_id, idx.toLong, off.toLong, s)
      }
    }
  }

  /** Media table derived from `documents`: payload = UTF-8 text bytes
    * (stand-in for real image/audio blobs; ASCII corpus ⇒ byte i ==
    * code point of char i+1, which the oracle SQL leans on), media_type
    * cycles deterministically. */
  def mediaTable(spark: SparkSession, sfDir: String): Dataset[MediaRow] = {
    import spark.implicits._
    Tables.documents(spark, sfDir)
      .select(col("doc_id"),
        element_at(array(lit("image"), lit("audio"), lit("video")),
          (col("doc_id") % 3 + 1).cast("int")).as("media_type"),
        encode(col("text"), "UTF-8").as("payload"))
      .as[MediaRow]
  }

  private val mediaSqlCte: String =
    """media AS (
      |  SELECT doc_id,
      |    ['image','audio','video'][CAST(doc_id % 3 + 1 AS INTEGER)] AS media_type,
      |    text AS payload
      |  FROM documents)""".stripMargin

  /** Metadata extraction: typed mapPartitions over the payload batches —
    * the decode loop a real codec would run per partition. */
  def mediaMeta(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    mediaTable(spark, sfDir)
      .mapPartitions(rows => rows.map(FakeCodec.meta))
      .toDF()
  }

  /** Shared "header parse" CTE — the SQL twin of [[FakeCodec.meta]]'s
    * byte reads (ascii(char i+1) == byte i on the ASCII corpus); single
    * source for BOTH the meta and resize oracles. */
  private val metaSqlCte: String =
    """m AS (
      |  SELECT doc_id, media_type, payload,
      |    64 + (b0*31 + b1) % 448 AS width,
      |    64 + (b1*31 + b2) % 448 AS height
      |  FROM (
      |    SELECT doc_id, media_type, payload,
      |      CASE WHEN length(payload) > 0 THEN CAST(ascii(substr(payload, 1, 1)) AS BIGINT) ELSE 0 END AS b0,
      |      CASE WHEN length(payload) > 1 THEN CAST(ascii(substr(payload, 2, 1)) AS BIGINT) ELSE 0 END AS b1,
      |      CASE WHEN length(payload) > 2 THEN CAST(ascii(substr(payload, 3, 1)) AS BIGINT) ELSE 0 END AS b2
      |    FROM media))""".stripMargin

  val mediaMetaSql: String =
    s"""WITH $mediaSqlCte,
       |$metaSqlCte
       |SELECT doc_id, media_type,
       |  CAST(length(payload) AS BIGINT) AS n_bytes,
       |  width, height,
       |  1 + CAST(length(payload) AS BIGINT) % 30 AS n_frames
       |FROM m""".stripMargin

  /** Frame sampling for video rows only: typed flatMap fan-out (1 → ~10
    * rows) after a pushed-down media_type filter. */
  def frameSamples(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    mediaTable(spark, sfDir)
      .filter(col("media_type") === "video")
      .flatMap(FakeCodec.frames)
      .toDF()
  }

  val frameSamplesSql: String =
    s"""WITH $mediaSqlCte
       |SELECT doc_id, CAST(off / ${FakeCodec.FrameStride} AS BIGINT) AS frame_idx,
       |  CAST(off AS BIGINT) AS off,
       |  CAST(list_sum(list_prepend(0::BIGINT, list_transform(
       |    range(off + 1, least(off + 1 + ${FakeCodec.FrameWindow}, length(payload) + 1)),
       |    i -> CAST(ascii(substr(payload, CAST(i AS INTEGER), 1)) AS BIGINT)))) AS BIGINT) AS checksum
       |FROM media,
       |  LATERAL (SELECT unnest(range(0, length(payload), ${FakeCodec.FrameStride})) AS off)
       |WHERE media_type = 'video'""".stripMargin

  /** Resized/feature-extracted record: aspect-preserving fit into a
    * 64×64 box + a 16-bucket byte histogram ("the embedding" a real
    * feature extractor would emit). */
  case class MediaFeature(doc_id: Long, media_type: String, out_w: Long,
      out_h: Long, hist: Array[Long])

  /** "Resize + feature extraction": downstream of the fake decode — the
    * remaining two stages of the standard media pipeline (decode →
    * resize → feature-extract), again with real Spark plumbing and a
    * stubbed kernel.
    *
    * The 16-bucket byte histogram is emitted as scalar columns h0..h15
    * (not one array column): downstream consumers — and the oracle
    * comparator — sort and diff rows, which array-typed cells break. */
  def resizeFeatures(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val features = mediaTable(spark, sfDir).mapPartitions { rows =>
      rows.map { row =>
        val m = FakeCodec.meta(row)
        // Aspect-preserving fit into 64×64: scale = 64/max(w,h),
        // exact in integer arithmetic (floor), min dimension 1.
        val mx = math.max(m.width, m.height)
        val outW = math.max(1L, m.width * 64L / mx)
        val outH = math.max(1L, m.height * 64L / mx)
        val hist = new Array[Long](16)
        row.payload.foreach(b => hist((b & 0xff) / 16) += 1)
        MediaFeature(row.doc_id, row.media_type, outW, outH, hist)
      }
    }.toDF()
    val histCols = (0 until 16).map(i => col("hist")(i).as(s"h$i"))
    features.select(
      Seq(col("doc_id"), col("media_type"), col("out_w"), col("out_h")) ++
        histCols: _*)
  }

  val resizeFeaturesSql: String = {
    val histCols =
      (0 until 16).map(i => s"hist[${i + 1}] AS h$i").mkString(",\n       |  ")
    s"""WITH $mediaSqlCte,
       |$metaSqlCte
       |SELECT doc_id, media_type, out_w, out_h,
       |  $histCols
       |FROM (
       |  SELECT doc_id, media_type,
       |    greatest(1, width * 64 // greatest(width, height)) AS out_w,
       |    greatest(1, height * 64 // greatest(width, height)) AS out_h,
       |    list_transform(range(0, 16), bucket ->
       |      CAST(len(list_filter(range(1, length(payload) + 1),
       |        i -> ascii(substr(payload, CAST(i AS INTEGER), 1)) // 16 = bucket)) AS BIGINT)) AS hist
       |  FROM m)""".stripMargin
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "multimodal_meta" -> (mediaMeta _),
    "multimodal_frames" -> (frameSamples _),
    "multimodal_resize" -> (resizeFeatures _))

  val oracles: Map[String, String] = Map(
    "multimodal_meta" -> mediaMetaSql,
    "multimodal_frames" -> frameSamplesSql,
    "multimodal_resize" -> resizeFeaturesSql)
}
