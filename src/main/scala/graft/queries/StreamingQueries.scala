package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables.t
import graft.multimodal.Multimodal

/** Streaming-adjacent and multimodal operator coverage.
  *
  * q50 is the batch form of the streaming windowed aggregation (same
  * plan Structured Streaming runs incrementally — see
  * graft.streaming.EventStream.windowedStats and its spec, which checks
  * stream output == this batch answer). q70 drives the binary-column
  * decode plumbing with a SQL-arithmetic oracle (the fake codec's
  * features are pure functions of the payload).
  */
object StreamingQueries extends QuerySet {

  /** Hourly tumbling-window stats over events (batch form of the
    * streaming agg; window().start == date_trunc('hour') for aligned
    * tumbling windows). */
  private def q50(s: SparkSession, d: String): DataFrame =
    t(s, d, "events")
      .groupBy(window(col("ts"), "1 hour").getField("start").as("window_start"),
        col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("total"))
      .orderBy(col("window_start"), col("event_type"))

  private val q50Sql =
    """SELECT CAST(DATE_TRUNC('hour', ts) AS TIMESTAMP) AS window_start, event_type,
      |  COUNT(*) AS n,
      |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total
      |FROM events GROUP BY 1, 2 ORDER BY window_start, event_type""".stripMargin

  /** Multimodal decode across ALL THREE kind branches: image rows are
    * REAL PNGs decoded by the JDK ImageIO codec, audio rows are REAL
    * 16-bit PCM WAVs decoded by the JDK sampled-sound codec, video rows
    * keep text bytes through the documented FakeCodec stand-in. Every
    * generated payload follows a closed-form formula (PNG and PCM are
    * lossless), so the oracle recomputes width/height/checksum/
    * sample_rate/n_frames without any decoder — a real decode bug on
    * any branch breaks the hash. */
  private def q70(s: SparkSession, d: String): DataFrame = {
    val gen = udf { (id: Long, text: String) =>
      if (id % 4 == 0)
        Multimodal.syntheticWav(id, (8000 + (id % 3) * 4000).toInt, (50 + id % 100).toInt)
      else if (id % 4 == 2) text.getBytes("UTF-8")
      else Multimodal.syntheticPng(id, (8 + id % 24).toInt, (8 + (id * 3) % 16).toInt)
    }
    val media = t(s, d, "documents")
      .select(col("doc_id"),
        when(col("doc_id") % 4 === 0, lit("audio"))
          .when(col("doc_id") % 4 === 2, lit("video"))
          .otherwise(lit("image")).as("kind"),
        gen(col("doc_id"), col("text")).as("bytes"))
    Multimodal.withFeatures(media, "bytes", "kind", Multimodal.KindDispatchCodec)
      .select(col("doc_id"), col("kind"), col("width"), col("height"),
        col("checksum"), col("sample_rate"), col("n_frames"))
      .orderBy(col("doc_id"))
  }

  private val q70Sql =
    """SELECT doc_id,
      |  CASE WHEN doc_id % 4 = 0 THEN 'audio'
      |       WHEN doc_id % 4 = 2 THEN 'video' ELSE 'image' END AS kind,
      |  CASE WHEN doc_id % 4 = 0 THEN 0
      |       WHEN doc_id % 4 = 2 THEN CAST(strlen(text) % 640 AS INT)
      |       ELSE CAST(8 + doc_id % 24 AS INT) END AS width,
      |  CASE WHEN doc_id % 4 = 0 THEN 0
      |       WHEN doc_id % 4 = 2 THEN CAST((strlen(text) * 7) % 480 AS INT)
      |       ELSE CAST(8 + (doc_id * 3) % 16 AS INT) END AS height,
      |  CASE WHEN doc_id % 4 = 0 THEN
      |    CAST(list_sum(list_transform(range(50 + doc_id % 100), i ->
      |      ((i * 13 + doc_id * 7) % 4096) - 2048)) AS BIGINT)
      |  WHEN doc_id % 4 = 2 THEN
      |    list_reduce(
      |      list_prepend(CAST(0 AS BIGINT),
      |        list_transform(string_split(text, ''), c -> CAST(ascii(c) AS BIGINT))),
      |      (a, b) -> (a * 31 + b) % 1000000007)
      |  ELSE CAST(list_sum(flatten(list_transform(range(8 + (doc_id * 3) % 16), y ->
      |    list_transform(range(8 + doc_id % 24), x ->
      |      (x * 31 + y * 17 + doc_id) % 256)))) AS BIGINT)
      |  END AS checksum,
      |  CASE WHEN doc_id % 4 = 0 THEN CAST(8000 + (doc_id % 3) * 4000 AS INT)
      |       ELSE 0 END AS sample_rate,
      |  CASE WHEN doc_id % 4 = 0 THEN CAST(50 + doc_id % 100 AS INT)
      |       ELSE 0 END AS n_frames
      |FROM documents ORDER BY doc_id""".stripMargin

  /** Multimodal downscale: REAL image resize (nearest-neighbor raster
    * sample + PNG re-encode) and REAL audio resample (PCM frame
    * decimation + WAV re-encode), verified by decoding the transformed
    * containers AGAIN through the real codecs. The integer sampling
    * maps (src pixel = 2·dst pixel; src frame = 2·dst frame) keep the
    * generators' closed forms closed, so the oracle recomputes the
    * post-resize dims/rate/frames/checksums with no media stack. */
  private def q115(s: SparkSession, d: String): DataFrame = {
    val gen = udf { (id: Long) =>
      if (id % 2 == 0)
        Multimodal.syntheticWav(id, (8000 + (id % 3) * 4000).toInt, (50 + id % 100).toInt)
      else
        Multimodal.syntheticPng(id, (8 + id % 24).toInt, (8 + (id * 3) % 16).toInt)
    }
    val media = t(s, d, "documents")
      .select(col("doc_id"),
        when(col("doc_id") % 2 === 0, lit("audio")).otherwise(lit("image")).as("kind"),
        gen(col("doc_id")).as("bytes"))
    val small = Multimodal.withDownscaled(media, "bytes", "kind", factor = 2)
    Multimodal.withFeatures(small, "bytes_small", "kind", Multimodal.KindDispatchCodec)
      .select(col("doc_id"), col("kind"), col("width"), col("height"),
        col("checksum"), col("sample_rate"), col("n_frames"))
      .orderBy(col("doc_id"))
  }

  private val q115Sql =
    """SELECT doc_id,
      |  CASE WHEN doc_id % 2 = 0 THEN 'audio' ELSE 'image' END AS kind,
      |  CASE WHEN doc_id % 2 = 0 THEN 0
      |       ELSE CAST((8 + doc_id % 24) // 2 AS INT) END AS width,
      |  CASE WHEN doc_id % 2 = 0 THEN 0
      |       ELSE CAST((8 + (doc_id * 3) % 16) // 2 AS INT) END AS height,
      |  CASE WHEN doc_id % 2 = 0 THEN
      |    CAST(list_sum(list_transform(range((50 + doc_id % 100 + 1) // 2), i ->
      |      ((2 * i * 13 + doc_id * 7) % 4096) - 2048)) AS BIGINT)
      |  ELSE
      |    CAST(list_sum(flatten(list_transform(range((8 + (doc_id * 3) % 16) // 2), y ->
      |      list_transform(range((8 + doc_id % 24) // 2), x ->
      |        (62 * x + 34 * y + doc_id) % 256)))) AS BIGINT)
      |  END AS checksum,
      |  CASE WHEN doc_id % 2 = 0 THEN CAST((8000 + (doc_id % 3) * 4000) // 2 AS INT)
      |       ELSE 0 END AS sample_rate,
      |  CASE WHEN doc_id % 2 = 0 THEN CAST((50 + doc_id % 100 + 1) // 2 AS INT)
      |       ELSE 0 END AS n_frames
      |FROM documents ORDER BY doc_id""".stripMargin

  /** Multimodal frame sampling: every 4th 16-byte slice of the payload,
    * capped at 6 frames (the partition-parallel frame-extraction shape;
    * document text bytes stand in for video payloads — all-ASCII in the
    * testdata, so byte offsets mirror to substr in the oracle). */
  private def q81(s: SparkSession, d: String): DataFrame = {
    val media = t(s, d, "documents")
      .select(col("doc_id"), encode(col("text"), "UTF-8").as("bytes"))
    Multimodal.sampleFrames(media, "bytes", everyK = 4, maxFrames = 6)
      .select(col("doc_id"), col("n_sampled"),
        element_at(col("frames"), 1).cast("string").as("first_frame"))
      .orderBy(col("doc_id"))
  }

  private val q81Sql =
    """SELECT doc_id,
      |  CASE WHEN strlen(text) = 0 THEN 0
      |       ELSE LEAST(6, CAST(ceil(strlen(text) / 64.0) AS INT)) END AS n_sampled,
      |  CASE WHEN strlen(text) = 0 THEN NULL
      |       ELSE substr(text, 1, 16) END AS first_frame
      |FROM documents ORDER BY doc_id""".stripMargin

  override val queries: Seq[Q] = Seq(
    Q("q50_hourly_window_stats", q50, Some(q50Sql), headline = true),
    Q("q70_multimodal_features", q70, Some(q70Sql)),
    Q("q81_frame_sample", q81, Some(q81Sql)),
    Q("q115_multimodal_resize", q115, Some(q115Sql)))
}
