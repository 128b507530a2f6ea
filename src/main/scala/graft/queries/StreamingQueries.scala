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
  * stream output == this batch answer). q70/q81/q115 drive the
  * binary-column decode plumbing with REAL JDK decoders on every kind
  * branch (ImageIO PNG, javax.sound WAV, multi-frame animated GIF);
  * the generators' closed forms give each decode a SQL-arithmetic
  * oracle because the containers are lossless.
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

  /** Multimodal decode across ALL THREE kind branches — every branch a
    * REAL JDK decoder: image rows are PNGs through ImageIO, audio rows
    * are 16-bit PCM WAVs through javax.sound, video rows are
    * multi-frame animated GIFs through ImageReader.getNumImages/read(i)
    * (real frame counts, real per-frame rasters). Every generated
    * payload follows a closed-form formula (PNG, PCM and
    * palette-indexed GIF are all lossless), so the oracle recomputes
    * width/height/checksum/sample_rate/n_frames without any decoder —
    * a real decode bug on any branch breaks the hash. */
  private def q70(s: SparkSession, d: String): DataFrame = {
    val gen = udf { (id: Long) =>
      if (id % 4 == 0)
        Multimodal.syntheticWav(id, (8000 + (id % 3) * 4000).toInt, (50 + id % 100).toInt)
      else if (id % 4 == 2)
        Multimodal.syntheticGif(id, (6 + id % 10).toInt, (4 + (id * 3) % 8).toInt,
          (2 + id % 4).toInt)
      else Multimodal.syntheticPng(id, (8 + id % 24).toInt, (8 + (id * 3) % 16).toInt)
    }
    val media = t(s, d, "documents")
      .select(col("doc_id"),
        when(col("doc_id") % 4 === 0, lit("audio"))
          .when(col("doc_id") % 4 === 2, lit("video"))
          .otherwise(lit("image")).as("kind"),
        gen(col("doc_id")).as("bytes"))
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
      |       WHEN doc_id % 4 = 2 THEN CAST(6 + doc_id % 10 AS INT)
      |       ELSE CAST(8 + doc_id % 24 AS INT) END AS width,
      |  CASE WHEN doc_id % 4 = 0 THEN 0
      |       WHEN doc_id % 4 = 2 THEN CAST(4 + (doc_id * 3) % 8 AS INT)
      |       ELSE CAST(8 + (doc_id * 3) % 16 AS INT) END AS height,
      |  CASE WHEN doc_id % 4 = 0 THEN
      |    CAST(list_sum(list_transform(range(50 + doc_id % 100), i ->
      |      ((i * 13 + doc_id * 7) % 4096) - 2048)) AS BIGINT)
      |  WHEN doc_id % 4 = 2 THEN
      |    CAST(list_sum(flatten(list_transform(range(2 + doc_id % 4), f ->
      |      flatten(list_transform(range(4 + (doc_id * 3) % 8), y ->
      |        list_transform(range(6 + doc_id % 10), x ->
      |          (x * 31 + y * 17 + f * 11 + doc_id) % 256)))))) AS BIGINT)
      |  ELSE CAST(list_sum(flatten(list_transform(range(8 + (doc_id * 3) % 16), y ->
      |    list_transform(range(8 + doc_id % 24), x ->
      |      (x * 31 + y * 17 + doc_id) % 256)))) AS BIGINT)
      |  END AS checksum,
      |  CASE WHEN doc_id % 4 = 0 THEN CAST(8000 + (doc_id % 3) * 4000 AS INT)
      |       ELSE 0 END AS sample_rate,
      |  CASE WHEN doc_id % 4 = 0 THEN CAST(50 + doc_id % 100 AS INT)
      |       WHEN doc_id % 4 = 2 THEN CAST(2 + doc_id % 4 AS INT)
      |       ELSE 0 END AS n_frames
      |FROM documents ORDER BY doc_id""".stripMargin

  /** Multimodal downscale across ALL THREE kinds — REAL image resize
    * (nearest-neighbor raster sample + PNG re-encode), REAL audio
    * resample (PCM frame decimation + WAV re-encode), REAL video
    * temporal downsample (per-frame ImageIO decode, keep every 2nd
    * frame, animated-GIF re-encode) — verified by decoding the
    * transformed containers AGAIN through the real codecs. The integer
    * sampling maps (src pixel = 2·dst pixel; src frame = 2·dst frame)
    * keep the generators' closed forms closed, so the oracle recomputes
    * the post-transform dims/rate/frames/checksums with no media
    * stack. */
  private def q115(s: SparkSession, d: String): DataFrame = {
    val gen = udf { (id: Long) =>
      if (id % 3 == 0)
        Multimodal.syntheticWav(id, (8000 + (id % 5) * 2000).toInt, (50 + id % 100).toInt)
      else if (id % 3 == 2)
        Multimodal.syntheticGif(id, (6 + id % 10).toInt, (4 + (id * 3) % 8).toInt,
          (5 + id % 6).toInt)
      else
        Multimodal.syntheticPng(id, (8 + id % 24).toInt, (8 + (id * 3) % 16).toInt)
    }
    val media = t(s, d, "documents")
      .select(col("doc_id"),
        when(col("doc_id") % 3 === 0, lit("audio"))
          .when(col("doc_id") % 3 === 2, lit("video"))
          .otherwise(lit("image")).as("kind"),
        gen(col("doc_id")).as("bytes"))
    val small = Multimodal.withDownscaled(media, "bytes", "kind", factor = 2)
    Multimodal.withFeatures(small, "bytes_small", "kind", Multimodal.KindDispatchCodec)
      .select(col("doc_id"), col("kind"), col("width"), col("height"),
        col("checksum"), col("sample_rate"), col("n_frames"))
      .orderBy(col("doc_id"))
  }

  private val q115Sql =
    """SELECT doc_id,
      |  CASE WHEN doc_id % 3 = 0 THEN 'audio'
      |       WHEN doc_id % 3 = 2 THEN 'video' ELSE 'image' END AS kind,
      |  CASE WHEN doc_id % 3 = 0 THEN 0
      |       WHEN doc_id % 3 = 2 THEN CAST(6 + doc_id % 10 AS INT)
      |       ELSE CAST((8 + doc_id % 24) // 2 AS INT) END AS width,
      |  CASE WHEN doc_id % 3 = 0 THEN 0
      |       WHEN doc_id % 3 = 2 THEN CAST(4 + (doc_id * 3) % 8 AS INT)
      |       ELSE CAST((8 + (doc_id * 3) % 16) // 2 AS INT) END AS height,
      |  CASE WHEN doc_id % 3 = 0 THEN
    CAST(list_sum(list_transform(range((50 + doc_id % 100 + 1) // 2), i ->
      |      ((2 * i * 13 + doc_id * 7) % 4096) - 2048)) AS BIGINT)
      |  WHEN doc_id % 3 = 2 THEN
      |    CAST(list_sum(flatten(list_transform(range((5 + doc_id % 6 + 1) // 2), j ->
      |      flatten(list_transform(range(4 + (doc_id * 3) % 8), y ->
      |        list_transform(range(6 + doc_id % 10), x ->
      |          (x * 31 + y * 17 + (2 * j) * 11 + doc_id) % 256)))))) AS BIGINT)
      |  ELSE
      |    CAST(list_sum(flatten(list_transform(range((8 + (doc_id * 3) % 16) // 2), y ->
      |      list_transform(range((8 + doc_id % 24) // 2), x ->
      |        (62 * x + 34 * y + doc_id) % 256)))) AS BIGINT)
      |  END AS checksum,
      |  CASE WHEN doc_id % 3 = 0 THEN CAST((8000 + (doc_id % 5) * 2000) // 2 AS INT)
      |       ELSE 0 END AS sample_rate,
      |  CASE WHEN doc_id % 3 = 0 THEN CAST((50 + doc_id % 100 + 1) // 2 AS INT)
      |       WHEN doc_id % 3 = 2 THEN CAST((5 + doc_id % 6 + 1) // 2 AS INT)
      |       ELSE 0 END AS n_frames
      |FROM documents ORDER BY doc_id""".stripMargin

  /** REAL video frame sampling: every 4th frame of a multi-frame
    * animated GIF (capped at 6), each sampled frame DECODED through the
    * JDK ImageReader and reduced to its pixel checksum — the
    * distributed frame-extraction stage with a real decoder in the
    * loop. The generator's closed form makes both the sampled-frame
    * count and every per-frame checksum oracle-computable without a
    * media stack (frame j of the sample is source frame 4·j). */
  private def q81(s: SparkSession, d: String): DataFrame = {
    val gen = udf { (id: Long) =>
      Multimodal.syntheticGif(id, (5 + id % 8).toInt, (4 + id % 6).toInt,
        (3 + id % 20).toInt)
    }
    val media = t(s, d, "documents").select(col("doc_id"), gen(col("doc_id")).as("bytes"))
    Multimodal.sampleVideoFrames(media, "bytes", everyK = 4, maxFrames = 6)
      .select(col("doc_id"), col("n_sampled"),
        element_at(col("frame_sums"), 1).as("first_sum"),
        aggregate(col("frame_sums"), lit(0L), (a, b) => a + b).as("total_sum"))
      .orderBy(col("doc_id"))
  }

  private val q81Sql =
    """SELECT doc_id,
      |  LEAST(6, CAST(ceil((3 + doc_id % 20) / 4.0) AS INT)) AS n_sampled,
      |  CAST(list_sum(flatten(list_transform(range(4 + doc_id % 6), y ->
      |    list_transform(range(5 + doc_id % 8), x ->
      |      (x * 31 + y * 17 + doc_id) % 256)))) AS BIGINT) AS first_sum,
      |  CAST(list_sum(flatten(list_transform(
      |    range(LEAST(6, CAST(ceil((3 + doc_id % 20) / 4.0) AS INT))), j ->
      |      flatten(list_transform(range(4 + doc_id % 6), y ->
      |        list_transform(range(5 + doc_id % 8), x ->
      |          (x * 31 + y * 17 + (4 * j) * 11 + doc_id) % 256)))))) AS BIGINT)
      |    AS total_sum
      |FROM documents ORDER BY doc_id""".stripMargin

  /** Perceptual image dedup over REALLY decoded pixels: each doc
    * renders one of 40 base patterns at a per-doc brightness shift, and
    * [[graft.multimodal.PerceptualHash]] dHash-buckets them — the
    * brightness-shifted copies of a pattern collapse into one group,
    * which is the whole point of a gradient hash. The decode is real
    * ImageIO; the oracle replays the 9×8 downsample + adjacent-pixel
    * comparisons from the generator's closed form (delta drops out of
    * the comparisons by design, so the oracle needn't carry it).
    * Shuffle carries (doc_id, 8-byte hash) — pixels stay in the decode
    * task. */
  private def q129(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val gen = udf { (id: Long) =>
      val p = (id % 40).toInt
      Multimodal.syntheticPngBrightness(p, ((id / 40) % 40).toInt,
        10 + (p % 3) * 7, 9 + (p % 4) * 5)
    }
    val media = t(s, d, "documents")
      .select(col("doc_id"), gen(col("doc_id")).as("bytes"))
    val w = Window.partitionBy(col("dhash"))
    graft.multimodal.PerceptualHash.withDhash(media, "bytes")
      .drop("bytes", "dhash_bits")
      .withColumn("rep_id", min(col("doc_id")).over(w))
      .withColumn("group_n", count(lit(1)).over(w))
      .orderBy(col("doc_id"))
  }

  private val q129Sql =
    """WITH d AS (
      |  SELECT doc_id, doc_id % 40 AS p,
      |    CAST(10 + (doc_id % 40) % 3 * 7 AS BIGINT) AS w,
      |    CAST(9 + (doc_id % 40) % 4 * 5 AS BIGINT) AS h
      |  FROM documents),
      |hx AS (
      |  SELECT doc_id,
      |    array_to_string(list_transform(range(8), y ->
      |      lower(lpad(hex(CAST(list_sum(list_transform(range(8), x ->
      |        CASE WHEN ((x*w)//9*23 + (y*h)//8*11 + p*37) % 200
      |                 < (((x+1)*w)//9*23 + (y*h)//8*11 + p*37) % 200
      |        THEN (1<<x) ELSE 0 END)) AS BIGINT)), 2, '0'))), '') AS dhash
      |  FROM d)
      |SELECT doc_id, dhash,
      |  MIN(doc_id) OVER (PARTITION BY dhash) AS rep_id,
      |  COUNT(*) OVER (PARTITION BY dhash) AS group_n
      |FROM hx ORDER BY doc_id""".stripMargin

  override val queries: Seq[Q] = Seq(
    Q("q50_hourly_window_stats", q50, Some(q50Sql), headline = true),
    Q("q70_multimodal_features", q70, Some(q70Sql)),
    Q("q81_frame_sample", q81, Some(q81Sql)),
    Q("q115_multimodal_resize", q115, Some(q115Sql)),
    Q("q129_image_phash_dedup", q129, Some(q129Sql)),
    Q("q142_audio_frame_features", q142, Some(q142Sql)),
    Q("q143_video_scene_deltas", q143, Some(q143Sql)),
    Q("q144_audio_segments", q144, Some(q144Sql)),
    Q("q399_y4m_scene_deltas", q399, Some(q399Sql)),
    Q("q400_y4m_frame_sample", q400, Some(q400Sql)),
    Q("q419_avi_scene_deltas", q419, Some(q419Sql)),
    Q("q420_mjpeg_scene_cuts", q420, Some(q420Sql)))

  /** q143's scene-delta signal over a SECOND real container: YUV4MPEG2
    * via the pure-JDK [[graft.multimodal.Y4m]] decoder (r17 — retires
    * the "real video only for animated GIF" honesty note). The payload
    * uses 4:2:0 chroma, so the luma reader must SKIP two chroma planes
    * per frame exactly — a framing bug drags chroma bytes into the
    * deltas and breaks the hash. Even dimensions by construction
    * (C420's contract); the luma closed form is syntheticGif's, so the
    * oracle replays decode → frame iteration → differencing with no
    * video stack. */
  private def q399(s: SparkSession, d: String): DataFrame = {
    val gen = udf { (id: Long) =>
      graft.multimodal.Y4m.synthetic(id, (6 + (id % 5) * 2).toInt,
        (4 + ((id * 3) % 4) * 2).toInt, (2 + id % 4).toInt)
    }
    val media = t(s, d, "documents")
      .select(col("doc_id"), gen(col("doc_id")).as("bytes"))
    graft.multimodal.VideoFeatures.withFrameDeltas(media, "bytes")
      .select(col("doc_id"), col("frame_idx"), col("delta"))
      .orderBy(col("doc_id"), col("frame_idx"))
  }

  private lazy val q399Sql = // lazy: declared below the `queries` val
    """WITH f AS (
      |  SELECT doc_id, unnest(range(1, 2 + doc_id % 4)) AS fi FROM documents)
      |SELECT doc_id, CAST(fi AS INT) AS frame_idx,
      |  CAST(list_sum(flatten(list_transform(range(4 + ((doc_id*3) % 4)*2), y ->
      |    list_transform(range(6 + (doc_id % 5)*2), x ->
      |      abs((x*31 + y*17 + doc_id + fi*11) % 256
      |        - (x*31 + y*17 + doc_id + (fi-1)*11) % 256))))) AS BIGINT) AS delta
      |FROM f ORDER BY doc_id, frame_idx""".stripMargin

  /** q81's every-kth frame sampling over the Y4M container — the luma
    * stream is sampled in ONE forward walk (one plane in memory), the
    * shape a 100 TB video corpus needs; same closed-form oracle
    * discipline as q81. */
  private def q400(s: SparkSession, d: String): DataFrame = {
    val gen = udf { (id: Long) =>
      graft.multimodal.Y4m.synthetic(id, (6 + (id % 4) * 2).toInt,
        (4 + (id % 3) * 2).toInt, (3 + id % 20).toInt)
    }
    val media = t(s, d, "documents")
      .select(col("doc_id"), gen(col("doc_id")).as("bytes"))
    Multimodal.sampleVideoFrames(media, "bytes", everyK = 4, maxFrames = 6)
      .select(col("doc_id"), col("n_sampled"),
        element_at(col("frame_sums"), 1).as("first_sum"),
        aggregate(col("frame_sums"), lit(0L), (a, b) => a + b).as("total_sum"))
      .orderBy(col("doc_id"))
  }

  private lazy val q400Sql = // lazy: declared below the `queries` val
    """SELECT doc_id,
      |  LEAST(6, CAST(ceil((3 + doc_id % 20) / 4.0) AS INT)) AS n_sampled,
      |  CAST(list_sum(flatten(list_transform(range(4 + (doc_id % 3)*2), y ->
      |    list_transform(range(6 + (doc_id % 4)*2), x ->
      |      (x * 31 + y * 17 + doc_id) % 256)))) AS BIGINT) AS first_sum,
      |  CAST(list_sum(flatten(list_transform(
      |    range(LEAST(6, CAST(ceil((3 + doc_id % 20) / 4.0) AS INT))), j ->
      |      flatten(list_transform(range(4 + (doc_id % 3)*2), y ->
      |        list_transform(range(6 + (doc_id % 4)*2), x ->
      |          (x * 31 + y * 17 + (4 * j) * 11 + doc_id) % 256)))))) AS BIGINT)
      |    AS total_sum
      |FROM documents ORDER BY doc_id""".stripMargin

  /** q399's scene-delta signal over a THIRD real container: RIFF/AVI
    * via the pure-JDK [[graft.multimodal.Avi]] walker (r18 — retires
    * the "compressed container" residual's plumbing half). The payload
    * is BI_RGB 24bpp — LOSSLESS, so the oracle replays the whole
    * container walk in exact arithmetic: widths 5–8 include strides the
    * 4-byte row padding must skip, and frames are stored BOTTOM-UP, so
    * a walker that misses either drags pad bytes / flips rows and
    * breaks the hash. (The MJPEG/JPEG half of the container rides
    * q420, where decode noise is isolated behind robust cut flags.) */
  private def q419(s: SparkSession, d: String): DataFrame = {
    val gen = udf { (id: Long) =>
      graft.multimodal.Avi.syntheticDib(id, (5 + id % 4).toInt,
        (4 + id % 3).toInt, (2 + id % 4).toInt)
    }
    val media = t(s, d, "documents")
      .select(col("doc_id"), gen(col("doc_id")).as("bytes"))
    graft.multimodal.VideoFeatures.withFrameDeltas(media, "bytes")
      .select(col("doc_id"), col("frame_idx"), col("delta"))
      .orderBy(col("doc_id"), col("frame_idx"))
  }

  private lazy val q419Sql = // lazy: declared below the `queries` val
    """WITH f AS (
      |  SELECT doc_id, unnest(range(1, 2 + doc_id % 4)) AS fi FROM documents)
      |SELECT doc_id, CAST(fi AS INT) AS frame_idx,
      |  CAST(list_sum(flatten(list_transform(range(4 + doc_id % 3), y ->
      |    list_transform(range(5 + doc_id % 4), x ->
      |      abs((x*31 + y*17 + doc_id + fi*11) % 256
      |        - (x*31 + y*17 + doc_id + (fi-1)*11) % 256))))) AS BIGINT) AS delta
      |FROM f ORDER BY doc_id, frame_idx""".stripMargin

  /** Hard-cut detection over REAL MJPEG — every frame chunk is a
    * genuine ImageIO-encoded JPEG, decoded by the stock JPEG reader
    * inside the RIFF walk. JPEG is lossy, so the gate emits
    * DECODE-NOISE-ROBUST output: uniform frames at gray 64/192 decode
    * within ±4 of their input (AviSpec measures it), and the cut flag
    * thresholds the delta at HALF the 128-level gap — the closed form
    * replays the planted cut positions exactly while the pixels
    * themselves stay honestly lossy. A framing bug (pad byte, chunk
    * desync) still breaks the hash: it shifts which frames decode. */
  private def q420(s: SparkSession, d: String): DataFrame = {
    val w = 16; val h = 12
    val gen = udf { (id: Long) =>
      graft.multimodal.Avi.syntheticMjpeg(id, w, h, (6 + id % 6).toInt,
        cutEvery = (3 + id % 3).toInt)
    }
    val media = t(s, d, "documents")
      .select(col("doc_id"), gen(col("doc_id")).as("bytes"))
    graft.multimodal.VideoFeatures.withFrameDeltas(media, "bytes")
      .select(col("doc_id"), col("frame_idx"),
        (col("delta") > lit(w.toLong * h * 64)).as("is_cut"))
      .orderBy(col("doc_id"), col("frame_idx"))
  }

  private lazy val q420Sql = // lazy: declared below the `queries` val
    """WITH f AS (
      |  SELECT doc_id, 3 + doc_id % 3 AS ce,
      |    unnest(range(1, 6 + doc_id % 6)) AS fi
      |  FROM documents)
      |SELECT doc_id, CAST(fi AS INT) AS frame_idx,
      |  ((fi % ce) = (doc_id % ce)) <> (((fi-1) % ce) = (doc_id % ce))
      |    AS is_cut
      |FROM f ORDER BY doc_id, frame_idx""".stripMargin

  /** Frame-level energy + zero-crossing features over REALLY decoded
    * PCM via [[graft.multimodal.AudioFeatures]] (the VAD/silence-trim
    * signals): every doc renders a closed-form WAV, the real
    * javax.sound parse decodes it, and 32-sample frames yield integer
    * Σs² and sign-flip counts — the oracle recomputes both from the
    * generator formula with no audio stack, so a decode or framing bug
    * anywhere breaks the hash. */
  private def q142(s: SparkSession, d: String): DataFrame = {
    val gen = udf { (id: Long) =>
      Multimodal.syntheticWav(id, (8000 + (id % 3) * 4000).toInt, (50 + id % 100).toInt)
    }
    val media = t(s, d, "documents")
      .select(col("doc_id"), gen(col("doc_id")).as("bytes"))
    graft.multimodal.AudioFeatures.withFrameFeatures(media, "bytes", frameLen = 32)
      .select(col("doc_id"), col("frame_idx"), col("energy"), col("crossings"))
      .orderBy(col("doc_id"), col("frame_idx"))
  }

  private lazy val q142Sql = // lazy: declared below the `queries` val
    """WITH s AS (
      |  SELECT doc_id,
      |    list_transform(range(50 + doc_id % 100),
      |      i -> CAST((i*13 + doc_id*7) % 4096 - 2048 AS BIGINT)) AS smp
      |  FROM documents),
      |f AS (
      |  SELECT doc_id, unnest(range(len(smp) // 32)) AS frame_idx, smp
      |  FROM s WHERE len(smp) >= 32)
      |SELECT doc_id, CAST(frame_idx AS INT) AS frame_idx,
      |  CAST(list_sum(list_transform(smp[frame_idx*32+1 : frame_idx*32+32],
      |    x -> x*x)) AS BIGINT) AS energy,
      |  CAST(len(list_filter(range(31), i ->
      |    (smp[frame_idx*32+i+1] >= 0) <> (smp[frame_idx*32+i+2] >= 0)))
      |    AS INT) AS crossings
      |FROM f ORDER BY doc_id, frame_idx""".stripMargin
  /** Frame-to-frame pixel deltas over the REAL multi-frame video
    * decode via [[graft.multimodal.VideoFeatures]] — the scene-change /
    * static-clip signal, computed with two frames in memory per clip.
    * The oracle recomputes every per-pixel absolute difference from
    * the lossless GIF generator formula, so a bug in frame iteration,
    * raster access, or the differencing breaks the hash. */
  private def q143(s: SparkSession, d: String): DataFrame = {
    val gen = udf { (id: Long) =>
      Multimodal.syntheticGif(id, (6 + id % 10).toInt, (4 + (id * 3) % 8).toInt,
        (2 + id % 4).toInt)
    }
    val media = t(s, d, "documents")
      .select(col("doc_id"), gen(col("doc_id")).as("bytes"))
    graft.multimodal.VideoFeatures.withFrameDeltas(media, "bytes")
      .select(col("doc_id"), col("frame_idx"), col("delta"))
      .orderBy(col("doc_id"), col("frame_idx"))
  }

  private lazy val q143Sql = // lazy: declared below the `queries` val
    """WITH f AS (
      |  SELECT doc_id, unnest(range(1, 2 + doc_id % 4)) AS fi FROM documents)
      |SELECT doc_id, CAST(fi AS INT) AS frame_idx,
      |  CAST(list_sum(flatten(list_transform(range(4 + (doc_id*3) % 8), y ->
      |    list_transform(range(6 + doc_id % 10), x ->
      |      abs((x*31 + y*17 + doc_id + fi*11) % 256
      |        - (x*31 + y*17 + doc_id + (fi-1)*11) % 256))))) AS BIGINT) AS delta
      |FROM f ORDER BY doc_id, frame_idx""".stripMargin
  /** Silence-segmentation (VAD utterance cutting) COMPOSED relationally
    * on q142's frame features: non-silent frames (energy ≥ 4·10⁷)
    * sessionize into contiguous runs via the lag→flag→cumsum window
    * (q24's shape), each segment reporting its frame span and total
    * energy — the "cut speech into utterances" preprocessing step,
    * demonstrating that decoded-media features are ordinary relational
    * rows the engine's window machinery composes over. All integers;
    * the oracle replays decode-formula → threshold → segmentation
    * exactly. */
  private def q144(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val gen = udf { (id: Long) =>
      Multimodal.syntheticWav(id, (8000 + (id % 3) * 4000).toInt, (50 + id % 100).toInt)
    }
    val media = t(s, d, "documents")
      .select(col("doc_id"), gen(col("doc_id")).as("bytes"))
    val frames = graft.multimodal.AudioFeatures
      .withFrameFeatures(media, "bytes", frameLen = 32)
      .filter(col("energy") >= 40000000L)
    val w = Window.partitionBy(col("doc_id")).orderBy(col("frame_idx"))
    val run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    frames
      .withColumn("prev", lag(col("frame_idx"), 1).over(w))
      .withColumn("newseg",
        when(col("prev").isNull || col("frame_idx") - col("prev") > 1, 1).otherwise(0))
      .withColumn("seg", sum(col("newseg")).over(run))
      .groupBy(col("doc_id"), col("seg"))
      .agg(min(col("frame_idx")).as("seg_start"),
        max(col("frame_idx")).as("seg_end"),
        count(lit(1)).as("n_frames"),
        sum(col("energy")).as("energy_sum"))
      .orderBy(col("doc_id"), col("seg"))
  }

  private lazy val q144Sql = // lazy: declared below the `queries` val
    """WITH s AS (
      |  SELECT doc_id,
      |    list_transform(range(50 + doc_id % 100),
      |      i -> CAST((i*13 + doc_id*7) % 4096 - 2048 AS BIGINT)) AS smp
      |  FROM documents),
      |f AS (
      |  SELECT doc_id, unnest(range(len(smp) // 32)) AS frame_idx, smp
      |  FROM s WHERE len(smp) >= 32),
      |fe AS (
      |  SELECT doc_id, CAST(frame_idx AS INT) AS frame_idx,
      |    CAST(list_sum(list_transform(smp[frame_idx*32+1 : frame_idx*32+32],
      |      x -> x*x)) AS BIGINT) AS energy
      |  FROM f),
      |nf AS (SELECT * FROM fe WHERE energy >= 40000000),
      |g AS (
      |  SELECT doc_id, frame_idx, energy,
      |    CASE WHEN LAG(frame_idx) OVER w IS NULL
      |           OR frame_idx - LAG(frame_idx) OVER w > 1 THEN 1 ELSE 0 END AS newseg
      |  FROM nf WINDOW w AS (PARTITION BY doc_id ORDER BY frame_idx)),
      |r AS (
      |  SELECT doc_id, frame_idx, energy,
      |    CAST(SUM(newseg) OVER (PARTITION BY doc_id ORDER BY frame_idx
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS seg
      |  FROM g)
      |SELECT doc_id, seg, MIN(frame_idx) AS seg_start, MAX(frame_idx) AS seg_end,
      |  COUNT(*) AS n_frames, CAST(SUM(energy) AS BIGINT) AS energy_sum
      |FROM r GROUP BY doc_id, seg
      |ORDER BY doc_id, seg""".stripMargin
}
