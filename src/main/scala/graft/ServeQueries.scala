package graft

import graft.serve.{QueryType, UsageQueries}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Gate queries for the serving layer, the streaming plan, and the
  * multimodal plumbing — each driven through the REAL engine surface
  * ([[graft.serve.UsageQueries]] / [[graft.streaming.StreamingUsage]] /
  * [[graft.operators.Multimodal]]) on the events-analog usage data,
  * with exact DuckDB oracles.
  *
  * Exactness: the analog fact used here carries `elapsedMs` (BIGINT)
  * as the additive measure so every serving aggregation is integer
  * arithmetic until the final minutes division.
  */
object ServeQueries {

  /** Hour-grain analog fact with integer elapsedMs measure.
    * `private[graft]` so [[ServeFuzz]] fuzzes the same fact the gate
    * queries serve from. */
  private[graft] def analogFact(s: SparkSession, d: String): DataFrame = {
    val at = analog.EventUsage.attempts(Tables.events(s, d))
    graft.usage.HourProration
      .explodeHours(at, col("startMs"), col("finishMs"))
      .groupBy(col("user"), col("hourMs").as("time"), col("cluster"),
        col("excess"), col("taskType"), col("status"))
      .agg(
        sum("started").as("started"),
        sum("finished").as("finished"),
        sum("overlapMs").as("elapsedMs"))
  }

  /** Full dashboard chain: cluster filter → type filter → day buckets
    * (UTC) → per-user densified series over the generated tick spine
    * (`usage_data.rb` §3.2 end-to-end). */
  private def q26(s: SparkSession, d: String): DataFrame = {
    implicit val spark: SparkSession = s
    val fact = analogFact(s, d).cache()
    val (users, lo, hi) = UsageQueries.clusterMeta(fact, "east")
    val qt = QueryType("elapsedTotal", "elapsedMs")
    UsageQueries
      .perUserSeries(fact, "east", users, qt, "DAYS", "UTC", lo, hi,
        bounds = Some((lo, hi)))
      .withColumn("value_min", col("value") / 60000.0)
      .drop("value")
  }

  /** The streaming hour-window aggregation executed as a batch plan
    * (identical plan runs under readStream — T6). */
  private def q27(s: SparkSession, d: String): DataFrame =
    graft.streaming.StreamingUsage.hourlyAgg(
      analog.EventUsage.attempts(Tables.events(s, d)))

  /** Multimodal binary-column pipeline (stub decoder, real plumbing). */
  private def q28(s: SparkSession, d: String): DataFrame =
    graft.operators.Multimodal.documentMediaFeatures(s, d)

  /** Real pixel decode (BMP bytes / deflated+filtered PNG bytes →
    * channel sums) — the content tier above q28's header metadata. */
  private def q75(s: SparkSession, d: String): DataFrame =
    graft.operators.Multimodal.documentPixelStats(s, d)

  /** Video-style frame sampling: each document's UTF-8 bytes as a
    * 16-byte-frame "video", every 4th frame sampled (stub byte-slice
    * decode, real narrow-generate plumbing). */
  private def q45(s: SparkSession, d: String): DataFrame = {
    implicit val spark: SparkSession = s
    val media = Tables.documents(s, d)
      .select(col("doc_id"), col("text").cast("binary").as("media"))
    graft.operators.Multimodal
      .sampleFrames(media, frameBytes = 16, stride = 4).toDF()
  }

  /** Codec-true frame sampling over a REAL container: the document's
    * text chunks wrapped as an MJPEG stream, frame boundaries from the
    * structural marker walk (not fixed-size slicing) — see
    * [[graft.operators.Multimodal.documentVideoFrames]]. */
  private def q89(s: SparkSession, d: String): DataFrame =
    graft.operators.Multimodal.documentVideoFrames(s, d)

  /** MP4 sample-table frame units over a real box tree — see
    * [[graft.operators.Multimodal.documentMp4Frames]]. */
  private def q90(s: SparkSession, d: String): DataFrame =
    graft.operators.Multimodal.documentMp4Frames(s, d)

  /** Frame-level video near-dup: MJPEG frame hashes → per-video frame
    * sets → Jaccard ≥ 0.4 pairs (measured separation on this corpus:
    * duplicate families ≥ 0.8, incidental shared chunks < 0.2) — see
    * [[graft.operators.Multimodal.documentVideoNearDups]]. */
  private def q92(s: SparkSession, d: String): DataFrame =
    graft.operators.Multimodal.documentVideoNearDups(s, d, tau = 0.4)

  /** Codec-true audio frame units: MP3 frame-sync walk (even doc_ids)
    * and ADTS frame-length walk (odd doc_ids) over real fixture
    * streams — see [[graft.operators.Multimodal.documentAudioFrames]]. */
  private def q93(s: SparkSession, d: String): DataFrame =
    graft.operators.Multimodal.documentAudioFrames(s, d)

  /** Frame-level AUDIO near-dup — the q92 composition over the q93
    * codec-true audio fixtures, proving the frame-set Jaccard join is
    * media-agnostic — see
    * [[graft.operators.Multimodal.documentAudioNearDups]]. */
  private def q94(s: SparkSession, d: String): DataFrame =
    graft.operators.Multimodal.documentAudioNearDups(s, d, tau = 0.4)

  /** Incremental frame-set near-dup: the daily-ingest maintenance path
    * — new batch (doc_id % 4 = 0) vs the persisted corpus frame index,
    * corpus payloads never re-walked — see
    * [[graft.operators.Multimodal.documentIncrementalVideoNearDups]]. */
  private def q95(s: SparkSession, d: String): DataFrame =
    graft.operators.Multimodal
      .documentIncrementalVideoNearDups(s, d, tau = 0.4)

  /** The q92 chain through the PRODUCTION guarded entry
    * ([[graft.operators.Multimodal.frameNearDupPairsAuto]], guard
    * always on at 256/doc floor 10⁶): at gate scale the volume fits
    * the floor, so the rows must be bit-identical to q92's — pinning
    * that auto dispatch does not perturb below-budget semantics. */
  private def q96(s: SparkSession, d: String): DataFrame =
    graft.operators.Multimodal.documentVideoNearDupsAuto(s, d, tau = 0.4)

  /** The STREAMING media-ingest plan run statically (the identical
    * plan runs under readStream per micro-batch — T6-style batch
    * parity): new batch (doc_id % 4 = 0) vs the corpus frame index,
    * zero-state exactly-once join — see
    * [[graft.operators.Multimodal.documentStreamingMediaNearDups]]. */
  private def q97(s: SparkSession, d: String): DataFrame =
    graft.operators.Multimodal
      .documentStreamingMediaNearDups(s, d, tau = 0.4)

  /** MIXED-media near-dup through the media-agnostic frame kernel
    * (even doc_ids MJPEG video, odd doc_ids MP3 audio, ONE operator
    * walks both) — the gate entry for the kernel property the mixed
    * streaming index depends on; see
    * [[graft.operators.Multimodal.documentMixedMediaNearDups]]. */
  private def q98(s: SparkSession, d: String): DataFrame =
    graft.operators.Multimodal
      .documentMixedMediaNearDups(s, d, tau = 0.4)

  /** A14/W3 server-side: top-3 users by total + "other" remainder,
    * per daily tick. The fact is cached (the serving layer's
    * in-memory-fact contract, as in q26): topNWithOther scans it
    * twice — once for the winners' totals, once for the final
    * collapse — and without the cache each scan re-runs the whole
    * events→explode→aggregate chain. */
  private def q29(s: SparkSession, d: String): DataFrame = {
    val fact = analogFact(s, d).cache()
    UsageQueries.topNWithOther(fact, "east",
      QueryType("elapsedTotal", "elapsedMs"), "DAYS", "UTC", 3)
      .withColumn("value_min", col("value") / 60000.0)
      .drop("value")
  }

  /** P9 zone-aware Sunday-week rollup (America/New_York). */
  private def q30(s: SparkSession, d: String): DataFrame = {
    val fact = analogFact(s, d)
    fact.groupBy(
      col("cluster"),
      graft.serve.TimeBuckets
        .bucket(col("time"), "WEEKS", "America/New_York").as("week_ms"))
      .agg(sum("elapsedMs").as("elapsed_ms_sum"))
      .withColumn("value_min", col("elapsed_ms_sum") / 60000.0)
      .drop("elapsed_ms_sum")
  }

  /** Gap-based sessionization (30-min inactivity): the event-stream
    * operator a training pipeline needs that the reference lacks. */
  private def q31(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
    graft.operators.Sessionize
      .byWindowFunctions(ev, "user_id", "tsMs", "event_id", 1800000L)
      .groupBy("user_id", "sess_idx")
      .agg(
        count(lit(1)).as("n_events"),
        min("tsMs").as("start_ms"),
        max("tsMs").as("end_ms"),
        sum(col("value").cast("decimal(18,2)")).cast("double")
          .as("total_value"))
  }

  /** Analytic profile: exact distinct counts + interpolated percentiles
    * (Spark `percentile` and DuckDB `quantile_cont` share the linear-
    * interpolation definition on sorted values — bit-identical). */
  private def q34(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .groupBy("event_type")
      .agg(
        countDistinct("user_id").as("n_users"),
        count(lit(1)).as("n_events"),
        expr("percentile(value, 0.5)").as("med_value"),
        expr("percentile(value, 0.95)").as("p95_value"))

  /** The 100 TB form of the q34 profile: sketch-based distincts and
    * percentiles. `approx_count_distinct` (HyperLogLog++, fixed-size
    * sketch vs an exact distinct's full shuffle of the key set) and
    * `approx_percentile` (KLL-style quantile sketch vs a full sort per
    * group) keep the aggregation one bounded-state pass — the variant
    * a dashboard runs when the exact q34 stops being interactive.
    * Engine-specific sketches are not SQL-oracle-reproducible, so this
    * surface is pinned by ServeSpec (tolerance against the exact
    * profile) rather than a gate query. */
  def profileApprox(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .groupBy("event_type")
      .agg(
        approx_count_distinct("user_id", rsd = 0.02).as("n_users_approx"),
        count(lit(1)).as("n_events"),
        expr("approx_percentile(value, 0.5, 10000)").as("med_value_approx"),
        expr("approx_percentile(value, 0.95, 10000)").as("p95_value_approx"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q26_serve_daily"  -> (q26 _),
    "q27_stream_hourly" -> (q27 _),
    "q28_multimodal"   -> (q28 _),
    "q29_serve_topn"   -> (q29 _),
    "q30_week_tz"      -> (q30 _),
    "q31_sessionize"   -> (q31 _),
    "q34_profile"      -> (q34 _),
    "q45_frame_sample" -> (q45 _),
    "q75_pixel_decode" -> (q75 _),
    "q89_mjpeg_frames" -> (q89 _),
    "q90_mp4_frames"   -> (q90 _),
    "q92_video_neardup" -> (q92 _),
    "q93_audio_frames" -> (q93 _),
    "q94_audio_neardup" -> (q94 _),
    "q95_incr_media_neardup" -> (q95 _),
    "q96_media_neardup_auto" -> (q96 _),
    "q97_stream_media_neardup" -> (q97 _),
    "q98_mixed_media_neardup" -> (q98 _))

  /** The q92/q96 shared oracle — frame hashes by the q89 fixture
    * arithmetic, then the video-level Jaccard set join in SQL (see the
    * comment at the map entries). */
  private val videoNearDupOracleSql: String =
    """WITH f AS (
      |  SELECT doc_id, text, length(text) // 16 AS n_frames FROM documents
      |), s AS (
      |  SELECT doc_id, text,
      |         unnest(range(0, greatest(n_frames, 0), 1)) AS frame_idx
      |  FROM f
      |), fh AS (
      |  SELECT doc_id,
      |       list_reduce(list_prepend(CAST(0 AS BIGINT),
      |         [255,216,255,192,0,11,8,0,8,0, 8,
      |          1,1,17,0, 255,218,0,8,1,1,0,0,63,0, 255,0]::BIGINT[]
      |         || list_transform(range(frame_idx*16 + 1, frame_idx*16 + 9),
      |              i -> CAST(unicode(substr(text, i, 1)) AS BIGINT))
      |         || [255,208]::BIGINT[]
      |         || list_transform(range(frame_idx*16 + 9, frame_idx*16 + 17),
      |              i -> CAST(unicode(substr(text, i, 1)) AS BIGINT))
      |         || [255,217]::BIGINT[]),
      |         (acc, c) -> (acc * 31 + c) % 1000000007) AS h
      |  FROM s
      |), sets AS (
      |  SELECT DISTINCT doc_id, h FROM fh
      |), sizes AS (
      |  SELECT doc_id, count(*) AS n FROM sets GROUP BY doc_id
      |), pairs AS (
      |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS shared
      |  FROM sets a JOIN sets b ON a.h = b.h AND a.doc_id < b.doc_id
      |  GROUP BY 1, 2
      |)
      |SELECT p.doc_a, p.doc_b, p.shared,
      |       CAST(p.shared AS DOUBLE) /
      |         CAST(sa.n + sb.n - p.shared AS DOUBLE) AS jaccard
      |FROM pairs p
      |JOIN sizes sa ON sa.doc_id = p.doc_a
      |JOIN sizes sb ON sb.doc_id = p.doc_b
      |WHERE CAST(p.shared AS DOUBLE) /
      |        CAST(sa.n + sb.n - p.shared AS DOUBLE) >= 0.4""".stripMargin

  val oracles: Map[String, String] = Map(
    "q75_pixel_decode" ->
      // The oracle never decodes: it recomputes the channel sums from
      // the SAME (doc_id, x, y) arithmetic rule the fixture pixels were
      // generated from. The Spark side must recover those exact pixels
      // from real BMP/PNG file bytes (deflate, scanline filters, row
      // order, BGR, padding) for the hashes to match.
      """WITH dims AS (
        |  SELECT doc_id, doc_id % 16 + 1 AS w, doc_id % 12 + 1 AS h,
        |         CASE WHEN doc_id % 2 = 0 THEN 'bmp' ELSE 'png' END AS format
        |  FROM documents
        |), px AS (
        |  SELECT d.doc_id, d.format, d.w, d.h, y.y, x.x
        |  FROM dims d,
        |       LATERAL (SELECT unnest(range(0, d.h)) AS y) y,
        |       LATERAL (SELECT unnest(range(0, d.w)) AS x) x
        |), sums AS (
        |  SELECT doc_id, format, w, h,
        |         CAST(SUM((doc_id*3 + x*5 + y*7) % 256) AS BIGINT) AS sum_r,
        |         CAST(SUM((doc_id*11 + x*13 + y*17) % 256) AS BIGINT) AS sum_g,
        |         CAST(SUM((doc_id*19 + x*23 + y*29) % 256) AS BIGINT) AS sum_b
        |  FROM px GROUP BY 1, 2, 3, 4
        |)
        |SELECT doc_id, format,
        |       CAST(w AS INTEGER) AS width, CAST(h AS INTEGER) AS height,
        |       CAST(w * h AS BIGINT) AS n_px, sum_r, sum_g, sum_b,
        |       CAST(sum_r AS DOUBLE) / (w * h) AS mean_r,
        |       CAST(sum_g AS DOUBLE) / (w * h) AS mean_g,
        |       CAST(sum_b AS DOUBLE) / (w * h) AS mean_b
        |FROM sums""".stripMargin,
    "q45_frame_sample" ->
      // ASCII corpus: UTF-8 byte == codepoint, so the byte-fold frame
      // hash is reproducible from substr/unicode arithmetic
      """WITH f AS (
        |  SELECT doc_id, text, length(text) // 16 AS n_frames FROM documents
        |), s AS (
        |  SELECT doc_id, text, unnest(range(0, greatest(n_frames, 0), 4)) AS frame_idx
        |  FROM f
        |)
        |SELECT doc_id,
        |       CAST(frame_idx AS BIGINT) AS frame_idx,
        |       CAST(frame_idx * 16 AS BIGINT) AS byte_off,
        |       CAST(16 AS BIGINT) AS n_bytes,
        |       list_reduce(list_prepend(CAST(0 AS BIGINT),
        |         list_transform(range(frame_idx*16 + 1, frame_idx*16 + 17),
        |           i -> CAST(unicode(substr(text, i, 1)) AS BIGINT))),
        |         (acc, c) -> (acc * 31 + c) % 1000000007) AS frame_hash
        |FROM s""".stripMargin,
    "q89_mjpeg_frames" ->
      // The oracle never parses JPEG: it recomputes the 47-byte frame
      // layout the MJPEG fixture was built from (VideoContainers
      // .mjpegFixture) — constant header with the doc-dependent SOF
      // width byte, stuffed 0xFF00, RST0 between the two 8-byte text
      // halves, EOI — and byte-folds the whole frame. The Spark side
      // must recover those exact frame boundaries, widths and bytes
      // from the real container structure for the hashes to match.
      // ASCII corpus: UTF-8 byte == codepoint.
      """WITH f AS (
        |  SELECT doc_id, text, length(text) // 16 AS n_frames FROM documents
        |), s AS (
        |  SELECT doc_id, text,
        |         unnest(range(0, greatest(n_frames, 0), 4)) AS frame_idx
        |  FROM f
        |)
        |SELECT doc_id,
        |       CAST(frame_idx AS BIGINT) AS frame_idx,
        |       CAST(frame_idx * 47 AS BIGINT) AS byte_off,
        |       CAST(47 AS BIGINT) AS n_bytes,
        |       CAST(frame_idx AS BIGINT) AS time_ticks,
        |       CAST(doc_id % 16 + 1 AS INTEGER) AS width,
        |       list_reduce(list_prepend(CAST(0 AS BIGINT),
        |         [255,216,255,192,0,11,8,0,8,0, doc_id % 16 + 1,
        |          1,1,17,0, 255,218,0,8,1,1,0,0,63,0, 255,0]::BIGINT[]
        |         || list_transform(range(frame_idx*16 + 1, frame_idx*16 + 9),
        |              i -> CAST(unicode(substr(text, i, 1)) AS BIGINT))
        |         || [255,208]::BIGINT[]
        |         || list_transform(range(frame_idx*16 + 9, frame_idx*16 + 17),
        |              i -> CAST(unicode(substr(text, i, 1)) AS BIGINT))
        |         || [255,217]::BIGINT[]),
        |         (acc, c) -> (acc * 31 + c) % 1000000007) AS frame_hash
        |FROM s""".stripMargin,
    "q93_audio_frames" ->
      // The oracle never parses MPEG audio: it recomputes each
      // fixture's frame layout — MP3 (even ids): 288-byte frames of
      // [FF FB 74 00] + chunk + 268 zeros (V1 L3, 96 kbps / 48 kHz →
      // exact length, the header's own 144·bitrate/rate arithmetic);
      // ADTS (odd ids): 23-byte frames of the 7-byte header (length
      // field = 23 spread over bytes 3–5) + chunk — and byte-folds the
      // whole frame. The Spark side must recover those boundaries from
      // the real sync words + header length fields to match.
      """WITH f AS (
        |  SELECT doc_id, text, length(text) // 16 AS n_frames FROM documents
        |), s AS (
        |  SELECT doc_id, text,
        |         unnest(range(0, greatest(n_frames, 0), 4)) AS frame_idx
        |  FROM f
        |)
        |SELECT doc_id,
        |       CASE WHEN doc_id % 2 = 0 THEN 'mp3' ELSE 'adts' END AS container,
        |       CAST(frame_idx AS BIGINT) AS frame_idx,
        |       CAST(frame_idx * (CASE WHEN doc_id % 2 = 0 THEN 288 ELSE 23 END)
        |            AS BIGINT) AS byte_off,
        |       CAST(CASE WHEN doc_id % 2 = 0 THEN 288 ELSE 23 END
        |            AS BIGINT) AS n_bytes,
        |       CAST(CASE WHEN doc_id % 2 = 0 THEN 1152 ELSE 1024 END
        |            AS INTEGER) AS samples,
        |       CAST(48000 AS INTEGER) AS sample_rate,
        |       list_reduce(list_prepend(CAST(0 AS BIGINT),
        |         (CASE WHEN doc_id % 2 = 0
        |               THEN [255,251,116,0]::BIGINT[]
        |               ELSE [255,241,76,128,2,255,252]::BIGINT[] END)
        |         || list_transform(range(frame_idx*16 + 1, frame_idx*16 + 17),
        |              i -> CAST(unicode(substr(text, i, 1)) AS BIGINT))
        |         || (CASE WHEN doc_id % 2 = 0
        |                  THEN list_transform(range(0, 268), x -> CAST(0 AS BIGINT))
        |                  ELSE []::BIGINT[] END)),
        |         (acc, c) -> (acc * 31 + c) % 1000000007) AS frame_hash
        |FROM s""".stripMargin,
    // Frame hashes by the q89 fixture arithmetic (constant SOF width
    // 8 — frame identity depends on chunk content alone), then the
    // video-level Jaccard join: distinct frame-hash sets, inverted-
    // index pairing on the hash, shared/(|A|+|B|−shared) ≥ 0.4. The
    // Spark side must recover identical frame bytes from the real
    // MJPEG containers AND reproduce the set join for the pair list
    // to hash-match. SHARED by q92 (raw operator) and q96 (the
    // guarded production entry) — at gate scale the guard's budget
    // floor exceeds the candidate volume, so both must equal this.
    "q92_video_neardup" -> videoNearDupOracleSql,
    "q96_media_neardup_auto" -> videoNearDupOracleSql,
    "q97_stream_media_neardup" ->
      // q95's batch×corpus leg alone (the streaming contract emits
      // only stream-vs-corpus pairs): same fixture frame-hash
      // arithmetic, the q95 split, Jaccard over full per-doc distinct
      // sets. The streaming plan must reproduce all of it through its
      // zero-state shape (per-payload sets, min-shared-hash
      // exactly-once, array_intersect measures) to hash-match.
      """WITH f AS (
        |  SELECT doc_id, text, length(text) // 16 AS n_frames FROM documents
        |), s AS (
        |  SELECT doc_id, text,
        |         unnest(range(0, greatest(n_frames, 0), 1)) AS frame_idx
        |  FROM f
        |), fh AS (
        |  SELECT doc_id,
        |       list_reduce(list_prepend(CAST(0 AS BIGINT),
        |         [255,216,255,192,0,11,8,0,8,0, 8,
        |          1,1,17,0, 255,218,0,8,1,1,0,0,63,0, 255,0]::BIGINT[]
        |         || list_transform(range(frame_idx*16 + 1, frame_idx*16 + 9),
        |              i -> CAST(unicode(substr(text, i, 1)) AS BIGINT))
        |         || [255,208]::BIGINT[]
        |         || list_transform(range(frame_idx*16 + 9, frame_idx*16 + 17),
        |              i -> CAST(unicode(substr(text, i, 1)) AS BIGINT))
        |         || [255,217]::BIGINT[]),
        |         (acc, c) -> (acc * 31 + c) % 1000000007) AS h
        |  FROM s
        |), sets AS (
        |  SELECT DISTINCT doc_id, h FROM fh
        |), sizes AS (
        |  SELECT doc_id, count(*) AS n FROM sets GROUP BY doc_id
        |), newb AS (
        |  SELECT * FROM sets WHERE doc_id % 4 = 0
        |), corpus AS (
        |  SELECT * FROM sets WHERE doc_id % 4 <> 0
        |), up AS (
        |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS shared
        |  FROM newb a JOIN corpus b ON a.h = b.h
        |  GROUP BY 1, 2
        |)
        |SELECT p.doc_a, p.doc_b, p.shared,
        |       CAST(p.shared AS DOUBLE) /
        |         CAST(sa.n + sb.n - p.shared AS DOUBLE) AS jaccard
        |FROM up p
        |JOIN sizes sa ON sa.doc_id = p.doc_a
        |JOIN sizes sb ON sb.doc_id = p.doc_b
        |WHERE CAST(p.shared AS DOUBLE) /
        |        CAST(sa.n + sb.n - p.shared AS DOUBLE) >= 0.4""".stripMargin,
    "q98_mixed_media_neardup" ->
      // Per-parity frame fold — the MIXED corpus: even doc_ids take the
      // q89/q92 MJPEG frame layout (47-byte frames: constant header
      // with SOF width 8, stuffed 0xFF00, RST0 between the two 8-byte
      // chunk halves, EOI), odd doc_ids the q93/q94 MP3 frame layout
      // (288-byte frames: [FF FB 74 00] + chunk + 268 zeros) — then the
      // SAME inverted-index Jaccard set join. The Spark side must
      // resolve each payload's container PER ROW (the media-agnostic
      // kernel), walk real markers/sync words on both, and reproduce
      // the set join for the pair list to hash-match; a video-only
      // kernel would hash the MP3 half through the fixed-size fallback
      // and miss/corrupt every audio pair.
      """WITH f AS (
        |  SELECT doc_id, text, length(text) // 16 AS n_frames FROM documents
        |), s AS (
        |  SELECT doc_id, text,
        |         unnest(range(0, greatest(n_frames, 0), 1)) AS frame_idx
        |  FROM f
        |), fh AS (
        |  SELECT doc_id,
        |       list_reduce(list_prepend(CAST(0 AS BIGINT),
        |         CASE WHEN doc_id % 2 = 0 THEN
        |           [255,216,255,192,0,11,8,0,8,0, 8,
        |            1,1,17,0, 255,218,0,8,1,1,0,0,63,0, 255,0]::BIGINT[]
        |           || list_transform(range(frame_idx*16 + 1, frame_idx*16 + 9),
        |                i -> CAST(unicode(substr(text, i, 1)) AS BIGINT))
        |           || [255,208]::BIGINT[]
        |           || list_transform(range(frame_idx*16 + 9, frame_idx*16 + 17),
        |                i -> CAST(unicode(substr(text, i, 1)) AS BIGINT))
        |           || [255,217]::BIGINT[]
        |         ELSE
        |           [255,251,116,0]::BIGINT[]
        |           || list_transform(range(frame_idx*16 + 1, frame_idx*16 + 17),
        |                i -> CAST(unicode(substr(text, i, 1)) AS BIGINT))
        |           || list_transform(range(0, 268), x -> CAST(0 AS BIGINT))
        |         END),
        |         (acc, c) -> (acc * 31 + c) % 1000000007) AS h
        |  FROM s
        |), sets AS (
        |  SELECT DISTINCT doc_id, h FROM fh
        |), sizes AS (
        |  SELECT doc_id, count(*) AS n FROM sets GROUP BY doc_id
        |), pairs AS (
        |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS shared
        |  FROM sets a JOIN sets b ON a.h = b.h AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2
        |)
        |SELECT p.doc_a, p.doc_b, p.shared,
        |       CAST(p.shared AS DOUBLE) /
        |         CAST(sa.n + sb.n - p.shared AS DOUBLE) AS jaccard
        |FROM pairs p
        |JOIN sizes sa ON sa.doc_id = p.doc_a
        |JOIN sizes sb ON sb.doc_id = p.doc_b
        |WHERE CAST(p.shared AS DOUBLE) /
        |        CAST(sa.n + sb.n - p.shared AS DOUBLE) >= 0.4""".stripMargin,
    "q94_audio_neardup" ->
      // Frame hashes by the q93 fixture arithmetic — per-parity fold
      // (even ids: the 288-byte MP3 frame [FF FB 74 00]+chunk+268·00,
      // odd: the 23-byte ADTS frame header+chunk) at stride 1 — then
      // the SAME inverted-index Jaccard join as q92. Cross-parity
      // family members share no frame bytes (different containers), so
      // pairs form within a container only; the Spark side must walk
      // real sync words AND reproduce the set join to hash-match.
      """WITH f AS (
        |  SELECT doc_id, text, length(text) // 16 AS n_frames FROM documents
        |), s AS (
        |  SELECT doc_id, text,
        |         unnest(range(0, greatest(n_frames, 0), 1)) AS frame_idx
        |  FROM f
        |), fh AS (
        |  SELECT doc_id,
        |       list_reduce(list_prepend(CAST(0 AS BIGINT),
        |         (CASE WHEN doc_id % 2 = 0
        |               THEN [255,251,116,0]::BIGINT[]
        |               ELSE [255,241,76,128,2,255,252]::BIGINT[] END)
        |         || list_transform(range(frame_idx*16 + 1, frame_idx*16 + 17),
        |              i -> CAST(unicode(substr(text, i, 1)) AS BIGINT))
        |         || (CASE WHEN doc_id % 2 = 0
        |                  THEN list_transform(range(0, 268), x -> CAST(0 AS BIGINT))
        |                  ELSE []::BIGINT[] END)),
        |         (acc, c) -> (acc * 31 + c) % 1000000007) AS h
        |  FROM s
        |), sets AS (
        |  SELECT DISTINCT doc_id, h FROM fh
        |), sizes AS (
        |  SELECT doc_id, count(*) AS n FROM sets GROUP BY doc_id
        |), pairs AS (
        |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS shared
        |  FROM sets a JOIN sets b ON a.h = b.h AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2
        |)
        |SELECT p.doc_a, p.doc_b, p.shared,
        |       CAST(p.shared AS DOUBLE) /
        |         CAST(sa.n + sb.n - p.shared AS DOUBLE) AS jaccard
        |FROM pairs p
        |JOIN sizes sa ON sa.doc_id = p.doc_a
        |JOIN sizes sb ON sb.doc_id = p.doc_b
        |WHERE CAST(p.shared AS DOUBLE) /
        |        CAST(sa.n + sb.n - p.shared AS DOUBLE) >= 0.4""".stripMargin,
    "q95_incr_media_neardup" ->
      // Frame hashes by the q92 fixture arithmetic, then the
      // INCREMENTAL split: docs with doc_id % 4 = 0 are the new batch,
      // the rest the persisted corpus index; batch×corpus pairs carry
      // vs_corpus = true (no doc_a < doc_b — doc_a is always the new
      // doc), batch×batch pairs are doc_a < doc_b with vs_corpus =
      // false. Set sizes are per-doc over the full distinct frame set
      // (each doc lives in exactly one split), Jaccard ≥ 0.4.
      """WITH f AS (
        |  SELECT doc_id, text, length(text) // 16 AS n_frames FROM documents
        |), s AS (
        |  SELECT doc_id, text,
        |         unnest(range(0, greatest(n_frames, 0), 1)) AS frame_idx
        |  FROM f
        |), fh AS (
        |  SELECT doc_id,
        |       list_reduce(list_prepend(CAST(0 AS BIGINT),
        |         [255,216,255,192,0,11,8,0,8,0, 8,
        |          1,1,17,0, 255,218,0,8,1,1,0,0,63,0, 255,0]::BIGINT[]
        |         || list_transform(range(frame_idx*16 + 1, frame_idx*16 + 9),
        |              i -> CAST(unicode(substr(text, i, 1)) AS BIGINT))
        |         || [255,208]::BIGINT[]
        |         || list_transform(range(frame_idx*16 + 9, frame_idx*16 + 17),
        |              i -> CAST(unicode(substr(text, i, 1)) AS BIGINT))
        |         || [255,217]::BIGINT[]),
        |         (acc, c) -> (acc * 31 + c) % 1000000007) AS h
        |  FROM s
        |), sets AS (
        |  SELECT DISTINCT doc_id, h FROM fh
        |), sizes AS (
        |  SELECT doc_id, count(*) AS n FROM sets GROUP BY doc_id
        |), newb AS (
        |  SELECT * FROM sets WHERE doc_id % 4 = 0
        |), corpus AS (
        |  SELECT * FROM sets WHERE doc_id % 4 <> 0
        |), up AS (
        |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS shared,
        |         TRUE AS vs_corpus
        |  FROM newb a JOIN corpus b ON a.h = b.h
        |  GROUP BY 1, 2
        |  UNION ALL
        |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS shared,
        |         FALSE AS vs_corpus
        |  FROM newb a JOIN newb b ON a.h = b.h AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2
        |)
        |SELECT p.doc_a, p.doc_b, p.shared,
        |       CAST(p.shared AS DOUBLE) /
        |         CAST(sa.n + sb.n - p.shared AS DOUBLE) AS jaccard,
        |       p.vs_corpus
        |FROM up p
        |JOIN sizes sa ON sa.doc_id = p.doc_a
        |JOIN sizes sb ON sb.doc_id = p.doc_b
        |WHERE CAST(p.shared AS DOUBLE) /
        |        CAST(sa.n + sb.n - p.shared AS DOUBLE) >= 0.4""".stripMargin,
    "q90_mp4_frames" ->
      // The oracle reproduces the mp4Fixture arithmetic: uniform
      // 16-byte samples at a constant data offset (moov size is
      // sample-count-independent by construction), decode time
      // 3600·idx, tkhd dims from doc_id, hash = byte fold of the
      // sample (the mdat slice IS the text chunk). The Spark side must
      // recover all of it from the real box tree + stsz/stsc/stco/stts
      // expansion for the hashes to match.
      s"""WITH f AS (
         |  SELECT doc_id, text, length(text) // 16 AS n_frames FROM documents
         |), s AS (
         |  SELECT doc_id, text,
         |         unnest(range(0, greatest(n_frames, 0), 4)) AS frame_idx
         |  FROM f
         |)
         |SELECT doc_id,
         |       CAST(frame_idx AS BIGINT) AS frame_idx,
         |       CAST(${graft.operators.VideoContainers.mp4FixtureDataOff}
         |            + frame_idx * 16 AS BIGINT) AS byte_off,
         |       CAST(16 AS BIGINT) AS n_bytes,
         |       CAST(frame_idx * 3600 AS BIGINT) AS time_ticks,
         |       CAST(doc_id % 16 + 1 AS INTEGER) AS width,
         |       CAST(doc_id % 12 + 1 AS INTEGER) AS height,
         |       list_reduce(list_prepend(CAST(0 AS BIGINT),
         |         list_transform(range(frame_idx*16 + 1, frame_idx*16 + 17),
         |           i -> CAST(unicode(substr(text, i, 1)) AS BIGINT))),
         |         (acc, c) -> (acc * 31 + c) % 1000000007) AS frame_hash
         |FROM s""".stripMargin,
    "q34_profile" ->
      """SELECT event_type,
        |       COUNT(DISTINCT user_id) AS n_users,
        |       COUNT(*) AS n_events,
        |       quantile_cont(value, 0.5) AS med_value,
        |       quantile_cont(value, 0.95) AS p95_value
        |FROM events GROUP BY event_type""".stripMargin,
    "q26_serve_daily" ->
      s"""WITH ${SparkEntry.attemptsCte}, ${SparkEntry.explodedCte},
         |fact AS (
         |  SELECT "user", cluster, hourMs,
         |         CAST(SUM(overlapMs) AS BIGINT) AS elapsedMs
         |  FROM hours
         |  GROUP BY 1, 2, 3
         |), east AS (
         |  SELECT * FROM fact WHERE cluster = 'east'
         |), bounds AS (
         |  SELECT MIN(hourMs) AS lo, MAX(hourMs) AS hi FROM east
         |), spine AS (
         |  SELECT unnest(generate_series(
         |           ((SELECT lo FROM bounds) // 86400000 + 1) * 86400000,
         |           ((SELECT hi FROM bounds) // 86400000 - 1) * 86400000,
         |           86400000)) AS tick
         |), grid AS (
         |  SELECT u."user", s.tick
         |  FROM (SELECT DISTINCT "user" FROM east) u CROSS JOIN spine s
         |), daily AS (
         |  SELECT "user", (hourMs // 86400000) * 86400000 AS tick,
         |         CAST(SUM(elapsedMs) AS BIGINT) AS v
         |  FROM east GROUP BY 1, 2
         |)
         |SELECT g."user", g.tick, COALESCE(d.v, 0) / 60000.0 AS value_min
         |FROM grid g LEFT JOIN daily d
         |  ON g."user" = d."user" AND g.tick = d.tick""".stripMargin,
    "q27_stream_hourly" ->
      s"""WITH ${SparkEntry.attemptsCte}, ${SparkEntry.explodedCte}
         |SELECT "user", cluster, excess, taskType, status,
         |       CAST(SUM(started) AS BIGINT) AS started,
         |       CAST(SUM(finished) AS BIGINT) AS finished,
         |       CAST(SUM(overlapMs) AS BIGINT) / 60000.0 AS elapsedMinutes,
         |       hourMs AS time
         |FROM hours
         |GROUP BY "user", cluster, excess, taskType, status, hourMs""".stripMargin,
    "q29_serve_topn" ->
      s"""WITH ${SparkEntry.attemptsCte}, ${SparkEntry.explodedCte},
         |daily AS (
         |  SELECT "user", (hourMs // 86400000) * 86400000 AS tick,
         |         CAST(SUM(overlapMs) AS BIGINT) AS v
         |  FROM hours WHERE cluster = 'east'
         |  GROUP BY 1, 2
         |), totals AS (
         |  SELECT "user", CAST(SUM(v) AS BIGINT) AS total FROM daily GROUP BY 1
         |), ranked AS (
         |  SELECT "user",
         |         row_number() OVER (ORDER BY total DESC, "user") AS rk
         |  FROM totals
         |)
         |SELECT CASE WHEN r.rk <= 3 THEN d."user" ELSE 'other' END AS who,
         |       d.tick,
         |       CAST(SUM(d.v) AS BIGINT) / 60000.0 AS value_min
         |FROM daily d JOIN ranked r ON d."user" = r."user"
         |GROUP BY 1, 2""".stripMargin,
    "q30_week_tz" ->
      s"""WITH ${SparkEntry.attemptsCte}, ${SparkEntry.explodedCte},
         |fact AS (
         |  SELECT cluster, hourMs,
         |         CAST(SUM(overlapMs) AS BIGINT) AS elapsedMs
         |  FROM hours GROUP BY 1, 2
         |)
         |SELECT cluster,
         |       epoch_ms(timezone('America/New_York',
         |         CAST(date_trunc('week',
         |                CAST(timezone('America/New_York',
         |                       epoch_ms(hourMs)::TIMESTAMPTZ) AS DATE) + 1) - 1
         |              AS TIMESTAMP))) AS week_ms,
         |       CAST(SUM(elapsedMs) AS BIGINT) / 60000.0 AS value_min
         |FROM fact
         |GROUP BY 1, 2""".stripMargin,
    "q31_sessionize" ->
      """WITH marked AS (
        |  SELECT user_id, event_id, value,
        |         epoch_ms(ts) AS tsMs,
        |         CASE WHEN lag(epoch_ms(ts)) OVER w IS NULL THEN 1
        |              WHEN epoch_ms(ts) - lag(epoch_ms(ts)) OVER w > 1800000 THEN 1
        |              ELSE 0 END AS new_sess
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY epoch_ms(ts), event_id)
        |), sessions AS (
        |  SELECT *,
        |         CAST(SUM(new_sess) OVER (PARTITION BY user_id
        |           ORDER BY tsMs, event_id
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS sess_idx
        |  FROM marked
        |)
        |SELECT user_id, sess_idx,
        |       COUNT(*) AS n_events,
        |       MIN(tsMs) AS start_ms,
        |       MAX(tsMs) AS end_ms,
        |       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
        |FROM sessions
        |GROUP BY user_id, sess_idx""".stripMargin,
    "q28_multimodal" ->
      // arithmetic mirror of ImageHeaders.pngFixture/jpegFixture byte
      // layout (33-/15-byte headers; w,h < 2^16 so the u32/u16 encodings
      // reduce to [0,0,w//256,w%256] / [w//256,w%256]); content_hash is
      // the byte fold over header ++ UTF-8 payload (ASCII corpus:
      // codepoint == byte)
      """WITH m AS (
        |  SELECT doc_id, text,
        |         doc_id % 1024 + 1 AS w,
        |         doc_id % 768 + 1 AS h,
        |         list_transform(range(1, length(text)+1),
        |           i -> CAST(unicode(substr(text,i,1)) AS BIGINT)) AS payload
        |  FROM documents
        |), built AS (
        |  SELECT doc_id, w, h,
        |         CASE WHEN doc_id % 3 = 0 THEN 'png'
        |              WHEN doc_id % 3 = 1 THEN 'jpeg'
        |              ELSE 'unknown' END AS format,
        |         CASE WHEN doc_id % 3 = 0 THEN list_concat(
        |                [CAST(137 AS BIGINT),80,78,71,13,10,26,10, 0,0,0,13, 73,72,68,82,
        |                 0,0, w//256, w%256, 0,0, h//256, h%256, 8,2,0,0,0, 0,0,0,0], payload)
        |              WHEN doc_id % 3 = 1 THEN list_concat(
        |                [CAST(255 AS BIGINT),216,255,192,0,11,8, h//256, h%256, w//256, w%256, 1,1,17,0], payload)
        |              ELSE payload END AS bytes
        |  FROM m
        |), hashed AS (
        |  SELECT doc_id, format, w, h,
        |         CAST(len(bytes) AS BIGINT) AS n_bytes,
        |         list_reduce(list_prepend(CAST(0 AS BIGINT), bytes),
        |           (acc, c) -> (acc * 31 + c) % 1000000007) AS content_hash
        |  FROM built
        |)
        |SELECT doc_id, format, n_bytes, content_hash,
        |       CAST(CASE WHEN format = 'unknown' THEN content_hash % 640 ELSE w END AS INTEGER) AS width,
        |       CAST(CASE WHEN format = 'unknown' THEN content_hash % 480 ELSE h END AS INTEGER) AS height
        |FROM hashed""".stripMargin)
}
