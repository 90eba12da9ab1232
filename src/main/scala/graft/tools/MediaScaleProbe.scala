package graft.tools

import org.apache.spark.sql.functions._

/** Scratch measurement main (not part of the driver contract): decade
  * scaling of the multimodal frame family — container-true frame
  * extraction (MJPEG marker walk / MP4 sample tables / MP3+ADTS sync
  * walks) and the frame-set near-dup join — on synthetic media corpora
  * orders of magnitude past gate scale. The container walks are
  * `mapPartitions` over full payload bytes; this probe is what tells
  * us their ×/decade before a 100 TB deployment does.
  *
  * Two stages per run:
  *  1. `gen`: documents(sfDir).text → one real container per doc
  *     (MJPEG / MP4 / MP3 / ADTS round-robin by doc_id%4), chunks
  *     repeated `repeat`× to inflate per-doc payload — written once to
  *     a parquet media table so the MEASURED stages read bytes from
  *     disk like a real pipeline (not fused with fixture generation).
  *  2. measured: (a) frame extraction counts over all four container
  *     kinds (the decode-side scan); (b) q92-shape video near-dup
  *     (stride-1 frame hashes → set-Jaccard pairs) over the MJPEG+MP4
  *     half, with the measured postings guard enabled; (c) the q95
  *     shape at scale — the video half split 7:1 into corpus/daily
  *     batch, the corpus frame index persisted BUCKETED by frame_phash
  *     ([[graft.operators.Multimodal.writeFrameIndexBucketed]], timed
  *     as the one-time indexing cost), then the incremental near-dup
  *     join of the batch against the persisted index (timed as the
  *     per-ingest cost — this is the number that must be
  *     increment-proportional, not corpus-proportional).
  *
  * Usage: sbt "runMain graft.tools.MediaScaleProbe <sfDir> <workDir>
  *             [repeat] [tau] [incrMaxPostings] [legacy=0]"
  *        (legacy=1 re-measures the retired prebuilt-sets streaming
  *        shape for contrast; off by default — its 34× shuffle number
  *        is already on the r15 ledger)
  */
object MediaScaleProbe {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2,
      "usage: MediaScaleProbe <sfDir> <workDir> [repeat] [tau]")
    val dir = args(0)
    val work = args(1)
    val repeat = if (args.length > 2) args(2).toInt else 1
    val tau = if (args.length > 3) args(3).toDouble else 0.4
    val spark = graft.GraftSession.create("media-scale-probe")
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    import graft.operators.{AudioHeaders, Multimodal, VideoContainers}

    val mediaPath = s"$work/media.parquet"
    val tGen = System.nanoTime()
    graft.Tables.documents(spark, dir)
      .select(col("doc_id"), col("text"))
      .as[(Long, String)]
      .map { case (id, text) =>
        val bytes = text.getBytes("UTF-8")
        val base = (0 until bytes.length / 16).map(f =>
          java.util.Arrays.copyOfRange(bytes, f * 16, f * 16 + 16))
        val chunks = Seq.fill(repeat)(base).flatten
        val payload = (id % 4) match {
          case 0 => VideoContainers.mjpegFixture(8, chunks)
          case 1 => VideoContainers.mp4Fixture((id % 16 + 1).toInt,
            (id % 12 + 1).toInt, 90000L, 3600L, chunks)
          case 2 => AudioHeaders.mp3Fixture(chunks)
          case _ => AudioHeaders.adtsFixture(chunks)
        }
        (id, payload)
      }
      .toDF("doc_id", "media")
      .write.mode("overwrite").parquet(mediaPath)
    val genSec = (System.nanoTime() - tGen) / 1e9
    val media = spark.read.parquet(mediaPath)
    val stats = media.agg(count(lit(1)), sum(length(col("media")))).head
    val (nDocs, payloadBytes) = (stats.getLong(0), stats.getLong(1))
    println(f"""{"stage":"gen","dir":"$dir","docs":$nDocs,"payload_mb":${payloadBytes / 1048576}, "repeat":$repeat,"sec":$genSec%.1f}""")

    // (a) frame extraction across all containers: video walks on the
    // mjpeg/mp4 half, audio walks on the mp3/adts half — one narrow
    // mapPartitions pass each, counts + a checksum so nothing is
    // optimized away
    implicit val s: org.apache.spark.sql.SparkSession = spark
    val video = media.filter(col("doc_id") % 4 < 2)
    val audio = media.filter(col("doc_id") % 4 >= 2)
    val t1 = System.nanoTime()
    val vf = Multimodal.sampleContainerFrames(video, stride = 1).toDF()
      .agg(count(lit(1)), coalesce(sum(col("frame_hash")), lit(0L))).head
    val videoSec = (System.nanoTime() - t1) / 1e9
    val t2 = System.nanoTime()
    val af = Multimodal.sampleAudioFrames(audio, stride = 1).toDF()
      .agg(count(lit(1)), coalesce(sum(col("frame_hash")), lit(0L))).head
    val audioSec = (System.nanoTime() - t2) / 1e9
    println(f"""{"stage":"frames","video_frames":${vf.getLong(0)},"video_sec":$videoSec%.1f,"audio_frames":${af.getLong(0)},"audio_sec":$audioSec%.1f}""")

    // (b) frame-set near-dup over the video half (q92 shape at scale),
    // measured guard on: budget 256 candidates/doc (the dedup-family
    // convention), floor 10^6
    val t3 = System.nanoTime()
    val budget = math.max(256L * nDocs, 1000000L)
    val pairs = Multimodal.videoNearDupPairs(
      Multimodal.videoFramePHashes(video, stride = 1), tau,
      maxCandidatePairs = budget)
    val nPairs = pairs.count()
    val ndSec = (System.nanoTime() - t3) / 1e9
    println(f"""{"stage":"neardup","pairs":$nPairs,"budget":$budget,"sec":$ndSec%.1f}""")
    graft.operators.OperatorCaches.releaseAll()

    // (c) the incremental (q95) shape at scale: corpus = video docs
    // with doc_id % 16 != 0 (walked ONCE into the persisted bucketed
    // index), batch = the doc_id % 16 == 0 slice (~1/8 of the video
    // half — a plausible daily ingest). The measured claim: incr_sec
    // costs what the BATCH walk + postings join cost, independent of
    // corpus payload bytes — the corpus enters only through its slim
    // index rows.
    val incrCut = if (args.length > 4) args(4).toInt else 0
    val corpusMedia = video.filter(col("doc_id") % 16 =!= 0)
    val batchMedia = video.filter(col("doc_id") % 16 === 0)
    val tbl = "media_frame_idx_probe"
    val tIdx = System.nanoTime()
    Multimodal.writeFrameIndexBucketed(
      Multimodal.videoFramePHashes(corpusMedia, stride = 1),
      tbl, buckets = spark.sparkContext.defaultParallelism,
      path = Some(s"$work/$tbl"))
    val idxRows = spark.table(tbl).count()
    val idxSec = (System.nanoTime() - tIdx) / 1e9
    val corpusDocs = corpusMedia.count()
    println(f"""{"stage":"incr_index","corpus_docs":$corpusDocs,"index_rows":$idxRows,"sec":$idxSec%.1f}""")
    val tInc = System.nanoTime()
    val incrPairs = Multimodal.incrementalFrameNearDupPairs(
      Multimodal.videoFramePHashes(batchMedia, stride = 1),
      spark.table(tbl), tau, maxPostings = incrCut)
    val nIncr = incrPairs.count()
    val incSec = (System.nanoTime() - tInc) / 1e9
    val batchDocs = batchMedia.count()
    println(f"""{"stage":"incr","batch_docs":$batchDocs,"pairs":$nIncr,"cut":$incrCut,"sec":$incSec%.1f}""")
    graft.operators.OperatorCaches.releaseAll()

    // (d) the STREAMING ingest shape at scale: the corpus side
    // persisted PRE-EXPLODED + bucketed (the one-time nightly cost —
    // graft.streaming.StreamingMediaNearDup consumes it exchange-free,
    // so in a stream-static join the per-batch corpus cost is a local
    // bucketed scan). Per-micro-batch cost measured at two batch sizes
    // 4x apart — the claim: batch cost tracks the BATCH, the corpus
    // enters only through the scan. The legacy prebuilt-sets shape
    // (the pre-exploded table's predecessor, which re-explodes and
    // re-shuffles the whole corpus per batch) is measured once at the
    // tiny batch for contrast.
    val tblP = "media_frame_postings_probe"
    val tP = System.nanoTime()
    // the NIGHTLY cut (incrCut, arg 5) is baked into the postings
    // build — the streaming path inherits the maintenance job's bound
    // instead of computing its own histogram (the boilerplate-regime
    // contract; pass the cut the stage-b guard derived)
    Multimodal.writeFramePostingsBucketed(
      Multimodal.mediaFramePHashes(corpusMedia, stride = 1),
      tblP, buckets = spark.sparkContext.defaultParallelism,
      path = Some(s"$work/$tblP"), maxPostings = incrCut)
    val pRows = spark.table(tblP).count()
    val pSec = (System.nanoTime() - tP) / 1e9
    println(f"""{"stage":"stream_index","corpus_docs":$corpusDocs,"rows":$pRows,"cut":$incrCut,"sec":$pSec%.1f}""")
    // per-call SHUFFLE WRITE bytes — the number that separates the
    // pre-exploded shape from the legacy one at cluster scale (wall
    // time on one NVMe box hides what crossing a network costs)
    val shuffleBytes = new java.util.concurrent.atomic.AtomicLong()
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onStageCompleted(
            sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit =
          shuffleBytes.addAndGet(
            sc.stageInfo.taskMetrics.shuffleWriteMetrics.bytesWritten)
      })
    def measured(f: => Long): (Long, Double, Long) = {
      Thread.sleep(1000) // drain listener events from prior work
      val before = shuffleBytes.get()
      val t = System.nanoTime()
      val n = f
      val sec = (System.nanoTime() - t) / 1e9
      Thread.sleep(1000)
      (n, sec, shuffleBytes.get() - before)
    }
    for (denom <- Seq(64L, 16L)) {
      // doc_id % 64 == 0 ⊂ % 16 == 0: both disjoint from the corpus
      val batch = video.filter(col("doc_id") % denom === 0)
      val nB = batch.count()
      val (nPair, sSec, sb) = measured(
        graft.streaming.StreamingMediaNearDup
          .mediaNearDupAgainstIndex(batch, spark.table(tblP), tau).count())
      println(f"""{"stage":"stream_batch","denom":$denom,"batch_docs":$nB,"pairs":$nPair,"sec":$sSec%.1f,"shuffle_mb":${sb / 1048576}}""")
    }
    // legacy-shape contrast is OPT-IN (arg 6 = 1): the prebuilt-sets
    // path is ranked test-scale-only in mediaNearDupAgainstIndex (34×
    // the per-batch shuffle, no cut mechanism) — its number is on the
    // ledger (r15: 652 MB vs 19 MB) and default runs shouldn't keep
    // paying to re-measure it. Uncut regime only: on a
    // boilerplate-skewed corpus it would just re-run the unguarded
    // quadratic.
    val legacy = args.length > 5 && args(5) == "1"
    if (legacy && incrCut <= 0) {
      val batchTiny = video.filter(col("doc_id") % 64 === 0)
      val (nLegacy, lSec, lb) = measured(
        graft.streaming.StreamingMediaNearDup
          .mediaNearDupAgainstIndex(batchTiny,
            graft.streaming.StreamingMediaNearDup
              .corpusFrameSets(spark.table(tbl)), tau).count())
      println(f"""{"stage":"stream_batch_legacy","denom":64,"pairs":$nLegacy,"sec":$lSec%.1f,"shuffle_mb":${lb / 1048576}}""")
    }
    spark.stop()
  }
}
