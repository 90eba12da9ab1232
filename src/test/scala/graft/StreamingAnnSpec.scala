package graft

import graft.operators.{IvfCentroids, Similarity}
import java.nio.file.Files
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Streaming ANN: query vectors arriving in micro-batches are searched
  * against a STATIC IVF index via foreachBatch — the engine's real
  * mechanism for batch-semantics-per-micro-batch (the same mapping
  * SURVEY gives T2's ledger reconcile). Each batch assigns only the
  * arriving queries (per-vector arithmetic against the pinned
  * centroids); the corpus index is built once and never rescanned.
  * Accumulated stream results must equal the one-shot batch search. */
class StreamingAnnSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  test("micro-batched query stream equals the one-shot batch search") {
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.001")
    val corpus = emb.filter($"vec_id" >= 40)
    val queries = emb.filter($"vec_id" < 40)
    val pinned = scala.collection.mutable.ListBuffer.empty[DataFrame]
    val staticIdx = Similarity.buildIvfIndex(
      corpus, IvfCentroids.Centroids16, nProbe = 2, pinned += _)

    // batch reference: all queries at once
    val batchRes = Similarity.ivfSearchAgainst(
      Similarity.buildIvfIndex(queries, IvfCentroids.Centroids16, 2, pinned += _),
      staticIdx, nProbe = 2, k = 3)
      .select("query_id", "neighbor_id", "rank")
      .as[(Long, Long, Int)].collect().toSet

    // stream: the same queries split across two micro-batch files
    val in = Files.createTempDirectory("ann_in")
    val ckpt = Files.createTempDirectory("ann_ck")
    queries.filter($"vec_id" < 20)
      .write.parquet(in.toString + "/b1")
    val streamed = scala.collection.mutable.Set.empty[(Long, Long, Int)]
    val stream = spark.readStream
      .schema(queries.schema)
      .option("path", in.toString + "/*")
      .format("parquet").load()
    val q = stream.writeStream
      .option("checkpointLocation", ckpt.toString)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        if (!batch.isEmpty) {
          val bp = scala.collection.mutable.ListBuffer.empty[DataFrame]
          val res = Similarity.ivfSearchAgainst(
            Similarity.buildIvfIndex(batch, IvfCentroids.Centroids16, 2, bp += _),
            staticIdx, nProbe = 2, k = 3)
            .select("query_id", "neighbor_id", "rank")
            .as[(Long, Long, Int)].collect()
          streamed.synchronized { streamed ++= res }
          bp.foreach(_.unpersist())
        }
        ()
      }
      .start()
    try {
      q.processAllAvailable()
      queries.filter($"vec_id" >= 20)
        .write.parquet(in.toString + "/b2")
      q.processAllAvailable()
    } finally q.stop()
    pinned.foreach(_.unpersist())

    assert(streamed.toSet == batchRes,
      s"stream ${streamed.size} vs batch ${batchRes.size}")
    assert(batchRes.nonEmpty)
  }

  test("micro-batched ADC query stream equals the one-shot batch search") {
    import graft.operators.PqCodebooks
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.001")
    val corpus = emb.filter($"vec_id" >= 40)
    val queries = emb.filter($"vec_id" < 40)
      .select($"vec_id".as("query_id"), $"embedding")
    val (cents, cbs) = (IvfCentroids.Centroids16, PqCodebooks.Codebooks8x16)
    // the slim compressed index is built once (the persisted-artifact
    // stand-in) — micro-batches only build their m×k distance tables
    val staticIdx = Similarity.buildAdcIndex(corpus, cents, cbs, 8).cache()
    staticIdx.count()

    val batchRes = Similarity.ivfAdcSearchAgainst(queries, staticIdx,
        cents, cbs, dsub = 8, nProbe = 4, k = 3, rerank = 10,
        rawVectors = Some(corpus))
      .select("query_id", "neighbor_id", "rank")
      .as[(Long, Long, Int)].collect().toSet

    val in = Files.createTempDirectory("adc_in")
    val ckpt = Files.createTempDirectory("adc_ck")
    queries.filter($"query_id" < 20).write.parquet(in.toString + "/b1")
    val streamed = scala.collection.mutable.Set.empty[(Long, Long, Int)]
    val stream = spark.readStream
      .schema(queries.schema)
      .option("path", in.toString + "/*")
      .format("parquet").load()
    val q = stream.writeStream
      .option("checkpointLocation", ckpt.toString)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        if (!batch.isEmpty) {
          val res = Similarity.ivfAdcSearchAgainst(batch, staticIdx,
              cents, cbs, dsub = 8, nProbe = 4, k = 3, rerank = 10,
              rawVectors = Some(corpus))
            .select("query_id", "neighbor_id", "rank")
            .as[(Long, Long, Int)].collect()
          streamed.synchronized { streamed ++= res }
        }
        ()
      }
      .start()
    try {
      q.processAllAvailable()
      queries.filter($"query_id" >= 20).write.parquet(in.toString + "/b2")
      q.processAllAvailable()
    } finally q.stop()
    staticIdx.unpersist()

    assert(streamed.toSet == batchRes,
      s"stream ${streamed.size} vs batch ${batchRes.size}")
    assert(batchRes.nonEmpty)
  }

  test("residual micro-batch increments equal the one-shot residual search") {
    // the residual tier's streaming contract mirrors the non-residual
    // one: a static slim residual index, arriving query batches
    // searched via ivfAdcResidualSearchAgainst — accumulated results
    // equal the one-shot batch (no stream machinery needed to prove
    // batch-equivalence here: the search is stateless per batch, so
    // partitioned query batches ARE the micro-batch semantics)
    import graft.operators.PqCodebooks
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.001")
    val corpus = emb.filter($"vec_id" >= 40)
    val queries = emb.filter($"vec_id" < 40)
      .select($"vec_id".as("query_id"), $"embedding")
    val idx = Similarity.buildResidualAdcIndex(corpus,
      IvfCentroids.Centroids16, PqCodebooks.ResidualCodebooks8x16, 8)
    def search(q: org.apache.spark.sql.DataFrame) =
      Similarity.ivfAdcResidualSearchAgainst(q, idx,
          IvfCentroids.Centroids16, PqCodebooks.ResidualCodebooks8x16, 8,
          nProbe = 2, k = 3)
        .select("query_id", "neighbor_id", "rank")
        .as[(Long, Long, Int)].collect().toSet
    val oneShot = search(queries)
    val batched = search(queries.filter($"query_id" < 20)) ++
      search(queries.filter($"query_id" >= 20))
    assert(batched == oneShot && oneShot.nonEmpty)
  }

  test("micro-batched query stream against the PERSISTED bucketed ADC table equals one-shot") {
    // the production ingest composition: the nightly artifact
    // (writeAdcIndexBucketed — the table the maintenance loop appends
    // to and compacts) serves a QUERY STREAM via foreachBatch pruned
    // search. Completes the artifact-symmetry story: the same persisted
    // table feeds batch search, the maintenance loop, and ingest.
    import graft.operators.PqCodebooks
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.001")
    val corpus = emb.filter($"vec_id" >= 40)
    val queries = emb.filter($"vec_id" < 40)
      .select($"vec_id".as("query_id"), $"embedding")
    val (cents, rcbs) =
      (IvfCentroids.Centroids16, PqCodebooks.ResidualCodebooks8x16)
    val idx = Similarity.buildResidualAdcIndex(corpus, cents, rcbs, 8)
    val dir = Files.createTempDirectory("ann_adc_tbl").toString
    Similarity.writeAdcIndexBucketed(idx, "ann_stream_adc_idx",
      buckets = 4, Some(s"$dir/ann_stream_adc_idx"))
    def search(q: DataFrame) = Similarity.ivfAdcSearchPruned(q,
        spark.table("ann_stream_adc_idx"), cents, rcbs, 8,
        nProbe = 2, k = 3, rerank = 10, rawVectors = Some(corpus),
        residual = true)
      .select("query_id", "neighbor_id", "rank")
      .as[(Long, Long, Int)].collect()
    val oneShot = search(queries).toSet

    val in = Files.createTempDirectory("ann_adc_in")
    val ckpt = Files.createTempDirectory("ann_adc_ck")
    queries.filter($"query_id" < 20).write.parquet(in.toString + "/b1")
    val streamed = scala.collection.mutable.Set.empty[(Long, Long, Int)]
    val stream = spark.readStream
      .schema(queries.schema)
      .option("path", in.toString + "/*")
      .format("parquet").load()
    val q = stream.writeStream
      .option("checkpointLocation", ckpt.toString)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        if (!batch.isEmpty) {
          val res = search(batch)
          streamed.synchronized { streamed ++= res }
        }
        ()
      }
      .start()
    try {
      q.processAllAvailable()
      queries.filter($"query_id" >= 20).write.parquet(in.toString + "/b2")
      q.processAllAvailable()
    } finally q.stop()
    assert(streamed.toSet == oneShot && oneShot.nonEmpty,
      s"stream ${streamed.size} vs one-shot ${oneShot.size}")
  }

  test("audio frame hashes feed the same frame-set near-dup operator") {
    import graft.operators.{AudioHeaders, Multimodal}
    implicit val s: SparkSession = spark
    def chunk(seed: Int) = Array.tabulate(16)(i => ((seed * 23 + i) % 100 + 1).toByte)
    val shared = Seq(chunk(1), chunk(2), chunk(3))
    val media = Seq(
      (1L, AudioHeaders.mp3Fixture(shared)),
      (2L, AudioHeaders.mp3Fixture(chunk(9) +: shared)), // re-cut: offsets shift
      (3L, AudioHeaders.adtsFixture(Seq(chunk(4), chunk(5), chunk(6))))
    ).toDF("doc_id", "media")
    val frames = Multimodal.sampleAudioFrames(media, stride = 1).toDF()
      .select($"doc_id", $"frame_hash".as("frame_phash"))
    val pairs = Multimodal.videoNearDupPairs(frames, tau = 0.5)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(pairs == Set((1L, 2L))) // re-cut audio caught, ADTS doc unrelated
  }
}
