package graft

import graft.app.CurateEmbeddings
import graft.operators.{Dedup, IvfCentroids}
import graft.streaming.StreamingEmbedNearDup
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The embedding curation pipeline: exact dedup → blocked cosine
  * near-dup → survivor vectors + the nightly home-cell artifact, which
  * both ingest paths (incremental batch, streaming routed) consume. */
class CurateEmbeddingsSpec extends AnyFunSuite {

  lazy implicit val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  // 64-dim vectors (the pinned Centroids16 dimensionality): one-hot-ish
  // directions are near-orthogonal across positions, near-parallel
  // under small perturbation
  private def vec(pos: Int, bump: Float = 0f): Array[Float] = {
    val a = Array.fill(64)(0.01f)
    a(pos) = 1f
    a((pos + 7) % 64) += bump
    a
  }

  test("curate: exact dup dropped, near-dup loses higher id, artifact serves both ingest paths") {
    val corpus = Seq(
      (1L, 0, vec(3)),          // family A canonical
      (2L, 0, vec(3)),          // exact dup of 1 → dropped at stage 1
      (3L, 0, vec(3, 0.02f)),   // near-dup of 1 (same block) → dropped
      // same DIRECTION as 1 (cosine 1) but scaled — byte-distinct, so
      // it passes exact dedup; near-dup ignores it (other block)
      (4L, 1, vec(3).map(_ * 2f)),
      (5L, 0, vec(40)),         // distinct direction → survives
      (6L, 1, vec(20))          // distinct → survives
    ).toDF("vec_id", "label", "embedding")
    val out = java.nio.file.Files.createTempDirectory("curate_emb").toString
    val counts = CurateEmbeddings.run(corpus, out, "label", tau = 0.9,
      buckets = 2, cellTable = "ce_spec_rel")
    assert(counts == CurateEmbeddings.EmbedStageCounts(6L, 5L, 4L, 4L))
    val survivors = spark.read.parquet(s"$out/vectors")
      .select("vec_id").as[Long].collect().toSet
    assert(survivors == Set(1L, 4L, 5L, 6L))
    // the artifact covers exactly the survivors and carries the radius
    // stat the routed probe bound needs
    val rel = spark.table("ce_spec_rel")
    assert(rel.select("vec_id").as[Long].collect().toSet == survivors)
    assert(rel.columns.contains("cdist") && rel.columns.contains("cell"))

    // a fresh twin of survivor 5 (same block) matches through BOTH
    // ingest paths against the artifact; the dropped dup 3 is gone
    val fresh = Seq((40L, 0, vec(40, 0.02f)))
      .toDF("vec_id", "label", "embedding")
    val cents = IvfCentroids.Centroids16
    val incr = Dedup.incrementalEmbeddingNearDupPairs(
        fresh, rel, "label", 0.9, strategy = "cells", centroids = cents)
      .select("vec_a", "vec_b").as[(Long, Long)].collect().toSet
    assert(incr == Set((40L, 5L)))
    val streamed = StreamingEmbedNearDup.embedNearDupAgainstCellIndex(
        fresh, rel, cents, "label", 0.9)
      .select("vec_a", "vec_b").as[(Long, Long)].collect().toSet
    assert(streamed == Set((40L, 5L)))
    spark.sql("DROP TABLE IF EXISTS ce_spec_rel")
  }

  test("exactCanonicalIdsVerified: a hash collision costs a comparison, not data loss") {
    // The exact-dedup key is a PRE-FILTER: colliding candidates are
    // byte-equality verified before any row is dropped. Forcing every
    // row into one hash group (constant hash) simulates the 64-bit
    // birthday collision a multi-billion-row corpus makes expected —
    // byte-distinct vectors must ALL survive it.
    val vecs = Seq(
      (1L, Array(1f, 0f)), (2L, Array(1f, 0f)),   // true dups → min id 1
      (3L, Array(0f, 1f)),                         // distinct
      (4L, Array(0.5f, 0.5f))                      // distinct
    ).toDF("vec_id", "embedding")
    val collided = Dedup.exactCanonicalIdsVerified(
        vecs, "vec_id", "embedding", _ => lit(0L))
      .as[Long].collect().toSet
    assert(collided == Set(1L, 3L, 4L))
    // and with the real hash the result is identical (hash only routes)
    val real = Dedup.exactCanonicalIdsVerified(vecs, "vec_id", "embedding")
      .as[Long].collect().toSet
    assert(real == collided)
  }
}
