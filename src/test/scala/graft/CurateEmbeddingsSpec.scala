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
    // the serving name is now the blue/green VIEW over the versioned
    // table, and the quantizer fingerprint flows through it
    assert(spark.catalog.getTable("ce_spec_rel").tableType == "VIEW")
    assert(rel.schema("cell").metadata.contains("graft.quantizer.hash"))
    spark.sql("DROP VIEW IF EXISTS ce_spec_rel")
    spark.sql("DROP TABLE IF EXISTS ce_spec_rel_v1")
  }

  test("cell rel quantizer binding: centroids from a different fit are refused, naming both fingerprints") {
    // The rel records the fingerprint of the quantizer that assigned
    // its cells; probe-time centroids from any OTHER fit would compute
    // every radius bound against the wrong cell geometry and silently
    // LOSE pairs — the one silent-wrong-answer hole in the routed
    // surface, closed by refusal (the media build-stride discipline).
    val corpus = Seq((1L, 0, vec(3)), (2L, 0, vec(40)))
      .toDF("vec_id", "label", "embedding")
    val cents = IvfCentroids.Centroids16
    val rel = Dedup.embedCellRel(corpus, "label", cents)
    val fresh = Seq((10L, 0, vec(3, 0.02f)))
      .toDF("vec_id", "label", "embedding")
    // perturbed quantizer = a "newer fit" — refused on both consumers
    val newerFit = cents.map { case (id, c) =>
      (id, c.map(_ + 1e-6)) }
    val exIncr = intercept[IllegalArgumentException] {
      Dedup.incrementalEmbeddingNearDupPairs(fresh, rel, "label", 0.9,
        strategy = "cells", centroids = newerFit).collect()
    }
    assert(exIncr.getMessage.contains("quantizer mismatch"))
    // the message names BOTH fingerprints so the operator can tell
    // which artifact is stale
    val fpRel = IvfCentroids.fingerprintString(
      IvfCentroids.quantizerFingerprint(cents))
    val fpNew = IvfCentroids.fingerprintString(
      IvfCentroids.quantizerFingerprint(newerFit))
    assert(exIncr.getMessage.contains(fpRel) &&
      exIncr.getMessage.contains(fpNew))
    val exStream = intercept[IllegalArgumentException] {
      StreamingEmbedNearDup.embedNearDupAgainstCellIndex(
        fresh, rel, newerFit, "label", 0.9).collect()
    }
    assert(exStream.getMessage.contains("quantizer mismatch"))
    // the MATCHING quantizer still passes
    assert(StreamingEmbedNearDup.embedNearDupAgainstCellIndex(
      fresh, rel, cents, "label", 0.9).count() == 1)
  }

  test("versioned cell rel rebuild: view swap, previous kept, older dropped, fingerprint through the view") {
    val cents = IvfCentroids.Centroids16
    val out = java.nio.file.Files.createTempDirectory("ce_ver").toString
    def corpusOf(n: Int) = (1 to n).map(i => (i.toLong, 0, vec(i)))
      .toDF("vec_id", "label", "embedding")
    def rebuild(n: Int): Unit =
      Dedup.writeEmbedCellRelBucketedVersioned(corpusOf(n), "label",
        cents, "ce_ver_rel", 2, Some(s"$out/rel"))
    rebuild(3)
    assert(spark.catalog.tableExists("ce_ver_rel_v1"))
    assert(spark.catalog.getTable("ce_ver_rel").tableType == "VIEW")
    rebuild(4)
    // v2 serves, v1 kept for in-flight readers
    assert(spark.catalog.tableExists("ce_ver_rel_v2"))
    assert(spark.catalog.tableExists("ce_ver_rel_v1"))
    assert(spark.table("ce_ver_rel").count() == 4)
    rebuild(5)
    // v3 serves, v2 kept, v1 dropped — catalog AND files
    assert(spark.catalog.tableExists("ce_ver_rel_v3"))
    assert(spark.catalog.tableExists("ce_ver_rel_v2"))
    assert(!spark.catalog.tableExists("ce_ver_rel_v1"))
    assert(!java.nio.file.Files.exists(
      java.nio.file.Paths.get(s"$out/rel/v1")))
    // quantizer fingerprint + routed-join consumption flow through the
    // serving view (a mismatched fit is refused THROUGH the view too)
    val served = spark.table("ce_ver_rel")
    assert(served.schema("cell").metadata.contains("graft.quantizer.hash"))
    val fresh = Seq((40L, 0, vec(3, 0.02f)))
      .toDF("vec_id", "label", "embedding")
    assert(StreamingEmbedNearDup.embedNearDupAgainstCellIndex(
      fresh, served, cents, "label", 0.9).count() == 1)
    intercept[IllegalArgumentException] {
      StreamingEmbedNearDup.embedNearDupAgainstCellIndex(
        fresh, served, cents.map { case (i, c) => (i, c.map(_ + 1e-6)) },
        "label", 0.9).collect()
    }
    spark.sql("DROP VIEW IF EXISTS ce_ver_rel")
    Seq("v2", "v3").foreach(v =>
      spark.sql(s"DROP TABLE IF EXISTS ce_ver_rel_$v"))
  }

  test("versioned rebuild survives a mixed-case table name (no silent v1 overwrite)") {
    // The catalog lowercases identifiers; version discovery matching
    // the verbatim name would find NOTHING every night and rewrite the
    // live _v1 the serving view points at — reintroducing exactly the
    // half-written-table window the blue/green path exists to close.
    val cents = IvfCentroids.Centroids16
    val corpus = Seq((1L, 0, vec(3))).toDF("vec_id", "label", "embedding")
    def rebuild(): String = Dedup.writeEmbedCellRelBucketedVersioned(
      corpus, "label", cents, "Ce_Mixed_Rel", 2)
    assert(rebuild() == "ce_mixed_rel_v1")
    assert(rebuild() == "ce_mixed_rel_v2") // not a v1 overwrite
    assert(spark.catalog.tableExists("ce_mixed_rel_v1"))
    assert(spark.table("Ce_Mixed_Rel").count() == 1)
    spark.sql("DROP VIEW IF EXISTS ce_mixed_rel")
    Seq("v1", "v2").foreach(v =>
      spark.sql(s"DROP TABLE IF EXISTS ce_mixed_rel_$v"))
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
