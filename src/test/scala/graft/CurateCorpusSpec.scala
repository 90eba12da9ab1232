package graft

import graft.app.CurateCorpus
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class CurateCorpusSpec extends AnyFunSuite {

  lazy implicit val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  test("full curation chain on the sf0.001 corpus: monotone stages, chunked output") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val probes = docs.filter(col("doc_id") < 3) // stand-in benchmark
    val out = java.nio.file.Files.createTempDirectory("curate_out").toString

    val c = CurateCorpus.run(docs, probes, out,
      sampleKeepOf = Map("en" -> 10L), sampleDefaultKeep = 16L,
      sampleMod = 20L, chunkTokens = 32, chunkStride = 24)

    // every doc-level stage can only shrink the set
    assert(c.input == 500)
    assert(c.quality <= c.input && c.quality > 0)
    assert(c.exactDedup <= c.quality)
    assert(c.nearDedup <= c.exactDedup)
    assert(c.decontaminated <= c.nearDedup)
    // the probe docs themselves overlap themselves → dropped (those
    // that survived to stage 4)
    assert(c.decontaminated < c.nearDedup)
    assert(c.sampled <= c.decontaminated && c.sampled > 0)
    assert(c.chunks >= c.sampled) // every surviving doc yields ≥1 chunk

    // output is lang-partitioned parquet; chunk sizes respect the cap
    val chunks = spark.read.parquet(out)
    assert(chunks.columns.toSet ==
      Set("doc_id", "chunk_idx", "chunk_text", "n_tokens", "lang", "train_rank"))
    // the training order is a bijection over surviving docs
    assert(chunks.select("doc_id", "train_rank").distinct().count() ==
      chunks.select("doc_id").distinct().count())
    assert(chunks.agg(max("n_tokens")).head().getLong(0) <= 32)
    assert(chunks.select("lang").distinct().count() >= 2)

    // reproducibility: the same inputs give the same survivor set
    val out2 = java.nio.file.Files.createTempDirectory("curate_out2").toString
    val c2 = CurateCorpus.run(docs, probes, out2,
      sampleKeepOf = Map("en" -> 10L), sampleDefaultKeep = 16L,
      sampleMod = 20L, chunkTokens = 32, chunkStride = 24)
    assert(c == c2)
  }

  test("fastGrams: xxhash64 decontamination gives the identical survivor set") {
    // parity at fixture scale — the 64-bit kernel's phantom-match risk
    // is ~2⁻⁶⁴ per gram pair, so on any fixture the stage counts must
    // be bit-identical to the oracle-exact polyhash path
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val probes = docs.filter(col("doc_id") < 3)
    val outS = java.nio.file.Files.createTempDirectory("curate_slow").toString
    val outF = java.nio.file.Files.createTempDirectory("curate_fast").toString
    val slow = CurateCorpus.run(docs, probes, outS,
      sampleKeepOf = Map("en" -> 10L), sampleDefaultKeep = 16L,
      sampleMod = 20L, chunkTokens = 32, chunkStride = 24)
    val fast = CurateCorpus.run(docs, probes, outF,
      sampleKeepOf = Map("en" -> 10L), sampleDefaultKeep = 16L,
      sampleMod = 20L, chunkTokens = 32, chunkStride = 24,
      fastGrams = true)
    assert(slow == fast)
    val a = spark.read.parquet(outS).select("doc_id", "chunk_idx", "chunk_text")
    val b = spark.read.parquet(outF).select("doc_id", "chunk_idx", "chunk_text")
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
  }

  test("governance knobs: LM floor and per-source cap only shrink stages") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val probes = docs.filter(col("doc_id") < 0) // empty probe set
    val outA = java.nio.file.Files.createTempDirectory("curate_gA").toString
    val base = CurateCorpus.run(docs, probes, outA)
    val outB = java.nio.file.Files.createTempDirectory("curate_gB").toString
    val gated = CurateCorpus.run(docs, probes, outB,
      minLmScore = Some(1L), maxDocsPerSource = Some(3))
    assert(gated.quality <= base.quality)
    assert(gated.sampled <= base.sampled)
    // the cap binds per source: no source exceeds 3 docs in the output
    val perSource = spark.read.parquet(outB)
      .join(docs.select("doc_id", "source"), "doc_id")
      .groupBy("source").agg(countDistinct("doc_id").as("n"))
    assert(perSource.agg(max("n")).head().getLong(0) <= 3)
  }

  test("dedupMode auto routes a quadratic duplicate family to the linear groups form") {
    // 1200 near-identical family docs (distinct texts → survive exact
    // dedup; near-identical shingle sets → one giant LSH bucket per
    // band) + 50 unique docs: candidate pair bound ≈ 4·C(1200,2) ≈
    // 2.9M, past auto's 10⁶ floor — enumerating those pairs is exactly
    // the quadratic-output regime the groups routing exists for
    val base = "the curious engineer walked across a long bridge and " +
      "noted every single data value detail about water flowing near town copy"
    val docs = ((1L to 1200L).map(i => (i, "en", s"$base num$i")) ++
      (10001L to 10050L).map(i => (i, "de",
        s"meanwhile a separate report number $i from the archive covers " +
          s"data value topics with plenty of varied wording on subject ${i * 7}")))
      .toDF("doc_id", "lang", "text")
    val probes = docs.filter(col("doc_id") < 0) // empty probe set
    // the routing statistic actually trips (auto ≡ groups is not
    // vacuous here — a pairs run would enumerate millions of rows)
    assert(graft.operators.Dedup.lshPairBound(docs) > 1000000L)
    spark.sharedState.cacheManager.clearCache()
    val outA = java.nio.file.Files.createTempDirectory("curate_auto").toString
    val outG = java.nio.file.Files.createTempDirectory("curate_grp").toString
    val auto = CurateCorpus.run(docs, probes, outA)
    val grp = CurateCorpus.run(docs, probes, outG, dedupMode = "groups")
    assert(auto == grp) // auto picked groups and matched it exactly
    // the family collapsed: survivors are ~the 50 uniques + canonicals
    assert(auto.nearDedup < auto.exactDedup / 5)
    assert(auto.nearDedup >= 1)
  }

  test("dedupMode jaccard: the edge family routes the quadratic block to star edges") {
    // same quadratic-family corpus shape as the auto test, but driven
    // through the exact blocked-jaccard EDGE surface: all 1200 family
    // docs share (lang, source) blocks, so the coarse-block candidate
    // bound (~1200² ≈ 1.4M) trips jaccardEdgesAuto's 10⁶ floor and the
    // refusal becomes a ROUTE (banded star edges), not an exception —
    // survivors still collapse the family to its min-id member
    val base = "the curious engineer walked across a long bridge and " +
      "noted every single data value detail about water flowing near town copy"
    val docs = ((1L to 1200L).map(i => (i, "en", "web", s"$base num$i")) ++
      (10001L to 10050L).map(i => (i, "de", "web",
        s"meanwhile a separate report number $i from the archive covers " +
          s"data value topics with plenty of varied wording on subject ${i * 7}")))
      .toDF("doc_id", "lang", "source", "text")
    val probes = docs.filter(col("doc_id") < 0)
    spark.sharedState.cacheManager.clearCache()
    val outJ = java.nio.file.Files.createTempDirectory("curate_jac").toString
    val jac = CurateCorpus.run(docs, probes, outJ, dedupMode = "jaccard")
    // the family collapsed through the routed star-edge path
    assert(jac.nearDedup < jac.exactDedup / 5)
    assert(jac.nearDedup >= 1)
    // below the budget the SAME surface returns the exact pair list's
    // edges — parity with ngramJaccardPairs on a small mutual family
    spark.sharedState.cacheManager.clearCache()
    val small = docs.filter(col("doc_id") <= 40 || col("doc_id") > 10000L)
    val exact = graft.operators.Dedup
      .ngramJaccardPairs(small, Seq("lang", "source"), 3, 0.6)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    val routed = graft.operators.Dedup
      .jaccardEdgesAuto(small, Seq("lang", "source"), 3, 0.6)
      .as[(Long, Long)].collect().toSet
    assert(routed == exact && exact.nonEmpty)
  }
}
