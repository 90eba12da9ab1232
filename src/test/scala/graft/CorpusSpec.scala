package graft

import graft.operators.Corpus
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class CorpusSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  private val P = 1000000007L
  private def polyHash(s: String): Long =
    s.foldLeft(0L)((acc, c) => (acc * 31 + c) % P)

  test("repetitionStats: hand-computed counters and fractions") {
    val docs = Seq(
      (1L, "a a b"),    // bigrams: "a a", "a b" → top 1
      (2L, "x x x"),    // bigrams: "x x", "x x" → top 2
      (3L, "z"),        // no bigrams
      (4L, "p q r s"))  // all distinct
      .toDF("doc_id", "text")
    val got = Corpus.repetitionStats(docs).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(got(1L).getLong(1) == 3 && got(1L).getLong(2) == 2) // n_words, n_distinct
    assert(got(1L).getLong(3) == 2 && got(1L).getLong(4) == 1) // n_bigrams, top cnt
    assert(got(1L).getDouble(5) == 1.0 / 3)                    // dup_word_frac
    assert(got(2L).getLong(4) == 2 && got(2L).getDouble(6) == 1.0) // "x x" twice
    assert(got(3L).getLong(3) == 0 && got(3L).getLong(4) == 0)
    assert(got(3L).getDouble(6) == 0.0) // guarded division
    assert(got(4L).getDouble(5) == 0.0 && got(4L).getDouble(6) == 1.0 / 3)
  }

  test("hashStratifiedSample: keeps exactly content-bucket < stratum rate, reproducibly") {
    val docs = (0L until 200L)
      .map(i => (i, s"doc number $i body", if (i % 2 == 0) "en" else "fr"))
      .toDF("doc_id", "text", "lang")
    val kept = Corpus
      .hashStratifiedSample(docs, "lang", Map("en" -> 4L), 10L, 20L)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val expected = (0L until 200L).flatMap { i =>
      val lang = if (i % 2 == 0) "en" else "fr"
      val b = polyHash(s"doc number $i body") % 20
      if (b < (if (lang == "en") 4 else 10)) Some((i, lang, b)) else None
    }
    assert(kept.sorted.toSeq == expected.sorted)
    // en downsampled below fr despite equal stratum sizes
    assert(kept.count(_._2 == "en") < kept.count(_._2 == "fr"))
  }

  test("tfIdfTopTerms: corpus-common terms rank below doc-specific ones") {
    val docs = Seq(
      (1L, "shared shared rare1"),
      (2L, "shared rare2 rare2"),
      (3L, "shared other"))
      .toDF("doc_id", "text")
    val got = Corpus.tfIdfTopTerms(docs, 2).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getDouble(4), r.getInt(5)))
    val byDoc = got.groupBy(_._1)
    // doc 1: rare1 tf=1 df=1 → 3.0; shared tf=2 df=3 → 2.0
    assert(byDoc(1L).sortBy(_._6).map(t => (t._2, t._5)).toSeq ==
      Seq(("rare1", 3.0), ("shared", 2.0)))
    // doc 2: rare2 tf=2 df=1 → 6.0 beats shared 1.0
    assert(byDoc(2L).minBy(_._6)._2 == "rare2")
    assert(byDoc(2L).minBy(_._6)._5 == 6.0)
  }

  test("qualityFilter: each rule flags independently; keep is the conjunction") {
    val good = "the data " + (1 to 10).map(i => s"word$i").mkString(" ")
    val tooShort = "the data x"
    val noStops = (1 to 12).map(i => s"word$i").mkString(" ")
    val repetitive = "the data " + ("dup " * 12).trim
    val docs = Seq((1L, good), (2L, tooShort), (3L, noStops), (4L, repetitive))
      .toDF("doc_id", "text")
    val got = Corpus.qualityFilter(docs).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(got(1L).getBoolean(8))                                // keep
    assert(!got(2L).getBoolean(4) && !got(2L).getBoolean(8))     // pass_len fails
    assert(!got(3L).getBoolean(7 - 1))                           // pass_stop fails
    assert(!got(4L).getBoolean(7) && !got(4L).getBoolean(8))     // pass_rep fails
    assert(got(1L).getLong(3) == 2)                              // n_stop: the, data
  }

  test("minHashAccuracyPairs: identical docs estimate 1.0 and match true jaccard") {
    val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa " * 3
    val docs = Seq(
      (1L, base, "en", "s0"),
      (2L, base, "en", "s0"),
      (3L, "completely different text with other words entirely " * 3, "en", "s0"),
      (4L, base, "fr", "s0"), // different block: never paired with 1/2
      (5L, "hi", "en", "s0"), // <5 chars: empty shingle set (0/0 jaccard path)
      (6L, "yo", "en", "s0"))
      .toDF("doc_id", "text", "lang", "source")
    val got = Corpus.minHashAccuracyPairs(docs, Seq("lang", "source"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getDouble(3), r.getDouble(4))).toMap
    assert(got((1L, 2L)) == ((16L, 1.0, 1.0)))
    assert(got((1L, 3L))._2 <= 0.25) // dissimilar pair estimates low
    assert(!got.keySet.exists(p => p._1 == 4L || p._2 == 4L))
    // empty-vs-empty and empty-vs-nonempty shingle sets: jaccard is a
    // defined 0.0 (never NULL / divide-by-zero), matching the guarded
    // DuckDB oracle semantics
    assert(got((5L, 6L))._3 == 0.0)
    assert(got((1L, 5L))._3 == 0.0)
    // estimator within 0.5 of truth everywhere except the degenerate
    // empty-empty pair (both sentinel signatures match trivially)
    (got - ((5L, 6L))).values.foreach { case (_, est, jac) =>
      assert(math.abs(est - jac) <= 0.5) }
  }

  test("chunkDocuments: stride windows, short tail kept, empty doc dropped") {
    val docs = Seq(
      (1L, (1 to 10).map(i => s"t$i").mkString(" ")), // 10 tokens
      (2L, "only three tokens"),
      (3L, ""))
      .toDF("doc_id", "text")
    val got = Corpus.chunkDocuments(docs, chunkTokens = 4, stride = 3)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> (r.getString(2), r.getLong(3)))
      .toMap
    // doc 1: starts 0,3,6,9 → chunks of 4,4,4,1
    assert(got((1L, 0L)) == (("t1 t2 t3 t4", 4L)))
    assert(got((1L, 1L)) == (("t4 t5 t6 t7", 4L)))
    assert(got((1L, 3L)) == (("t10", 1L)))
    assert(got((2L, 0L)) == (("only three tokens", 3L)))
    assert(!got.keySet.exists(_._1 == 3L))
    assert(got.keySet.count(_._1 == 1L) == 4)
  }

  test("contaminationCheck: probe overlap flags exactly the sharing docs") {
    val shared = "one two three four five six"
    val docs = Seq(
      (1L, shared + " suffix here"),        // shares 5-grams with probe
      (2L, "totally different words apple banana cherry date elder fig"),
      (3L, "tiny doc"))                     // < 5 tokens → no grams
      .toDF("doc_id", "text")
    val probes = Seq((99L, shared)).toDF("doc_id", "text")
    val got = Corpus.contaminationCheck(docs, probes, n = 5, minMatches = 1)
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getBoolean(3)))
      .toMap
    assert(got(1L)._3 && got(1L)._2 == 2)  // "one..five" and "two..six"
    assert(!got(2L)._3 && got(2L)._2 == 0)
    assert(got(3L) == ((0L, 0L, false)))   // gramless, still reported
  }

  test("hybridNearDupPairs: paraphrase-similar vectors verified by text jaccard") {
    val rnd = new scala.util.Random(11)
    val v1 = Array.fill(64)(rnd.nextGaussian().toFloat)
    val v3 = Array.fill(64)(rnd.nextGaussian().toFloat)
    val emb = Seq(
      (1L, v1), (2L, v1),          // identical vectors: certain candidates
      (3L, v3), (4L, v3.map(-_)))  // antipodal: cosine −1, gated out
      .toDF("vec_id", "embedding")
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon"),
      (2L, "alpha beta gamma delta zeta"),   // high jaccard with 1
      (3L, "one two three four five"),
      (4L, "six seven eight nine ten"))
      .toDF("doc_id", "text")
    val got = Corpus
      .hybridNearDupPairs(docs, emb, nPlanes = 32, nBands = 4,
        cosineThreshold = 0.5, jacThreshold = 0.5)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getDouble(2), r.getDouble(3), r.getBoolean(4))).toMap
    val (cos12, jac12, dup12) = got((1L, 2L))
    assert(cos12 > 0.999 && jac12 == 4.0 / 6 && dup12)
    assert(!got.contains((3L, 4L))) // antipodal pair never survives the gate
  }

  test("lshRecallAtK: one row per config; narrower bands never lose recall") {
    val rnd = new scala.util.Random(7)
    val emb = (0L until 60L)
      .map(i => (i, Array.fill(64)(rnd.nextGaussian().toFloat)))
      .toDF("vec_id", "embedding")
    val got = Corpus
      .lshRecallAtK(emb, 64, Seq((32, 4, 0), (32, 4, 8), (32, 8, 0)),
        k = 3, nQueries = 20)
      .collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4))).toMap
    assert(got.keySet == Set("32p4b", "32p4b+mp8", "32p8b"))
    got.values.foreach { case (nq, exp, hits, rec) =>
      assert(nq == 20 && exp == 60)
      assert(hits >= 0 && hits <= exp)
      assert(rec == hits.toDouble / exp)
    }
    // 4-bit bands collide strictly more often than 8-bit bands, and
    // multi-probe can only add candidates over the same-config base
    assert(got("32p8b")._3 >= got("32p4b")._3)
    assert(got("32p4b+mp8")._3 >= got("32p4b")._3)
  }

  test("duplicateSpanStats: shared boilerplate spans counted, short docs zeroed") {
    val boiler = "this content is licensed under the terms below"  // 8 tokens
    val docs = Seq(
      (1L, s"$boiler unique tail one two"),
      (2L, s"$boiler other ending words here"),
      (3L, "entirely different text with no shared spans at all九"),
      (4L, "tiny"))  // < 8 tokens → zero spans
      .toDF("doc_id", "text")
    val got = Corpus.duplicateSpanStats(docs, n = 8, minDf = 2).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toMap
    // doc1: 12 tokens → 5 distinct 8-gram spans; only the pure-boiler
    // span (positions 1) is shared with doc2
    assert(got(1L)._1 == 5 && got(1L)._2 == 1 && got(1L)._3 == 0.2)
    assert(got(2L)._2 == 1)
    assert(got(3L)._2 == 0)
    assert(got(4L) == ((0L, 0L, 0.0))) // guarded division, row kept
  }

  /** Gram population is collision-free for BOTH hash families iff the
    * families agree on the distinct count (each path dedups within
    * itself; equal counts mean neither merged grams the other kept
    * apart). The parity tests gate on this so they measure the
    * OPERATOR, not hash luck. */
  private def collisionFree(d: org.apache.spark.sql.DataFrame, n: Int): Boolean = {
    import graft.functions.HashExpressions
    val a = d.select(explode(HashExpressions.tokenNGramHashes(col("text"), n)).as("g"))
    val b = d.select(explode(HashExpressions.tokenNGramXxHashes(col("text"), n)).as("g"))
    a.distinct().count() == b.distinct().count()
  }

  test("duplicateSpanStats: xxhash fast path is output-identical on collision-free input") {
    val boiler = "this content is licensed under the terms below"
    val fix = Seq(
      (1L, s"$boiler unique tail one two"),
      (2L, s"$boiler other ending words here"),
      (3L, "entirely different text with no shared spans at all"),
      (4L, "tiny"))
      .toDF("doc_id", "text")
    // 100-doc real-text subset, verified collision-free (the FULL
    // sf0.001 table has exactly one polyhash birthday collision at its
    // 23k-gram population — see the next test)
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
      .select("doc_id", "text").filter(col("doc_id") % 5 === 0)
    for (d <- Seq(fix, docs)) {
      assert(collisionFree(d, 8))
      val exact = Corpus.duplicateSpanStats(d, n = 8, minDf = 2)
      val fast = Corpus.duplicateSpanStats(d, n = 8, minDf = 2,
        fastGrams = true)
      assert(exact.exceptAll(fast).isEmpty && fast.exceptAll(exact).isEmpty)
    }
  }

  test("duplicateSpanStats: a polyhash collision only ever ADDS phantom dup spans") {
    // the full sf0.001 table carries one 31-base-mod-1e9+7 birthday
    // collision (23171 vs 23172 distinct over 24439 grams): the exact
    // family merges two different grams, marking their two documents
    // as sharing a span. That IS q49's oracle semantics (DuckDB
    // reproduces the same polyhash); the 64-bit fast path doesn't
    // collide. Pin the divergence's SHAPE: same rows, same n_spans,
    // fast's n_dup_spans ≤ exact's.
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
      .select("doc_id", "text")
    val exact = Corpus.duplicateSpanStats(docs, n = 8, minDf = 2)
      .withColumnRenamed("n_dup_spans", "dup_exact")
      .select("doc_id", "n_spans", "dup_exact")
    val fast = Corpus.duplicateSpanStats(docs, n = 8, minDf = 2,
      fastGrams = true)
      .withColumnRenamed("n_dup_spans", "dup_fast")
      .select("doc_id", "n_spans", "dup_fast")
    val j = exact.join(fast, Seq("doc_id", "n_spans")).cache()
    assert(j.count() == 500) // n_spans identical on every doc
    assert(j.filter(col("dup_fast") > col("dup_exact")).count() == 0)
    val phantoms = j.filter(col("dup_exact") > col("dup_fast")).count()
    assert(phantoms <= 4, s"unexpectedly many collision phantoms: $phantoms")
    j.unpersist()
  }

  test("contaminationCheckBloom: xxhash fast path is output-identical on collision-free input") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
      .select("doc_id", "text").filter(col("doc_id") % 5 === 0)
    assert(collisionFree(docs, 7))
    val probes = docs.filter(col("doc_id") % 15 === 0).select("text")
    val exact = Corpus.contaminationCheckBloom(docs, probes,
      n = 7, minMatches = 2)
    val fast = Corpus.contaminationCheckBloom(docs, probes,
      n = 7, minMatches = 2, fastGrams = true)
    assert(exact.exceptAll(fast).isEmpty && fast.exceptAll(exact).isEmpty)
    assert(exact.filter(col("contaminated")).count() > 0) // non-vacuous
  }

  test("tokenNGramXxHashes: segmentation parity with the exact path (count + short-doc cases)") {
    import graft.functions.HashExpressions
    val rows = Seq(
      (1L, "a b c d e"), (2L, "  leading   and\ttrailing ws \n"),
      (3L, "九 unicode 久 tokens mixed in here"), (4L, ""), (5L, "one two"))
      .toDF("doc_id", "text")
    val both = rows.select(
      size(HashExpressions.tokenNGramHashes(col("text"), 3)).as("a"),
      size(HashExpressions.tokenNGramXxHashes(col("text"), 3)).as("b"))
      .collect()
    both.foreach(r => assert(r.getInt(0) == r.getInt(1), r.toString))
  }

  test("piiScan: counts, redaction, and clean-doc passthrough") {
    val docs = Seq(
      (1L, "mail a@b.co or x.y@sub.domain.org, call +1 (555) 123-4567"),
      (2L, "server at 10.0.0.1 and 192.168.1.255 ok"),
      (3L, "no pii here at all"))
      .toDF("doc_id", "text")
    val got = Corpus.piiScan(docs).collect()
      .map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getBoolean(4),
          r.getString(5))).toMap
    assert(got(1L)._1 == 2 && got(1L)._3 == 1 && got(1L)._4)
    assert(got(1L)._5 == "mail [EMAIL] or [EMAIL], call [PHONE]")
    assert(got(2L)._2 == 2 && got(2L)._4)
    assert(got(2L)._5 == "server at [IPV4] and [IPV4] ok")
    assert(got(3L) == ((0L, 0L, 0L, false, "no pii here at all")))
  }
}
