package graft

import graft.operators.{Corpus, Retrieval}
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

class RetrievalSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  test("keywordSearch: rational tf-idf ranking, zero-df terms ignored") {
    val docs = Seq(
      (0L, "spark spark join"),   // tf(spark)=2, tf(join)=1
      (1L, "spark filter"),       // tf(spark)=1
      (2L, "filter scan scan"),   // no query terms
      (3L, "join join join"))     // tf(join)=3
      .toDF("doc_id", "text")
    // N=4; df(spark)=2, df(join)=2, df(zzz)=0
    val got = Retrieval.keywordSearch(docs, Seq("spark", "join", "zzz"), 10)
      .collect().map(r => r.getLong(0) -> r.getDouble(4)).toMap
    assert(got(0L) == 2.0 * 4 / 2 + 1.0 * 4 / 2) // 6.0
    assert(got(1L) == 1.0 * 4 / 2)               // 2.0
    assert(got(3L) == 3.0 * 4 / 2)               // 6.0
    assert(!got.contains(2L))                    // score 0 excluded
    // ties (docs 0 and 3 at 6.0) break by doc_id; k truncates
    val top = Retrieval.keywordSearch(docs, Seq("spark", "join", "zzz"), 2)
      .collect().map(_.getLong(0)).toSeq
    assert(top == Seq(0L, 3L))
  }

  test("hybridRrfTopK: fuses disagreeing lexical and semantic lists") {
    // doc 0 is the query. Lexically doc 1 is identical text; doc 2
    // shares nothing. Semantically doc 2 is the closest vector; doc 1
    // is near-orthogonal.
    val docs = Seq(
      (0L, "alpha beta gamma"),
      (1L, "alpha beta gamma"),
      (2L, "delta epsilon zeta"),
      (3L, "alpha delta"))
      .toDF("doc_id", "text")
    val embeddings = Seq(
      (0L, Array(1f, 0f, 0f, 0f)),
      (1L, Array(0.1f, 1f, 0f, 0f)),
      (2L, Array(1f, 0.1f, 0f, 0f)),
      (3L, Array(0.5f, 0.5f, 0f, 0f)))
      .toDF("vec_id", "embedding")
    val got = Retrieval
      .hybridRrfTopK(docs, embeddings, nQueries = 1, perListK = 3, fuseK = 3)
      .collect()
      .map(r => r.getLong(1) ->
        (Option(r.get(2)), Option(r.get(3)), r.getDouble(4), r.getInt(5)))
      .toMap
    // lexical ranks: 1→1 (jac 1.0), 3→2 (jac 1/4), 2→3 (jac 0)
    // semantic ranks: 2→1, 3→2, 1→3
    assert(got(1L)._1 == Some(1) && got(1L)._2 == Some(3))
    assert(got(2L)._1 == Some(3) && got(2L)._2 == Some(1))
    assert(got(3L)._1 == Some(2) && got(3L)._2 == Some(2))
    assert(got(1L)._3 == 1.0 / 61 + 1.0 / 63)
    assert(got(2L)._3 == 1.0 / 63 + 1.0 / 61)
    assert(got(3L)._3 == 1.0 / 62 + 1.0 / 62)
    // doc 1 and doc 2 tie exactly (1/61+1/63) → doc_id breaks it
    assert(got(1L)._4 == 1 && got(2L)._4 == 2 && got(3L)._4 == 3)
  }

  test("hybridRrfTopK: one-sided membership contributes a null rank") {
    val docs = Seq(
      (0L, "alpha beta"),
      (1L, "alpha beta"),   // lexical hit
      (2L, "zzz yyy"))      // lexical jac 0 — still ranked (k covers all)
      .toDF("doc_id", "text")
    val embeddings = Seq(
      (0L, Array(1f, 0f)),
      (1L, Array(0f, 1f)),
      (2L, Array(1f, 0.1f)))
      .toDF("vec_id", "embedding")
    // perListK = 1: lexical list = {1}, semantic list = {2} — disjoint
    val got = Retrieval
      .hybridRrfTopK(docs, embeddings, nQueries = 1, perListK = 1, fuseK = 5)
      .collect()
      .map(r => r.getLong(1) -> (Option(r.get(2)), Option(r.get(3)), r.getDouble(4)))
      .toMap
    assert(got(1L) == ((Some(1), None, 1.0 / 61)))
    assert(got(2L) == ((None, Some(1), 1.0 / 61)))
    assert(got.size == 2)
  }

  test("vocabularyCoverage: OOV counting, empty docs, deterministic cut") {
    val docs = Seq(
      (0L, "a a a b"),  // a:3+2=… corpus counts below
      (1L, "a b rare"),
      (2L, ""))         // empty → zero rates
      .toDF("doc_id", "text")
    // corpus counts: a=4, b=2, rare=1 → vocabSize=2 keeps {a, b}
    val got = Corpus.vocabularyCoverage(docs, 2).collect()
      .map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4)))
      .toMap
    assert(got(0L) == ((4L, 0L, 0.0, (3 * 4 + 2).toDouble / 4)))
    assert(got(1L) == ((3L, 1L, 1.0 / 3, (4 + 2 + 0).toDouble / 3)))
    assert(got(2L) == ((0L, 0L, 0.0, 0.0)))
  }
}
