package graft

import graft.operators.{Corpus, Pq, Sketches}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class SketchOpsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  // ---------------------------------------------------------------- //
  //  Product quantization                                             //
  // ---------------------------------------------------------------- //

  /** Tiny 4-dim corpus with m=2 × dsub=2 codebooks whose codes sit AT
    * two of the vectors — encoding is then exactly predictable. */
  private def pqFixture = {
    val codebooks = Seq(
      (0, 0, Seq(0.0, 0.0)), (0, 1, Seq(1.0, 1.0)),
      (1, 0, Seq(0.0, 1.0)), (1, 1, Seq(1.0, 0.0)))
    val vecs = Seq(
      (0L, Array(0.0f, 0.0f, 0.0f, 1.0f)), // codes (0, 0)
      (1L, Array(1.0f, 1.0f, 1.0f, 0.0f)), // codes (1, 1)
      (2L, Array(0.1f, 0.1f, 0.9f, 0.1f)), // codes (0, 1)
      (3L, Array(0.5f, 0.5f, 0.5f, 0.5f))) // equidistant → lowest code wins
      .toDF("vec_id", "embedding")
    (vecs, codebooks)
  }

  test("Pq.encode: per-subspace argmin with lowest-code tie break") {
    val (vecs, codebooks) = pqFixture
    val enc = Pq.encode(vecs, codebooks, dsub = 2)
      .collect().map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    assert(enc(0L) == Seq(0, 0))
    assert(enc(1L) == Seq(1, 1))
    assert(enc(2L) == Seq(0, 1))
    // vec 3: every subspace distance is 0.5²+0.5² = 0.5 to BOTH codes
    // (0.5f is exact in binary) → genuine ties → lowest code 0 wins
    assert(enc(3L) == Seq(0, 0))
  }

  test("Pq.adcTopK: ADC distance equals the table-lookup sum; self excluded") {
    val (vecs, codebooks) = pqFixture
    val got = Pq.adcTopK(vecs, col("vec_id") === 0L, codebooks, dsub = 2, k = 3)
      .collect().map(r => (r.getLong(1), r.getInt(2), r.getDouble(3)))
    assert(got.length == 3)
    assert(!got.exists(_._1 == 0L)) // no self pair
    // query 0's table: sub0 → [0.0, 2.0], sub1 → [(0-0)²+(1-1)²=0.0,
    // (0-1)²+(1-0)²=2.0]; vec2 codes (0,1) → 0.0+2.0
    assert(got.find(_._1 == 2L).get._3 == 2.0)
    // ranks are 1..k by (dist, vec_id)
    assert(got.map(_._2).sorted.toSeq == Seq(1, 2, 3))
  }

  test("Pq.adcTopK agrees with brute force on separated clusters (sf0.001)") {
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.001")
    val pq = Pq.adcTopK(emb, pmod(col("vec_id"), lit(25L)) === 0,
      graft.operators.PqCodebooks.Codebooks8x16, dsub = 8, k = 5)
    // approximate index: require every query to return full k results
    // with strictly increasing distance by rank
    val rows = pq.collect()
    val byQ = rows.groupBy(_.getLong(0))
    assert(byQ.nonEmpty)
    byQ.foreach { case (_, rs) =>
      assert(rs.length == 5)
      val byRank = rs.sortBy(_.getInt(2)).map(_.getDouble(3))
      assert(byRank.zip(byRank.tail).forall { case (a, b) => a <= b })
    }
  }

  // ---------------------------------------------------------------- //
  //  Count-min sketch                                                 //
  // ---------------------------------------------------------------- //

  test("CMS: estimates never under-count and are exact without collisions") {
    val terms = (Seq.fill(100)("alpha") ++ Seq.fill(10)("beta") ++
      Seq.fill(1)("gamma")).toDF("term")
    val sketch = Sketches.cmsBuild(terms, "term", w = 512)
    val est = Sketches
      .cmsEstimate(sketch, Seq("alpha", "beta", "gamma", "absent").toDF("term"),
        "term", w = 512)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // 3 distinct terms in 4×512 cells: collisions impossible to force
    // under-counts; with this few terms estimates are exact
    assert(est("alpha") == 100L)
    assert(est("beta") == 10L)
    assert(est("gamma") == 1L)
    assert(est("absent") == 0L) // all-empty cells → 0
  }

  test("CMS sketches merge by relational union+sum") {
    val a = Seq.fill(7)("x").toDF("term")
    val b = (Seq.fill(5)("x") ++ Seq.fill(3)("y")).toDF("term")
    val merged = Sketches.cmsBuild(a, "term", 512)
      .unionAll(Sketches.cmsBuild(b, "term", 512))
      .groupBy("row", "pos").agg(sum("cnt").as("cnt"))
    val whole = Sketches.cmsBuild(a.unionAll(b), "term", 512)
    assert(merged.except(whole).isEmpty && whole.except(merged).isEmpty)
  }

  test("heavyHittersWithCms: est >= true for every reported hitter") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val rows = Sketches.heavyHittersWithCms(docs, k = 20, w = 512).collect()
    assert(rows.length == 20)
    rows.foreach(r => assert(r.getLong(2) >= r.getLong(1),
      s"${r.getString(0)}: est ${r.getLong(2)} < true ${r.getLong(1)}"))
  }

  // ---------------------------------------------------------------- //
  //  Mixture resample + adaptive quality filter                       //
  // ---------------------------------------------------------------- //

  test("mixtureResample: kept counts hit the exact integer mixture") {
    val docs = (0 until 60).map { i =>
      val src = if (i < 30) "a" else if (i < 50) "b" else "c"
      (i.toLong, s"doc text $i", src)
    }.toDF("doc_id", "text", "source")
    // parts 2:1:1, n = (30, 20, 10) → T = min(30·4/2, 20·4/1, 10·4/1)
    //   = min(60, 80, 40) = 40 → takes (20, 10, 10)
    val kept = Corpus
      .mixtureResample(docs, "source", Map("a" -> 2L, "b" -> 1L, "c" -> 1L))
      .groupBy("stratum").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(kept == Map("a" -> 20L, "b" -> 10L, "c" -> 10L))
  }

  test("mixtureResample is reproducible and a subset of the input") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val parts = Map("src0" -> 5L, "src1" -> 3L, "src2" -> 2L)
    val a = Corpus.mixtureResample(docs, "source", parts).collect().toSet
    val b = Corpus.mixtureResample(docs, "source", parts).collect().toSet
    assert(a == b && a.nonEmpty)
  }

  test("adaptiveQualityFilter keeps ~the target fraction per language") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val per = Corpus.adaptiveQualityFilter(docs, keepPermille = 300)
      .groupBy("lang").agg(
        sum(when(col("kept"), 1L).otherwise(0L)).as("kept"),
        count(lit(1)).as("n"))
      .collect()
    per.foreach { r =>
      val (kept, n) = (r.getLong(1), r.getLong(2))
      // percent_rank ≤ 0.3 keeps ⌈0.3·(n−1)⌉+1-ish rows — allow ±2
      val expected = 0.3 * (n - 1) + 1
      assert(math.abs(kept - expected) <= 2, s"${r.getString(0)}: $kept vs $expected")
    }
  }
}
