package graft

import graft.functions.{HashExpressions, TextFunctions}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The native expressions must produce bit-identical values to the
  * (oracle-mirroring) higher-order-function formulations. */
class HashExprSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  val texts = Seq(
    "the quick brown fox jumps over the lazy dog",
    "aaaaa",           // all-identical shingles → one distinct hash
    "abcd",            // shorter than n=5 → empty
    "abcdef",
    "spark batch column table scan merge row data stream")

  test("shingleHashes == distinct(tokenHashes(charShingles)) as sets") {
    val df = texts.toDF("text")
    val rows = df.select(
      HashExpressions.shingleHashes(col("text"), 5).as("fast"),
      array_distinct(TextFunctions.tokenHashes(
        TextFunctions.charShingles(col("text"), 5))).as("ref"))
      .collect()
    rows.foreach { r =>
      assert(r.getSeq[Long](0).toSet == r.getSeq[Long](1).toSet)
      // distinct already applied
      assert(r.getSeq[Long](0).distinct == r.getSeq[Long](0))
    }
  }

  test("minHashSig == minHashSignature") {
    val df = texts.toDF("text")
      .withColumn("hs", HashExpressions.shingleHashes(col("text"), 5))
    val rows = df.select(
      HashExpressions.minHashSig(col("hs")).as("fast"),
      TextFunctions.minHashSignature(col("hs")).as("ref"))
      .collect()
    rows.foreach { r =>
      assert(r.getSeq[Long](0) == r.getSeq[Long](1))
    }
  }

  test("polyHash == polyFingerprint") {
    val df = texts.toDF("text")
    val rows = df.select(
      HashExpressions.polyHash(col("text")).as("fast"),
      TextFunctions.polyFingerprint(col("text")).as("ref"))
      .collect()
    rows.foreach(r => assert(r.getLong(0) == r.getLong(1)))
  }

  test("termFreqs == per-term size(filter(tokens)) incl. edge whitespace") {
    val docs = Seq(
      "the quick brown fox the the",
      "  leading and trailing  ",
      "",
      "\t tabs\nand newlines the fox  vertical",
      "no match here at all").toDF("text")
    val terms = Seq("the", "fox", "and", "missing")
    val rows = docs.select(
      HashExpressions.termFreqs(col("text"), terms).as("fast") +:
        terms.map(t => size(filter(TextFunctions.tokensHof(col("text")),
          x => x === t)).cast("long").as(s"ref_$t")): _*)
      .collect()
    rows.foreach { r =>
      val fast = r.getSeq[Long](0)
      terms.indices.foreach(i => assert(fast(i) == r.getLong(i + 1)))
    }
  }

  test("tokenArray == filter(split(text, \\s+), _ != '') bit-exact") {
    val docs = (texts ++ Seq("", "  ", "\t\n x  y \r\n", " lead",
      "trail ", "a")).toDF("text")
    val rows = docs.select(
      HashExpressions.tokenArray(col("text")).as("fast"),
      TextFunctions.tokensHof(col("text")).as("ref"))
      .collect()
    rows.foreach(r => assert(r.getSeq[String](0) == r.getSeq[String](1)))
  }

  test("tokenNGramHashes == array_distinct(transform(polyHash(concat_ws))) bit-exact") {
    val docs = (texts ++ Seq(
      "",
      "one two three", // exactly n tokens for n=3
      "one two",       // fewer than n → empty
      "rep rep rep rep rep", // duplicate grams collapse, order kept
      "  pad\t ded   tokens with  odd   spacing here ")).toDF("text")
    for (n <- Seq(2, 3, 5)) {
      val rows = docs.select(
        graft.functions.HashExpressions.tokenNGramHashes(col("text"), n).as("fast"),
        graft.operators.Corpus.gramHashesHof(n)(
          TextFunctions.tokensHof(col("text"))).as("ref"))
        .collect()
      rows.foreach(r => assert(r.getSeq[Long](0) == r.getSeq[Long](1), s"n=$n"))
    }
  }

  test("tokenHashSet == array_sort(tokenHashes(tokenSet)) bit-exact") {
    val docs = (texts ++ Seq("", "  ", "dup dup dup unique")).toDF("text")
    val rows = docs.select(
      HashExpressions.tokenHashSet(col("text")).as("fast"),
      array_sort(TextFunctions.tokenHashes(
        TextFunctions.tokenSet(col("text")))).as("ref"))
      .collect()
    rows.foreach(r => assert(r.getSeq[Long](0) == r.getSeq[Long](1)))
  }

  test("tokenBigrams == zip_with(slice, slice, concat) bit-exact") {
    val docs = (texts ++ Seq("", "one", "a  b", " x y z ")).toDF("text")
      .withColumn("tk", TextFunctions.tokensHof(col("text")))
    val rows = docs.select(
      HashExpressions.tokenBigrams(col("text")).as("fast"),
      expr("zip_with(slice(tk, 1, greatest(size(tk)-1, 0))," +
        " slice(tk, 2, greatest(size(tk)-1, 0))," +
        " (x, y) -> concat(x, ' ', y))").as("ref"))
      .collect()
    rows.foreach(r => assert(r.getSeq[String](0) == r.getSeq[String](1)))
  }

  test("simHash30 == HOF simHash30 bit-exact, incl. empty input") {
    val docs = (texts ++ Seq("", "dup dup unique")).toDF("text")
    val rows = docs.select(
      HashExpressions.simHash30(
        HashExpressions.tokenHashSet(col("text"))).as("fast"),
      TextFunctions.simHash30(TextFunctions.tokenHashes(
        TextFunctions.tokenSet(col("text")))).as("ref"))
      .collect()
    rows.foreach(r => assert(r.getLong(0) == r.getLong(1)))
  }

  test("subSquaredDist / adcSum == their HOF folds bit-exact") {
    val rnd = new scala.util.Random(9)
    val dsub = 4; val nCodes = 3; val m = 2
    val emb = Seq((1L, Array.fill(m * dsub)(rnd.nextFloat())),
      (2L, Array.fill(m * dsub)(rnd.nextFloat()))).toDF("vec_id", "embedding")
    val cent = array((0 until dsub).map(i => lit(rnd.nextDouble())): _*)
    for (sub <- 0 until m) {
      val rows = emb.select(
        HashExpressions.subSquaredDist(
          col("embedding"), cent, lit(sub), dsub).as("fast"),
        graft.operators.Pq.subDistHof(
          col("embedding"), cent, lit(sub), dsub).as("ref"))
        .collect()
      rows.foreach(r => assert(r.getDouble(0) == r.getDouble(1), s"sub=$sub"))
    }
    val adc = Seq((Array(0, 2), Array.tabulate(m * nCodes)(_ * 0.25)))
      .toDF("codes", "dtab")
    val got = adc.select(
      HashExpressions.adcSum(col("codes"), col("dtab"), nCodes).as("fast"),
      aggregate(sequence(lit(0), lit(m - 1)), lit(0.0),
        (acc, s) => acc + element_at(col("dtab"),
          s * nCodes + element_at(col("codes"), s + 1) + 1)).as("ref"))
      .head()
    assert(got.getDouble(0) == got.getDouble(1))
    assert(got.getDouble(0) == 0.0 * 0.25 + (nCodes + 2) * 0.25)
  }

  test("pqEncodeResidual == nearestCells + manual residual + pqEncode bit-exact") {
    import graft.operators.{IvfCentroids, PqCodebooks}
    val rnd = new scala.util.Random(11)
    val emb = (0 until 40)
      .map(i => (i.toLong, Array.fill(64)(rnd.nextFloat() - 0.5f)))
      .toDF("vec_id", "embedding")
    val cents = IvfCentroids.Centroids16
    val cbs = PqCodebooks.ResidualCodebooks8x16
    val centDf = cents.toDF("cell", "centroid")
    val fused = emb.select(col("vec_id"),
        HashExpressions.pqEncodeResidual(col("embedding"), cents, cbs, 8).as("e"))
      .select(col("vec_id"), col("e.cell").as("cell"),
        col("e.codes").cast("array<int>").as("codes"))
      .as[(Long, Int, Seq[Int])].collect().toSet
    val staged = emb.select(col("vec_id"), col("embedding"),
        element_at(HashExpressions.nearestCells(col("embedding"), cents, 1), 1)
          .getField("cell").as("cell"))
      .join(broadcast(centDf), "cell")
      .select(col("vec_id"), col("cell"),
        HashExpressions.pqEncode(
          zip_with(col("embedding"), col("centroid"),
            (x, c) => x.cast("double") - c), cbs, 8)
          .cast("array<int>").as("codes"))
      .as[(Long, Int, Seq[Int])].collect().toSet
    assert(fused == staged)
  }

  test("vecSub == zip_with cast-subtract bit-exact (float and double inputs)") {
    val rnd = new scala.util.Random(17)
    val rows = (0 until 10).map(i => (i.toLong,
      Array.fill(64)(rnd.nextFloat() - 0.5f),
      Array.fill(64)(rnd.nextDouble() - 0.5)))
      .toDF("id", "emb", "cent")
    val both = rows.select(col("id"),
        HashExpressions.vecSub(col("emb"), col("cent")).as("fast"),
        zip_with(col("emb"), col("cent"),
          (x, c) => x.cast("double") - c).as("ref"))
      .collect()
    both.foreach(r => assert(r.getSeq[Double](1) == r.getSeq[Double](2)))
    // double-typed left input too (the residualView fit path)
    val d = rows.select(col("id"),
        col("emb").cast("array<double>").as("emb"), col("cent"))
      .select(HashExpressions.vecSub(col("emb"), col("cent")).as("fast"),
        zip_with(col("emb"), col("cent"), (x, c) => x - c).as("ref"))
      .collect()
    d.foreach(r => assert(r.getSeq[Double](0) == r.getSeq[Double](1)))
  }

  test("adcDirectDist == dtab build + adcSum bit-exact") {
    import graft.operators.PqCodebooks
    val rnd = new scala.util.Random(13)
    val cbs = PqCodebooks.ResidualCodebooks8x16
    val rows = (0 until 20).map { i =>
      (i.toLong, Array.fill(64)(rnd.nextDouble() - 0.5),
        Array.fill(8)(rnd.nextInt(16)))
    }.toDF("id", "res", "codes")
    // reference: per-sub table entries via subSquaredDist, then AdcSum
    val cb = cbs.toDF("sub", "code", "cent")
    val dtabs = rows.crossJoin(broadcast(cb))
      .withColumn("pdist", HashExpressions.subSquaredDist(
        col("res"), col("cent"), col("sub"), 8))
      .groupBy("id")
      .agg(transform(
        sort_array(collect_list(struct(col("sub"), col("code"), col("pdist")))),
        s => s.getField("pdist")).as("dtab"))
    val ref = rows.join(dtabs, "id")
      .select(col("id"),
        HashExpressions.adcSum(col("codes"), col("dtab"), 16).as("d"))
      .as[(Long, Double)].collect().toMap
    val fast = rows.select(col("id"),
        HashExpressions.adcDirectDist(col("res"), col("codes"), cbs, 8).as("d"))
      .as[(Long, Double)].collect().toMap
    assert(fast == ref)
  }

  test("adcDirectDist codegen == interpreted eval bit-exact") {
    import org.apache.spark.sql.catalyst.util.ArrayData
    val rnd = new scala.util.Random(29)
    val cbs = graft.operators.PqCodebooks.ResidualCodebooks8x16
    val rows = (0 until 50).map { i =>
      (i.toLong, Array.fill(64)(rnd.nextDouble() - 0.5),
        Array.fill(8)(rnd.nextInt(16)))
    }
    // DataFrame path (whole-stage codegen evaluates doGenCode)
    val viaDf = rows.toDF("id", "res", "codes")
      .select(col("id"),
        HashExpressions.adcDirectDist(col("res"), col("codes"), cbs, 8).as("d"))
      .as[(Long, Double)].collect().toMap
    // direct interpreted eval on the same inputs
    val expr = HashExpressions.AdcDirectDist(
      org.apache.spark.sql.catalyst.expressions.Literal(1),
      org.apache.spark.sql.catalyst.expressions.Literal(1), cbs, 8)
    rows.foreach { case (id, res, codes) =>
      val got = expr.nullSafeEval(
        ArrayData.toArrayData(res), ArrayData.toArrayData(codes))
        .asInstanceOf[Double]
      assert(java.lang.Double.doubleToLongBits(got) ==
        java.lang.Double.doubleToLongBits(viaDf(id)),
        s"codegen/interpreted drift at id=$id")
    }
  }

  test("rolling-window update matches direct fold on a long string") {
    val rnd = new scala.util.Random(5)
    val s = (1 to 2000).map(_ => ('a' + rnd.nextInt(26)).toChar).mkString
    val got = Seq(s).toDF("text")
      .select(HashExpressions.shingleHashes(col("text"), 7))
      .first().getSeq[Long](0).toSet
    val expect = s.sliding(7).map(
      _.foldLeft(0L)((a, c) => (a * 31 + c) % 1000000007L)).toSet
    assert(got == expect)
  }

  test("sortedJaccardGeq: exact above t, provably-below t when abandoned") {
    // the r18 early-abandon verify: survivors of a `jac >= t` filter
    // must be BIT-identical to SortedJaccard; abandoned pairs must
    // truly be below t (their exact value would fail the filter too)
    val rnd = new scala.util.Random(7)
    val rows = (1 to 300).map { i =>
      val na = 1 + rnd.nextInt(400)
      val nb = 1 + rnd.nextInt(400)
      // overlapping universes of varying density so jaccard spans 0..1
      val uni = 1 + rnd.nextInt(500)
      val a = Seq.fill(na)(rnd.nextInt(uni).toLong).distinct.sorted
      val b = Seq.fill(nb)(rnd.nextInt(uni).toLong).distinct.sorted
      (i.toLong, a, b)
    }
    val df = rows.toDF("id", "a", "b")
    for (t <- Seq(0.3, 0.5, 0.6, 0.9)) {
      val got = df.select(col("id"),
        HashExpressions.sortedJaccard(col("a"), col("b")).as("exact"),
        HashExpressions.sortedJaccardGeq(col("a"), col("b"), t).as("geq"))
        .collect()
      got.foreach { r =>
        val (exact, geq) = (r.getDouble(1), r.getDouble(2))
        if (exact >= t)
          assert(java.lang.Double.doubleToLongBits(exact) ==
            java.lang.Double.doubleToLongBits(geq),
            s"id=${r.getLong(0)} t=$t: survivor drifted $exact vs $geq")
        else assert(geq < t,
          s"id=${r.getLong(0)} t=$t: below-threshold pair passed ($geq)")
      }
      // interpreted eval must agree with the codegen'd path
      val expr = HashExpressions.SortedJaccardGeq(null, null, t)
      rows.foreach { case (id, a, b) =>
        val iv = expr.nullSafeEval(
          org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(a.toArray),
          org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(b.toArray))
          .asInstanceOf[Double]
        val cg = got.find(_.getLong(0) == id).get.getDouble(2)
        assert(java.lang.Double.doubleToLongBits(iv) ==
          java.lang.Double.doubleToLongBits(cg),
          s"id=$id t=$t: codegen/interpreted drift $cg vs $iv")
      }
    }
  }
}
