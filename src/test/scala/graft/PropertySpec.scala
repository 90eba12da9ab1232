package graft

import graft.functions.HashExpressions
import graft.operators.{AudioHeaders, Corpus, ImageHeaders}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Seeded-random property loops (scalacheck is not in the offline
  * cache) for the native expressions and operators whose correctness
  * the oracles depend on — each checked against an independent
  * reference formulation. */
class PropertySpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  private val rnd = new scala.util.Random(20260812L)

  test("dotProduct == HOF fold == Scala reference, floats and doubles") {
    val rows = Seq.fill(50)(
      (Array.fill(64)(rnd.nextGaussian().toFloat),
        Array.fill(64)(rnd.nextGaussian().toFloat)))
    val df = rows.toDF("a", "b")
    val got = df.select(
      HashExpressions.dotProduct(col("a"), col("b")).as("native"),
      expr("aggregate(zip_with(a, b, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), " +
        "CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)").as("hof"))
      .collect()
    got.zip(rows).foreach { case (r, (a, b)) =>
      val ref = a.zip(b).foldLeft(0.0) { case (acc, (x, y)) =>
        acc + x.toDouble * y.toDouble
      }
      assert(r.getDouble(0) == ref) // bit-identical, not approx
      assert(r.getDouble(1) == ref)
    }
  }

  test("sortedJaccard == set-based reference on random sorted arrays") {
    val rows = Seq.fill(100)((
      rnd.shuffle((0L until 200L).toList).take(rnd.nextInt(50) + 1).sorted.toArray,
      rnd.shuffle((0L until 200L).toList).take(rnd.nextInt(50) + 1).sorted.toArray))
    val got = rows.toDF("a", "b")
      .select(HashExpressions.sortedJaccard(col("a"), col("b")))
      .collect().map(_.getDouble(0))
    got.zip(rows).foreach { case (j, (a, b)) =>
      val (sa, sb) = (a.toSet, b.toSet)
      val ref = sa.intersect(sb).size.toDouble / sa.union(sb).size
      assert(j == ref)
    }
  }

  test("lshProjections == per-plane HOF fold; planes are NOT all identical") {
    val rows = Seq.fill(20)(Array.fill(64)(rnd.nextGaussian().toFloat))
    val df = rows.toDF("embedding")
    val hofPlanes = (0 until 32).map { j =>
      val a = graft.functions.TextFunctions.LshA(j)
      val b = graft.functions.TextFunctions.LshB(j)
      expr(s"aggregate(zip_with(embedding, sequence(1, 64), (x, i) -> " +
        s"CAST(x AS DOUBLE) * (CASE WHEN (CAST($a AS BIGINT) * i + $b) * (CAST($a AS BIGINT) * i + $b) % 1000000007 % 2 = 0 " +
        s"THEN 1.0D ELSE -1.0D END)), 0.0D, (acc, v) -> acc + v)")
    }
    val got = df.select(
      HashExpressions.lshProjections(col("embedding"), 32).as("native"),
      array(hofPlanes: _*).as("hof"))
      .collect()
    got.foreach { r =>
      assert(r.getSeq[Double](0) == r.getSeq[Double](1)) // bit-identical
    }
    // regression for the all-odd-constant degeneracy: sign patterns
    // must differ across planes (the bug made every plane identical)
    val signs = (0 until 32).map { j =>
      val a = graft.functions.TextFunctions.LshA(j)
      val b = graft.functions.TextFunctions.LshB(j)
      (1 to 64).map(i => (a * i + b) * (a * i + b) % 1000000007L % 2).toVector
    }
    assert(signs.distinct.size == 32, "hyperplane sign patterns collapsed")
  }

  test("tokenizer family == HOF forms on random whitespace-heavy texts") {
    // random texts mixing every \s class char, empty runs, and edges
    val wsChars = " \t\n\f\r"
    def randText(): String = {
      val sb = new StringBuilder
      for (_ <- 0 until rnd.nextInt(60)) {
        if (rnd.nextBoolean()) sb.append(wsChars(rnd.nextInt(wsChars.length)))
        else sb.append(('a' + rnd.nextInt(4)).toChar) // tiny alphabet → dup tokens
      }
      sb.toString
    }
    val docs = Seq.fill(200)(randText()).toDF("text")
      .withColumn("tk", graft.functions.TextFunctions.tokensHof(col("text")))
    val rows = docs.select(
      HashExpressions.tokenArray(col("text")).as("fastTok"),
      col("tk").as("refTok"),
      HashExpressions.tokenBigrams(col("text")).as("fastBg"),
      expr("zip_with(slice(tk, 1, greatest(size(tk)-1, 0))," +
        " slice(tk, 2, greatest(size(tk)-1, 0))," +
        " (x, y) -> concat(x, ' ', y))").as("refBg"),
      HashExpressions.tokenNGramHashes(col("text"), 2).as("fastGr"),
      graft.operators.Corpus.gramHashesHof(2)(col("tk")).as("refGr"))
      .collect()
    rows.foreach { r =>
      assert(r.getSeq[String](0) == r.getSeq[String](1))
      assert(r.getSeq[String](2) == r.getSeq[String](3))
      assert(r.getSeq[Long](4) == r.getSeq[Long](5))
    }
  }

  test("TimeBuckets.bucket is idempotent and never exceeds its input") {
    import graft.serve.TimeBuckets
    val zones = Seq("UTC", "America/New_York", "Asia/Tokyo")
    val units = Seq("HOURS", "DAYS", "WEEKS", "MONTHS", "QUARTERS")
    val ts = Seq.fill(200)(1500000000000L + (rnd.nextLong() % 200000000000L).abs)
    val df = ts.toDF("t")
    for (z <- zones; u <- units) {
      val got = df.select(col("t"),
        TimeBuckets.bucket(col("t"), u, z).as("b1"))
        .withColumn("b2", TimeBuckets.bucket(col("b1"), u, z))
        .collect()
      got.foreach { r =>
        assert(r.getLong(1) <= r.getLong(0), s"$u/$z bucket after input")
        assert(r.getLong(2) == r.getLong(1), s"$u/$z not idempotent")
      }
    }
  }

  test("header decoders never throw on random or truncated bytes") {
    (1 to 500).foreach { _ =>
      val b = Array.fill(rnd.nextInt(128))(rnd.nextInt(256).toByte)
      ImageHeaders.decode(b)
      AudioHeaders.decodeWav(b)
    }
    val png = ImageHeaders.pngFixture(64, 48, Array[Byte](1, 2))
    val jpg = ImageHeaders.jpegFixture(64, 48, Array[Byte](1, 2))
    val wav = AudioHeaders.wavFixture(1, 8000, 16, 10)
    Seq(png, jpg, wav).foreach { full =>
      (0 to full.length).foreach { n =>
        ImageHeaders.decode(full.take(n)) // must not throw at any cut
        AudioHeaders.decodeWav(full.take(n))
      }
    }
  }

  test("chunking with stride == chunk size reconstructs every token") {
    val docs = (0L until 30L)
      .map(i => (i, Seq.fill(rnd.nextInt(40) + 1)(s"w${rnd.nextInt(20)}").mkString(" ")))
      .toDF("doc_id", "text")
    val chunks = Corpus.chunkDocuments(docs, chunkTokens = 7, stride = 7)
      .collect()
      .groupBy(_.getLong(0))
      .view.mapValues(_.sortBy(_.getLong(1)).map(_.getString(2)).mkString(" "))
      .toMap
    docs.collect().foreach { r =>
      val expected = r.getString(1).trim
      assert(chunks(r.getLong(0)) == expected)
    }
  }

  test("repetitionStats invariants on random texts") {
    val docs = (0L until 50L)
      .map(i => (i, Seq.fill(rnd.nextInt(30) + 1)(s"t${rnd.nextInt(8)}").mkString(" ")))
      .toDF("doc_id", "text")
    Corpus.repetitionStats(docs).collect().foreach { r =>
      val (nw, nd, nb, top) =
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
      assert(nd <= nw && nd >= 1)
      assert(nb == math.max(nw - 1, 0))
      assert(top <= nb)
      assert(r.getDouble(5) >= 0.0 && r.getDouble(5) < 1.0)
      assert(r.getDouble(6) >= 0.0 && r.getDouble(6) <= 1.0)
    }
  }

  test("packSequences reference check on random docs: bins match a scala fold") {
    val docs = (0L until 80L)
      .map(i => (i, s"s${rnd.nextInt(3)}",
        Seq.fill(rnd.nextInt(40) + 1)("w").mkString(" ")))
      .toDF("doc_id", "source", "text")
    val got = Corpus.packSequences(docs, budget = 64L, nShards = 4)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)) ->
        (r.getLong(3), r.getLong(4))).toMap
    // independent reference: group → sort → running sum → bin
    val ref = docs.collect().toSeq
      .map(r => (r.getLong(0), r.getString(1), r.getString(2).split(" ").length.toLong))
      .groupBy { case (id, src, _) => (src, id % 4) }
      .toSeq
      .flatMap { case ((src, shard), rows) =>
        var cum = 0L
        rows.sortBy(_._1).map { case (_, _, n) =>
          val bin = cum / 64L
          cum += n
          ((src, shard, bin), n)
        }
      }
      .groupBy(_._1)
      .map { case (k, vs) => k -> ((vs.size.toLong, vs.map(_._2).sum)) }
    assert(got == ref)
  }

  test("shuffleRank on random sparse id sets: rank is the sort order of the key") {
    val ids = rnd.shuffle((0L until 10000L).toList).take(200)
    val docs = ids.map(i => (i, "x")).toDF("doc_id", "text")
    val got = Corpus.shuffleRank(docs, seed = 5L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // independent reference: the same squared polyhash in scala
    val P = 1000000007L
    def key(i: Long): Long = {
      val h = s"5:$i".foldLeft(0L)((a, c) => (a * 31 + c.toLong) % P)
      val h2 = h * h % P
      h2 * h2 % P
    }
    got.foreach { case (id, k, _) => assert(k == key(id)) }
    val expectedOrder = ids.sortBy(i => (key(i), i))
    assert(got.sortBy(_._3).map(_._1).toList == expectedOrder)
  }

  test("randomProjection norm identity on ±axis vectors") {
    // a one-hot vector's projection components are ±1/√k, so its
    // projected norm is exactly 1 for any k that is a power of 4
    val vecs = (0 until 8)
      .map(i => (i.toLong, Array.tabulate(8)(j => if (j == i) 1.0f else 0.0f)))
      .toDF("vec_id", "embedding")
    val norms = graft.operators.Similarity.randomProjection(vecs, 16)
      .select(sqrt(graft.operators.Similarity.dot(col("proj"), col("proj"))))
      .collect().map(_.getDouble(0))
    norms.foreach(n => assert(n == 1.0))
  }
}
