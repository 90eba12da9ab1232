package graft

import graft.operators.{AsOf, Dedup, RangeJoin}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** As-of join, binned range join, and connected components — the three
  * join-family operators Spark has no single built-in for. */
class JoinOpsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  test("asofJoin: latest at-or-before match per key, null when none") {
    val left = Seq((1L, 100L, "p1"), (1L, 50L, "p2"), (2L, 10L, "p3"))
      .toDF("k", "ts", "tag")
    val right = Seq((1L, 100L, "r100"), (1L, 60L, "r60"), (1L, 40L, "r40"),
      (2L, 20L, "r20"))
      .toDF("k", "ts", "v")
    val got = AsOf.asofJoin(left, right, Seq("k"), "ts", Seq("v"))
      .collect().map(r => r.getString(2) ->
        (Option(r.get(3)).map(_.asInstanceOf[Long]), Option(r.getString(4))))
      .toMap
    assert(got("p1") == (Some(100L), Some("r100"))) // same-instant matches
    assert(got("p2") == (Some(40L), Some("r40")))   // skips the later r60
    assert(got("p3") == (None, None))               // nothing at or before
  }

  test("asofJoin: null payload field does not fall back to an older row") {
    val left = Seq((1L, 100L)).toDF("k", "ts")
    val right = Seq((1L, 10L, Some("old")), (1L, 90L, None: Option[String]))
      .toDF("k", "ts", "v")
    val row = AsOf.asofJoin(left, right, Seq("k"), "ts", Seq("v")).collect()(0)
    // the matched row is ts=90 whose v is null — NOT ts=10's "old"
    assert(row.getLong(2) == 90L && row.isNullAt(3))
  }

  test("asofJoin plans one shuffle on the key, no join node") {
    val left = Seq((1L, 100L)).toDF("k", "ts")
    val right = Seq((1L, 10L, "x")).toDF("k", "ts", "v")
    val plan = AsOf.asofJoin(left, right, Seq("k"), "ts", Seq("v"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), s"expected join-free sort-merge plan:\n$plan")
    assert(plan.contains("Window"))
  }

  test("intervalJoin matches naive inequality join, drops invalid intervals") {
    val rnd = new scala.util.Random(7)
    val points = (1 to 300).map(i => (i.toLong % 5, rnd.nextInt(1000).toLong))
      .toDF("k", "pt")
    val ivs = (1 to 60).map { i =>
      val lo = rnd.nextInt(1000).toLong - 20
      (i.toLong, i.toLong % 5, lo, lo + rnd.nextInt(120) - 10) // some hi<lo
    }.toDF("iv_id", "k", "lo", "hi")
    val got = RangeJoin
      .intervalJoin(points, ivs, Seq("k"), "pt", "lo", "hi", binWidth = 64)
      .select("iv_id", "pt").as[(Long, Long)].collect().sorted
    val naive = ivs.as("i").join(points.as("p"), $"i.k" === $"p.k" &&
        $"pt" >= $"lo" && $"pt" <= $"hi")
      .select("iv_id", "pt").as[(Long, Long)].collect().sorted
    assert(got.sameElements(naive))
    assert(got.nonEmpty)
  }

  test("intervalJoin plans an equi-join, never a nested-loop/cartesian") {
    val points = Seq((1L, 5L)).toDF("k", "pt")
    val ivs = Seq((1L, 0L, 10L)).toDF("k", "lo", "hi")
    val plan = RangeJoin
      .intervalJoin(points, ivs, Seq("k"), "pt", "lo", "hi", 16)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("NestedLoop") && !plan.contains("Cartesian"),
      s"range join degenerated:\n$plan")
  }

  test("connectedComponents: chains collapse transitively, labels are min id") {
    // 1-2-3 one chain (1~3 never proposed), 7-8, 9 isolated node via self-ref
    val edges = Seq((2L, 1L), (2L, 3L), (7L, 8L), (9L, 9L)).toDF("a", "b")
    val got = Dedup.connectedComponents(edges, "a", "b")
      .as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 7L -> 7L, 8L -> 7L, 9L -> 9L))
  }

  test("connectedComponents matches union-find on a random graph") {
    val rnd = new scala.util.Random(11)
    val n = 120
    val edges = (1 to 150).map(_ => (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
    // reference union-find
    val parent = Array.tabulate(n)(identity)
    def find(x: Int): Int = { var r = x; while (parent(r) != r) r = parent(r); r }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a.toInt), find(b.toInt))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val want = edges.flatMap(e => Seq(e._1, e._2)).distinct
      .map(id => id -> {
        // component = min node id among nodes sharing the root
        val root = find(id.toInt)
        (0 until n).filter(find(_) == root)
          .filter(i => edges.exists(e => e._1 == i || e._2 == i)).min.toLong
      }).toMap
    val got = Dedup.connectedComponents(edges.toDF("a", "b"), "a", "b")
      .as[(Long, Long)].collect().toMap
    assert(got == want)
    // r17: the default run above took the bounded driver union-find
    // fast path; the forced DISTRIBUTED loop (smallGraphEdges = -1)
    // must produce the identical labeling — the fast path's
    // equivalence contract.
    val gotDist = Dedup.connectedComponents(edges.toDF("a", "b"), "a", "b",
      smallGraphEdges = -1L).as[(Long, Long)].collect().toMap
    assert(gotDist == want)
  }

  test("connectedComponents: long chain beyond maxIter converges via pointer jumping") {
    // a 120-node path needs ~119 plain-propagation rounds; with
    // maxIter=5 the old code returned silently-wrong labels. The
    // pointer-jumping phase compresses the chain in O(log n) rounds.
    // smallGraphEdges = -1 forces the distributed loop (the r17 fast
    // path would otherwise solve the chain on the driver).
    val n = 120L
    val chain = (0L until n - 1).map(i => (i, i + 1))
    val got = Dedup.connectedComponents(
      chain.toDF("a", "b"), "a", "b", maxIter = 5, smallGraphEdges = -1L)
      .as[(Long, Long)].collect().toMap
    assert(got.size == n && got.values.forall(_ == 0L), got.toSeq.sorted.take(20))
  }

  test("connectedComponents: non-convergence throws instead of mislabeling") {
    val chain = (0L until 80L).map(i => (i, i + 1))
    val e = intercept[IllegalStateException] {
      Dedup.connectedComponents(
        chain.toDF("a", "b"), "a", "b", maxIter = 3, shortcutIter = 0,
        smallGraphEdges = -1L)
    }
    assert(e.getMessage.contains("did not converge"))
  }
}
