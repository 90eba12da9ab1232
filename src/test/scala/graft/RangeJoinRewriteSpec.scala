package graft

import graft.plans.RangeJoinRewrite
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** The range-join optimizer rule: inequality joins become binned
  * equi-joins (plan-asserted), with results identical to the
  * nested-loop original. */
class RangeJoinRewriteSpec extends AnyFunSuite {

  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    if (!s.experimental.extraOptimizations.contains(RangeJoinRewrite))
      s.experimental.extraOptimizations =
        s.experimental.extraOptimizations :+ RangeJoinRewrite
    s
  }

  import spark.implicits._

  private def withBinWidth[A](w: Long)(f: => A): A = {
    spark.conf.set(RangeJoinRewrite.BinWidthConf, w.toString)
    try f finally spark.conf.unset(RangeJoinRewrite.BinWidthConf)
  }

  private val rnd = new scala.util.Random(13)
  private def pointsDf = (1 to 400)
    .map(i => (i.toLong, rnd.nextInt(5).toLong, rnd.nextInt(2000).toLong))
    .toDF("pt_id", "k", "pt")
  private def ivsDf = (1 to 50).map { i =>
    val lo = rnd.nextInt(2000).toLong - 30
    (i.toLong, i.toLong % 5, lo, lo + rnd.nextInt(200) - 20)
  }.toDF("iv_id", "k2", "lo", "hi")

  test("pure range join: nested-loop without the rule, equi-join with it") {
    val points = pointsDf
    val ivs = ivsDf
    def query = points.join(ivs, $"pt" >= $"lo" && $"pt" <= $"hi")
      .select("pt_id", "iv_id")
    val before = query.queryExecution.executedPlan.toString
    assert(before.contains("NestedLoop") || before.contains("Cartesian"))
    val want = query.as[(Long, Long)].collect().sorted

    withBinWidth(128) {
      val after = query.queryExecution.executedPlan.toString
      assert(!after.contains("NestedLoop") && !after.contains("Cartesian"),
        s"rewrite did not fire:\n$after")
      assert(query.as[(Long, Long)].collect().sorted.sameElements(want))
    }
  }

  test("keyed range join keeps results; strict bounds and reversed sides too") {
    val points = pointsDf
    val ivs = ivsDf
    // intervals on the LEFT, strict upper bound, plus a key equality
    def query = ivs.join(points,
      $"k2" === $"k" && $"pt" > $"lo" && $"pt" < $"hi")
      .select("iv_id", "pt_id")
    val want = query.as[(Long, Long)].collect().sorted
    withBinWidth(64) {
      val plan = query.queryExecution.optimizedPlan.toString
      assert(plan.contains("_graft_bin"), s"rewrite did not fire:\n$plan")
      assert(query.as[(Long, Long)].collect().sorted.sameElements(want))
    }
  }

  test("rule leaves plain equi-joins and half-bounded joins untouched") {
    val points = pointsDf
    val ivs = ivsDf
    withBinWidth(64) {
      val equi = points.join(ivs, $"k" === $"k2")
      assert(!equi.queryExecution.optimizedPlan.toString.contains("_graft_bin"))
      val half = points.join(ivs, $"pt" >= $"lo")
      assert(!half.queryExecution.optimizedPlan.toString.contains("_graft_bin"))
    }
  }

  test("disabled (no conf) means no rewrite") {
    val q = pointsDf.join(ivsDf, $"pt" >= $"lo" && $"pt" <= $"hi")
    assert(!q.queryExecution.optimizedPlan.toString.contains("_graft_bin"))
  }
}
