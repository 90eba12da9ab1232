package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.SparkPlan
import org.scalatest.funsuite.AnyFunSuite

/** Physical-plan assertions: the properties that matter at 100 TB must
  * be visible in the plan, not assumed — filter/projection pushdown
  * into the parquet scan, broadcast joins for dimensions, partial
  * (map-side) aggregation, and no accidental cartesian products.
  */
class PlanSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  val d = "/root/testdata/sf0.001"

  private def physical(name: String): String = {
    val df = SparkEntry.queries(name)(spark, d)
    df.queryExecution.executedPlan.toString
  }

  test("q02: filter and projection reach the parquet scan") {
    val plan = physical("q02_filter_project")
    assert(plan.contains("PushedFilters: ["), plan.take(2000))
    assert(plan.contains("GreaterThan(o_totalprice"), plan.take(2000))
    // pruned read schema — only the 4 needed columns, not the full table
    assert(!plan.contains("o_orderstatus"))
  }

  test("q03: dimension joins are broadcast, fact is not shuffled for them") {
    val plan = physical("q03_join_revenue")
    assert(plan.contains("BroadcastHashJoin"), plan.take(3000))
  }

  test("q01: hash aggregation is partial (map-side combine)") {
    val plan = physical("q01_agg_pushdown")
    // two HashAggregate nodes: partial + final
    assert("HashAggregate".r.findAllIn(plan).size >= 2, plan.take(3000))
  }

  test("q08: proration is a narrow generate (no shuffle before the agg)") {
    val plan = physical("q08_hour_proration")
    assert(plan.contains("Generate explode"), plan.take(3000))
    // exactly one exchange: the final groupBy
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(exchanges == 1, s"expected 1 shuffle, plan:\n${plan.take(3000)}")
  }

  test("q21: LSH pair generation is an equi-join on band hash, not a cartesian") {
    val plan = physical("q21_minhash_lsh")
    assert(!plan.contains("CartesianProduct"), plan.take(3000))
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan.take(3000))
  }

  test("q23: brute-force ANN broadcasts the query set") {
    val plan = physical("q23_ann_bruteforce")
    assert(plan.contains("BroadcastNestedLoopJoin")
      || plan.contains("BroadcastHashJoin"), plan.take(3000))
  }

  test("whole-stage codegen covers the scan→filter→project pipeline (q02)") {
    val plan = physical("q02_filter_project")
    // compact plan marks codegen stages with a `*(n)` prefix
    assert(plan.contains("*(1) Project") && plan.contains("*(1) Filter"),
      plan.take(2000))
  }

  test("q37: hash-stratified sample is a narrow shuffle-free filter") {
    val plan = physical("q37_strat_sample")
    assert(!plan.contains("Exchange"), plan.take(3000))
  }

  test("q38: TF-IDF top-k window is partitioned by doc_id, never global") {
    val plan = physical("q38_tfidf")
    assert(plan.contains("windowspecdefinition(doc_id"), plan.take(4000))
    assert(!plan.contains("windowspecdefinition(,"), plan.take(4000))
  }

  test("corpus queries: no cartesian products anywhere") {
    Seq("q36_repetition", "q38_tfidf", "q39_quality_filter",
      "q40_minhash_acc", "q41_lsh_recall").foreach { q =>
      val plan = physical(q)
      assert(!plan.contains("CartesianProduct"), s"$q:\n${plan.take(2000)}")
    }
  }

  test("q36: bigram top count aggregates partially before the shuffle") {
    val plan = physical("q36_repetition")
    assert("HashAggregate".r.findAllIn(plan).size >= 2, plan.take(3000))
  }

  test("q42: chunking is a narrow generate — no shuffle at all") {
    val plan = physical("q42_chunking")
    assert(plan.contains("Generate explode"), plan.take(3000))
    assert(!plan.contains("Exchange hashpartitioning"), plan.take(3000))
  }

  test("q43: decontamination broadcasts the probe gram set, corpus side unshuffled") {
    val plan = physical("q43_contamination")
    assert(plan.contains("BroadcastNestedLoopJoin")
      || plan.contains("BroadcastHashJoin"), plan.take(3000))
  }

  test("q76: both cap windows are shard/source-partitioned, never global") {
    val plan = physical("q76_source_cap")
    // phase 1 must carry the shard in its partitioning (the hot-source
    // parallelism); no window may be unpartitioned
    assert(plan.contains("windowspecdefinition(source"), plan.take(4000))
    assert(plan.contains("shard"), plan.take(4000))
    assert(!plan.contains("windowspecdefinition(,"), plan.take(4000))
  }

  test("q77: bigram LM has no window and no cartesian — count joins only") {
    val plan = physical("q77_bigram_lm")
    assert(!plan.contains("CartesianProduct"), plan.take(3000))
    assert(!plan.contains("Window"), plan.take(3000))
    // partial aggregation collapses the bigram explode map-side
    assert("HashAggregate".r.findAllIn(plan).size >= 2, plan.take(3000))
  }

  test("q75: pixel decode is a narrow map — no shuffle of the binaries") {
    val plan = physical("q75_pixel_decode")
    // the only exchange permitted is none: doc_id-keyed stats come out
    // of the per-partition decoder directly
    assert(!plan.contains("Exchange hashpartitioning"), plan.take(3000))
  }

  test("q59/q60: retrieval plans carry no interpreted lambda chains") {
    Seq("q59_keyword_search", "q60_hybrid_rrf").foreach { q =>
      val plan = physical(q)
      assert(!plan.contains("lambdafunction"), s"$q:\n${plan.take(3000)}")
    }
  }
}
