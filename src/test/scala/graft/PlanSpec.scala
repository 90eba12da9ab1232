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

  test("q78: corpus diff shuffles 16-byte hash rows, never document text") {
    val plan = physical("q78_corpus_diff")
    assert(!plan.contains("CartesianProduct"), plan.take(3000))
    // the full-outer join keys on doc_id over (doc_id, poly_hash) rows:
    // text must be projected away BELOW both exchanges — no shuffled
    // attribute set may contain the text column
    val exchanges = plan.linesIterator.filter(_.contains("Exchange")).toSeq
    assert(exchanges.nonEmpty, plan.take(3000))
    assert(plan.contains("poly_hash"), plan.take(3000))
    // text appears only in scan/project lines, never after an exchange:
    // the hash projection happens before the join, so the join operator
    // itself must not reference `text`
    val joinLines = plan.linesIterator.filter(_.contains("SortMergeJoin")).toSeq
    assert(joinLines.nonEmpty && joinLines.forall(!_.contains("text#")),
      joinLines.mkString("\n"))
  }

  test("q79: token-budget prefix has no global window or single-partition funnel") {
    // the operator materializes through the two-pass offset trick, so
    // the output plan is an ExistingRDD scan — what must NOT appear is
    // a global window or an everything-to-one-partition exchange (the
    // range shuffle itself runs inside the operator; its semantics are
    // pinned by CurationOpsSpec's partitioning-invariance test)
    val plan = physical("q79_token_budget")
    assert(!plan.contains("windowspecdefinition"), plan.take(3000))
    assert(!plan.contains("Exchange SinglePartition"), plan.take(3000))
    assert(plan.contains("Scan ExistingRDD"), plan.take(3000))
  }

  test("ALL plans: no cartesian, no new interpreted lambdas, no global sort under a limit") {
    // The sweep the targeted tests above can't give: every registered
    // query's physical plan is checked for the shapes that kill a
    // 100 TB run, so a regression in ANY query — including ones added
    // later — fails here without needing its own test.
    //
    // lambdafunction( budget: the pinned per-query count of
    // higher-order functions each plan legitimately carries today —
    // per-token or per-array-element folds on BOUNDED arrays (64-dim
    // embeddings, k-element buffers, token arrays), never
    // per-character text scans (those moved to native expressions in
    // rounds 5-8; q18/q64's per-char folds went native in round 8, and
    // q68's array filter now wraps Spark's native
    // BloomFilterMightContain instead of a Scala UDF). Raising a
    // budget is a deliberate decision, not drift.
    val lambdaBudget = Map(
      "q15_token_stats" -> 2, "q39_quality_filter" -> 2,
      "q40_minhash_acc" -> 3, "q44_hybrid_dedup" -> 4,
      "q68_bloom_decontam" -> 1, "q73_rand_proj" -> 1)
    spark.conf.set("spark.sql.adaptive.enabled", "false") // plain trees
    try {
      SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
        val plan = fn(spark, d).queryExecution.executedPlan
        val s = plan.toString
        assert(!s.contains("CartesianProduct"),
          s"$name: cartesian product in plan")
        val nLambda = "lambdafunction\\(".r.findAllIn(s).size
        assert(nLambda <= lambdaBudget.getOrElse(name, 0),
          s"$name: $nLambda interpreted lambdas (budget ${lambdaBudget.getOrElse(name, 0)}) — native expression regressed?")
        // top-k must plan as TakeOrderedAndProject, never a full global
        // sort under a limit
        plan.foreach {
          case g: org.apache.spark.sql.execution.GlobalLimitExec =>
            g.foreach {
              case srt: org.apache.spark.sql.execution.SortExec if srt.global =>
                fail(s"$name: global Sort under GlobalLimit — top-k lost TakeOrderedAndProject")
              case _ => ()
            }
          case _ => ()
        }
      }
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }

  test("q72: fuzzy edit distance is a block equi-join with the q-gram prune in place") {
    val plan = physical("q72_fuzzy_editdist")
    assert(!plan.contains("CartesianProduct"), plan.take(3000))
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan.take(3000))
    // the lossless prefilter sits in the join condition/filter ahead of
    // the DP: both the intersect-count scan and the early-abandon
    // levenshtein must be present
    assert(plan.contains("sorted_intersect_count"), plan.take(4000))
    assert(plan.contains("levenshtein"), plan.take(4000))
  }

  test("tiled kernels (q82–q85): hash exchange on the tile key, no sort under the kernel") {
    // The kernels' no-sort property is the point of the shape: tiles
    // are distributed by an UnsafeRow HASH exchange and decoded by a
    // typed mapPartitions — a mapGroups/groupBy formulation would
    // instead SORT every tile's multi-KB payload rows (the exact cost
    // the kernels exist to avoid; q20's sort-merge over wide shingle
    // rows measured 233 s at sf10). A Sort or a range exchange
    // appearing under these plans is a regression.
    for (q <- Seq("q82_ngram_tiled", "q83_nn_tiled", "q84_cosine_tiled",
        "q85_edit_tiled")) {
      val plan = physical(q)
      assert(plan.contains("MapPartitions"), s"$q: kernel node missing\n" + plan.take(3000))
      assert(plan.contains("Exchange hashpartitioning"), s"$q\n" + plan.take(3000))
      // the tree prints top-down, so everything after the LAST
      // MapPartitions is the kernel's input subtree (tile exchange +
      // payload scan) — the segment that must never sort the wide
      // rows. Downstream slim-row sorts (q83's max_by SortAggregate
      // over 24-byte partials) are fine and not what the kernels buy.
      val under = plan.substring(plan.lastIndexOf("MapPartitions"))
      assert(!under.contains("Sort "), s"$q: SortExec under the kernel\n" + under.take(3000))
      assert(!under.contains("SortMergeJoin"), s"$q\n" + under.take(3000))
      assert(!under.contains("Exchange rangepartitioning"), s"$q\n" + under.take(3000))
    }
  }

  test("q21/q71 carry shape: in-join verification, wide rows never sort") {
    // The carry shape (r7-proven, r9 re-proven vs a slim variant) runs
    // at every scale: the jaccard verify sits IN the band join — the
    // hs arrays flow through it (sorted_jaccard on join outputs), no
    // per-candidate attach join — and the wide rows must hash-join,
    // never sort-merge (sorting them measured 243 s / 14 GB spilled
    // at sf10). At gate scale saltedBlockJoin's maxR escape keeps the
    // join plain; the salted variant of the same shape is pinned by
    // ParallelismSpec.
    for (q <- Seq("q21_minhash_lsh", "q71_incr_neardup")) {
      val plan = physical(q)
      assert(plan.contains("sorted_jaccard"), s"$q\n" + plan.take(3000))
      assert(!plan.contains("CartesianProduct"), s"$q\n" + plan.take(3000))
      assert(!plan.contains("SortMergeJoin"),
        s"$q: wide rows must hash-join, not sort\n" + plan.take(3000))
    }
  }
}
