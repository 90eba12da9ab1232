package graft.tools

import org.apache.spark.sql.functions._

/** Scratch measurement main (not part of the driver contract): the
  * [[graft.operators.Similarity.lshTopKAuto]] `annMode` routing A/B —
  * run the requested engines over a real embeddings table and print
  * one JSON line each, plus the routing statistic auto dispatches on
  * (the banded candidate bound Σ_bucket n·(n−1)), so STRESS.md can
  * show auto picking the cheaper engine on BOTH sides of the boundary
  * (uniform → lsh, clustered → ivfadc). Forced-lsh on a heavily
  * clustered corpus is the catastrophic case — request it explicitly
  * (`engines=lsh`) only at scales you can afford.
  *
  * `recallQueries` > 0 adds the QUALITY row the cost A/B lacks: a
  * deterministic sample of queries gets an exact cosine top-k
  * (brute force: broadcast sample × one corpus scan — Q·n dots, cheap
  * next to any engine), and each engine's output is scored
  * recall@k = |engine ∩ exact| / (Q·k) over the sample. This is what
  * proves auto is quality-parity at the routing boundary, not just
  * cost-parity.
  *
  * `repeat` > 1 re-runs each engine; with the session QuantizerMemo
  * the second routed run must cost ≈ search only (the fit memoized —
  * VERDICT r12 item 2's A/B row).
  *
  * Usage: sbt "runMain graft.tools.AnnRouteProbe <sfDir> [k] [engines]
  *             [recallQueries] [repeat]"
  *   engines: comma list of auto|lsh|ivfadc (default "auto,ivfadc")
  */
object AnnRouteProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/sf10")
    val k = if (args.length > 1) args(1).toInt else 3
    val engines = (if (args.length > 2) args(2) else "auto,ivfadc")
      .split(',').map(_.trim).filter(_.nonEmpty)
    val recallQueries = if (args.length > 3) args(3).toInt else 0
    val repeat = if (args.length > 4) args(4).toInt else 1
    val spark = graft.GraftSession.create("ann-route-probe")
    spark.sparkContext.setLogLevel("WARN")
    import graft.operators.Similarity

    val emb = graft.Tables.embeddings(spark, dir).cache()
    val n = emb.count()

    // the routing statistic, reported explicitly (lshTopKAuto computes
    // the same thing internally on the auto path)
    val planes = Similarity.autoPlanes(n, 4)
    val budget = 4096L * n
    println(f"""{"stage":"config","dir":"$dir","n":$n,"nPlanes":$planes,"budget":$budget,"recallQueries":$recallQueries,"repeat":$repeat}""")

    // deterministic spread sample + its exact cosine top-k, computed
    // ONCE and shared across engines (the scoring reference)
    val exact =
      if (recallQueries <= 0) None
      else {
        val step = math.max(n / recallQueries, 1L)
        val q = emb.filter(col("vec_id") % step === 0)
          .orderBy("vec_id").limit(recallQueries).cache()
        val nq = q.count()
        val t0 = System.nanoTime()
        val ex = Similarity.bruteForceTopK(q, emb, k)
          .select("query_id", "neighbor_id", "cosine").cache()
        val exRows = ex.count()
        // slot-normalized like the engine side below (missing exact
        // slots — n <= k corpora — score 0), so regret is symmetric
        val exAvgCos = ex.agg(sum("cosine")).head.getDouble(0) / (nq * k)
        println(f"""{"stage":"exact","queries":$nq,"rows":$exRows,"avg_cos":$exAvgCos%.6f,"sec":${(System.nanoTime() - t0) / 1e9}%.2f}""")
        Some((q, ex, nq, exAvgCos))
      }

    engines.foreach { eng =>
      (1 to repeat).foreach { run =>
        val t0 = System.nanoTime()
        val out = Similarity.lshTopKAuto(emb, dim = 64, nBands = 4, k = k,
          annMode = eng)
        val rows = out.count()
        val sec = (System.nanoTime() - t0) / 1e9
        val recallField = exact.map { case (q, ex, nq, exAvgCos) =>
          // recall counts exact id matches; on a near-dup-clustered
          // corpus the true top-k among ~10⁵ cosine near-ties is a
          // lottery NO sub-exact engine wins, so also report cosine
          // REGRET: how much worse the returned neighbors' mean
          // cosine is than the exact top-k's — the quality measure
          // that survives tie-dense regimes. BOTH means are
          // normalized by the FULL slot count nq·k (a missing slot —
          // an engine returning < k neighbors or dropping a query —
          // contributes cosine 0), so an engine cannot improve its
          // regret by answering fewer queries; `sample_rows` makes
          // the fill rate visible next to the means.
          val sample = out
            .join(q.select(col("vec_id").as("query_id")), "query_id")
            .cache()
          val sampleRows = sample.count()
          val hits = sample
            .join(ex.select("query_id", "neighbor_id"),
              Seq("query_id", "neighbor_id"))
            .count()
          val engCosSum = sample.agg(sum("cosine")).head.getDouble(0)
          sample.unpersist()
          val slots = nq * k
          val engAvgCos = engCosSum / slots
          f""","recall@$k":${hits.toDouble / slots}%.3f,"sample_rows":$sampleRows,"slots":$slots,"avg_cos":$engAvgCos%.6f,"cos_regret":${exAvgCos - engAvgCos}%.6f"""
        }.getOrElse("")
        println(f"""{"stage":"engine","mode":"$eng","run":$run,"rows":$rows,"sec":$sec%.2f$recallField}""")
        // free operator caches between engines so runs don't subsidize
        // each other (the QuantizerMemo deliberately survives — that
        // reuse is what the repeat runs measure)
        graft.operators.OperatorCaches.releaseAll()
      }
    }
    spark.stop()
  }
}
