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
  * Usage: sbt "runMain graft.tools.AnnRouteProbe <sfDir> [k] [engines]"
  *   engines: comma list of auto|lsh|ivfadc (default "auto,ivfadc")
  */
object AnnRouteProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/sf10")
    val k = if (args.length > 1) args(1).toInt else 3
    val engines = (if (args.length > 2) args(2) else "auto,ivfadc")
      .split(',').map(_.trim).filter(_.nonEmpty)
    val spark = graft.GraftSession.create("ann-route-probe")
    spark.sparkContext.setLogLevel("WARN")
    import graft.operators.Similarity

    val emb = graft.Tables.embeddings(spark, dir).cache()
    val n = emb.count()

    // the routing statistic, reported explicitly (lshTopKAuto computes
    // the same thing internally on the auto path)
    val planes = Similarity.autoPlanes(n, 4)
    val budget = 4096L * n
    println(f"""{"stage":"config","dir":"$dir","n":$n,"nPlanes":$planes,"budget":$budget}""")

    engines.foreach { eng =>
      val t0 = System.nanoTime()
      val out = Similarity.lshTopKAuto(emb, dim = 64, nBands = 4, k = k,
        annMode = eng)
      val rows = out.count()
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"""{"stage":"engine","mode":"$eng","rows":$rows,"sec":$sec%.2f}""")
      // free operator caches between engines so runs don't subsidize
      // each other
      graft.operators.OperatorCaches.releaseAll()
    }
    spark.stop()
  }
}
