package graft.tools

import org.apache.spark.sql.functions._

/** Scratch measurement main (not part of the driver contract): the
  * PRODUCTION IVFADC path end-to-end over a real embeddings table —
  * both quantizer halves resolved through their artifact-or-fit
  * dispatch ([[graft.operators.IvfCentroids.forCorpus]] via
  * `SPARK_GRAFT_IVF_DIR`, [[graft.operators.PqCodebooks.forCorpus]]
  * via `SPARK_GRAFT_PQ_DIR`), the slim index built once, then a
  * query batch searched against it with exact rerank. Prints one JSON
  * line per phase; the `[graft.dispatch]` stderr lines record which
  * tier each half actually took. Numbers land in STRESS.md.
  *
  * Usage: sbt "runMain graft.tools.AdcProbe <sfDir> [nProbe] [k] [rerank]"
  */
object AdcProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/sf10")
    val nProbe = if (args.length > 1) args(1).toInt else 8
    val k = if (args.length > 2) args(2).toInt else 5
    val rerank = if (args.length > 3) args(3).toInt else 50
    val spark = graft.GraftSession.create("adc-probe")
    spark.sparkContext.setLogLevel("WARN")
    import graft.operators.{IvfCentroids, PqCodebooks, Similarity}

    val emb = graft.Tables.embeddings(spark, dir).cache()
    val n = emb.count()

    val t0 = System.nanoTime()
    val cents = IvfCentroids.forCorpus(emb)
    val tCents = (System.nanoTime() - t0) / 1e9
    val t1 = System.nanoTime()
    val (cbs, dsub) = PqCodebooks.forCorpus(emb)
    val tCbs = (System.nanoTime() - t1) / 1e9
    println(f"""{"stage":"quantizers","n":$n,"cells":${cents.size},"codewords":${cbs.size},"dsub":$dsub,"cents_sec":$tCents%.2f,"cbs_sec":$tCbs%.2f}""")

    val t2 = System.nanoTime()
    val index = Similarity.buildAdcIndex(emb, cents, cbs, dsub).cache()
    val idxRows = index.count()
    val tIdx = (System.nanoTime() - t2) / 1e9
    println(f"""{"stage":"build_index","rows":$idxRows,"sec":$tIdx%.2f}""")

    val q = emb.filter(pmod(col("vec_id"), lit(1000L)) === 0)
      .select(col("vec_id").as("query_id"), col("embedding"))
    val nQ = q.count()
    val t3 = System.nanoTime()
    val res = Similarity.ivfAdcSearchAgainst(q, index, cents, cbs, dsub,
      nProbe, k, rerank, rawVectors = Some(emb))
    val nRes = res.count()
    val tSearch = (System.nanoTime() - t3) / 1e9
    println(f"""{"stage":"search","queries":$nQ,"results":$nRes,"nProbe":$nProbe,"k":$k,"rerank":$rerank,"sec":$tSearch%.2f,"ms_per_query":${tSearch * 1000 / math.max(nQ, 1)}%.1f}""")
    spark.stop()
  }
}
