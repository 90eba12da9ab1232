package graft.tools

/** One-shot generator for [[graft.operators.PqCodebooks]]: trains the
  * per-subspace PQ codebooks (m=8 subspaces × 8 dims, 16 codes each;
  * seeded k-means per subspace — [[graft.operators.Pq.fitCodebooks]])
  * on the gate dataset's embeddings and prints the codebook table as
  * Scala source.
  *
  * Like [[FitQuantizer]], the fit is a build step: q63 pins the
  * trained codebooks as literal doubles so both engines (Spark and
  * the DuckDB oracle) encode and scan against the identical
  * quantizer — exactly how production PQ ships (train once,
  * distribute the codebooks as data).
  *
  * Usage: sbt "runMain graft.tools.FitPq /root/testdata/sf0.01"
  *
  * With a second argument the codebooks are written as a parquet
  * ARTIFACT (+ corpus fingerprint sibling) instead of source
  * literals — the shape [[graft.operators.PqCodebooks.forCorpus]]
  * loads for corpora past the pinned table (m=8 × 256 codes, the
  * one-byte-per-subspace production code):
  *   sbt "runMain graft.tools.FitPq /tmp/sf100 /tmp/pq"
  */
object FitPq {

  def main(args: Array[String]): Unit = {
    val residual = args.contains("--residual")
    val posArgs = args.filterNot(_ == "--residual")
    val dir = posArgs.headOption.getOrElse("/root/testdata/sf0.01")
    val artifactDir = if (posArgs.length > 1) Some(posArgs(1)) else None
    val spark = graft.GraftSession.create("fit-pq")
    spark.sparkContext.setLogLevel("WARN")
    val raw = graft.Tables.embeddings(spark, dir)
    // residual flavor: fit on x − centroid(homeCell); pinned-literal
    // mode uses the pinned gate centroid family, artifact mode the
    // same artifact-or-fit dispatch the search side resolves
    val emb =
      if (!residual) raw
      else if (artifactDir.isEmpty)
        graft.operators.Pq.residualView(raw, graft.operators.IvfCentroids.Centroids16)
      else graft.operators.Pq.residualView(raw, graft.operators.IvfCentroids.forCorpus(raw))
    val flavor = if (residual) "res_" else ""
    artifactDir match {
      case Some(d) =>
        import spark.implicits._
        val (m, nCodes) = (8, 256)
        val cbs = graft.operators.Pq.fitCodebooks(emb, m,
          dsub = 8, nCodes = nCodes,
          maxSample = math.max(64L * nCodes, 65536L))
        cbs.toDF("sub", "code", "cent").coalesce(1)
          .write.mode("overwrite")
          .parquet(s"$d/codebooks_${flavor}m${m}x$nCodes.parquet")
        val fp = graft.operators.IvfCentroids.corpusFingerprint(raw)
        Seq(fp).toDF("fp_count", "fp_hash").coalesce(1)
          .write.mode("overwrite")
          .parquet(s"$d/fingerprint_${flavor}m${m}x$nCodes.parquet")
        println(s"wrote $d/codebooks_${flavor}m${m}x$nCodes.parquet " +
          s"(${cbs.length} codewords, fingerprint $fp)")
      case None =>
        val cbs = graft.operators.Pq.fitCodebooks(emb, m = 8, dsub = 8,
          nCodes = 16)
        val name = if (residual) "ResidualCodebooks8x16" else "Codebooks8x16"
        println(s"  val $name: Seq[(Int, Int, Seq[Double])] = Seq(")
        cbs.foreach { case (s, c, cent) =>
          println(s"    ($s, $c, Seq(${cent.map(v => s"${v}d").mkString(", ")})),")
        }
        println("  )")
    }
    spark.stop()
  }
}
