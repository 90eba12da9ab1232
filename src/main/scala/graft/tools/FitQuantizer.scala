package graft.tools

/** One-shot generator for [[graft.operators.IvfCentroids]]: fits the
  * seeded k-means coarse quantizer (k=16, seed=42, maxIter=5, 25%
  * sample — [[graft.operators.Similarity.fitQuantizer]]) on the gate
  * dataset's embeddings and prints the centroid table as Scala source.
  *
  * The q33 gate query pins the quantizer as literal doubles so BOTH
  * engines (Spark and the DuckDB oracle) search against the identical
  * cell structure — the fit itself is a build step, not part of the
  * query (exactly how a production IVF index ships: train once,
  * distribute centroids as data).
  *
  * Usage: sbt "runMain graft.tools.FitQuantizer /root/testdata/sf0.01 [k]"
  *
  * With a third argument the centroids are written as a parquet
  * ARTIFACT instead of source literals — the shape
  * [[graft.operators.IvfCentroids.forCorpus]] loads for corpora past
  * the pinned tables:
  *   sbt "runMain graft.tools.FitQuantizer /tmp/sf10 1600 /tmp/ivf"
  */
object FitQuantizer {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val k = if (args.length > 1) args(1).toInt else 16
    val artifactDir = if (args.length > 2) Some(args(2)) else None
    val spark = graft.GraftSession.create("fit-quantizer")
    spark.sparkContext.setLogLevel("WARN")
    val emb = graft.Tables.embeddings(spark, dir)
    val cents = artifactDir match {
      case Some(_) =>
        // artifact tier: size-capped sample (the forCorpus fallback's
        // exact fit, just precomputed)
        graft.operators.Similarity.fitQuantizer(emb, nCentroids = k,
          maxSample = math.max(64L * k, 65536L))
      case None =>
        graft.operators.Similarity.fitQuantizer(emb, nCentroids = k)
    }
    artifactDir match {
      case Some(d) =>
        import spark.implicits._
        cents.toDF("cell", "centroid").coalesce(1)
          .write.mode("overwrite").parquet(s"$d/centroids_k$k.parquet")
        // corpus fingerprint sibling: lets forCorpus refuse this
        // artifact once the corpus it was trained on changes
        val fp = graft.operators.IvfCentroids.corpusFingerprint(emb)
        Seq(fp).toDF("fp_count", "fp_hash").coalesce(1)
          .write.mode("overwrite").parquet(s"$d/fingerprint_k$k.parquet")
        println(s"wrote $d/centroids_k$k.parquet (${cents.length} cells, " +
          s"fingerprint $fp)")
      case None =>
        println(s"  val Centroids$k: Seq[(Int, Seq[Double])] = Seq(")
        cents.foreach { case (i, c) =>
          // full-precision doubles: Double.toString round-trips exactly
          // and DuckDB parses the same decimal string to the same IEEE
          // double
          println(s"    $i -> Seq(${c.map(v => s"${v}d").mkString(", ")}),")
        }
        println("  )")
    }
    spark.stop()
  }
}
