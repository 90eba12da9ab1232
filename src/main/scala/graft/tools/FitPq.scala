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
  */
object FitPq {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = graft.GraftSession.create("fit-pq")
    spark.sparkContext.setLogLevel("WARN")
    val cbs = graft.operators.Pq.fitCodebooks(
      graft.Tables.embeddings(spark, dir), m = 8, dsub = 8, nCodes = 16)
    println("  val Codebooks8x16: Seq[(Int, Int, Seq[Double])] = Seq(")
    cbs.foreach { case (s, c, cent) =>
      println(s"    ($s, $c, Seq(${cent.map(v => s"${v}d").mkString(", ")})),")
    }
    println("  )")
    spark.stop()
  }
}
