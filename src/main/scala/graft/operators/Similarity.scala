package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor / similarity search over an embedding
  * column (`array<float>`).
  *
  * Numeric discipline: dot products are computed as a *sequential
  * left-fold in double precision* (`aggregate(zip_with(...))`), which
  * is bit-reproducible across engines — the DuckDB oracle does the
  * identical fold. `sqrt` and `/` are IEEE-correctly-rounded, so full
  * cosine scores hash-match exactly.
  *
  * Scale posture: brute-force is the small-query-set baseline
  * (broadcast queries × full scan — embarrassingly parallel, no
  * shuffle); the LSH variant buckets by random-hyperplane signs so
  * candidate generation is a bucket equi-join, then exact re-rank.
  */
object Similarity {

  /** Sequential double-precision dot product of two array columns
    * (left fold in array order — bit-reproducible; native expression,
    * see [[graft.functions.HashExpressions.DotProduct]]). */
  def dot(a: Column, b: Column): Column =
    graft.functions.HashExpressions.dotProduct(a, b)

  def l2Norm(a: Column): Column = sqrt(dot(a, a))

  /** Exact top-k cosine neighbors for each query vector.
    * `queries`/`candidates`: (id, embedding). Self-pairs excluded.
    * Output: query_id, neighbor_id, rank, cosine. */
  def bruteForceTopK(queries: DataFrame, candidates: DataFrame, k: Int): DataFrame = {
    val q = queries.select(
      col("vec_id").as("query_id"), col("embedding").as("q_emb"),
      l2Norm(col("embedding")).as("q_norm"))
    val c = candidates.select(
      col("vec_id").as("neighbor_id"), col("embedding").as("c_emb"),
      l2Norm(col("embedding")).as("c_norm"))
    val scored = c.crossJoin(broadcast(q))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cosine",
        dot(col("q_emb"), col("c_emb")) / (col("q_norm") * col("c_norm")))
    scored
      .withColumn("rank", row_number().over(
        Window.partitionBy("query_id")
          .orderBy(col("cosine").desc, col("neighbor_id"))))
      .filter(col("rank") <= k)
      .select("query_id", "neighbor_id", "rank", "cosine")
  }

  /** Single nearest neighbor per vector inside equal-`blockCol` blocks
    * (a blocked similarity self-join — the shape of embedding-based
    * near-dup detection). Output: vec_id, neighbor_id, cosine. */
  def blockedNearestNeighbor(embeddings: DataFrame, blockCol: String): DataFrame = {
    val base = embeddings.select(
      col("vec_id"), col(blockCol).as("blk"), col("embedding"),
      l2Norm(col("embedding")).as("nrm"))
    val a = base.select(col("vec_id"), col("blk"),
      col("embedding").as("e_a"), col("nrm").as("n_a"))
    val b = base.select(col("vec_id").as("neighbor_id"), col("blk"),
      col("embedding").as("e_b"), col("nrm").as("n_b"))
    a.join(b, "blk")
      .filter(col("vec_id") =!= col("neighbor_id"))
      .withColumn("cosine",
        dot(col("e_a"), col("e_b")) / (col("n_a") * col("n_b")))
      .withColumn("rk", row_number().over(
        Window.partitionBy("vec_id")
          .orderBy(col("cosine").desc, col("neighbor_id"))))
      .filter(col("rk") === 1)
      .select("vec_id", "neighbor_id", "cosine")
  }

  /** IVF (inverted-file) ANN: a k-means coarse quantizer partitions the
    * vectors into `nCentroids` cells; each query probes its `nProbe`
    * nearest cells and exact-reranks only those candidates. The
    * standard scale path when the query set is large but per-query work
    * must stay sublinear — cell assignment is one broadcast-join pass,
    * candidate generation an equi-join on cell id (recall loss at cell
    * boundaries is the usual IVF trade-off; raise nProbe to trade speed
    * for recall). Seeded k-means ⇒ deterministic, but not
    * SQL-oracle-expressible (rows-only driver check).
    */
  def ivfTopK(embeddings: DataFrame, nCentroids: Int, nProbe: Int, k: Int): DataFrame = {
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector
    val withVec = embeddings
      .withColumn("features", array_to_vector(col("embedding")))
      .cache()
    // fit the coarse quantizer on a sample — the quantizer only needs
    // the density shape, not every vector (at 100 TB you cannot fit on
    // the full set anyway); assignment below still covers all rows
    val model = new KMeans()
      .setK(nCentroids).setSeed(42L).setMaxIter(5)
      .fit(withVec.sample(withReplacement = false, 0.25, seed = 42L))
    val spark = embeddings.sparkSession
    import spark.implicits._
    val centroids = model.clusterCenters.zipWithIndex
      .map { case (c, i) => (i, c.toArray.map(_.toFloat).toSeq) }
      .toSeq.toDF("cell", "centroid")
    // candidate side: home cell only
    val assigned = model.transform(withVec)
      .withColumnRenamed("prediction", "cell")
      .select(col("vec_id").as("neighbor_id"), col("cell"),
        col("embedding").as("e_b"), l2Norm(col("embedding")).as("n_b"))
    // query side: nProbe nearest cells by centroid distance
    val probes = withVec
      .select(col("vec_id").as("query_id"), col("embedding").as("e_a"),
        l2Norm(col("embedding")).as("n_a"))
      .crossJoin(broadcast(centroids))
      .withColumn("dist",
        -dot(col("e_a"), col("centroid")) +
          dot(col("centroid"), col("centroid")) / 2)
      .withColumn("pr", row_number().over(
        Window.partitionBy("query_id").orderBy(col("dist"), col("cell"))))
      .filter(col("pr") <= nProbe)
      .select("query_id", "cell", "e_a", "n_a")
    probes.join(assigned, "cell")
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cosine",
        dot(col("e_a"), col("e_b")) / (col("n_a") * col("n_b")))
      .withColumn("rank", row_number().over(
        Window.partitionBy("query_id")
          .orderBy(col("cosine").desc, col("neighbor_id"))))
      .filter(col("rank") <= k)
      .select("query_id", "neighbor_id", "rank", "cosine")
  }

  /** Random-hyperplane LSH top-k: deterministic pseudo-random
    * hyperplanes H(j,i) = ±1 derived from xxhash64(j*dim + i), bucket
    * by the sign-bit signature, candidates = same-bucket pairs, exact
    * cosine re-rank within buckets. Approximate (bucketing loses
    * recall) — the scale path when the query set is the whole table.
    * Output: query_id, neighbor_id, rank, cosine. */
  def lshTopK(embeddings: DataFrame, dim: Int, nPlanes: Int, k: Int): DataFrame = {
    // signature bit j = sign(Σ_i H(j,i)·v_i); H from a hash of (j,i)
    val sigBits = (0 until nPlanes).map { j =>
      val planes = transform(
        sequence(lit(0), lit(dim - 1)),
        i => when(pmod(xxhash64(lit(j * dim) + i), lit(2)) === 0, 1.0).otherwise(-1.0))
      val proj = aggregate(
        zip_with(col("embedding"), planes, (x, h) => x.cast("double") * h),
        lit(0.0), (a, v) => a + v)
      when(proj >= 0, lit(1L << j)).otherwise(lit(0L))
    }
    val sig = sigBits.reduce(_ + _)
    val base = embeddings
      .withColumn("bucket", sig)
      .withColumn("nrm", l2Norm(col("embedding")))
    val a = base.select(col("vec_id").as("query_id"), col("bucket"),
      col("embedding").as("e_a"), col("nrm").as("n_a"))
    val b = base.select(col("vec_id").as("neighbor_id"), col("bucket"),
      col("embedding").as("e_b"), col("nrm").as("n_b"))
    a.join(b, "bucket")
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cosine",
        dot(col("e_a"), col("e_b")) / (col("n_a") * col("n_b")))
      .withColumn("rank", row_number().over(
        Window.partitionBy("query_id")
          .orderBy(col("cosine").desc, col("neighbor_id"))))
      .filter(col("rank") <= k)
      .select("query_id", "neighbor_id", "rank", "cosine")
  }
}
