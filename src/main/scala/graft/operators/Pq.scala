package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Product quantization (PQ) for approximate nearest-neighbor search
  * (Jégou, Douze, Schmid, "Product Quantization for Nearest Neighbor
  * Search", TPAMI 2011 — the standard memory-bound ANN scale path).
  *
  * The 64-dim embedding is split into `m` contiguous subspaces of
  * `dsub` dims. Each subspace has its own small codebook (`k` codes,
  * trained offline — pinned as literal data like
  * [[IvfCentroids]]); a vector is stored as `m` one-byte codes. At
  * 100 TB this is the difference between an index that fits in
  * cluster memory and one that does not: 64 float32 (256 B) becomes
  * m=8 bytes per vector, a 32× compression, and the ADC scan touches
  * only the code table — the raw vectors stay in cold storage for
  * optional re-ranking.
  *
  * Query = asymmetric distance computation (ADC): the query vector
  * precomputes a `m × k` table of partial squared distances to every
  * code; a candidate's approximate distance is the sum of `m` table
  * lookups selected by its codes. The scan is embarrassingly
  * parallel (query tables broadcast, no shuffle until top-k).
  *
  * Numeric discipline (the repo-wide oracle contract): every distance
  * is a *sequential left-fold in double precision* over a fixed
  * index order, so the DuckDB oracle reproduces encoding, tables and
  * ADC sums bit-for-bit. Ties break on the lowest code / vec_id.
  */
object Pq {

  /** Per-subspace squared L2 distance between the `sub`-th slice of a
    * float-array embedding column and a literal double-array centroid
    * column: ordered fold of (x_j − c_j)² over j = 1..dsub — the
    * native one-loop form ([[graft.functions.HashExpressions.SubSquaredDist]];
    * [[subDistHof]] is the HOF spec it equals, cross-checked in
    * HashExprSpec). Evaluated N·m·k times in [[encode]] — the
    * operator's hot loop. */
  private def subDist(emb: Column, cent: Column, sub: Column, dsub: Int): Column =
    graft.functions.HashExpressions.subSquaredDist(emb, cent, sub, dsub)

  /** The SQL-HOF formulation of [[subDist]] — the cross-engine spec
    * the q63 oracle mirrors. */
  private[graft] def subDistHof(emb: Column, cent: Column, sub: Column, dsub: Int): Column = {
    val sliced = slice(emb, sub * dsub + 1, lit(dsub))
    aggregate(
      zip_with(transform(sliced, x => x.cast("double")), cent,
        (x, c) => (x - c) * (x - c)),
      lit(0.0), (acc, v) => acc + v)
  }

  /** The codebook as a small DataFrame: (sub, code, cent). */
  def codebookDF(df: DataFrame, codebooks: Seq[(Int, Int, Seq[Double])]): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    codebooks.toDF("sub", "code", "cent")
  }

  /** Encode every vector against the pinned codebooks: for each of
    * the `m` subspaces, the code of the nearest centroid (squared-L2,
    * ties to the lowest code). Output: (vec_id, codes array<int>
    * ordered by subspace) — the compressed index, m bytes of
    * information per vector.
    *
    * Plan shape: a crossJoin against the ≤ m·k broadcast codebook
    * rows (never vector×vector), a hash-aggregate argmin per
    * (vec, sub) — `min(struct(dist, code))` is the (dist, code)
    * ordering, with map-side partial combine and no sort of the
    * N·m·k distance rows (the [[Similarity.buildIvfIndex]] lesson) —
    * then one aggregation to assemble the code array. All narrow
    * per-vector work that scales linearly with the table; widen()
    * because every stage up to the first exchange inherits the
    * input's partitioning. */
  def encode(embeddings: DataFrame,
      codebooks: Seq[(Int, Int, Seq[Double])], dsub: Int): DataFrame =
    // one narrow map ([[graft.functions.HashExpressions.PqEncode]] —
    // the buildIvfIndex lesson): the former crossJoin(broadcast(cb))
    // + two-level argmin aggregation materialized N×m×nCodes distance
    // rows only to collapse them back to N; at production code counts
    // (256) that was 410 M rows / 178 s for a 200 k index build, vs a
    // per-row scan that is arithmetic-bound (bit-identical distances
    // and (dist, code) tie-break — q63/q88 oracles unchanged)
    Parallelism.widen(embeddings)
      .select(col("vec_id"),
        graft.functions.HashExpressions
          .pqEncode(col("embedding"), codebooks, dsub).as("codes"))

  /** ADC top-k: for each query vector (selected by `queryPred`),
    * the `k` nearest encoded vectors by asymmetric PQ distance.
    *
    * The query side precomputes its full m×k distance table and
    * carries it as one array ordered by (sub, code); the scan side
    * is a broadcast crossJoin (queries are few) + an ordered fold of
    * m table lookups per candidate — no shuffle before the per-query
    * top-k window. Output: query_id, neighbor_id, rank, approx_dist. */
  def adcTopK(embeddings: DataFrame, queryPred: Column,
      codebooks: Seq[(Int, Int, Seq[Double])], dsub: Int, k: Int): DataFrame = {
    val nCodes = codebooks.map(_._2).distinct.size
    val cb = codebookDF(embeddings, codebooks)
    val enc = encode(embeddings, codebooks, dsub)
    val dtabs = embeddings.filter(queryPred)
      .select(col("vec_id").as("query_id"), col("embedding"))
      .crossJoin(broadcast(cb))
      .withColumn("pdist", subDist(col("embedding"), col("cent"), col("sub"), dsub))
      .groupBy("query_id")
      .agg(transform(
        sort_array(collect_list(struct(col("sub"), col("code"), col("pdist")))),
        s => s.getField("pdist")).as("dtab"))
    enc.crossJoin(broadcast(dtabs))
      .filter(col("query_id") =!= col("vec_id"))
      // native Σ_s dtab[s·k + codes[s]] (one loop per candidate; the
      // aggregate(sequence(...)) HOF form interprets m lambdas per
      // pair — cross-checked bit-exact in HashExprSpec)
      .withColumn("approx_dist",
        graft.functions.HashExpressions.adcSum(col("codes"), col("dtab"), nCodes))
      .withColumn("rank", row_number().over(
        Window.partitionBy("query_id")
          .orderBy(col("approx_dist"), col("vec_id"))))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        col("rank"), col("approx_dist"))
  }

  /** Residual training view: each vector replaced by
    * x − centroid(homeCell) in double precision — the quantity
    * [[Similarity.buildResidualAdcIndex]] encodes (FAISS IndexIVFPQ
    * residuals). Home cells from the SAME centroid family the search
    * will route with; one broadcast join against the ≤k-row centroid
    * rel, otherwise narrow. Feeds [[fitCodebooks]] for the residual
    * flavor ([[graft.tools.FitPq]] `--residual`). */
  def residualView(emb: DataFrame,
      centroids: Seq[(Int, Seq[Double])]): DataFrame = {
    val spark = emb.sparkSession
    import spark.implicits._
    val centDf = centroids.toDF("cell", "centroid")
    emb.select(col("vec_id"),
        element_at(graft.functions.HashExpressions.nearestCells(
          col("embedding"), centroids, 1), 1).getField("cell").as("cell"),
        col("embedding"))
      .join(broadcast(centDf), "cell")
      .select(col("vec_id"),
        graft.functions.HashExpressions
          .vecSub(col("embedding"), col("centroid")).as("embedding"))
  }

  /** Train the per-subspace codebooks: one seeded k-means per
    * subspace over the sliced sample (the [[Similarity.fitQuantizer]]
    * discipline: fit on a sample, ship the result as data). A build
    * step, not a query — run once via [[graft.tools.FitPq]] and pin
    * the output as literals so the search itself is exact
    * arithmetic both engines share. */
  def fitCodebooks(embeddings: DataFrame, m: Int, dsub: Int,
      nCodes: Int, maxSample: Long = 0L): Seq[(Int, Int, Seq[Double])] = {
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector
    // maxSample > 0 caps the training-set SIZE (the
    // Similarity.fitQuantizer discipline: k-means cost is sample ×
    // nCodes × m per iteration; ~64 samples/code per subspace is
    // plenty for a quantizer whose job is balanced cells). 0 keeps the
    // legacy fixed 50% fraction the pinned Codebooks8x16 were trained
    // with.
    val fraction =
      if (maxSample <= 0L) 0.5
      else {
        val n = math.max(embeddings.count(), 1L)
        math.min(1.0, maxSample.toDouble / n.toDouble)
      }
    // capped tier: widen before caching (the Similarity.fitQuantizer
    // parallelism fix — a single-file corpus leaves the sample on ~2
    // partitions and the m×nCodes Lloyd iterations on ~2 cores);
    // widening after the sample keeps the sampled row set unchanged,
    // and the legacy path keeps the exact plan the pinned
    // Codebooks8x16 were trained with
    val sample0 = embeddings
      .select(col("embedding"))
      .sample(withReplacement = false, fraction, seed = 42L)
    val sample = (if (maxSample > 0L) Parallelism.widen(sample0)
                  else sample0).cache()
    try {
      (0 until m).flatMap { s =>
        val sliced = sample.select(
          array_to_vector(transform(
            slice(col("embedding"), s * dsub + 1, dsub),
            x => x.cast("double"))).as("features"))
        val km = new KMeans()
          .setK(nCodes).setSeed(42L + s).setMaxIter(10)
        // capped tier: skip the k-means|| init passes (the
        // fitQuantizer lesson — random init + Lloyd is plenty for a
        // coarse quantizer); legacy path keeps the default init the
        // pinned tables were trained with
        if (maxSample > 0L) km.setInitMode("random")
        val model = km.fit(sliced)
        model.clusterCenters.zipWithIndex.map { case (c, i) =>
          (s, i, c.toArray.toSeq)
        }
      }
    } finally sample.unpersist()
  }
}
