package graft.operators

/** Session-scoped memo for fitted/loaded quantizer artifacts
  * (IVF centroids, PQ codebooks), keyed by the corpus fingerprint +
  * quantizer shape.
  *
  * Why it exists: the auto-routed ANN path ([[Similarity.lshTopKAuto]]
  * → [[Similarity.ivfAdcCosineSelfTopK]]) resolves its quantizers
  * artifact-or-fit PER INVOCATION — and the in-query fit tier is
  * minutes at scale (the r12 sf100skew routed run spent ~25 of its
  * 51 min on k=4096 IVF + residual-PQ fits). A deployment ships
  * artifacts, but auto-routing is precisely the path a caller reaches
  * WITHOUT having planned for IVFADC — so repeated routed searches
  * over the same corpus must pay the fit once per session, not once
  * per query. The corpus fingerprint in the key
  * ([[IvfCentroids.corpusFingerprint]] — count + order-independent
  * content hash) makes reuse exact: a regenerated corpus (same size,
  * different vectors) misses the memo and refits, the same staleness
  * discipline the on-disk artifacts get.
  *
  * Deliberately NOT tied to [[OperatorCaches.releaseAll]]: that clears
  * per-query Spark storage between gate queries; this memo holds small
  * driver-side Seq literals (a k=4096 × 64-dim centroid table is
  * ~2 MB) whose whole value is surviving across queries. [[clear]] is
  * the explicit reset for tests / corpus-swap sessions.
  */
object QuantizerMemo {
  private val memo =
    scala.collection.concurrent.TrieMap.empty[String, AnyRef]
  private val missCounter = new java.util.concurrent.atomic.AtomicLong
  private val hitCounter = new java.util.concurrent.atomic.AtomicLong

  /** Misses = compute invocations — the spec surface for "same
    * fingerprint ⇒ no new fit job". */
  def misses: Long = missCounter.get
  def hits: Long = hitCounter.get

  /** Memoized compute. Key contract: include the corpus fingerprint
    * AND every shape parameter the result depends on (k / m / nCodes /
    * flavor / centroid identity for residual codebooks). */
  def getOrCompute[T <: AnyRef](key: String)(compute: => T): T =
    memo.get(key) match {
      case Some(v) =>
        hitCounter.incrementAndGet()
        Parallelism.logDispatch("QuantizerMemo", s"hit $key")
        v.asInstanceOf[T]
      case None =>
        // driver-side single-threaded in practice; a racing duplicate
        // compute is tolerable (last write wins, both results valid)
        missCounter.incrementAndGet()
        val v = compute
        memo.update(key, v)
        v
    }

  def clear(): Unit = memo.clear()
  def size: Int = memo.size
}
