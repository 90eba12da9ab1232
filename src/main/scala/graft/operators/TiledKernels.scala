package graft.operators

import scala.collection.mutable

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Tiled evaluation kernels for dense blocked pair generators — the
  * answer to a cost the salted ROW-JOIN shape cannot avoid: every
  * candidate row the join emits materializes copies of BOTH sides'
  * payload arrays (two ~300 B embeddings, or two ~3.8 KB shingle-hash
  * arrays) before the scoring expression reads them once. At sf10 that
  * is 4×10⁹ pairs · ~600 B ≈ 2.4 TB of row copying for blocked NN
  * (q24 measured 410 ns/pair where the 64-float dot itself is ~60 ns)
  * and 3.2×10⁹ · ~7.6 KB ≈ 24 TB for n-gram jaccard (q20: 233 s at
  * sf10 — 64× the sf1 cost at 10× the data, because copy bytes scale
  * with CANDIDATES = Σ_b n_b² while everything before the join is
  * linear).
  *
  * Shape: GRID salting — each block's rows are split into
  * g = ⌈n_b / √target⌉ groups by id-hash; tile (qg, xg) scores the
  * ordered pairs (query ∈ qg, index ∈ xg), so every ordered pair lands
  * in exactly one tile and each row is shuffled 2g times (g query
  * roles + g index roles) instead of the one-sided salt's r ≈ g² index
  * replicas. The tile relation is repartitioned on the tile key (an
  * UnsafeRow hash exchange — no sort, unlike mapGroups' required
  * ordering) and a typed mapPartitions kernel decodes each tile ONCE
  * into primitive arrays, then runs a tight scoring loop over the pair
  * space: zero per-pair copying, plus pruning a row join cannot
  * express (id-order check before scoring, jaccard size-filter and
  * in-merge threshold early-exit). Tile memory is bounded by
  * construction: 2·√target rows of payload per tile (~17 MB at the
  * 2×10⁷ default), independent of block size — the one-sided salt
  * held the whole block's index side per task.
  *
  * Results are bit-identical to the join shape: the same sequential
  * double folds as [[graft.functions.HashExpressions.DotProduct]] /
  * SortedJaccard, and Spark SQL's comparison semantics (NaN greatest
  * and equal to itself, -0.0 == 0.0) replicated in [[cmpD]]. Rows
  * whose block key or payload is null are dropped up front — a null
  * block key never equi-joins and a null payload scores a null that
  * every downstream filter/rank discards.
  *
  * Candidate volume is still Σ_b n_b²: that asymptote is the SPEC of
  * an exact blocked pair generator (quadratic in N at fixed block
  * count — see STRESS.md round 8). The kernels buy the constant — pair
  * cost drops to the arithmetic itself — and the sub-linear production
  * forms remain the LSH/IVF family.
  */
object TiledKernels {

  /** Spark SQL's double total order: NaN is greatest and equals
    * itself; -0.0 == 0.0 (java.lang.Double.compare differs on both). */
  private def cmpD(a: Double, b: Double): Int =
    if (a.isNaN) { if (b.isNaN) 0 else 1 }
    else if (b.isNaN) -1
    else if (a == b) 0
    else if (a < b) -1 else 1

  /** Sequential double fold over double arrays — bit-identical to
    * [[graft.functions.HashExpressions.DotProduct]] on the same values
    * (float inputs are cast element-wise to double in the tile
    * relation; the widening is exact). */
  private def seqDot(a: Array[Double], b: Array[Double]): Double = {
    val n = math.min(a.length, b.length)
    var acc = 0.0
    var i = 0
    while (i < n) { acc += a(i) * b(i); i += 1 }
    acc
  }

  /** Exact jaccard of two sorted hash arrays, or -1.0 when it is
    * provably below `t`. Both prunes are lossless under double
    * rounding: the final jac double is round(x/y) with x ≤ the bound's
    * numerator and y ≥ its denominator, rationals ordered ⇒ rounded
    * doubles ordered, so bound < t ⇒ final jac < t under the SAME
    * compare the caller applies. The survivor value is the identical
    * inter/union division SortedJaccard (and the DuckDB oracle)
    * computes. */
  private def jaccardOrBelow(a: Array[Long], b: Array[Long], t: Double): Double = {
    val na = a.length
    val nb = b.length
    val mn = math.min(na, nb)
    val mx = math.max(na, nb)
    // jac ≤ |min|/|max|
    if (mx > 0 && mn.toDouble / mx.toDouble < t) return -1.0
    var i = 0
    var j = 0
    var inter = 0
    var steps = 0
    while (i < na && j < nb) {
      val x = a(i)
      val y = b(j)
      if (x == y) { inter += 1; i += 1; j += 1 }
      else if (x < y) i += 1
      else j += 1
      steps += 1
      if ((steps & 63) == 0) {
        // jac ≤ (inter + rem) / (na + nb - inter - rem), rem matches left
        val rem = math.min(na - i, nb - j)
        if ((inter + rem).toDouble / (na + nb - inter - rem).toDouble < t)
          return -1.0
      }
    }
    val uni = na + nb - inter
    if (uni == 0) 0.0 else inter.toDouble / uni.toDouble
  }

  /** Partitions for a tile exchange of `replicatedRows` total rows:
    * ~2·√target rows per partition — the same payload volume as one
    * full tile, so the kernel's buffer-the-partition memory bound is
    * unchanged whatever the tile-size distribution. Sizing by TILE
    * COUNT is wrong at the small end: a band-bucketed gate-scale rel
    * has ~1M singleton buckets = ~1M near-empty tiles, and one tile
    * per partition hit the 4096 cap — 4096 near-empty tasks whose
    * scheduling overhead alone was ~3× the whole carry join (q87:
    * 7.1 s vs q71 2.6 s at sf0.1). Rows-per-partition sizing gives the
    * same ~pairs/target partitions in the dense regime (R ≈ Σ 2·n_b·g_b
    * ≈ 2·pairs/√target) and collapses the sparse regime to the
    * parallelism floor.
    *
    * The cap is a scheduler-sanity bound only, set high enough that the
    * memory bound is what gives first: the kernel buffers its whole
    * partition, so capping at C partitions means rows-per-task grows
    * past 2·√target once R > C·2·√target — at C = 2²⁰ and the 2×10⁷
    * default that is ~1.9×10¹⁰ replicated payload rows (~70 TB of
    * shingle arrays in ONE pair stage), beyond any single job this
    * engine should accept. A low cap here (the old 4096) would
    * silently void the bounded-memory guarantee the OOM-avoidance
    * dispatch relies on. */
  private def tilePartitions(spark: org.apache.spark.sql.SparkSession,
      replicatedRows: Long, target: Long): Int = {
    val rowsPerPart = math.max(1L, (2.0 * math.sqrt(target.toDouble)).toLong)
    math.min(1L << 20, math.max(
      (replicatedRows + rowsPerPart - 1) / rowsPerPart,
      spark.sparkContext.defaultParallelism.toLong)).toInt
  }

  /** Grid-tile relation over `base` (columns: bk, id, payload...):
    * adds qg/xg/is_q and repartitions on the tile key. g_b per block
    * from one narrow count (payload projection pruned); `factors` is
    * tiny (one row per block) and cached, so the stats action and the
    * two broadcast joins evaluate the count subtree once instead of
    * three times. */
  private def tileRel(base: DataFrame, target: Long,
      pin: DataFrame => Unit): DataFrame = {
    val spark = base.sparkSession
    // nb < 2 ⇒ no ordered pair can form in the block; dropping those
    // blocks HERE (the factors join is inner) keeps singleton band
    // buckets — the vast majority of a gate-scale LSH bucketing — out
    // of the payload exchange entirely.
    val factors = base.select("bk").groupBy("bk")
      .agg(count(lit(1)).as("nb"))
      .filter(col("nb") >= 2)
      .withColumn("g", greatest(lit(1),
        ceil(col("nb") / sqrt(lit(target.toDouble)))).cast("int"))
      .select("bk", "nb", "g")
      .cache()
    pin(factors)
    val stats = factors.agg(
      coalesce(sum(col("nb") * lit(2L) * col("g")), lit(0L))).head
    val nPart = tilePartitions(spark, stats.getLong(0), target)
    // One scan, one generate: role index k ∈ [0, 2g) encodes the g
    // query roles (k < g: tile (grp, k)) then the g index roles
    // (tile (k−g, grp)) — a two-branch union would evaluate the
    // payload projection (shingle hashing, casts) twice per row.
    base.join(broadcast(factors.drop("nb")), Seq("bk"))
      .withColumn("grp", pmod(hash(col("id")), col("g")))
      .withColumn("k", explode(sequence(lit(0), lit(2) * col("g") - 1)))
      .withColumn("is_q", col("k") < col("g"))
      .withColumn("qg",
        when(col("is_q"), col("grp")).otherwise(col("k") - col("g")))
      .withColumn("xg", when(col("is_q"), col("k")).otherwise(col("grp")))
      .drop("g", "grp", "k")
      .repartition(nPart, col("bk"), col("qg"), col("xg"))
  }

  /** Exact within-block jaccard pairs over sorted hash arrays.
    * `rel`: (id: Long, bk: String, sh: Array[Long] sorted distinct).
    * Emits (doc_a, doc_b, jac) with doc_a < doc_b and jac ≥ threshold,
    * each qualifying pair exactly once. */
  def blockJaccardPairs(rel: DataFrame, threshold: Double,
      targetPairsPerTask: Long = 20000000L,
      pin: DataFrame => Unit = OperatorCaches.register): DataFrame = {
    val spark = rel.sparkSession
    import spark.implicits._
    val tiled = tileRel(
      rel.filter(col("bk").isNotNull && col("sh").isNotNull)
        .select(col("bk"), col("id"), col("sh")),
      targetPairsPerTask, pin)
      .select(col("bk"), col("qg"), col("xg"), col("is_q"), col("id"), col("sh"))
      .as[(String, Int, Int, Boolean, Long, Array[Long])]
    tiled.mapPartitions { it =>
      val tiles = mutable.HashMap.empty[(String, Int, Int),
        (mutable.ArrayBuffer[(Long, Array[Long])],
         mutable.ArrayBuffer[(Long, Array[Long])])]
      it.foreach { case (bk, qg, xg, isQ, id, sh) =>
        val t = tiles.getOrElseUpdate((bk, qg, xg),
          (mutable.ArrayBuffer.empty, mutable.ArrayBuffer.empty))
        (if (isQ) t._1 else t._2) += ((id, sh))
      }
      tiles.valuesIterator.flatMap { case (qs, xs) =>
        qs.iterator.flatMap { case (qid, qsh) =>
          val out = mutable.ArrayBuffer.empty[(Long, Long, Double)]
          var k = 0
          while (k < xs.length) {
            val (xid, xsh) = xs(k)
            if (xid > qid) {
              val jac = jaccardOrBelow(qsh, xsh, threshold)
              if (jac >= threshold) out += ((qid, xid, jac))
            }
            k += 1
          }
          out.iterator
        }
      }
    }.toDF("doc_a", "doc_b", "jac")
  }

  /** Exact within-block top-1 cosine neighbor partials.
    * `rel`: (id: Long, bk: String, emb: Array[Double], nrm: Double).
    * Emits one (vec_id, neighbor_id, cosine) per (query, tile); the
    * caller folds partials with max_by(struct(neighbor_id, cosine),
    * struct(cosine, -neighbor_id)) — the in-loop comparator below is
    * that same ordering, so partial-then-final equals global. */
  def blockTop1Partials(rel: DataFrame,
      targetPairsPerTask: Long = 50000000L,
      pin: DataFrame => Unit = OperatorCaches.register): DataFrame = {
    val spark = rel.sparkSession
    import spark.implicits._
    val tiled = tileRel(
      rel.filter(col("bk").isNotNull && col("emb").isNotNull &&
          col("nrm").isNotNull)
        .select(col("bk"), col("id"), col("emb"), col("nrm")),
      targetPairsPerTask, pin)
      .select(col("bk"), col("qg"), col("xg"), col("is_q"), col("id"),
        col("emb"), col("nrm"))
      .as[(String, Int, Int, Boolean, Long, Array[Double], Double)]
    tiled.mapPartitions { it =>
      val tiles = mutable.HashMap.empty[(String, Int, Int),
        (mutable.ArrayBuffer[(Long, Array[Double], Double)],
         mutable.ArrayBuffer[(Long, Array[Double], Double)])]
      it.foreach { case (bk, qg, xg, isQ, id, emb, nrm) =>
        val t = tiles.getOrElseUpdate((bk, qg, xg),
          (mutable.ArrayBuffer.empty, mutable.ArrayBuffer.empty))
        (if (isQ) t._1 else t._2) += ((id, emb, nrm))
      }
      tiles.valuesIterator.flatMap { case (qs, xs) =>
        qs.iterator.flatMap { case (qid, qe, qn) =>
          var bestId = -1L
          var bestCos = 0.0
          var found = false
          var k = 0
          while (k < xs.length) {
            val (xid, xe, xn) = xs(k)
            if (xid != qid) {
              val cos = seqDot(qe, xe) / (qn * xn)
              val c = cmpD(cos, bestCos)
              if (!found || c > 0 || (c == 0 && xid < bestId)) {
                found = true; bestId = xid; bestCos = cos
              }
            }
            k += 1
          }
          if (found) Iterator.single((qid, bestId, bestCos))
          else Iterator.empty
        }
      }
    }.toDF("vec_id", "neighbor_id", "cosine")
  }

  /** Threshold Levenshtein over code-point arrays: the exact integer
    * Spark's `levenshtein(a, b, k)` returns — dist when ≤ k, else −1.
    * Banded DP (commons-lang shape): only the diagonal band of width
    * 2k+1 is filled, rows abandon early when the band's minimum
    * exceeds k. Distance is a pure function of the two code-point
    * sequences, so any correct implementation is bit-identical;
    * parity with the Spark expression is property-tested in
    * TextOpsSpec (random strings incl. multi-byte code points,
    * boundary thresholds). */
  private[graft] def levenshteinOrNeg(a: Array[Int], b: Array[Int],
      k: Int): Int = {
    // orient so the DP rows run over the SHORTER string
    val (s, t) = if (a.length <= b.length) (a, b) else (b, a)
    val n = s.length
    val m = t.length
    if (m - n > k) return -1
    if (n == 0) return m // m ≤ k here
    var prev = new Array[Int](n + 1)
    var curr = new Array[Int](n + 1)
    val inf = Int.MaxValue
    var i = 0
    while (i <= n) { prev(i) = if (i <= k) i else inf; i += 1 }
    var j = 1
    while (j <= m) {
      val tj = t(j - 1)
      val lo = math.max(1, j - k)
      val hi = math.min(n, j + k)
      curr(0) = if (j <= k) j else inf
      if (lo > 1) curr(lo - 1) = inf
      var rowMin = curr(0)
      i = lo
      while (i <= hi) {
        val del = if (prev(i) == inf) inf else prev(i) + 1
        val ins = if (curr(i - 1) == inf) inf else curr(i - 1) + 1
        val sub =
          if (prev(i - 1) == inf) inf
          else prev(i - 1) + (if (s(i - 1) == tj) 0 else 1)
        val v = math.min(del, math.min(ins, sub))
        curr(i) = v
        if (v < rowMin) rowMin = v
        i += 1
      }
      if (hi < n) curr(hi + 1) = inf
      if (rowMin > k) return -1
      val tmp = prev; prev = curr; curr = tmp
      j += 1
    }
    if (prev(n) <= k) prev(n) else -1
  }

  /** Pattern-side state of Myers' bit-parallel Levenshtein (Myers
    * 1999, "A fast bit-vector algorithm for approximate string
    * matching based on dynamic programming"; multi-word form per Hyyrö
    * 2003): the per-character match masks of one pattern, built ONCE
    * and reused against every text the tile pairs it with — the
    * pattern preprocessing is O(m) while each comparison is
    * O(⌈m/64⌉·n) word ops, ~10× less work than the banded cell DP at
    * q72's ~480-char/k=90 regime (measured 402 s → see STRESS).
    * Distance is exact (bit-vectors simulate the full DP column), so
    * parity with [[levenshteinOrNeg]] / Spark's `levenshtein(a, b, k)`
    * is mathematical, and property-tested anyway.
    *
    * The alphabet map is a linear-probe open-addressing table (code
    * point → mask row) — a boxed HashMap lookup per text character
    * would cost more than the block update it feeds. */
  private[graft] final class MyersPattern(pattern: Array[Int]) {
    val m: Int = pattern.length
    val nBlocks: Int = math.max(1, (m + 63) >>> 6)
    // open-addressing code-point table, power-of-two size ≥ 2m
    private val tableBits: Int = {
      var b = 3
      while ((1 << b) < 2 * math.max(m, 1)) b += 1
      b
    }
    private val tableSize = 1 << tableBits
    private val mask = tableSize - 1
    private val keys = new Array[Int](tableSize)
    private val slotOf = new Array[Int](tableSize)
    private val used = new Array[Boolean](tableSize)
    private var nSlots = 0
    private val masksBuf = new mutable.ArrayBuffer[Array[Long]]()
    locally {
      var i = 0
      while (i < m) {
        val c = pattern(i)
        var h = (c * 0x9E3779B9) >>> (32 - tableBits)
        while (used(h & mask) && keys(h & mask) != c) h += 1
        val slot = h & mask
        val row =
          if (!used(slot)) {
            used(slot) = true; keys(slot) = c; slotOf(slot) = nSlots
            masksBuf += new Array[Long](nBlocks); nSlots += 1
            masksBuf(nSlots - 1)
          } else masksBuf(slotOf(slot))
        row(i >>> 6) |= 1L << (i & 63)
        i += 1
      }
    }
    private val masks = masksBuf.toArray
    private val zero = new Array[Long](nBlocks)
    @inline private def eqRow(c: Int): Array[Long] = {
      var h = (c * 0x9E3779B9) >>> (32 - tableBits)
      while (used(h & mask) && keys(h & mask) != c) h += 1
      if (used(h & mask)) masks(slotOf(h & mask)) else zero
    }

    private val pv = new Array[Long](nBlocks)
    private val mv = new Array[Long](nBlocks)

    /** Exact Levenshtein(pattern, text), or −1 if it exceeds `k`. */
    def distanceOrNeg(text: Array[Int], k: Int): Int = {
      val n = text.length
      if (math.abs(m - n) > k) return -1
      if (m == 0) return n // n ≤ k here
      if (n == 0) return m
      java.util.Arrays.fill(pv, -1L)
      java.util.Arrays.fill(mv, 0L)
      val lastBits = m - ((nBlocks - 1) << 6) // bits used in last block
      val highBit = 1L << (lastBits - 1)
      var score = m
      var j = 0
      while (j < n) {
        val eq = eqRow(text(j))
        // the DISTANCE variant's top boundary is D(0, j) = j: a +1
        // horizontal delta enters block 0 every column (the search
        // variant's 0 would compute min over pattern positions)
        var hin = 1
        var b = 0
        while (b < nBlocks) {
          val pvb = pv(b); val mvb = mv(b)
          val eq0 = eq(b)
          // Xv must see the UNadjusted Eq; the hin<0 bit feeds Xh only
          val xv = eq0 | mvb
          val eqb = if (hin < 0) eq0 | 1L else eq0
          val xh = (((eqb & pvb) + pvb) ^ pvb) | eqb
          var ph = mvb | ~(xh | pvb)
          var mh = pvb & xh
          // horizontal delta leaving this block (its top bit)
          val top = if (b == nBlocks - 1) highBit else java.lang.Long.MIN_VALUE
          val hout = (if ((ph & top) != 0L) 1 else 0) -
            (if ((mh & top) != 0L) 1 else 0)
          ph <<= 1; mh <<= 1
          if (hin < 0) mh |= 1L else if (hin > 0) ph |= 1L
          pv(b) = mh | ~(xv | ph)
          mv(b) = ph & xv
          hin = hout
          b += 1
        }
        score += hin
        // score falls at most 1 per remaining char: bail once even a
        // perfect suffix cannot reach k
        if (score - (n - j - 1) > k) return -1
        j += 1
      }
      if (score <= k) score else -1
    }
  }

  /** Count of common elements of two sorted-distinct long arrays —
    * the integer [[graft.functions.HashExpressions.SortedIntersectCount]]
    * computes. */
  private def sortedIntersect(a: Array[Long], b: Array[Long]): Int = {
    var i = 0; var j = 0; var inter = 0
    while (i < a.length && j < b.length) {
      val x = a(i); val y = b(j)
      if (x == y) { inter += 1; i += 1; j += 1 }
      else if (x < y) i += 1
      else j += 1
    }
    inter
  }

  /** Bipartite grid-tile relation: a-side rows replicated over the
    * b-side's group count and vice versa, so tile (qg, xg) of a block
    * holds a-group qg and b-group xg — every (a, b) pair of the block
    * lands in exactly one tile. Group counts are per-block and
    * per-side (⌈n/√target⌉), from one narrow count over each side.
    *
    * `bKeep`: optional per-block prune — extra aggregates over the
    * b side's count pass plus a predicate over them; blocks failing it
    * never enter the payload exchange. The caller must prove a failing
    * block emits nothing (e.g. the jaccard kernel's pair predicate
    * `vs || xid > qid` emits nothing from a block whose only b row is
    * the a row itself). */
  private def bipartiteTileRel(aBase: DataFrame, bBase: DataFrame,
      target: Long, pin: DataFrame => Unit,
      bKeep: Option[(Seq[Column], Column)] = None): DataFrame = {
    val spark = aBase.sparkSession
    def counts(df: DataFrame, as: String, extra: Seq[Column] = Nil) =
      df.groupBy("bk").agg(count(lit(1)).as(as), extra: _*)
    val bCounts = bKeep match {
      case Some((aggs, p)) =>
        counts(bBase, "nb", aggs).filter(p).select("bk", "nb")
      case None => counts(bBase, "nb")
    }
    val factors = counts(aBase, "na").join(bCounts, "bk")
      .withColumn("ga", greatest(lit(1),
        ceil(col("na") / sqrt(lit(target.toDouble)))).cast("int"))
      .withColumn("gb", greatest(lit(1),
        ceil(col("nb") / sqrt(lit(target.toDouble)))).cast("int"))
      .select("bk", "na", "nb", "ga", "gb")
      .cache()
    pin(factors)
    val replicated = factors.agg(coalesce(
      sum(col("na") * col("gb").cast("long") +
        col("nb") * col("ga").cast("long")), lit(0L))).head.getLong(0)
    val nPart = tilePartitions(spark, replicated, target)
    val slim = factors.drop("na", "nb")
    val aT = aBase.join(broadcast(slim), Seq("bk"))
      .withColumn("qg", pmod(hash(col("id")), col("ga")))
      .withColumn("xg", explode(sequence(lit(0), col("gb") - 1)))
      .withColumn("is_q", lit(true))
      .drop("ga", "gb")
    val bT = bBase.join(broadcast(slim), Seq("bk"))
      .withColumn("xg", pmod(hash(col("id")), col("gb")))
      .withColumn("qg", explode(sequence(lit(0), col("ga") - 1)))
      .withColumn("is_q", lit(false))
      .drop("ga", "gb")
    aT.unionByName(bT).repartition(nPart, col("bk"), col("qg"), col("xg"))
  }

  /** Exact bounded-edit-distance pairs between two relations inside
    * shared blocks — the kernel form of [[Dedup.editDistancePairs]]'s
    * candidate resolution, for the regime where candidates dwarf the
    * corpus (at sf10 the join shape's per-candidate payload attach
    * shuffled ~1.4 TB and filled the disk; here text + shingle arrays
    * shuffle once per tile role, ∝ N·√tiles, and the length band,
    * Gravano q-gram prune, and banded DP all run inside the tile
    * loop — a rejected candidate costs arithmetic only).
    *
    * `aRel`/`bRel`: (bk: String, id: Long, len: Long, text: String,
    * sh: Array[Long] — pass null columns when prefilterGram = 0).
    * `orderCheck` = true for the self form (emit id_a < id_b once);
    * false for disjoint-id bipartite matching. Emits
    * (doc_a, doc_b, dist ≤ maxDist), bit-identical to the join shape:
    * same length filter, same intersect-count bound, and
    * [[levenshteinOrNeg]] = Spark's `levenshtein(a, b, k)`. */
  def bipartiteEditPairs(aRel: DataFrame, bRel: DataFrame, maxDist: Int,
      prefilterGram: Int, orderCheck: Boolean,
      targetPairsPerTask: Long = 20000000L,
      pin: DataFrame => Unit = OperatorCaches.register): DataFrame = {
    val spark = aRel.sparkSession
    import spark.implicits._
    def prep(df: DataFrame) = df
      .filter(col("bk").isNotNull && col("text").isNotNull)
      .select(col("bk"), col("id"), col("len").cast("long"),
        col("text"), col("sh"))
    val tiled = bipartiteTileRel(prep(aRel), prep(bRel),
      targetPairsPerTask, pin)
      .select(col("bk"), col("qg"), col("xg"), col("is_q"), col("id"),
        col("len"), col("text"), col("sh"))
      .as[(String, Int, Int, Boolean, Long, Long, String, Array[Long])]
    val bound = maxDist.toLong * prefilterGram + prefilterGram - 1
    val kGram = maxDist.toLong * prefilterGram
    tiled.mapPartitions { it =>
      val tiles = mutable.HashMap.empty[(String, Int, Int),
        (mutable.ArrayBuffer[(Long, Long, Array[Int], Array[Long])],
         mutable.ArrayBuffer[(Long, Long, Array[Int], Array[Long])])]
      it.foreach { case (bk, qg, xg, isQ, id, len, text, sh) =>
        val t = tiles.getOrElseUpdate((bk, qg, xg),
          (mutable.ArrayBuffer.empty, mutable.ArrayBuffer.empty))
        val cps = text.codePoints().toArray
        (if (isQ) t._1 else t._2) += ((id, len, cps, sh))
      }
      tiles.valuesIterator.flatMap { case (qs, xs) =>
        qs.iterator.flatMap { case (qid, qlen, qcp, qsh) =>
          // pattern masks build once per (query, tile) and amortize
          // over every text in the tile — the whole point of the
          // bit-parallel form (exact distance, so same result as
          // [[levenshteinOrNeg]] / Spark's levenshtein(a, b, k))
          val pat = new MyersPattern(qcp)
          val out = mutable.ArrayBuffer.empty[(Long, Long, Long)]
          var k = 0
          while (k < xs.length) {
            val (xid, xlen, xcp, xsh) = xs(k)
            if ((!orderCheck || xid > qid) &&
                math.abs(qlen - xlen) <= maxDist) {
              val pruned = prefilterGram > 0 &&
                math.max(qlen, xlen) > bound && {
                  val mx = math.max(qsh.length, xsh.length).toLong
                  sortedIntersect(qsh, xsh) < mx - kGram
                }
              if (!pruned) {
                val d = pat.distanceOrNeg(xcp, maxDist)
                if (d >= 0) out += ((qid, xid, d.toLong))
              }
            }
            k += 1
          }
          out.iterator
        }
      }
    }.toDF("doc_a", "doc_b", "dist")
  }

  /** Exact bipartite jaccard-threshold pairs inside shared blocks —
    * the kernel form of [[Dedup.incrementalNearDupPairs]]'s band join
    * for the regime where a duplicate family makes one band bucket
    * huge. The salted shuffle-hash join's per-task BUILD side is the
    * whole bucket's b side (salting splits only the probe stream), so
    * task memory grows with the largest bucket — a 37.5k-member family
    * at sf10skew put ~140 MB of unspillable hash relation in every
    * salted task and the stage died on UNABLE_TO_ACQUIRE_MEMORY. Tile
    * memory here is bounded by construction (2·√target rows per tile),
    * independent of bucket size.
    *
    * `aRel`: (bk, id, sh); `bRel`: (bk, id, sh, vs: Boolean — true for
    * corpus-side rows). Emits (doc_a = a-side id, doc_b, jac ≥
    * threshold, vs_corpus) under the carry join's exact pair
    * predicate: `vs OR doc_b > doc_a` (a-a pairs once in id order,
    * a-corpus pairs always; b rows that are a-side duplicates carry
    * vs = false). `bRel` MUST contain every `aRel` row with
    * vs = false (the incremental union shape) — the block prune below
    * relies on it. Same [[jaccardOrBelow]] fold as the join's
    * SortedJaccard — bit-identical survivors. */
  def bipartiteJaccardPairs(aRel: DataFrame, bRel: DataFrame,
      threshold: Double,
      targetPairsPerTask: Long = 20000000L,
      pin: DataFrame => Unit = OperatorCaches.register): DataFrame = {
    val spark = aRel.sparkSession
    import spark.implicits._
    def prep(df: DataFrame, vs: Option[Column]) = df
      .filter(col("bk").isNotNull && col("sh").isNotNull)
      .select(col("bk"), col("id"), col("sh"),
        vs.getOrElse(col("vs")).as("vs"))
    // Block prune: the pair predicate is `vs || xid > qid`, so a block
    // whose b side is a single non-corpus row can only offer the a row
    // itself (every a row also appears b-side with vs = false) — no
    // pair can pass. Keeping only blocks with a corpus row or ≥ 2
    // increment rows drops the vast majority of a gate-scale LSH
    // bucketing (singleton buckets) before the payload exchange.
    val tiled = bipartiteTileRel(
      prep(aRel, Some(lit(false))), prep(bRel, None), targetPairsPerTask, pin,
      bKeep = Some((
        Seq(max(col("vs")).as("hasC"),
          sum(when(col("vs"), 0).otherwise(1)).as("nNew")),
        col("hasC") || col("nNew") >= 2)))
      .select(col("bk"), col("qg"), col("xg"), col("is_q"), col("id"),
        col("sh"), col("vs"))
      .as[(String, Int, Int, Boolean, Long, Array[Long], Boolean)]
    tiled.mapPartitions { it =>
      val tiles = mutable.HashMap.empty[(String, Int, Int),
        (mutable.ArrayBuffer[(Long, Array[Long])],
         mutable.ArrayBuffer[(Long, Array[Long], Boolean)])]
      it.foreach { case (bk, qg, xg, isQ, id, sh, vs) =>
        val t = tiles.getOrElseUpdate((bk, qg, xg),
          (mutable.ArrayBuffer.empty, mutable.ArrayBuffer.empty))
        if (isQ) t._1 += ((id, sh)) else t._2 += ((id, sh, vs))
      }
      tiles.valuesIterator.flatMap { case (qs, xs) =>
        qs.iterator.flatMap { case (qid, qsh) =>
          val out = mutable.ArrayBuffer.empty[(Long, Long, Double, Boolean)]
          var k = 0
          while (k < xs.length) {
            val (xid, xsh, vs) = xs(k)
            if (vs || xid > qid) {
              val jac = jaccardOrBelow(qsh, xsh, threshold)
              if (jac >= threshold) out += ((qid, xid, jac, vs))
            }
            k += 1
          }
          out.iterator
        }
      }
    }.toDF("doc_a", "doc_b", "jac", "vs_corpus")
  }

  /** Exact within-block cosine-threshold pairs.
    * `rel`: (id: Long, bk: String, emb: Array[Double], nrm: Double).
    * Emits (vec_a, vec_b, cosine) with vec_a < vec_b and
    * cosine ≥ threshold under Spark's compare (NaN passes any
    * threshold, as it does in the Column filter). */
  def blockCosinePairs(rel: DataFrame, threshold: Double,
      targetPairsPerTask: Long = 50000000L,
      pin: DataFrame => Unit = OperatorCaches.register): DataFrame = {
    val spark = rel.sparkSession
    import spark.implicits._
    val tiled = tileRel(
      rel.filter(col("bk").isNotNull && col("emb").isNotNull &&
          col("nrm").isNotNull)
        .select(col("bk"), col("id"), col("emb"), col("nrm")),
      targetPairsPerTask, pin)
      .select(col("bk"), col("qg"), col("xg"), col("is_q"), col("id"),
        col("emb"), col("nrm"))
      .as[(String, Int, Int, Boolean, Long, Array[Double], Double)]
    tiled.mapPartitions { it =>
      val tiles = mutable.HashMap.empty[(String, Int, Int),
        (mutable.ArrayBuffer[(Long, Array[Double], Double)],
         mutable.ArrayBuffer[(Long, Array[Double], Double)])]
      it.foreach { case (bk, qg, xg, isQ, id, emb, nrm) =>
        val t = tiles.getOrElseUpdate((bk, qg, xg),
          (mutable.ArrayBuffer.empty, mutable.ArrayBuffer.empty))
        (if (isQ) t._1 else t._2) += ((id, emb, nrm))
      }
      tiles.valuesIterator.flatMap { case (qs, xs) =>
        qs.iterator.flatMap { case (qid, qe, qn) =>
          val out = mutable.ArrayBuffer.empty[(Long, Long, Double)]
          var k = 0
          while (k < xs.length) {
            val (xid, xe, xn) = xs(k)
            if (xid > qid) {
              val cos = seqDot(qe, xe) / (qn * xn)
              if (cmpD(cos, threshold) >= 0) out += ((qid, xid, cos))
            }
            k += 1
          }
          out.iterator
        }
      }
    }.toDF("vec_a", "vec_b", "cosine")
  }
}
