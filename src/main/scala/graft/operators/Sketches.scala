package graft.operators

import graft.functions.TextFunctions
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Mergeable frequency sketches for corpus statistics at 100 TB —
  * count-min (Cormode & Muthukrishnan, "An improved data stream
  * summary: the count-min sketch and its applications", J. Algorithms
  * 2005) in its *relational* form.
  *
  * The sketch is represented as a tiny relation `(row, pos, cnt)`
  * (d·w cells, e.g. 4×512 = 2 048 rows) rather than a driver-side
  * array: the build is an ordinary `groupBy(row, pos).count()` whose
  * map-side partial aggregation bounds the shuffle at d·w cells *per
  * input partition* regardless of how many terms stream through —
  * this IS the classic mergeable-sketch property, expressed as a
  * relational aggregation Catalyst already executes with partial
  * HashAggregates. No custom state, no collect, unioning two
  * sketches = `union.groupBy.sum`.
  *
  * Hash discipline: row `i` maps term-hash `h` (the repo's
  * polynomial fingerprint, mod P) to `((A_i·h + B_i) mod P) mod w` —
  * exact integer arithmetic both engines share, so estimates are
  * oracle-checkable bit-for-bit (A_i < 2·10⁵, h < P ≈ 10⁹ keeps the
  * product < 2⁶³). Estimates only *over*-count (est ≥ true), the
  * CMS guarantee the q64 gate asserts per row.
  */
object Sketches {

  /** Pairwise-independent-ish row-hash parameters (d = 4 rows). Any
    * fixed values work — they only need to be identical in the
    * oracle (same discipline as [[TextFunctions.MinHashA]]). */
  val CmsA: IndexedSeq[Long] = IndexedSeq(100003L, 100019L, 100043L, 100057L)
  val CmsB: IndexedSeq[Long] = IndexedSeq(7L, 19L, 31L, 43L)

  private def pos(row: Int, h: org.apache.spark.sql.Column, w: Int) =
    pmod(pmod(lit(CmsA(row)) * h + lit(CmsB(row)), lit(TextFunctions.P)), lit(w))

  /** Build the d×w count-min sketch over a term column: one narrow
    * d-way fan-out per term, then a bounded `groupBy(row, pos)` —
    * the partial-aggregate shuffle never exceeds d·w cells per input
    * partition. Output: (row, pos, cnt). */
  def cmsBuild(terms: DataFrame, termCol: String, w: Int): DataFrame = {
    val d = CmsA.size
    terms
      .withColumn("h", graft.functions.HashExpressions.polyHash(col(termCol))) // native: bit-equal to polyFingerprint on ASCII, no per-char lambda
      .select(posexplode(array((0 until d).map(i => pos(i, col("h"), w)): _*))
        .as(Seq("row", "pos")))
      .groupBy("row", "pos")
      .agg(count(lit(1)).as("cnt"))
  }

  /** Point-query the sketch for each candidate term: est = min over
    * the d rows of the addressed cell (integer min — order-free,
    * exact). Candidates join the ≤ d·w-cell sketch broadcast; cells
    * never hit for a candidate count as 0 (an empty cell). */
  def cmsEstimate(sketch: DataFrame, candidates: DataFrame,
      termCol: String, w: Int): DataFrame = {
    val d = CmsA.size
    candidates
      .withColumn("h", graft.functions.HashExpressions.polyHash(col(termCol))) // native: bit-equal to polyFingerprint on ASCII, no per-char lambda
      .select(col(termCol),
        posexplode(array((0 until d).map(i => pos(i, col("h"), w)): _*))
          .as(Seq("row", "pos")))
      .join(broadcast(sketch), Seq("row", "pos"), "left")
      .groupBy(termCol)
      .agg(min(coalesce(col("cnt"), lit(0L))).as("est_cnt"))
  }

  /** Heavy hitters with sketch verification — the q64 gate shape:
    * the exact top-`k` terms of the corpus (count desc, term asc tie
    * break) side-by-side with their count-min estimates from a d×w
    * sketch built over the same token stream. `est_cnt ≥ true_cnt`
    * always (CMS never under-counts); the gap measures collision
    * pressure at the chosen width. Output: (term, true_cnt,
    * est_cnt). */
  def heavyHittersWithCms(docs: DataFrame, k: Int, w: Int): DataFrame = {
    val terms = docs.select(
      explode(TextFunctions.tokens(col("text"))).as("term"))
    val exact = terms.groupBy("term").agg(count(lit(1)).as("true_cnt"))
      .orderBy(col("true_cnt").desc, col("term")).limit(k)
    val sketch = cmsBuild(terms, "term", w)
    exact.join(cmsEstimate(sketch, exact.select("term"), "term", w), "term")
      .select("term", "true_cnt", "est_cnt")
  }
}
