package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Explicit skew mitigation for equi-joins with hot keys — the
  * salt-and-replicate pattern.
  *
  * AQE's skew-join (`spark.sql.adaptive.skewJoin.enabled`, on by
  * default in [[graft.GraftSession]]) splits oversized sort-merge
  * partitions at runtime and is the first line of defense. Explicit
  * salting remains the tool when AQE can't act: shuffle-hash or
  * bucketed join paths, stream-static joins, a join feeding an
  * operator that pins the output distribution, or a single key so hot
  * that even a split partition's task is dominated by it.
  *
  * Shape: the skewed (fact) side gets a deterministic-per-row salt in
  * [0, salts); the small-but-unbroadcastable (dim) side is replicated
  * `salts` × via a generate; the join key becomes (key, salt), fanning
  * one hot key across `salts` tasks. Dim-side cost is the replication
  * factor — use the smallest `salts` that flattens the hot key.
  */
object Skew {

  /** Salted inner equi-join of `fact` (skewed on `key`) with `dim`
    * (every `key` at most once per salt replica). Result rows are
    * identical to `fact.join(dim, key)` — only the shuffle layout
    * changes.
    *
    * The salt hashes the fact row's CONTENT (all columns), never a
    * per-execution id: `monotonically_increasing_id`/`rand` salts are
    * recompute-nondeterministic, and when a lost executor forces
    * partial recomputation mid-shuffle, re-salted rows hash to
    * different reducers and are silently dropped or duplicated. Rows
    * identical in every column share a salt, which is harmless — they
    * are interchangeable. */
  def saltedJoin(fact: DataFrame, dim: DataFrame, key: String,
      salts: Int): DataFrame = {
    require(salts > 0, "salts must be positive")
    val saltedFact = fact.withColumn("__salt",
      pmod(xxhash64(fact.columns.map(col).toIndexedSeq: _*), lit(salts.toLong)))
    val saltedDim = dim.withColumn("__salt",
      explode(sequence(lit(0L), lit(salts.toLong - 1))))
    saltedFact.join(saltedDim, Seq(key, "__salt")).drop("__salt")
  }
}
