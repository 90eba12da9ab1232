package graft.operators

import graft.functions.HashExpressions
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Retrieval operators over the corpus: exact keyword search with
  * rational tf-idf ranking, and hybrid lexical+semantic fusion via
  * reciprocal-rank fusion (RRF, Cormack et al. 2009) — the two query
  * paths a RAG / training-data-inspection stack runs against a corpus,
  * complementing the pure-ANN operators in [[Similarity]].
  *
  * Numeric discipline (same as [[Corpus]]): every score is built from
  * exact integer counts combined by IEEE-correctly-rounded `/` and
  * fixed-order `+` — no `ln`, no non-deterministic float summation
  * order — so both operators carry bit-exact SQL oracles.
  */
object Retrieval {

  /** Exact keyword search: documents ranked by the rational tf-idf sum
    * Σ_t tf(doc,t)·N/df(t) over the fixed query `terms` (the
    * no-transcendentals form of [[Corpus.tfIdfTopTerms]]'s score,
    * summed in declared term order so the double addition sequence is
    * deterministic). Only matching documents (score > 0) are returned,
    * top-`k` by (score desc, doc_id).
    *
    * Scale: per-term tf counts come from ONE native tokenization pass
    * per document ([[HashExpressions.TermFreqs]] — no token-array
    * materialization, no interpreted filter lambda per term); df and N
    * are one tiny global aggregate broadcast back; ranking is a
    * distributed `orderBy.limit` (TakeOrderedAndProject — never a
    * global window). Output: doc_id, tf_<term>…, score. */
  def keywordSearch(docs: DataFrame, terms: Seq[String], k: Int): DataFrame = {
    require(terms.nonEmpty, "at least one query term")
    val tf = docs.select(col("doc_id"),
      HashExpressions.termFreqs(col("text"), terms).as("_tf"))
      .select(col("doc_id") +: terms.zipWithIndex.map { case (t, i) =>
        col("_tf").getItem(i).as(s"tf_$t") }: _*)
    val dfExprs = terms.map(t =>
      sum(when(col(s"tf_$t") > 0, 1L).otherwise(0L)).as(s"df_$t")) :+
      count(lit(1)).as("n_docs")
    val dfr = tf.agg(dfExprs.head, dfExprs.tail: _*)
    val score = terms.map(t =>
      when(col(s"df_$t") === 0, lit(0.0))
        .otherwise((col(s"tf_$t") * col("n_docs")).cast("double") /
          col(s"df_$t"))).reduce(_ + _)
    tf.crossJoin(broadcast(dfr))
      .withColumn("score", score)
      .filter(col("score") > 0)
      .orderBy(col("score").desc, col("doc_id"))
      .limit(k)
      .select(col("doc_id") +: terms.map(t => col(s"tf_$t")) :+ col("score"): _*)
  }

  /** Hybrid more-like-this retrieval with reciprocal-rank fusion: for
    * each query document (`doc_id < nQueries`), the top-`perListK`
    * corpus documents by token-set jaccard (lexical list) and by
    * embedding cosine (semantic list) are fused by
    * rrf = Σ_list 1/(rrfK + rank), missing-from-list contributing 0 —
    * the standard scheme for combining keyword and vector retrieval
    * (cosine finds paraphrases that share no tokens, jaccard finds
    * exact phrasing that embeddings blur; RRF needs no score
    * calibration between the two).
    *
    * Scale: both candidate generators broadcast the (small by
    * definition) query set against a full corpus scan — embarrassingly
    * parallel, no corpus shuffle; ranking windows partition by
    * query_id (never global); fusion is an equi-join of two
    * queries×perListK lists. For corpus-scale query sets swap the
    * generators for [[Similarity.lshTopK]] / a minhash-banded lexical
    * list — the fusion stage is unchanged.
    *
    * Output: query_id, doc_id, r_lex, r_sem (null = not in that
    * list), rrf, fused_rank (1..fuseK by rrf desc, doc_id). */
  def hybridRrfTopK(docs: DataFrame, embeddings: DataFrame, nQueries: Int,
      perListK: Int, fuseK: Int, rrfK: Int = 60): DataFrame = {
    val sem = Similarity.bruteForceTopK(
        embeddings.filter(col("vec_id") < nQueries), embeddings, perListK)
      .select(col("query_id"), col("neighbor_id").as("doc_id"),
        col("rank").as("r_sem"))
    // one-pass native tokenize+hash+sort (bit-equal to
    // array_sort(tokenHashes(tokenSet(text))) — see TokenHashSet)
    val toks = docs.select(col("doc_id"),
      HashExpressions.tokenHashSet(col("text")).as("hs"))
    val q = toks.filter(col("doc_id") < nQueries)
      .select(col("doc_id").as("query_id"), col("hs").as("q_hs"))
    val lex = toks.crossJoin(broadcast(q))
      .filter(col("doc_id") =!= col("query_id"))
      .withColumn("jac", HashExpressions.sortedJaccard(col("q_hs"), col("hs")))
      .withColumn("r_lex", row_number().over(
        Window.partitionBy("query_id").orderBy(col("jac").desc, col("doc_id"))))
      .filter(col("r_lex") <= perListK)
      .select("query_id", "doc_id", "r_lex")
    lex.join(sem, Seq("query_id", "doc_id"), "full_outer")
      .withColumn("rrf",
        coalesce(lit(1.0) / (col("r_lex") + rrfK), lit(0.0)) +
          coalesce(lit(1.0) / (col("r_sem") + rrfK), lit(0.0)))
      .withColumn("fused_rank", row_number().over(
        Window.partitionBy("query_id").orderBy(col("rrf").desc, col("doc_id"))))
      .filter(col("fused_rank") <= fuseK)
      .select("query_id", "doc_id", "r_lex", "r_sem", "rrf", "fused_rank")
  }
}
