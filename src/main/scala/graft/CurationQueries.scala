package graft

import graft.operators.{Corpus, Dedup, IvfCentroids}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Gate queries q67–q70: the curation-pipeline additions of round 5 —
  * semantic dedup (cluster-then-prune), bloom-prefiltered
  * decontamination, sequence packing, and DSIR-style importance
  * weighting. Exact-oracle discipline as everywhere: integer/rational
  * arithmetic plus the sequential double fold for cosines.
  */
object CurationQueries {

  /** q67 — SemDeDup over the pinned IVF centroids: within-cell
    * cosine ≥ 0.4 pairs (the q32 threshold convention; ~4% dup rate
    * on the synthetic corpus), min-id-wins keep rule. */
  private def q67(s: SparkSession, d: String): DataFrame =
    Dedup.semanticDedup(Tables.embeddings(s, d),
      IvfCentroids.Centroids16, tau = 0.4)

  /** q68 — bloom-prefiltered benchmark decontamination: 7-gram
    * overlap ≥ 2 against the doc_id ∈ [100, 120) probe slice. The
    * bloom prunes; the confirm join keeps the result exact. */
  private def q68(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
    Corpus.contaminationCheckBloom(docs,
      docs.filter(col("doc_id") >= 100 && col("doc_id") < 120),
      n = 7, minMatches = 2)
  }

  /** q69 — contiguous sequence packing: 256-token budget, 8 hash
    * shards per source. */
  private def q69(s: SparkSession, d: String): DataFrame =
    Corpus.packSequences(Tables.documents(s, d), budget = 256L, nShards = 8)

  /** q70 — importance weights against the src0 target domain. */
  private def q70(s: SparkSession, d: String): DataFrame =
    Corpus.importanceWeights(Tables.documents(s, d),
      col("source") === "src0")

  /** q74 — deterministic training-order shuffle, seed 42. */
  private def q74(s: SparkSession, d: String): DataFrame =
    Corpus.shuffleRank(Tables.documents(s, d), seed = 42L)

  /** q76 — per-source document cap: best 10 docs per source by
    * (token count desc, doc_id), two-phase top-k (the testdata has
    * ~25 docs/source at sf0.01, so the cap genuinely cuts). */
  private def q76(s: SparkSession, d: String): DataFrame =
    Corpus.perSourceCap(Tables.documents(s, d), cap = 10, nShards = 8)

  /** q77 — corpus-bigram LM quality scores (rational p(w2|w1)). */
  private def q77(s: SparkSession, d: String): DataFrame =
    Corpus.bigramLmScores(Tables.documents(s, d))

  /** q78 — corpus version diff: "old" = doc_id < 450, "new" =
    * doc_id ≥ 40 with every doc_id % 9 == 0 text rewritten — a
    * deterministic two-version fixture carved from the shared table
    * so both engines derive identical versions. */
  private def q78(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
    val old = docs.filter(col("doc_id") < 450)
    val newer = docs.filter(col("doc_id") >= 40)
      .withColumn("text", when(col("doc_id") % 9 === 0,
        concat(lit("v2 "), col("text"))).otherwise(col("text")))
    Corpus.corpusDiff(old, newer)
  }

  /** q79 — exact 10 000-token budget prefix of the seed-42 shuffle
    * order (scalable global running sum, no global window). */
  private def q79(s: SparkSession, d: String): DataFrame =
    Corpus.tokenBudgetPrefix(Tables.documents(s, d), budget = 10000L, seed = 42L)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q67_semdedup"      -> (q67 _),
    "q68_bloom_decontam" -> (q68 _),
    "q69_seq_packing"   -> (q69 _),
    "q70_importance"    -> (q70 _),
    "q74_shuffle_rank"  -> (q74 _),
    "q76_source_cap"    -> (q76 _),
    "q77_bigram_lm"     -> (q77 _),
    "q78_corpus_diff"   -> (q78 _),
    "q79_token_budget"  -> (q79 _))

  // ------------------------------------------------------------------ //

  private val duckDot = TextQueries.duckDot _
  private val duckPolyHash = TextQueries.duckPolyHash _

  val oracles: Map[String, String] = Map(
    "q67_semdedup" ->
      s"""WITH cent AS (
         |  SELECT * FROM (VALUES
         |        ${TextQueries.centroidValues}
         |  ) AS t(cell, centroid)
         |), base AS (
         |  SELECT vec_id, embedding,
         |         sqrt(${duckDot("embedding", "embedding")}) AS nrm
         |  FROM embeddings
         |), dists AS (
         |  SELECT b.vec_id, b.embedding, b.nrm, c.cell,
         |         -${duckDot("b.embedding", "c.centroid")}
         |           + ${duckDot("c.centroid", "c.centroid")} / 2 AS dist
         |  FROM base b CROSS JOIN cent c
         |), asg AS (
         |  SELECT vec_id, cell, embedding, nrm FROM (
         |    SELECT *, row_number() OVER
         |      (PARTITION BY vec_id ORDER BY dist, cell) AS pr
         |    FROM dists
         |  ) WHERE pr = 1
         |), pairs AS (
         |  SELECT a.vec_id,
         |         ${duckDot("a.embedding", "b.embedding")} / (a.nrm * b.nrm) AS cosine
         |  FROM asg a JOIN asg b ON a.cell = b.cell AND b.vec_id < a.vec_id
         |), d AS (
         |  SELECT vec_id, CAST(COUNT(*) AS BIGINT) AS n_dups,
         |         MAX(cosine) AS max_cosine
         |  FROM pairs WHERE cosine >= 0.4 GROUP BY 1
         |)
         |SELECT a.vec_id, a.cell,
         |       COALESCE(d.n_dups, 0) AS n_dups, d.max_cosine,
         |       COALESCE(d.n_dups, 0) > 0 AS is_dup
         |FROM asg a LEFT JOIN d USING (vec_id)""".stripMargin,
    "q68_bloom_decontam" ->
      s"""WITH t AS (
         |  SELECT doc_id, list_filter(string_split_regex(text, '\\s+'), x -> x != '') AS tk
         |  FROM documents
         |), g AS (
         |  SELECT doc_id,
         |         CASE WHEN len(tk) < 7 THEN CAST([] AS BIGINT[])
         |              ELSE list_distinct(list_transform(range(1, len(tk) - 5),
         |                     i -> ${duckPolyHash("array_to_string(list_slice(tk, i, i + 6), ' ')")})) END AS grams
         |  FROM t
         |), pg AS (
         |  SELECT list_sort(list_distinct(flatten(list(grams)))) AS pg
         |  FROM g WHERE doc_id >= 100 AND doc_id < 120
         |)
         |SELECT g.doc_id, CAST(len(g.grams) AS BIGINT) AS n_grams,
         |       CAST(len(list_intersect(g.grams, pg.pg)) AS BIGINT) AS n_matched,
         |       len(list_intersect(g.grams, pg.pg)) >= 2 AS contaminated
         |FROM g CROSS JOIN pg""".stripMargin,
    "q69_seq_packing" ->
      """WITH t AS (
        |  SELECT doc_id, source,
        |         CAST(len(list_filter(string_split_regex(text, '\s+'), x -> x != '')) AS BIGINT) AS n_tok,
        |         doc_id % 8 AS shard
        |  FROM documents
        |), c AS (
        |  SELECT *, SUM(n_tok) OVER
        |    (PARTITION BY source, shard ORDER BY doc_id) AS cum
        |  FROM t
        |)
        |SELECT source, shard, CAST((cum - n_tok) // 256 AS BIGINT) AS seq_id,
        |       CAST(COUNT(*) AS BIGINT) AS n_docs,
        |       CAST(SUM(n_tok) AS BIGINT) AS seq_tokens,
        |       MIN(doc_id) AS first_doc, MAX(doc_id) AS last_doc
        |FROM c GROUP BY 1, 2, 3""".stripMargin,
    "q70_importance" ->
      """WITH tok AS (
        |  SELECT doc_id, source = 'src0' AS is_target,
        |         unnest(list_filter(string_split_regex(text, '\s+'), x -> x != '')) AS term
        |  FROM documents
        |), cc AS (
        |  SELECT term, CAST(COUNT(*) AS BIGINT) AS cc FROM tok GROUP BY 1
        |), tc AS (
        |  SELECT term, CAST(COUNT(*) AS BIGINT) AS tc FROM tok WHERE is_target GROUP BY 1
        |), w AS (
        |  SELECT cc.term,
        |         (1000000 * (COALESCE(tc.tc, 0) + 1)) // (cc.cc + 1) AS w
        |  FROM cc LEFT JOIN tc USING (term)
        |), thr AS (
        |  SELECT (1000000 * SUM(CASE WHEN is_target THEN 1 ELSE 0 END)) // COUNT(*) AS thr
        |  FROM tok
        |), scored AS (
        |  SELECT tok.doc_id, CAST(COUNT(*) AS BIGINT) AS n_tokens,
        |         CAST(SUM(w.w) AS BIGINT) AS score_sum
        |  FROM tok JOIN w USING (term) GROUP BY 1
        |)
        |SELECT d.doc_id,
        |       COALESCE(s.n_tokens, 0) AS n_tokens,
        |       COALESCE(s.score_sum, 0) AS score_sum,
        |       CASE WHEN COALESCE(s.n_tokens, 0) = 0 THEN 0
        |            ELSE s.score_sum // s.n_tokens END AS avg_score,
        |       CASE WHEN COALESCE(s.n_tokens, 0) = 0 THEN 0
        |            ELSE s.score_sum // s.n_tokens END >= thr.thr AS target_like
        |FROM documents d LEFT JOIN scored s USING (doc_id) CROSS JOIN thr""".stripMargin,
    "q74_shuffle_rank" ->
      s"""WITH hashed AS (
         |  SELECT doc_id,
         |         ${TextQueries.duckPolyHash("('42:' || CAST(doc_id AS VARCHAR))")} AS h
         |  FROM documents
         |), keyed AS (
         |  SELECT doc_id,
         |         ((h * h) % 1000000007) * ((h * h) % 1000000007) % 1000000007 AS shuffle_key
         |  FROM hashed
         |)
         |SELECT doc_id, shuffle_key,
         |       row_number() OVER (ORDER BY shuffle_key, doc_id) AS rank
         |FROM keyed""".stripMargin,
    "q76_source_cap" ->
      // the oracle's single source-partitioned window equals the
      // engine's two-phase shard/top-k by construction (any
      // source-wide top-cap row is in its own shard's top-cap)
      """WITH t AS (
        |  SELECT doc_id, source,
        |         CAST(len(list_filter(string_split_regex(text, '\s+'), x -> x != '')) AS BIGINT) AS n_tok
        |  FROM documents
        |)
        |SELECT source, doc_id, n_tok, CAST(rk AS INTEGER) AS rk FROM (
        |  SELECT *, row_number() OVER
        |    (PARTITION BY source ORDER BY n_tok DESC, doc_id) AS rk
        |  FROM t
        |) WHERE rk <= 10""".stripMargin,
    "q77_bigram_lm" ->
      """WITH tok AS (
        |  SELECT doc_id, list_filter(string_split_regex(text, '\s+'), x -> x != '') AS tk
        |  FROM documents
        |), bg AS (
        |  SELECT doc_id, tk[i] AS w1, tk[i + 1] AS w2
        |  FROM tok, LATERAL (SELECT unnest(range(1, len(tk))) AS i) r
        |), cb AS (
        |  SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS cb FROM bg GROUP BY 1, 2
        |), cu AS (
        |  SELECT w1, CAST(COUNT(*) AS BIGINT) AS cu FROM bg GROUP BY 1
        |), scored AS (
        |  SELECT bg.doc_id, CAST(COUNT(*) AS BIGINT) AS n_bigrams,
        |         CAST(SUM((1000000 * cb.cb) // cu.cu) AS BIGINT) AS lm_sum
        |  FROM bg JOIN cb USING (w1, w2) JOIN cu USING (w1)
        |  GROUP BY 1
        |)
        |SELECT d.doc_id,
        |       COALESCE(s.n_bigrams, 0) AS n_bigrams,
        |       COALESCE(s.lm_sum, 0) AS lm_sum,
        |       CAST(CASE WHEN COALESCE(s.n_bigrams, 0) = 0 THEN 0
        |            ELSE s.lm_sum // s.n_bigrams END AS BIGINT) AS lm_score
        |FROM documents d LEFT JOIN scored s USING (doc_id)""".stripMargin,
    "q78_corpus_diff" ->
      s"""WITH old AS (
         |  SELECT doc_id, ${TextQueries.duckPolyHash("text")} AS h_old
         |  FROM documents WHERE doc_id < 450
         |), newer AS (
         |  SELECT doc_id, ${TextQueries.duckPolyHash(
               "CASE WHEN doc_id % 9 = 0 THEN 'v2 ' || text ELSE text END")} AS h_new
         |  FROM documents WHERE doc_id >= 40
         |)
         |SELECT COALESCE(o.doc_id, n.doc_id) AS doc_id,
         |       CASE WHEN o.doc_id IS NULL THEN 'added'
         |            WHEN n.doc_id IS NULL THEN 'removed'
         |            WHEN o.h_old = n.h_new THEN 'unchanged'
         |            ELSE 'modified' END AS status
         |FROM old o FULL OUTER JOIN newer n ON o.doc_id = n.doc_id""".stripMargin,
    "q79_token_budget" ->
      s"""WITH hashed AS (
         |  SELECT doc_id,
         |         CAST(len(list_filter(string_split_regex(text, '\\s+'), x -> x != '')) AS BIGINT) AS n_tok,
         |         ${TextQueries.duckPolyHash("('42:' || CAST(doc_id AS VARCHAR))")} AS h
         |  FROM documents
         |), keyed AS (
         |  SELECT doc_id, n_tok,
         |         ((h * h) % 1000000007) * ((h * h) % 1000000007) % 1000000007 AS shuffle_key
         |  FROM hashed
         |), c AS (
         |  SELECT doc_id, shuffle_key, n_tok,
         |         CAST(SUM(n_tok) OVER (ORDER BY shuffle_key, doc_id) AS BIGINT) AS cum_tokens
         |  FROM keyed
         |)
         |SELECT doc_id, shuffle_key, n_tok, cum_tokens
         |FROM c WHERE cum_tokens - n_tok < 10000""".stripMargin)
}
