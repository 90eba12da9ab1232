package graft

import graft.operators.{Corpus, EventAnalytics, Layout, Retrieval}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-5 pipeline queries: corpus compliance + quality scoring
  * (PII redaction, vocabulary/OOV), retrieval (keyword search, hybrid
  * RRF fusion), and event-analytics OLAP (cohort retention, funnel,
  * CUBE). Shares [[SparkEntry]]'s exact-arithmetic oracle discipline:
  * integer counts, fixed-order double folds, no transcendentals.
  */
object PipelineQueries {

  /** Fixed query-term list for q59 (corpus-vocabulary words). */
  private val SearchTerms = Seq("window", "join", "vector", "scan")

  /** q54 — PII detect + redact. The synthetic corpus carries no PII,
    * so the gate derives a deterministic PII-bearing column (doc_id
    * woven into an email, an IPv4, a phone) and runs the REAL
    * [[Corpus.piiScan]] over it — nonzero counts, real redaction,
    * both engines share the injection expression. */
  private def q54(s: SparkSession, d: String): DataFrame =
    Corpus.piiScan(
      Tables.documents(s, d).withColumn("text", concat(
        col("text"),
        lit(" contact user"), col("doc_id").cast("string"),
        lit("@example.com via 10.0."),
        pmod(col("doc_id"), lit(256L)).cast("string"),
        lit(".7 or +1 555 01"),
        pmod(col("doc_id"), lit(100L)).cast("string"))))

  /** q55 — vocabulary coverage / OOV-rate quality scoring (top-20
    * corpus vocabulary). */
  private def q55(s: SparkSession, d: String): DataFrame =
    Corpus.vocabularyCoverage(Tables.documents(s, d), 20)

  /** q56 — cohort retention: users bucketed by first-seen epoch-week,
    * activity counted per (cohort, week-offset) cell. */
  private def q56(s: SparkSession, d: String): DataFrame =
    EventAnalytics.cohortRetention(Tables.events(s, d))

  /** q57 — ordered funnel per user: first view → first click at/after
    * it → first purchase at/after that; stage = deepest step reached. */
  private def q57(s: SparkSession, d: String): DataFrame =
    EventAnalytics.funnelStages(Tables.events(s, d),
      Seq("view", "click", "purchase"))

  /** q58 — CUBE over (event_type, weekday): all four grouping levels
    * in one Expand + single shuffle (q51's ROLLUP, completed to the
    * full lattice). Weekday from epoch-day arithmetic (day 0 =
    * Thursday ⇒ +4 aligns 0=Sunday), exact integers. */
  private def q58(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .withColumn("weekday", expr("(tsMs div 86400000 + 4) % 7"))
      .cube(col("event_type"), col("weekday"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("sum_value"),
        grouping_id().as("gid"))

  /** q59 — exact keyword search, rational tf-idf ranking, top-10. */
  private def q59(s: SparkSession, d: String): DataFrame =
    Retrieval.keywordSearch(Tables.documents(s, d), SearchTerms, 10)

  /** q60 — hybrid lexical+semantic retrieval with RRF fusion: 5 query
    * docs, top-20 per modality, top-10 fused. */
  private def q60(s: SparkSession, d: String): DataFrame =
    Retrieval.hybridRrfTopK(Tables.documents(s, d), Tables.embeddings(s, d),
      nQueries = 5, perListK = 20, fuseK = 10)

  /** q61 — the z-curve itself, cross-engine: 8-bit range buckets of
    * (n_chars, doc_id) and their Morton interleave. Pins
    * [[Layout.rangeBucket]] (IEEE-deterministic double scaling) and
    * [[Layout.mortonInterleave]] (pure bit weave) against DuckDB's
    * integer/bit arithmetic — the layout operator's math is exact,
    * not approximate. */
  private def q61(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
    val b = docs.agg(
      min("n_chars").as("x_lo"), max("n_chars").as("x_hi"),
      min("doc_id").as("y_lo"), max("doc_id").as("y_hi"))
    docs.crossJoin(broadcast(b))
      .select(col("doc_id"),
        Layout.rangeBucket(col("n_chars"), col("x_lo"), col("x_hi"), 8).as("bx"),
        Layout.rangeBucket(col("doc_id"), col("y_lo"), col("y_hi"), 8).as("by"))
      .withColumn("z", Layout.mortonInterleave(col("bx"), col("by"), 8))
  }

  /** q62 — equal-width histogram: 10 global-range value bins per event
    * type (global min/max so bins align across types), count + decimal
    * sum + bounds per cell. One tiny bounds aggregate broadcast into a
    * narrow bin map, one cell shuffle. */
  private def q62(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
    val b = ev.agg(min("value").as("lo"), max("value").as("hi"))
    ev.crossJoin(broadcast(b))
      .withColumn("bin",
        when(col("hi") === col("lo"), lit(0L)).otherwise(least(lit(9L),
          floor((col("value") - col("lo")) / (col("hi") - col("lo")) * 10)
            .cast("long"))))
      .groupBy("event_type", "bin")
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("sum_value"),
        min("value").as("min_value"), max("value").as("max_value"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q54_pii_redact"     -> (q54 _),
    "q55_vocab_oov"      -> (q55 _),
    "q56_cohort"         -> (q56 _),
    "q57_funnel"         -> (q57 _),
    "q58_cube"           -> (q58 _),
    "q59_keyword_search" -> (q59 _),
    "q60_hybrid_rrf"     -> (q60 _),
    "q61_zorder_curve"   -> (q61 _),
    "q62_histogram"      -> (q62 _))

  // ------------------------------------------------------------------ //
  //  DuckDB oracles                                                     //
  // ------------------------------------------------------------------ //

  /** The three PII regexes, generated from [[Corpus.PiiPatterns]] so
    * the two engines can never drift. */
  private val Seq(emailRe, ipv4Re, phoneRe) = Corpus.PiiPatterns.map(_._2)

  /** Shared tokenizer CTE text (tokens / distinct-token variants). */
  private def duckTokens(distinctSet: Boolean): String = {
    val base = """list_filter(string_split_regex(text, '\s+'), x -> x != '')"""
    if (distinctSet) s"list_distinct($base)" else base
  }

  /** DuckDB mirror of [[graft.functions.TextFunctions.tokenHashes]]. */
  private val duckTokenHashes =
    """list_transform(tk, t ->
      |           list_reduce(list_prepend(CAST(0 AS BIGINT),
      |             list_transform(range(1, length(t)+1), i -> CAST(unicode(substr(t,i,1)) AS BIGINT))),
      |             (acc, c) -> (acc * 31 + c) % 1000000007))""".stripMargin

  /** Guarded jaccard (same empty-set semantics as sortedJaccard). */
  private def duckJaccard(a: String, b: String): String =
    s"CASE WHEN len($a) + len($b) = 0 THEN CAST(0.0 AS DOUBLE) " +
      s"ELSE CAST(len(list_intersect($a, $b)) AS DOUBLE) " +
      s"/ (len($a) + len($b) - len(list_intersect($a, $b))) END"

  /** Sequential double-precision dot product (dim 64). */
  private def duckDot(a: String, b: String): String =
    s"list_reduce(list_prepend(CAST(0.0 AS DOUBLE), " +
      s"list_transform(range(1, 65), i -> CAST($a[i] AS DOUBLE) * CAST($b[i] AS DOUBLE))), " +
      "(acc, v) -> acc + v)"

  /** DuckDB mirror of [[graft.operators.Layout.rangeBucket]] — same
    * subtraction-cast-divide-scale order, truncation == floor for the
    * non-negative quotient. */
  private def duckBucket(c: String, lo: String, hi: String, bits: Int): String =
    s"CASE WHEN $hi <= $lo THEN CAST(0 AS BIGINT) " +
      s"ELSE LEAST(CAST(floor(($c - $lo)::DOUBLE / (($hi)::DOUBLE - $lo + 1) " +
      s"* ${1L << bits}) AS BIGINT), ${(1L << bits) - 1}) END"

  /** DuckDB mirror of [[graft.operators.Layout.mortonInterleave]]. */
  private def duckMorton(x: String, y: String, bits: Int): String =
    (0 until bits).flatMap(i => Seq(
      s"((($x >> $i) & 1) << ${2 * i})",
      s"((($y >> $i) & 1) << ${2 * i + 1})")).mkString(" | ")

  private def q59ScoreSql: String = SearchTerms.map(t =>
    s"CASE WHEN g.df_$t = 0 THEN CAST(0.0 AS DOUBLE) " +
      s"ELSE CAST(tf.tf_$t * g.n_docs AS DOUBLE) / g.df_$t END")
    .mkString("\n           + ")

  val oracles: Map[String, String] = Map(
    "q54_pii_redact" ->
      s"""WITH p AS (
         |  SELECT doc_id,
         |         text || ' contact user' || CAST(doc_id AS VARCHAR)
         |              || '@example.com via 10.0.' || CAST(doc_id % 256 AS VARCHAR)
         |              || '.7 or +1 555 01' || CAST(doc_id % 100 AS VARCHAR) AS text
         |  FROM documents
         |)
         |SELECT doc_id,
         |       CAST(len(regexp_extract_all(text, '$emailRe')) AS BIGINT) AS n_email,
         |       CAST(len(regexp_extract_all(text, '$ipv4Re')) AS BIGINT) AS n_ipv4,
         |       CAST(len(regexp_extract_all(text, '$phoneRe')) AS BIGINT) AS n_phone,
         |       (len(regexp_extract_all(text, '$emailRe')) > 0
         |        OR len(regexp_extract_all(text, '$ipv4Re')) > 0
         |        OR len(regexp_extract_all(text, '$phoneRe')) > 0) AS has_pii,
         |       regexp_replace(regexp_replace(regexp_replace(text,
         |         '$emailRe', '[EMAIL]', 'g'),
         |         '$ipv4Re', '[IPV4]', 'g'),
         |         '$phoneRe', '[PHONE]', 'g') AS redacted
         |FROM p""".stripMargin,
    "q55_vocab_oov" ->
      s"""WITH tok AS (
         |  SELECT doc_id, unnest(${duckTokens(distinctSet = false)}) AS term
         |  FROM documents
         |), cnts AS (
         |  SELECT term, COUNT(*) AS cnt FROM tok GROUP BY 1
         |), vocab AS (
         |  SELECT term, cnt AS vocab_cnt FROM cnts ORDER BY cnt DESC, term LIMIT 20
         |), per AS (
         |  SELECT doc_id, COUNT(*) AS n_tokens,
         |         SUM(CASE WHEN v.vocab_cnt IS NULL THEN 1 ELSE 0 END) AS n_oov,
         |         SUM(COALESCE(v.vocab_cnt, 0)) AS sum_vocab_cnt
         |  FROM tok LEFT JOIN vocab v USING (term) GROUP BY 1
         |)
         |SELECT d.doc_id,
         |       CAST(COALESCE(p.n_tokens, 0) AS BIGINT) AS n_tokens,
         |       CAST(COALESCE(p.n_oov, 0) AS BIGINT) AS n_oov,
         |       CASE WHEN COALESCE(p.n_tokens, 0) = 0 THEN CAST(0.0 AS DOUBLE)
         |            ELSE CAST(p.n_oov AS DOUBLE) / p.n_tokens END AS oov_rate,
         |       CASE WHEN COALESCE(p.n_tokens, 0) = 0 THEN CAST(0.0 AS DOUBLE)
         |            ELSE CAST(p.sum_vocab_cnt AS DOUBLE) / p.n_tokens END AS avg_vocab_tf
         |FROM documents d LEFT JOIN per p USING (doc_id)""".stripMargin,
    "q56_cohort" ->
      """WITH e AS (
        |  SELECT user_id, epoch_ms(ts) // 604800000 AS wk FROM events
        |), f AS (
        |  SELECT user_id, MIN(wk) AS cohort_week FROM e GROUP BY 1
        |)
        |SELECT f.cohort_week, e.wk - f.cohort_week AS week_offset,
        |       CAST(COUNT(DISTINCT e.user_id) AS BIGINT) AS n_users,
        |       COUNT(*) AS n_events
        |FROM e JOIN f USING (user_id)
        |GROUP BY 1, 2""".stripMargin,
    "q57_funnel" ->
      """WITH e AS (
        |  SELECT user_id, event_type, epoch_ms(ts) AS ms FROM events
        |), v AS (
        |  SELECT user_id,
        |         MIN(CASE WHEN event_type = 'view' THEN ms END) AS view_ms
        |  FROM e GROUP BY 1
        |), c AS (
        |  SELECT e.user_id, v.view_ms,
        |         MIN(CASE WHEN event_type = 'click' AND ms >= view_ms THEN ms END) AS click_ms
        |  FROM e JOIN v USING (user_id) GROUP BY 1, 2
        |), p AS (
        |  SELECT e.user_id, c.view_ms, c.click_ms,
        |         MIN(CASE WHEN event_type = 'purchase' AND ms >= click_ms THEN ms END) AS purchase_ms
        |  FROM e JOIN c USING (user_id) GROUP BY 1, 2, 3
        |)
        |SELECT user_id, view_ms, click_ms, purchase_ms,
        |       CAST(CASE WHEN purchase_ms IS NOT NULL THEN 3
        |                 WHEN click_ms IS NOT NULL THEN 2
        |                 WHEN view_ms IS NOT NULL THEN 1 ELSE 0 END AS BIGINT) AS stage
        |FROM p""".stripMargin,
    "q58_cube" ->
      """WITH e AS (
        |  SELECT event_type, (epoch_ms(ts) // 86400000 + 4) % 7 AS weekday, value
        |  FROM events
        |)
        |SELECT event_type, weekday, COUNT(*) AS n,
        |       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value,
        |       CAST(GROUPING(event_type, weekday) AS BIGINT) AS gid
        |FROM e GROUP BY CUBE (event_type, weekday)""".stripMargin,
    "q59_keyword_search" ->
      s"""WITH tk AS (
         |  SELECT doc_id, ${duckTokens(distinctSet = false)} AS tk FROM documents
         |), tf AS (
         |  SELECT doc_id,
         |         ${SearchTerms.map(t =>
               s"CAST(len(list_filter(tk, x -> x = '$t')) AS BIGINT) AS tf_$t")
               .mkString(",\n         ")}
         |  FROM tk
         |), g AS (
         |  SELECT ${SearchTerms.map(t =>
               s"SUM(CASE WHEN tf_$t > 0 THEN 1 ELSE 0 END) AS df_$t")
               .mkString(",\n         ")},
         |         COUNT(*) AS n_docs
         |  FROM tf
         |), scored AS (
         |  SELECT tf.doc_id, ${SearchTerms.map(t => s"tf.tf_$t").mkString(", ")},
         |         $q59ScoreSql AS score
         |  FROM tf, g
         |)
         |SELECT * FROM scored WHERE score > 0
         |ORDER BY score DESC, doc_id LIMIT 10""".stripMargin,
    "q60_hybrid_rrf" ->
      s"""WITH tk AS (
         |  SELECT doc_id, ${duckTokens(distinctSet = true)} AS tk FROM documents
         |), hashed AS (
         |  SELECT doc_id, list_sort($duckTokenHashes) AS hs
         |  FROM tk
         |), lex0 AS (
         |  SELECT q.doc_id AS query_id, d.doc_id AS doc_id,
         |         ${duckJaccard("q.hs", "d.hs")} AS jac
         |  FROM hashed d JOIN hashed q ON q.doc_id < 5 AND d.doc_id != q.doc_id
         |), lex AS (
         |  SELECT query_id, doc_id,
         |         row_number() OVER (PARTITION BY query_id ORDER BY jac DESC, doc_id) AS r_lex
         |  FROM lex0 QUALIFY r_lex <= 20
         |), nrm AS (
         |  SELECT vec_id, embedding, sqrt(${duckDot("embedding", "embedding")}) AS nrm
         |  FROM embeddings
         |), sem0 AS (
         |  SELECT q.vec_id AS query_id, c.vec_id AS doc_id,
         |         ${duckDot("q.embedding", "c.embedding")} / (q.nrm * c.nrm) AS cosine
         |  FROM nrm c JOIN nrm q ON q.vec_id < 5 AND c.vec_id != q.vec_id
         |), sem AS (
         |  SELECT query_id, doc_id,
         |         row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, doc_id) AS r_sem
         |  FROM sem0 QUALIFY r_sem <= 20
         |), fused AS (
         |  SELECT COALESCE(l.query_id, s.query_id) AS query_id,
         |         COALESCE(l.doc_id, s.doc_id) AS doc_id,
         |         l.r_lex AS r_lex, s.r_sem AS r_sem,
         |         COALESCE(CAST(1.0 AS DOUBLE) / (l.r_lex + 60), CAST(0.0 AS DOUBLE))
         |           + COALESCE(CAST(1.0 AS DOUBLE) / (s.r_sem + 60), CAST(0.0 AS DOUBLE)) AS rrf
         |  FROM lex l FULL JOIN sem s
         |    ON l.query_id = s.query_id AND l.doc_id = s.doc_id
         |)
         |SELECT query_id, doc_id, r_lex, r_sem, rrf,
         |       row_number() OVER (PARTITION BY query_id ORDER BY rrf DESC, doc_id) AS fused_rank
         |FROM fused
         |QUALIFY fused_rank <= 10""".stripMargin,
    "q61_zorder_curve" ->
      s"""WITH b AS (
         |  SELECT MIN(n_chars) AS x_lo, MAX(n_chars) AS x_hi,
         |         MIN(doc_id) AS y_lo, MAX(doc_id) AS y_hi
         |  FROM documents
         |), z AS (
         |  SELECT d.doc_id,
         |         ${duckBucket("d.n_chars", "b.x_lo", "b.x_hi", 8)} AS bx,
         |         ${duckBucket("d.doc_id", "b.y_lo", "b.y_hi", 8)} AS by
         |  FROM documents d, b
         |)
         |SELECT doc_id, bx, by,
         |       ${duckMorton("bx", "by", 8)} AS z
         |FROM z""".stripMargin,
    "q62_histogram" ->
      """WITH b AS (
        |  SELECT MIN(value) AS lo, MAX(value) AS hi FROM events
        |), e AS (
        |  SELECT event_type, value,
        |         CASE WHEN b.hi = b.lo THEN CAST(0 AS BIGINT)
        |              ELSE LEAST(CAST(9 AS BIGINT),
        |                CAST(floor((value - b.lo) / (b.hi - b.lo) * 10) AS BIGINT)) END AS bin
        |  FROM events, b
        |)
        |SELECT event_type, bin, COUNT(*) AS n,
        |       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value,
        |       MIN(value) AS min_value, MAX(value) AS max_value
        |FROM e GROUP BY 1, 2""".stripMargin)
}
