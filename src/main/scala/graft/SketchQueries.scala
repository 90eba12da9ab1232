package graft

import graft.functions.TextFunctions
import graft.operators.{Corpus, IvfCentroids, Pq, PqCodebooks, Similarity, Sketches}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-5 index/sketch queries: product-quantization ANN (the
  * memory-bound 100 TB vector-search path), count-min heavy hitters
  * (mergeable frequency sketching), domain-mixture resampling (the
  * training "data recipe"), and per-language adaptive quality
  * thresholds. Same exact-arithmetic oracle discipline as
  * [[SparkEntry]]: pinned literal codebooks, integer hashes, ordered
  * double folds.
  */
object SketchQueries {

  /** q63 — PQ ADC top-5: every 100th vector queries the codebook-
    * compressed index ([[PqCodebooks]], m=8 × 16 codes — 32×
    * compression of the 64-float embeddings). */
  private def q63(s: SparkSession, d: String): DataFrame =
    Pq.adcTopK(Tables.embeddings(s, d), pmod(col("vec_id"), lit(100L)) === 0,
      PqCodebooks.Codebooks8x16, dsub = 8, k = 5)

  /** q64 — exact top-20 heavy hitters with their count-min estimates
    * (d=4 × w=512 sketch over the full token stream). */
  private def q64(s: SparkSession, d: String): DataFrame =
    Sketches.heavyHittersWithCms(Tables.documents(s, d), k = 20, w = 512)

  /** q88 — composed IVFADC: IVF cell routing ([[IvfCentroids
    * .Centroids16]]) + PQ ADC scan within the 4 probed cells
    * ([[PqCodebooks.Codebooks8x16]]) + exact top-50 re-rank → top-5.
    * The 10⁹-vector search shape (raw vectors never ride the scan);
    * every distance is pinned-literal exact arithmetic, so the oracle
    * reproduces routing, codes, ADC sums and the re-rank
    * bit-for-bit. */
  private def q88(s: SparkSession, d: String): DataFrame =
    Similarity.ivfAdcTopK(Tables.embeddings(s, d),
      pmod(col("vec_id"), lit(100L)) === 0,
      IvfCentroids.Centroids16, PqCodebooks.Codebooks8x16, dsub = 8,
      nProbe = 4, k = 5, rerank = 50)

  /** q91 — RESIDUAL IVFADC (the FAISS IndexIVFPQ form): codes quantize
    * x − centroid(homeCell) against the pinned residual codebooks
    * ([[PqCodebooks.ResidualCodebooks8x16]]), the query's distance
    * table is per probed cell (its residual differs per cell), ranking
    * by pure ADC distance (no exact re-rank — the residual
    * approximation itself is the surface under test; TextOpsSpec pins
    * its recall ≥ the non-residual q88 configuration). All pinned-
    * literal exact arithmetic: the oracle reproduces home cells,
    * residuals, codes and ADC sums bit-for-bit. */
  private def q91(s: SparkSession, d: String): DataFrame =
    Similarity.ivfAdcResidualTopK(Tables.embeddings(s, d),
      pmod(col("vec_id"), lit(100L)) === 0,
      IvfCentroids.Centroids16, PqCodebooks.ResidualCodebooks8x16, dsub = 8,
      nProbe = 4, k = 5)

  /** q65 — mixture resample to 5:3:2 over three source domains. */
  private def q65(s: SparkSession, d: String): DataFrame =
    Corpus.mixtureResample(Tables.documents(s, d), "source",
      Map("src0" -> 5L, "src1" -> 3L, "src2" -> 2L))

  /** q66 — keep the top 30% of each language by lexical diversity. */
  private def q66(s: SparkSession, d: String): DataFrame =
    Corpus.adaptiveQualityFilter(Tables.documents(s, d), keepPermille = 300)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q63_pq_adc"          -> (q63 _),
    "q64_cms_heavy"       -> (q64 _),
    "q65_mixture_sample"  -> (q65 _),
    "q66_adaptive_filter" -> (q66 _),
    "q88_ivfadc"          -> (q88 _),
    "q91_ivfadc_residual" -> (q91 _))

  // ------------------------------------------------------------------ //
  //  DuckDB oracles                                                     //
  // ------------------------------------------------------------------ //

  /** PQ codebook VALUES literal — CAST('…' AS DOUBLE) parses the exact
    * Double.toString round-trip (see the q33 centroid discipline). */
  private val codebookValues = PqCodebooks.Codebooks8x16.map { case (s, c, cent) =>
    s"($s, $c, [${cent.map(v => s"CAST('$v' AS DOUBLE)").mkString(", ")}])"
  }.mkString(",\n        ")

  private val resCodebookValues =
    PqCodebooks.ResidualCodebooks8x16.map { case (s, c, cent) =>
      s"($s, $c, [${cent.map(v => s"CAST('$v' AS DOUBLE)").mkString(", ")}])"
    }.mkString(",\n        ")

  /** DuckDB residual of a 64-dim embedding vs an attached centroid:
    * element i is (double)emb[i] − centroid[i] — the exact arithmetic
    * [[graft.functions.HashExpressions.PqEncodeResidual]] (index side)
    * and the zip_with query-side residual compute. */
  private def duckResidual(emb: String, centroid: String): String =
    s"list_transform(range(1, 65), i -> " +
      s"CAST($emb[i] AS DOUBLE) - $centroid[i])"

  /** DuckDB mirror of [[Pq]]'s per-subspace squared-L2 fold:
    * Σ_j (emb[sub·8+j] − cent[j])², sequential in j. */
  private def duckSubDist(emb: String, cent: String, sub: String): String =
    s"list_reduce(list_prepend(CAST(0.0 AS DOUBLE), " +
      s"list_transform(range(1, 9), j -> " +
      s"(CAST($emb[$sub*8 + j] AS DOUBLE) - $cent[j]) * " +
      s"(CAST($emb[$sub*8 + j] AS DOUBLE) - $cent[j]))), (acc, v) -> acc + v)"

  /** DuckDB mirror of [[TextFunctions.polyFingerprint]]. */
  private def duckPolyHash(t: String): String =
    s"list_reduce(list_prepend(CAST(0 AS BIGINT), " +
      s"list_transform(range(1, length($t)+1), i -> " +
      s"CAST(unicode(substr($t, i, 1)) AS BIGINT))), " +
      s"(acc, c) -> (acc * 31 + c) % ${TextFunctions.P})"

  private val duckToks =
    """list_filter(string_split_regex(text, '\s+'), x -> x != '')"""

  /** CMS row hash positions as a DuckDB list literal (d = 4). */
  private val cmsPosList = (0 until Sketches.CmsA.size).map { i =>
    s"((${Sketches.CmsA(i)} * h + ${Sketches.CmsB(i)}) % ${TextFunctions.P}) % 512"
  }.mkString("[", ", ", "]")

  val oracles: Map[String, String] = Map(
    "q88_ivfadc" ->
      s"""WITH cent AS (
         |  SELECT * FROM (VALUES
         |        ${TextQueries.centroidValues}
         |  ) AS t(cell, centroid)
         |), cb AS (
         |  SELECT * FROM (VALUES
         |        $codebookValues
         |  ) AS t(sub, code, cent)
         |), cdists AS (
         |  SELECT e.vec_id, c.cell,
         |         -${TextQueries.duckDot("e.embedding", "c.centroid")}
         |           + ${TextQueries.duckDot("c.centroid", "c.centroid")} / 2 AS dist
         |  FROM embeddings e CROSS JOIN cent c
         |), home AS (
         |  SELECT vec_id, cell FROM (
         |    SELECT *, row_number() OVER (PARTITION BY vec_id
         |                                 ORDER BY dist, cell) AS pr
         |    FROM cdists
         |  ) WHERE pr = 1
         |), pdists AS (
         |  SELECT e.vec_id, c.sub, c.code,
         |         ${duckSubDist("e.embedding", "c.cent", "c.sub")} AS dist
         |  FROM embeddings e CROSS JOIN cb c
         |), enc AS (
         |  SELECT vec_id, list(code ORDER BY sub) AS codes FROM (
         |    SELECT vec_id, sub, code,
         |           row_number() OVER (PARTITION BY vec_id, sub
         |                              ORDER BY dist, code) AS pr
         |    FROM pdists
         |  ) WHERE pr = 1 GROUP BY vec_id
         |), dtabs AS (
         |  SELECT vec_id AS query_id,
         |         list(dist ORDER BY sub, code) AS dtab
         |  FROM pdists WHERE vec_id % 100 = 0 GROUP BY vec_id
         |), probes AS (
         |  SELECT vec_id AS query_id, cell FROM (
         |    SELECT *, row_number() OVER (PARTITION BY vec_id
         |                                 ORDER BY dist, cell) AS pr
         |    FROM cdists WHERE vec_id % 100 = 0
         |  ) WHERE pr <= 4
         |), adc AS (
         |  SELECT p.query_id, h.vec_id AS neighbor_id,
         |         list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
         |           list_transform(range(0, 8), s ->
         |             q.dtab[s*16 + e.codes[s+1] + 1])),
         |           (acc, v) -> acc + v) AS approx_dist
         |  FROM probes p
         |  JOIN home h ON h.cell = p.cell
         |  JOIN enc e ON e.vec_id = h.vec_id
         |  JOIN dtabs q ON q.query_id = p.query_id
         |  WHERE h.vec_id != p.query_id
         |), shortlist AS (
         |  SELECT query_id, neighbor_id, approx_dist FROM (
         |    SELECT *, row_number() OVER (PARTITION BY query_id
         |                                 ORDER BY approx_dist, neighbor_id) AS ar
         |    FROM adc
         |  ) WHERE ar <= 50
         |), rer AS (
         |  SELECT s.query_id, s.neighbor_id, s.approx_dist,
         |         ${TextQueries.duckDot("qe.embedding", "qe.embedding")}
         |           - 2 * ${TextQueries.duckDot("qe.embedding", "ne.embedding")}
         |           + ${TextQueries.duckDot("ne.embedding", "ne.embedding")} AS dist
         |  FROM shortlist s
         |  JOIN embeddings qe ON qe.vec_id = s.query_id
         |  JOIN embeddings ne ON ne.vec_id = s.neighbor_id
         |)
         |SELECT query_id, neighbor_id, rank, dist, approx_dist FROM (
         |  SELECT *, row_number() OVER (PARTITION BY query_id
         |                               ORDER BY dist, neighbor_id) AS rank
         |  FROM rer
         |) WHERE rank <= 5""".stripMargin,
    "q91_ivfadc_residual" ->
      s"""WITH cent AS (
         |  SELECT * FROM (VALUES
         |        ${TextQueries.centroidValues}
         |  ) AS t(cell, centroid)
         |), rcb AS (
         |  SELECT * FROM (VALUES
         |        $resCodebookValues
         |  ) AS t(sub, code, cent)
         |), cdists AS (
         |  SELECT e.vec_id, c.cell,
         |         -${TextQueries.duckDot("e.embedding", "c.centroid")}
         |           + ${TextQueries.duckDot("c.centroid", "c.centroid")} / 2 AS dist
         |  FROM embeddings e CROSS JOIN cent c
         |), home AS (
         |  SELECT vec_id, cell FROM (
         |    SELECT *, row_number() OVER (PARTITION BY vec_id
         |                                 ORDER BY dist, cell) AS pr
         |    FROM cdists
         |  ) WHERE pr = 1
         |), hres AS (
         |  SELECT h.vec_id, h.cell,
         |         ${duckResidual("e.embedding", "c.centroid")} AS res
         |  FROM home h
         |  JOIN embeddings e ON e.vec_id = h.vec_id
         |  JOIN cent c ON c.cell = h.cell
         |), pidx AS (
         |  SELECT r.vec_id, c.sub, c.code,
         |         ${duckSubDist("r.res", "c.cent", "c.sub")} AS dist
         |  FROM hres r CROSS JOIN rcb c
         |), enc AS (
         |  SELECT vec_id, list(code ORDER BY sub) AS codes FROM (
         |    SELECT vec_id, sub, code,
         |           row_number() OVER (PARTITION BY vec_id, sub
         |                              ORDER BY dist, code) AS pr
         |    FROM pidx
         |  ) WHERE pr = 1 GROUP BY vec_id
         |), probes AS (
         |  SELECT vec_id AS query_id, cell FROM (
         |    SELECT *, row_number() OVER (PARTITION BY vec_id
         |                                 ORDER BY dist, cell) AS pr
         |    FROM cdists WHERE vec_id % 100 = 0
         |  ) WHERE pr <= 4
         |), qres AS (
         |  SELECT p.query_id, p.cell,
         |         ${duckResidual("e.embedding", "c.centroid")} AS res
         |  FROM probes p
         |  JOIN embeddings e ON e.vec_id = p.query_id
         |  JOIN cent c ON c.cell = p.cell
         |), pq AS (
         |  SELECT q.query_id, q.cell, c.sub, c.code,
         |         ${duckSubDist("q.res", "c.cent", "c.sub")} AS dist
         |  FROM qres q CROSS JOIN rcb c
         |), dtabs AS (
         |  SELECT query_id, cell,
         |         list(dist ORDER BY sub, code) AS dtab
         |  FROM pq GROUP BY query_id, cell
         |), adc AS (
         |  SELECT d.query_id, h.vec_id AS neighbor_id,
         |         list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
         |           list_transform(range(0, 8), s ->
         |             d.dtab[s*16 + e.codes[s+1] + 1])),
         |           (acc, v) -> acc + v) AS approx_dist
         |  FROM dtabs d
         |  JOIN home h ON h.cell = d.cell
         |  JOIN enc e ON e.vec_id = h.vec_id
         |  WHERE h.vec_id != d.query_id
         |)
         |SELECT query_id, neighbor_id, rank, dist, approx_dist FROM (
         |  SELECT query_id, neighbor_id, approx_dist AS dist, approx_dist,
         |         row_number() OVER (PARTITION BY query_id
         |                            ORDER BY approx_dist, neighbor_id) AS rank
         |  FROM adc
         |) WHERE rank <= 5""".stripMargin,
    "q63_pq_adc" ->
      s"""WITH cb AS (
         |  SELECT * FROM (VALUES
         |        $codebookValues
         |  ) AS t(sub, code, cent)
         |), dists AS (
         |  SELECT e.vec_id, c.sub, c.code,
         |         ${duckSubDist("e.embedding", "c.cent", "c.sub")} AS dist
         |  FROM embeddings e CROSS JOIN cb c
         |), enc AS (
         |  SELECT vec_id, list(code ORDER BY sub) AS codes FROM (
         |    SELECT vec_id, sub, code,
         |           row_number() OVER (PARTITION BY vec_id, sub
         |                              ORDER BY dist, code) AS pr
         |    FROM dists
         |  ) WHERE pr = 1 GROUP BY vec_id
         |), dtabs AS (
         |  SELECT vec_id AS query_id,
         |         list(dist ORDER BY sub, code) AS dtab
         |  FROM dists WHERE vec_id % 100 = 0 GROUP BY vec_id
         |), adc AS (
         |  SELECT q.query_id, e.vec_id AS neighbor_id,
         |         list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
         |           list_transform(range(0, 8), s ->
         |             q.dtab[s*16 + e.codes[s+1] + 1])),
         |           (acc, v) -> acc + v) AS approx_dist
         |  FROM enc e CROSS JOIN dtabs q
         |  WHERE e.vec_id != q.query_id
         |)
         |SELECT query_id, neighbor_id, rank, approx_dist FROM (
         |  SELECT *, row_number() OVER (PARTITION BY query_id
         |                               ORDER BY approx_dist, neighbor_id) AS rank
         |  FROM adc
         |) WHERE rank <= 5""".stripMargin,

    "q64_cms_heavy" ->
      s"""WITH toks AS (
         |  SELECT unnest($duckToks) AS term FROM documents
         |), tc AS (
         |  SELECT term, count(*) AS cnt FROM toks GROUP BY term
         |), th AS (
         |  SELECT term, cnt, ${duckPolyHash("term")} AS h FROM tc
         |), cells AS (
         |  SELECT p.row, p.pos, sum(t.cnt) AS cell_cnt
         |  FROM th t, LATERAL (
         |    SELECT unnest(range(0, 4)) AS row,
         |           unnest($cmsPosList) AS pos
         |  ) p
         |  GROUP BY p.row, p.pos
         |), exact AS (
         |  SELECT term, cnt AS true_cnt, h FROM th
         |  ORDER BY cnt DESC, term LIMIT 20
         |), est AS (
         |  SELECT e.term, CAST(min(coalesce(c.cell_cnt, 0)) AS BIGINT) AS est_cnt
         |  FROM exact e, LATERAL (
         |    SELECT unnest(range(0, 4)) AS row,
         |           unnest($cmsPosList) AS pos
         |  ) p
         |  LEFT JOIN cells c ON c.row = p.row AND c.pos = p.pos
         |  GROUP BY e.term
         |)
         |SELECT e.term, e.true_cnt, s.est_cnt
         |FROM exact e JOIN est s ON e.term = s.term""".stripMargin,

    "q65_mixture_sample" ->
      s"""WITH sized AS (
         |  SELECT doc_id, source, text,
         |         CASE source WHEN 'src0' THEN 5 WHEN 'src1' THEN 3
         |                     WHEN 'src2' THEN 2 END AS part
         |  FROM documents
         |  WHERE source IN ('src0', 'src1', 'src2')
         |), counts AS (
         |  SELECT source, part, count(*) AS n_d FROM sized GROUP BY 1, 2
         |), t AS (
         |  SELECT min(n_d * 10 // part) AS t FROM counts
         |), takes AS (
         |  SELECT source, part * t.t // 10 AS take_d FROM counts, t
         |), ranked AS (
         |  SELECT doc_id, source,
         |         row_number() OVER (PARTITION BY source
         |           ORDER BY ${duckPolyHash("text")}, doc_id) AS rk
         |  FROM sized
         |)
         |SELECT r.doc_id, r.source AS stratum, r.rk
         |FROM ranked r JOIN takes k ON r.source = k.source
         |WHERE r.rk <= k.take_d""".stripMargin,

    "q66_adaptive_filter" ->
      s"""WITH scored AS (
         |  SELECT doc_id, lang,
         |         len(list_distinct($duckToks)) * 10000
         |           // greatest(len($duckToks), 1) AS score
         |  FROM documents
         |), pr AS (
         |  SELECT doc_id, lang, score,
         |         percent_rank() OVER (PARTITION BY lang
         |                              ORDER BY score DESC, doc_id) AS pr
         |  FROM scored
         |)
         |SELECT doc_id, lang, score, pr, pr * 1000 <= 300 AS kept
         |FROM pr""".stripMargin)
}
