package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis column builders for the training-data pipeline
  * operators (tokenization, fingerprinting, shingling, minhash/simhash,
  * language scoring, quality metrics).
  *
  * Everything here is pure `org.apache.spark.sql.functions` / SQL
  * higher-order functions — codegen'd, no UDFs — so the operators stay
  * inside whole-stage codegen and scale linearly with input bytes.
  *
  * Two hash families:
  *  - [[tokenHashes]]/[[polyFingerprint]]: a 31-base polynomial rolling
  *    hash mod 1e9+7 over characters. Deliberately simple integer
  *    arithmetic so an external SQL engine (the DuckDB oracle) computes
  *    bit-identical values — this is the cross-engine-checkable path.
  *  - [[xxMinHashSignature]]: `xxhash64(token, seed)` based — the fast
  *    production path (one native hash per token per permutation).
  */
object TextFunctions {

  /** Mod for the polynomial hash family: fits a*h+b in i64
    * (a,b < P ⇒ a*h+b < ~1e18 < 2^63). */
  final val P = 1000000007L

  /** Non-empty whitespace tokens — the native one-pass scan
    * ([[HashExpressions.TokenArray]]); every token-exploding operator
    * funnels through here. Value-identical to [[tokensHof]]. */
  def tokens(text: Column): Column =
    HashExpressions.tokenArray(text)

  /** The SQL-HOF formulation of [[tokens]] — the cross-engine
    * specification the oracles mirror (`string_split_regex` +
    * non-empty filter); cross-checked bit-exact against the native
    * path in HashExprSpec. */
  def tokensHof(text: Column): Column =
    filter(split(text, "\\s+"), t => t =!= "")

  /** Distinct non-empty tokens (set semantics for jaccard/minhash). */
  def tokenSet(text: Column): Column = array_distinct(tokens(text))

  /** Character n-gram shingles (1-based substring positions). */
  def charShingles(text: Column, n: Int): Column =
    when(length(text) < n, array().cast("array<string>"))
      .otherwise(transform(
        sequence(lit(1), length(text) - (n - 1)),
        i => text.substr(i, lit(n))))

  /** Polynomial rolling hash of one string column value:
    * fold over chars of `acc*31 + codepoint (mod P)` — the document
    * fingerprint. Exactly reproducible in any SQL engine. */
  def polyFingerprint(text: Column): Column =
    aggregate(split(text, ""), lit(0L),
      (acc, c) => (acc * 31 + ascii(c)) % P)

  /** Polynomial hash of every element of a string-array column. */
  def tokenHashes(tokensCol: Column): Column =
    transform(tokensCol, t => polyFingerprint(t))

  /** Deterministic permutation parameters for the exact minhash family.
    * Small primes-ish constants; any fixed values work — they only need
    * to be identical in the oracle. */
  val MinHashA: IndexedSeq[Long] =
    IndexedSeq(100003, 100019, 100043, 100057, 100069, 100103, 100109,
      100129, 100151, 100153, 100169, 100183, 100189, 100193, 100207, 100213)
  val MinHashB: IndexedSeq[Long] =
    IndexedSeq(3, 17, 29, 41, 53, 67, 79, 97, 101, 113, 127, 139, 151,
      163, 179, 191)

  /** Separate, larger family for the LSH hyperplanes (q25): 32 planes
    * → bands carry 8 sign bits each (256 buckets/band) instead of 4
    * (16 buckets/band), which is what keeps the band self-join from
    * going quadratic as the table grows. Kept distinct from the
    * 16-entry minhash family so minhash signatures (q21) are
    * untouched. Same contract: arbitrary fixed constants mirrored
    * verbatim in the DuckDB oracle. */
  // 128 planes: the first 32 are the original table (oracle SQL and all
  // gate-scale queries use only these); 33..128 extend the run of
  // consecutive primes (>200383 / >283) so the adaptive LSH mode
  // ([[graft.operators.Similarity.lshTopKAuto]]) can widen band hashes
  // with corpus size without touching the pinned prefix. Round 11
  // doubled 64→128 after the sf100 spot check: the 64-plane cap froze
  // band hashes at 16 bits past n≈0.5M, so per-band candidate volume
  // grew ∝ N² again (q25 measured 27×/decade at 2M vectors); 32
  // bits/band at 4 bands keeps the log2(n)−3 rule unconstrained to
  // n≈2^35.
  val LshA: IndexedSeq[Long] =
    IndexedSeq(200003L, 200017L, 200029L, 200033L, 200041L, 200063L, 200087L,
      200117L, 200131L, 200153L, 200159L, 200171L, 200177L, 200183L, 200191L,
      200201L, 200227L, 200231L, 200237L, 200257L, 200273L, 200293L, 200297L,
      200323L, 200329L, 200341L, 200351L, 200357L, 200363L, 200371L, 200381L,
      200383L,
      200401L, 200407L, 200437L, 200443L, 200461L, 200467L, 200483L,
      200513L, 200569L, 200573L, 200579L, 200587L, 200591L, 200597L,
      200609L, 200639L, 200657L, 200671L, 200689L, 200699L, 200713L,
      200723L, 200731L, 200771L, 200779L, 200789L, 200797L, 200807L,
      200843L, 200861L, 200867L, 200869L,
      200881L, 200891L, 200899L, 200903L, 200909L, 200927L, 200929L,
      200971L, 200983L, 200987L, 200989L, 201007L, 201011L, 201031L,
      201037L, 201049L, 201073L, 201101L, 201107L, 201119L, 201121L,
      201139L, 201151L, 201163L, 201167L, 201193L, 201203L, 201209L,
      201211L, 201233L, 201247L, 201251L, 201281L, 201287L, 201307L,
      201329L, 201337L, 201359L, 201389L, 201401L, 201403L, 201413L,
      201437L, 201449L, 201451L, 201473L, 201491L, 201493L, 201497L,
      201499L, 201511L, 201517L, 201547L, 201557L, 201577L, 201581L,
      201589L, 201599L, 201611L, 201623L, 201629L, 201653L, 201661L,
      201667L)
  val LshB: IndexedSeq[Long] =
    IndexedSeq(5L, 11L, 19L, 31L, 43L, 59L, 71L, 83L, 103L, 107L, 131L, 137L,
      149L, 157L, 167L, 173L, 181L, 193L, 199L, 211L, 223L, 227L, 233L, 239L,
      251L, 257L, 263L, 269L, 271L, 277L, 281L, 283L,
      293L, 307L, 311L, 313L, 317L, 331L, 337L, 347L, 349L, 353L, 359L,
      367L, 373L, 379L, 383L, 389L, 397L, 401L, 409L, 419L, 421L, 431L,
      433L, 439L, 443L, 449L, 457L, 461L, 463L, 467L, 479L, 487L,
      491L, 499L, 503L, 509L, 521L, 523L, 541L, 547L, 557L, 563L,
      569L, 571L, 577L, 587L, 593L, 599L, 601L, 607L, 613L, 617L,
      619L, 631L, 641L, 643L, 647L, 653L, 659L, 661L, 673L, 677L,
      683L, 691L, 701L, 709L, 719L, 727L, 733L, 739L, 743L, 751L,
      757L, 761L, 769L, 773L, 787L, 797L, 809L, 811L, 821L, 823L,
      827L, 829L, 839L, 853L, 857L, 859L, 863L, 877L, 881L, 883L,
      887L, 907L, 911L, 919L)

  /** Exact-arithmetic minhash signature (k = 16): element j is
    * `min over token hashes h of (A(j)*h + B(j)) mod P`. Input must be
    * a column of token-hash arrays ([[tokenHashes]]); empty docs get
    * P as the sentinel minimum. */
  def minHashSignature(hashes: Column): Column = {
    val mins = MinHashA.indices.map { j =>
      coalesce(
        array_min(transform(hashes,
          h => (lit(MinHashA(j)) * h + lit(MinHashB(j))) % P)),
        lit(P))
    }
    array(mins: _*)
  }

  /** LSH band hashes: 4 bands × 4 rows. Band b = exact fold of its 4
    * signature values (fits i64: P·31³ ≈ 3e13). */
  def bandHashes(sig: Column): Column = {
    val bands = (0 until 4).map { b =>
      val Seq(m0, m1, m2, m3) =
        (0 until 4).map(r => element_at(sig, b * 4 + r + 1): Column)
      ((m0 * 31 + m1) * 31 + m2) * 31 + m3
    }
    array(bands: _*)
  }

  /** Fast-path minhash signature using native xxhash64 — one codegen'd
    * hash per (token, seed). Production variant; not oracle-checked
    * (DuckDB has no xxhash64) but cross-checked in unit tests for
    * set-similarity behavior. */
  def xxMinHashSignature(tokensCol: Column, k: Int): Column = {
    val mins = (0 until k).map { j =>
      coalesce(
        array_min(transform(tokensCol, t => xxhash64(t, lit(j)))),
        lit(Long.MaxValue))
    }
    array(mins: _*)
  }

  /** 30-bit simhash over token hashes: bit b of the signature is set
    * when Σ_tokens (±1 by bit b of the token hash) > 0. Bit test via
    * `h mod 2^(b+1) >= 2^b` — exact integer arithmetic, identical to
    * the oracle's `(h // 2^b) % 2`. */
  def simHash30(hashes: Column): Column = {
    val pows = (0 until 30).map(b => lit(1L << b): Column)
    val counts = transform(array(pows: _*), pw =>
      aggregate(hashes, lit(0L),
        (acc, h) => acc + when(pmod(h, pw * 2) >= pw, 1L).otherwise(-1L)))
    aggregate(reverse(counts), lit(0L),
      (acc, cnt) => acc * 2 + when(cnt > 0, 1L).otherwise(0L))
  }

  /** Per-language pseudo-stopword sets for the n-gram language-ID
    * heuristic. The synthetic corpus shares one vocabulary across
    * langs, so these act as deterministic discriminators exercising the
    * scoring machinery rather than a real model. */
  val LangMarkers: Seq[(String, Seq[String])] = Seq(
    "de" -> Seq("table", "scan", "merge"),
    "en" -> Seq("the", "a", "join"),
    "es" -> Seq("row", "data", "stream"),
    "fr" -> Seq("window", "query", "order"),
    "zh" -> Seq("spark", "batch", "column"))

  /** Language scores: size of tokenSet ∩ markers per language. */
  def langScore(tokSet: Column, markers: Seq[String]): Column =
    size(array_intersect(tokSet,
      array(markers.map(lit): _*)))

  /** Predicted language: argmax of scores, alphabetical-first tie
    * break (deterministic in both engines). */
  def predictedLang(tokSet: Column): Column = {
    val scores = LangMarkers.map { case (l, ms) => l -> langScore(tokSet, ms) }
    val best = greatest(scores.map(_._2): _*)
    scores.foldRight(lit("und"): Column) { case ((l, s), els) =>
      when(s === best && best > 0, lit(l)).otherwise(els)
    }
  }
}
