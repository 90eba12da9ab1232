package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** The declarative injection path: a session configured with
  * `spark.sql.extensions=graft.GraftExtensions` gets the custom SQL
  * functions without any imperative registration call. */
class ExtensionsSpec extends AnyFunSuite {

  test("GraftExtensions injected at session build time provides the SQL functions") {
    val prevDefault = SparkSession.getDefaultSession
    val prevActive = SparkSession.getActiveSession
    SparkSession.clearDefaultSession()
    SparkSession.clearActiveSession()
    try {
      // fresh session object (shared SparkContext is fine) with the
      // extension applied through the public builder hook —
      // `spark.sql.extensions=graft.GraftExtensions` loads the SAME
      // class through Spark's own static-conf path, but that conf is
      // pinned at SparkContext creation and so not testable in a suite
      // run where an earlier spec already started the context
      val s = SparkSession.builder()
        .master("local[2]")
        .withExtensions(new GraftExtensions()(_))
        .config("spark.sql.shuffle.partitions", "2")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
      val P = 1000000007L
      val want = "abc".foldLeft(0L)((a, c) => (a * 31 + c) % P)
      assert(s.sql("SELECT poly_hash('abc') AS h").head().getLong(0) == want)
      assert(s.sql(
        "SELECT sorted_jaccard(array(1L, 2L, 3L), array(2L, 3L, 4L)) AS j")
        .head().getDouble(0) == 0.5)
      assert(s.sql("SELECT size(minhash_sig(array(7L))) AS n")
        .head().getInt(0) == graft.functions.TextFunctions.MinHashA.size)
      // round-6 additions: tokenizer, gram, simhash, PQ families
      assert(s.sql("SELECT token_array('  a b\tc ') AS t")
        .head().getSeq[String](0) == Seq("a", "b", "c"))
      assert(s.sql("SELECT size(token_ngram_hashes('a b c d', 3)) AS n")
        .head().getInt(0) == 2)
      assert(s.sql("SELECT simhash30(token_hash_set('x y z')) AS sh")
        .head().getLong(0) >= 0L)
      assert(s.sql(
        "SELECT adc_sum(array(1, 0), array(CAST(0.5 AS DOUBLE), 1.5, 2.5, 3.5), 2) AS d")
        .head().getDouble(0) == 1.5 + 2.5)
      // wrong-typed arguments fail at ANALYSIS time with a clean error,
      // not at execution with a ClassCastException (ExpectsInputTypes)
      for (bad <- Seq(
          "SELECT simhash30(array(1))",            // array<int>, wants array<bigint>
          "SELECT token_array(42)",                // int, wants string
          "SELECT token_hash_set(array('a'))",     // array, wants string
          "SELECT token_ngram_hashes(7, 2)",       // int, wants string
          "SELECT token_bigrams(array('a','b'))",  // array, wants string
          "SELECT adc_sum(array(1L, 2L), array(CAST(1.0 AS DOUBLE)), 2)", // bigint codes
          "SELECT sub_squared_dist(array('x'), array(CAST(1.0 AS DOUBLE)), 0, 1)",
          "SELECT sorted_jaccard(array('a'), array('b'))",
          "SELECT poly_hash(array(1))")) {
        val e = intercept[org.apache.spark.sql.AnalysisException](s.sql(bad).collect())
        assert(e.getMessage.toLowerCase.contains("type"), s"$bad: ${e.getMessage}")
      }
      // don't stop s — it shares the JVM-wide SparkContext
    } finally {
      prevDefault.foreach(SparkSession.setDefaultSession)
      prevActive.foreach(SparkSession.setActiveSession)
    }
  }
}
