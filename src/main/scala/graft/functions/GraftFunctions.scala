package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SQL-mode surface of the engine's custom functions.
  *
  * The reference's query layer is SQL (HSQLDB with registered Java
  * functions, `server/app/usage_database.rb:132-168`); registering our
  * Catalyst expressions in the session's FunctionRegistry gives
  * `spark.sql(...)` users the same capabilities as the Column API:
  *
  * {{{
  *   GraftFunctions.register(spark)
  *   spark.sql("SELECT sorted_jaccard(shingle_hashes(a, 5), shingle_hashes(b, 5)) ...")
  *   spark.sql("SELECT round_to_week_sunday(ts, 'America/New_York') ...")
  * }}}
  */
object GraftFunctions {

  private def reg(spark: SparkSession, name: String, arity: Int)(
      build: Seq[Expression] => Expression): Unit = {
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier(name),
      new ExpressionInfo("graft", name),
      (exprs: Seq[Expression]) => {
        require(exprs.length == arity, s"$name expects $arity arguments")
        build(exprs)
      })
  }

  /** Register all graft SQL functions on a session. */
  def register(spark: SparkSession): Unit = {
    import HashExpressions._
    reg(spark, "shingle_hashes", 2) { e =>
      val n = e(1) match {
        case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
        case other => other.eval().asInstanceOf[Number].intValue()
      }
      ShingleHashes(e.head, n)
    }
    reg(spark, "minhash_sig", 1)(e => MinHashSig(e.head))
    reg(spark, "sorted_jaccard", 2)(e => SortedJaccard(e(0), e(1)))
    reg(spark, "poly_hash", 1)(e => PolyHash(e.head))
    reg(spark, "dot_product", 2)(e => DotProduct(e(0), e(1)))
    reg(spark, "lsh_projections", 2) { e =>
      val n = e(1) match {
        case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
        case other => other.eval().asInstanceOf[Number].intValue()
      }
      LshProjections(e.head, n)
    }
    def intArg(e: Expression): Int = e match {
      case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
      case other => other.eval().asInstanceOf[Number].intValue()
    }
    reg(spark, "sorted_intersect_count", 2)(e =>
      SortedIntersectCount(e(0), e(1)))
    reg(spark, "token_array", 1)(e => TokenArray(e.head))
    reg(spark, "token_hash_set", 1)(e => TokenHashSet(e.head))
    reg(spark, "token_ngram_hashes", 2)(e =>
      TokenNGramHashes(e.head, intArg(e(1))))
    reg(spark, "simhash30", 1)(e => SimHash30(e.head))
    reg(spark, "sub_squared_dist", 4)(e =>
      SubSquaredDist(e(0), e(1), e(2), intArg(e(3))))
    reg(spark, "adc_sum", 3)(e => AdcSum(e(0), e(1), intArg(e(2))))
    reg(spark, "token_bigrams", 1)(e => TokenBigrams(e.head))
    // the reference's roundTimestampToWeek (Sunday weeks, zone-aware):
    // composition of built-ins, SQL-registered for parity with
    // `usage_database.rb:132-168`
    spark.udf.register("round_to_week_sunday",
      (tsMs: Long, zone: String) => {
        val tz = java.time.ZoneId.of(zone)
        val local = java.time.Instant.ofEpochMilli(tsMs).atZone(tz).toLocalDate
        val sunday = local.minusDays(local.getDayOfWeek.getValue % 7)
        sunday.atStartOfDay(tz).toInstant.toEpochMilli
      })
  }
}
