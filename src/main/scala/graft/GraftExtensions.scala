package graft

import graft.functions.HashExpressions._
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}

/** Canonical Spark extension point for the engine: inject the custom
  * Catalyst expressions through `SparkSessionExtensions`, so sessions
  * the library does NOT construct (spark-submit, notebooks, Thrift
  * server) get the SQL functions declaratively:
  *
  * {{{
  *   spark-submit --conf spark.sql.extensions=graft.GraftExtensions ...
  * }}}
  *
  * [[graft.functions.GraftFunctions.register]] remains the imperative
  * twin for sessions created in code ([[GraftSession.create]] calls
  * it); both register the same expressions under the same names.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def intArg(e: Expression): Int = e match {
    case Literal(v: Int, _) => v
    case other => other.eval().asInstanceOf[Number].intValue()
  }

  override def apply(ext: SparkSessionExtensions): Unit = {
    def inject(name: String, arity: Int)(
        build: Seq[Expression] => Expression): Unit =
      ext.injectFunction((
        FunctionIdentifier(name),
        new ExpressionInfo("graft", name),
        (exprs: Seq[Expression]) => {
          require(exprs.length == arity, s"$name expects $arity arguments")
          build(exprs)
        }))
    inject("shingle_hashes", 2)(e => ShingleHashes(e.head, intArg(e(1))))
    inject("minhash_sig", 1)(e => MinHashSig(e.head))
    inject("sorted_jaccard", 2)(e => SortedJaccard(e(0), e(1)))
    inject("sorted_intersect_count", 2)(e => SortedIntersectCount(e(0), e(1)))
    inject("poly_hash", 1)(e => PolyHash(e.head))
    inject("dot_product", 2)(e => DotProduct(e(0), e(1)))
    inject("lsh_projections", 2)(e => LshProjections(e.head, intArg(e(1))))
    inject("token_array", 1)(e => TokenArray(e.head))
    inject("token_hash_set", 1)(e => TokenHashSet(e.head))
    inject("token_ngram_hashes", 2)(e => TokenNGramHashes(e.head, intArg(e(1))))
    inject("simhash30", 1)(e => SimHash30(e.head))
    inject("sub_squared_dist", 4)(e => SubSquaredDist(e(0), e(1), e(2), intArg(e(3))))
    inject("adc_sum", 3)(e => AdcSum(e(0), e(1), intArg(e(2))))
    inject("token_bigrams", 1)(e => TokenBigrams(e.head))
    ext.injectOptimizerRule(_ => graft.plans.RangeJoinRewrite)
  }
}
