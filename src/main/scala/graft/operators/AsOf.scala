package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (backward) join — for every left row, attach the single right
  * row with the greatest timestamp at or before the left row's, within
  * the same key group. The time-series enrichment join Spark has no
  * built-in operator for (DuckDB/Pandas call it ASOF JOIN;
  * kdb+ calls it `aj`).
  *
  * Implementation is the distributed sort-merge formulation, not a
  * range join: tag and union the two inputs, then one pass of
  * `last(_, ignoreNulls)` over a (key, ts, tag) window carries the
  * most recent right payload forward onto each left row. Cost is a
  * single shuffle on the key columns plus a within-key sort — the same
  * shape as any windowed aggregation, with none of the candidate-pair
  * blowup of an inequality join. At 100 TB the partition key is the
  * join key (high cardinality ⇒ even spread); per-key history length
  * bounds the sort, exactly like sessionization.
  */
object AsOf {

  /** Join `left` to the latest `right` row with `right.tsCol <=
    * left.tsCol` per `keys` (left outer: unmatched left rows keep null
    * payloads).
    *
    * The right side MUST be unique per (keys, tsCol) — dedupe first
    * (e.g. `max_by` per key+ts); with duplicates the matched row would
    * be nondeterministic, which is also true of DuckDB's ASOF JOIN.
    *
    * The matched row's `tsCol` and `payloadCols` are emitted as
    * `prefix+name` columns. The payload travels as ONE struct through
    * the window so a legitimately-null payload field can never mix
    * fields from two different right rows. */
  def asofJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
      tsCol: String, payloadCols: Seq[String],
      prefix: String = "asof_"): DataFrame = {
    val outFields = (tsCol +: payloadCols).map(c => col(c).as(prefix + c))
    val r = right.select(
      (keys.map(col) :+ col(tsCol).as("_asof_ts")) :+
        struct(outFields: _*).as("_asof_p"): _*)
      .withColumn("_asof_tag", lit(0))
    val l = left
      .withColumn("_asof_ts", col(tsCol))
      .withColumn("_asof_tag", lit(1))
    // right rows sort before left rows at an equal timestamp, so
    // "at or before" includes same-instant matches (DuckDB `>=`
    // ASOF semantics)
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("_asof_ts"), col("_asof_tag"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    l.unionByName(r, allowMissingColumns = true)
      .withColumn("_asof_m", last(col("_asof_p"), ignoreNulls = true).over(w))
      .filter(col("_asof_tag") === 1)
      .select(left.columns.toIndexedSeq.map(col) ++
        (tsCol +: payloadCols).map(c =>
          col(s"_asof_m.$prefix$c").as(prefix + c)): _*)
  }
}
