package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Gap-based sessionization of an event stream — two formulations:
  *
  *  - [[byWindowFunctions]]: lag + running-sum session ids (the ANSI-SQL
  *    shape, exactly reproducible in any engine — this is what the gate
  *    query q31 checks against DuckDB);
  *  - [[bySessionWindow]]: Spark's native `session_window` grouping —
  *    the streaming-capable form (works under readStream with a
  *    watermark, state-store backed), preferred at scale because it
  *    needs no global per-user sort.
  *
  * Both agree on session boundaries for batch data (cross-checked in
  * tests).
  */
object Sessionize {

  /** Window-function formulation. Event frame needs: user col, epoch-ms
    * ts col, a unique tiebreaker col. */
  def byWindowFunctions(events: DataFrame, user: String, tsMs: String,
      tieBreak: String, gapMs: Long): DataFrame = {
    val w = Window.partitionBy(user).orderBy(tsMs, tieBreak)
    events
      .withColumn("new_sess",
        when(col(tsMs) - lag(tsMs, 1).over(w) > gapMs, 1)
          .otherwise(when(lag(tsMs, 1).over(w).isNull, 1).otherwise(0)))
      .withColumn("sess_idx",
        sum("new_sess").over(w.rowsBetween(Window.unboundedPreceding, 0)))
      .drop("new_sess")
  }

  /** Native session_window formulation over a timestamp column. Returns
    * per-session aggregates keyed by (user, session window). */
  def bySessionWindow(events: DataFrame, user: String, ts: String,
      gap: String, aggs: Seq[Column]): DataFrame =
    events
      .groupBy(col(user), session_window(col(ts), gap).as("session"))
      .agg(count(lit(1)).as("n_events"), aggs: _*)
      .withColumn("start_ms", unix_millis(col("session.start")))
      .withColumn("end_ms", unix_millis(col("session.end")))
      .drop("session")
}
