package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Stream-stream interval join — the streaming form of
  * [[graft.operators.RangeJoin]]: every point event pairs with the
  * window-opening events of the same key whose
  * `[open, open + windowMs]` window contains it.
  *
  * Built on Spark's watermarked stream-stream inner join. The explicit
  * event-time bound in the join condition is what makes this runnable
  * as a stream at all: it lets the state store expire rows, so each
  * side retains only watermark-depth history — state is bounded by
  * rate × (window + lateness), not by stream length. The same code
  * path executes on batch frames (withWatermark is a no-op there),
  * giving batch/stream parity for free.
  */
object StreamingJoins {

  /** Inner interval join; both inputs need an event-time timestamp
    * column. Output: the open side's columns + the point side's
    * non-key columns. */
  def intervalJoin(opens: DataFrame, points: DataFrame, key: String,
      openTsCol: String, ptTsCol: String, windowMs: Long,
      lateness: String): DataFrame = {
    val o = opens.withWatermark(openTsCol, lateness).alias("o")
    val p = points.withWatermark(ptTsCol, lateness).alias("p")
    o.join(p, expr(
        s"o.$key = p.$key AND p.$ptTsCol >= o.$openTsCol" +
          s" AND p.$ptTsCol <= o.$openTsCol + interval $windowMs milliseconds"))
      .drop(col(s"p.$key"))
  }
}
