package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Interval (range) join — points × intervals with `lo <= pt <= hi` —
  * expressed as a bin-bucketed equi-join, the standard trick for making
  * a range predicate shuffle-friendly: Spark plans a bare inequality
  * join as BroadcastNestedLoop (or a full cartesian), which is a
  * scale-killer; with binning the shuffle key is (key, bin) and each
  * candidate pair is generated at most once.
  *
  * Every interval explodes to the bins it covers (`(hi-lo)/binWidth+1`
  * of them — pick binWidth near the typical interval length so this
  * stays O(1) per interval); every point maps to exactly ONE bin, so
  * the equi-join output needs no dedup, only the residual `between`
  * filter. Skewed keys fall out of AQE or [[Skew.saltedJoin]] like any
  * other equi-join — which is the point of reducing range→equi.
  */
object RangeJoin {

  /** Inner interval join on integer columns (epoch-ms, offsets, …):
    * rows pair when keys match and `points.ptCol ∈ [loCol, hiCol]`
    * (inclusive ends). Intervals with `hi < lo` are dropped. Output:
    * all interval columns + all point columns (caller resolves name
    * collisions by pre-selecting). */
  def intervalJoin(points: DataFrame, intervals: DataFrame,
      keys: Seq[String], ptCol: String, loCol: String, hiCol: String,
      binWidth: Long): DataFrame = {
    require(binWidth > 0, "binWidth must be positive")
    val pts = points.withColumn("_rj_bin",
      floor(col(ptCol).cast("double") / binWidth).cast("long"))
    val ivs = intervals
      .filter(col(hiCol) >= col(loCol))
      .withColumn("_rj_bin", explode(sequence(
        floor(col(loCol).cast("double") / binWidth).cast("long"),
        floor(col(hiCol).cast("double") / binWidth).cast("long"))))
    ivs.join(pts, keys :+ "_rj_bin")
      .filter(col(ptCol) >= col(loCol) && col(ptCol) <= col(hiCol))
      .drop("_rj_bin")
  }
}
