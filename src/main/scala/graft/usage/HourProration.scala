package graft.usage

import graft.model._
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The heart of the engine: prorate each task attempt's runtime across
  * the clock hours it spans (reference
  * `analysis/ComputeUsagePerHour.java:270-338`, A6/T6).
  *
  * Semantics reproduced exactly (the reference loop is
  * `while (currentTime < end)` at `:285`):
  *  - hour buckets are UTC hour floors (`:340-376`; reference uses a GMT
  *    calendar);
  *  - one output row per hour from floor(start) to floor(finish-1)
  *    inclusive — a finish exactly on a boundary does NOT open a
  *    0-minute bucket; `finished=1` lands in the last bucket with
  *    positive overlap (`:325-332`);
  *  - a zero-length attempt (finish == start) emits NO rows (the loop
  *    body never runs). The reference throws for finish < start
  *    (`:275-278`); this engine drops such rows instead of failing the
  *    job (deviation documented in QUIRKS.md);
  *  - `elapsedMinutes` = overlap of [start,finish) with the bucket, in
  *    minutes (`:301-305`);
  *  - `cpuMinutes` and `spilledRecords` are prorated by
  *    overlap/duration (`:307-315`);
  *  - ⚠ `reduceShuffleBytes` is NOT prorated — the full counter value is
  *    repeated in every bucket the attempt touches
  *    (`:317-320`; quirk preserved, SURVEY.md §7.4);
  *  - `started`/`finished` are 1 only in the boundary buckets
  *    (`:324-332`).
  *
  * Two implementations that must agree (cross-checked in tests):
  * a typed [[prorate]] for the Dataset pipeline, and a pure-Column
  * [[explodeHours]] (`explode(sequence(...))` + overlap arithmetic) that
  * stays inside whole-stage codegen for the DataFrame/SQL path. Fan-out
  * is bounded by attempt duration in hours, so no skew blow-up at scale.
  */
object HourProration {

  final val HourMs = 3600000L

  def hourFloor(ms: Long): Long = Math.floorDiv(ms, HourMs) * HourMs

  /** Typed proration of one attempt belonging to (user, cluster). */
  def prorate(user: String, cluster: String, a: Attempt): Seq[HourlyUsage] = {
    val start = a.startTime
    val finish = a.finishTime
    if (finish <= start) return Seq.empty // while(currentTime < end) never runs
    val durMs = finish - start
    val cpuMs = a.counters.get("CPU_MILLISECONDS").map(_.toDouble)
    val spilled = a.counters.get("SPILLED_RECORDS").map(_.toDouble)
    val shuffleBytes = a.counters.get("REDUCE_SHUFFLE_BYTES")
    val firstHour = hourFloor(start)
    val lastHour = hourFloor(finish - 1L)
    (firstHour to lastHour by HourMs).map { h =>
      val overlapMs =
        math.max(0L, math.min(finish, h + HourMs) - math.max(start, h))
      val fraction = overlapMs.toDouble / durMs.toDouble
      HourlyUsage(
        user = user,
        time = h,
        cluster = cluster,
        excess = a.excess,
        taskType = a.taskType,
        status = a.status,
        started = if (h == firstHour) 1 else 0,
        finished = if (h == lastHour) 1 else 0,
        elapsedMinutes = overlapMs / 60000.0,
        cpuMinutes = cpuMs.map(c => c * fraction / 60000.0),
        spilledRecords = spilled.map(_ * fraction),
        reduceShuffleBytes = shuffleBytes)
    }
  }

  /** Column-based hour fan-out over a DataFrame with epoch-ms `startMs`
    * and `finishMs` columns. Adds:
    *   `hourMs`     — bucket start, epoch ms
    *   `overlapMs`  — ms of [startMs,finishMs) inside the bucket
    *   `started`, `finished` — boundary flags (0/1)
    *
    * Stays fully native (`sequence` + `explode` + integer arithmetic) so
    * Catalyst keeps it in whole-stage codegen; at 100 TB this is a
    * narrow map-side transform with bounded fan-out, no shuffle.
    */
  def explodeHours(df: DataFrame, startMs: Column, finishMs: Column): DataFrame = {
    val firstHour = floor(startMs / HourMs) * HourMs
    val lastHour = floor((finishMs - 1) / HourMs) * HourMs
    df.filter(finishMs > startMs) // while(currentTime < end): zero-length → no rows
      .withColumn("__startMs", startMs)
      .withColumn("__finishMs", finishMs)
      .withColumn("__firstHour", firstHour.cast("long"))
      .withColumn("__lastHour", lastHour.cast("long"))
      .withColumn(
        "hourMs",
        explode(sequence(col("__firstHour"), col("__lastHour"), lit(HourMs))))
      .withColumn(
        "overlapMs",
        greatest(
          lit(0L),
          least(col("__finishMs"), col("hourMs") + HourMs) -
            greatest(col("__startMs"), col("hourMs"))))
      .withColumn(
        "started", when(col("hourMs") === col("__firstHour"), 1).otherwise(0))
      .withColumn(
        "finished", when(col("hourMs") === col("__lastHour"), 1).otherwise(0))
      .drop("__startMs", "__finishMs", "__firstHour", "__lastHour")
  }
}
