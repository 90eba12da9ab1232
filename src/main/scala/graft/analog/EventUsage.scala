package graft.analog

import graft.usage.HourProration
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Maps the driver's synthetic `events` table onto the engine's
  * attempt/usage domain so the full White-Elephant pipeline shape
  * (parse → prorate → hour cube → serve) can be exercised — and
  * oracle-checked — on the shared testdata (TESTDATA.md).
  *
  * Deterministic mapping (both engines compute it identically):
  *  - an event is an "attempt": start = ts, duration = `value` minutes
  *    (ms = round(value*60000));
  *  - user     = user_id as string
  *  - cluster  = 'east' / 'west' by user_id parity
  *  - taskType = MAP for click/view, REDUCE otherwise
  *  - status   = purchase→SUCCESS, error→FAILED, else KILLED
  *  - excess   = event_id % 5 == 0
  *  - cpuMs    = round(value*30000) (half the wall time), prorated
  *  - reduceShuffleBytes = props.k * 1MiB, NOT prorated (the reference
  *    quirk, `ComputeUsagePerHour.java:317-320`).
  */
object EventUsage {

  /** events → attempt-shaped rows with integer-ms boundaries. */
  def attempts(events: DataFrame): DataFrame =
    events
      .withColumn("startMs", col("tsMs"))
      .withColumn("durMs", expr("cast(round(value * 60000) as bigint)"))
      .withColumn("finishMs", col("startMs") + col("durMs"))
      .withColumn("user", col("user_id").cast("string"))
      .withColumn(
        "cluster",
        when(col("user_id") % 2 === 0, "east").otherwise("west"))
      .withColumn(
        "taskType",
        when(col("event_type").isin("click", "view"), "MAP")
          .otherwise("REDUCE"))
      .withColumn(
        "status",
        when(col("event_type") === "purchase", "SUCCESS")
          .when(col("event_type") === "error", "FAILED")
          .otherwise("KILLED"))
      .withColumn("excess", col("event_id") % 5 === 0)
      .withColumn("cpuMs", expr("cast(round(value * 30000) as bigint)"))
      .withColumn(
        "reduceShuffleBytes",
        get_json_object(col("props"), "$.k").cast("long") * 1048576L)

  /** Full hour-grain usage fact (the engine's A6+A7 on analog data).
    * All measures are exact integer/decimal arithmetic so the DuckDB
    * oracle hash-matches bit-for-bit.
    */
  def usageFact(spark: SparkSession, dir: String): DataFrame = {
    // widen() the RAW table (inside attempts' projection the exchange
    // would land ABOVE the parse and leave it single-core): the JSON
    // prop extraction, hour fan-out, and map-side partial aggregate
    // are the heavy narrow stages, and a single-file events input
    // would run them all on one core (no shuffle above them for AQE
    // to re-plan)
    val ev = attempts(graft.operators.Parallelism.widen(
      graft.Tables.events(spark, dir)))
    val exploded = HourProration.explodeHours(ev, col("startMs"), col("finishMs"))
    exploded
      .withColumn(
        "cpuMsProrated",
        // exact in doubles: both engines compute cpuMs*overlap/dur the
        // same way; durMs > 0 guaranteed (explodeHours drops zero-length)
        col("cpuMs").cast("double") * col("overlapMs").cast("double") /
          col("durMs").cast("double"))
      .groupBy("user", "hourMs", "cluster", "excess", "taskType", "status")
      .agg(
        sum("started").as("started"),
        sum("finished").as("finished"),
        sum("overlapMs").as("elapsedMs"),
        sum(col("cpuMsProrated").cast("decimal(28,6)")).cast("double")
          .as("cpuMsSum"),
        sum("reduceShuffleBytes").as("reduceShuffleBytes"))
      .withColumn("elapsedMinutes", col("elapsedMs") / 60000.0)
      .drop("elapsedMs")
  }
}
