package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, Trigger}
import org.apache.spark.sql.Row

/** Streaming ingest of the usage pipeline — the reference's poll-based
  * loader (`server/app/usage_loader.rb:26-55`, T1-T5) re-expressed as
  * Structured Streaming:
  *
  *  - file-source checkpointing replaces the LoadedFiles ledger
  *    (exactly-once per file, T2);
  *  - `withWatermark(5 days)` replaces the `num.days.forced`
  *    reprocessing window (allowed lateness, T5);
  *  - windowed event-time aggregation replaces the hour bucketing
  *    (T6) — note the *same* hour-grain grouping expression as the
  *    batch path, so batch and streaming produce identical cubes.
  *
  * The transform is written against a plain DataFrame so it runs
  * identically under `readStream` (incremental) and `read` (batch
  * backfill) — Structured Streaming's unified-plan contract.
  */
object StreamingUsage {

  /** Hour-grain usage aggregation of attempt-shaped rows (columns:
    * user, cluster, taskType, status, excess, startMs, finishMs —
    * see [[graft.analog.EventUsage.attempts]] / the ETL output).
    * Works on both static and streaming DataFrames. */
  def hourlyAgg(attempts: DataFrame): DataFrame = {
    val exploded = graft.usage.HourProration
      .explodeHours(attempts, col("startMs"), col("finishMs"))
      .withColumn("hour", timestamp_millis(col("hourMs")))
    exploded
      .withWatermark("hour", "5 days")
      .groupBy(
        window(col("hour"), "1 hour").as("w"),
        col("user"), col("cluster"), col("excess"),
        col("taskType"), col("status"))
      .agg(
        sum("started").as("started"),
        sum("finished").as("finished"),
        (sum("overlapMs") / 60000.0).as("elapsedMinutes"))
      .withColumn("time", unix_millis(col("w.start")))
      .drop("w")
  }

  /** Streaming source: parquet attempt files appearing in `dir`
    * (the reference's polled HDFS drop directory). */
  def attemptsStream(spark: SparkSession, dir: String,
      schema: org.apache.spark.sql.types.StructType): DataFrame =
    spark.readStream.schema(schema).parquet(dir)

  /** 15-minute micro-batch writer (the reference's `refresh_in_mins`,
    * T1) with checkpointed exactly-once file tracking (T2). */
  def writer(agg: DataFrame, checkpoint: String): DataStreamWriter[Row] =
    agg.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.ProcessingTime("15 minutes"))
}
