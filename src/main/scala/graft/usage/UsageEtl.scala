package graft.usage

import graft.model._
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Stage 3: merged [[Job]] trees → hour-grain usage fact table
  * (reference `analysis/ComputeUsagePerHour.java`, A6+A7).
  *
  * Spark shape: flatMap the job tree into prorated [[HourlyUsage]] rows
  * (narrow, codegen'd fan-out) then ONE hash aggregation on the 6-part
  * stats key. Spark's partial aggregation gives the map-side combine the
  * reference lacks (it ran combiner-less map→reduce,
  * `ComputeUsagePerHour.java:379-447`); `sum` skips nulls natively which
  * matches the reference's explicit null-aware adds (`:408-442`).
  *
  * Scale posture: the stats key (user, hour, cluster, excess, type,
  * status) has cardinality ≈ users × hours × 12 — millions of groups at
  * 100 TB, far below row count, so partial aggregation collapses almost
  * everything before the shuffle. Output is partitioned
  * `cluster/date` on disk like the reference's layout
  * (`ComputeUsagePerHour.java:119`).
  */
object UsageEtl {

  /** Explode every valid attempt of every task into prorated hourly rows
    * (F3 filter is implicit: assembly only kept attempts with status and
    * positive start/finish, `ComputeUsagePerHour.java:232-255`). */
  def hourlyRecords(jobs: Dataset[Job])(
      implicit spark: SparkSession): Dataset[HourlyUsage] = {
    import spark.implicits._
    jobs.flatMap { job =>
      val user = job.user.getOrElse("unknown")
      for {
        task <- job.tasks
        attempt <- task.attempts
        row <- HourProration.prorate(user, job.cluster, attempt)
      } yield row
    }
  }

  /** A7: sum all measures per stats key. */
  def aggregate(hourly: Dataset[HourlyUsage]): DataFrame =
    hourly
      .groupBy("user", "time", "cluster", "excess", "taskType", "status")
      .agg(
        sum("started").cast("int").as("started"),
        sum("finished").cast("int").as("finished"),
        sum("elapsedMinutes").as("elapsedMinutes"),
        sum("cpuMinutes").as("cpuMinutes"),
        sum("spilledRecords").as("spilledRecords"),
        sum("reduceShuffleBytes").as("reduceShuffleBytes"))

  /** Full stage-3: jobs → fact DataFrame. */
  def usageFact(jobs: Dataset[Job])(implicit spark: SparkSession): DataFrame =
    aggregate(hourlyRecords(jobs))

  /** Write the fact table partitioned like the reference's
    * `<cluster>/<yyyy>/<MMdd>` output layout. Dynamic partition
    * overwrite = the reference's staged-output atomic rename (S7/T5).
    *
    * The repartition pins file count: without it every shuffle task
    * holds rows of every day (the agg shuffle is keyed on the stats
    * key, not the date) and the write emits tasks × days small files —
    * measured 1 140 files for 15 MB in the 100-day rehearsal. One
    * hash partition per (cluster, date, salt) → `filesPerDay` files
    * per day dir; raise `filesPerDay` when one day's fact outgrows a
    * single write task (the post-agg fact is key-cardinality-bounded,
    * so 1 is right far past sf-rehearsal scale). */
  def writeFact(fact: DataFrame, path: String, filesPerDay: Int = 1): Unit =
    fact
      .withColumn("date", to_date(timestamp_millis(col("time"))))
      .repartition(col("cluster"), col("date"),
        pmod(hash(col("user")), lit(filesPerDay)))
      .write
      .partitionBy("cluster", "date")
      .mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .parquet(path)

  /** Catalog-table variant of the fact, BUCKETED by user: the serving
    * workload is user-grained (per-user series, user top-N, user
    * joins), and bucketing pre-partitions the data so those
    * aggregations and self-joins read bucket-aligned files with NO
    * exchange — the co-located-join layout for a fact that is written
    * once per ETL window and queried many times. `buckets` should be
    * sized so a bucket's rows fit one task comfortably (users ×
    * hours × 12 per bucket / `buckets`). Requires a catalog
    * (`saveAsTable`) — bucket metadata lives in the metastore, which
    * is why [[writeFact]]'s plain-path layout can't carry it. */
  def writeFactBucketed(fact: DataFrame, table: String, buckets: Int,
      path: Option[String] = None): Unit = {
    val w = fact
      .withColumn("date", to_date(timestamp_millis(col("time"))))
      .write
      .bucketBy(buckets, "user")
      .sortBy("user")
      .mode("overwrite")
      .format("parquet")
    path.fold(w)(p => w.option("path", p)).saveAsTable(table)
  }
}
