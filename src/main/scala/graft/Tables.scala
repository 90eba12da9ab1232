package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Uniform access to the driver-generated parquet tables
  * (`/root/testdata/sf*`; see TESTDATA.md). All queries in
  * [[SparkEntry]] read through here so partition/file options are
  * applied in one place.
  */
object Tables {
  def apply(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def lineitem(s: SparkSession, d: String): DataFrame  = apply(s, d, "lineitem")
  def orders(s: SparkSession, d: String): DataFrame    = apply(s, d, "orders")
  def customer(s: SparkSession, d: String): DataFrame  = apply(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = apply(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = apply(s, d, "part")
  def nation(s: SparkSession, d: String): DataFrame    = apply(s, d, "nation")
  def region(s: SparkSession, d: String): DataFrame    = apply(s, d, "region")
  /** `events.ts` is physical INT64 TIMESTAMP(NANOS) parquet, which Spark 4
    * refuses to read as a timestamp ([PARQUET_TYPE_ILLEGAL]). Read it as
    * raw nanos (`tsNs`) via an explicit schema — robust under any session
    * config — and expose exact epoch-ms (`tsMs`) plus a µs-truncated
    * `ts` timestamp for window/date functions.
    */
  def events(s: SparkSession, d: String): DataFrame =
    s.read
      .schema(
        "event_id BIGINT, ts BIGINT, user_id BIGINT, event_type STRING, " +
          "value DOUBLE, props STRING")
      .parquet(s"$d/events.parquet")
      .withColumnRenamed("ts", "tsNs")
      .withColumn("tsMs", org.apache.spark.sql.functions.expr("tsNs div 1000000"))
      .withColumn("ts",
        org.apache.spark.sql.functions.expr("timestamp_micros(tsNs div 1000)"))
  def documents(s: SparkSession, d: String): DataFrame = apply(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = apply(s, d, "embeddings")
}
