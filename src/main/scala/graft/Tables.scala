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
  /** `events.ts` is physical INT64 timestamp parquet whose unit has
    * varied across driver testdata generations (NANOS — which Spark 4
    * refuses to read as a timestamp ([PARQUET_TYPE_ILLEGAL]) — and
    * MICROS). Read it as a raw long via an explicit schema — robust
    * under any session config and either encoding — and sniff the unit
    * from magnitude (any plausible epoch is ≥3 orders of magnitude from
    * the neighbouring unit: 2024 is ~1.7e18 ns vs ~1.7e15 µs; the
    * cutover at 1e17 is year ~5138 in µs and 1973 in ns). Expose raw
    * nanos (`tsNs`), exact epoch-ms (`tsMs`), and a µs-truncated `ts`
    * timestamp for window/date functions.
    */
  def events(s: SparkSession, d: String): DataFrame =
    s.read
      .schema(
        "event_id BIGINT, ts BIGINT, user_id BIGINT, event_type STRING, " +
          "value DOUBLE, props STRING")
      .parquet(s"$d/events.parquet")
      .withColumnRenamed("ts", "tsRaw")
      .withColumn("tsNs", org.apache.spark.sql.functions.expr(
        "CASE WHEN abs(tsRaw) >= 100000000000000000 THEN tsRaw ELSE tsRaw * 1000 END"))
      .drop("tsRaw")
      .withColumn("tsMs", org.apache.spark.sql.functions.expr("tsNs div 1000000"))
      .withColumn("ts",
        org.apache.spark.sql.functions.expr("timestamp_micros(tsNs div 1000)"))
  def documents(s: SparkSession, d: String): DataFrame = apply(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = apply(s, d, "embeddings")
}
