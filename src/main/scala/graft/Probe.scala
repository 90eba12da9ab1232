package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch diagnostic main (not part of the driver contract): band-bucket
  * histogram of the minhash LSH index over a documents table. */
object Probe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/sf10")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "64")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = Tables.documents(spark, dir)
    println(s"docs: ${docs.count()}")
    println("token-length histogram (short docs):")
    docs.select(size(split(col("text"), "\\s+")).as("ntok"))
      .groupBy(when(col("ntok") < 5, col("ntok")).otherwise(lit(5)).as("ntok_bucket"))
      .count().orderBy("ntok_bucket").show()
    val rel = operators.Dedup.minHashBandRel(docs)
    val buckets = rel.groupBy("band_idx", "band_hash").count()
    println("top band buckets:")
    buckets.orderBy(col("count").desc).show(20, truncate = false)
    println("bucket-size histogram:")
    buckets.groupBy(
      when(col("count") <= 2, lit("2"))
        .when(col("count") <= 10, lit("10"))
        .when(col("count") <= 100, lit("1e2"))
        .when(col("count") <= 1000, lit("1e3"))
        .when(col("count") <= 10000, lit("1e4"))
        .otherwise(lit(">1e4")).as("sz"))
      .agg(count(lit(1)).as("n_buckets"), sum(col("count") * col("count")).as("sum_sq"))
      .orderBy("sz").show()
    spark.stop()
  }
}
