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
    if (args.length > 1 && args(1) == "edit") {
      // q72 candidate-volume probe: length-band pair count per
      // (lang, source) block at maxDist = 90 (bucket width 91)
      val w = 91
      val slim = docs.select(col("doc_id"), col("lang"), col("source"),
        length(col("text")).as("len"),
        pmod(col("doc_id"), lit(7)).as("m7"))
      val a = slim.filter(col("m7") === 0)
        .withColumn("bkt", explode(array(
          floor(col("len") / w) - 1, floor(col("len") / w),
          floor(col("len") / w) + 1)))
        .groupBy("lang", "source", "bkt").agg(count(lit(1)).as("na"))
      val b = slim.filter(col("m7") =!= 0)
        .withColumn("bkt", floor(col("len") / w))
        .groupBy("lang", "source", "bkt").agg(count(lit(1)).as("nb"))
      val j = a.join(b, Seq("lang", "source", "bkt"))
      println("q72 vs-corpus band candidates (pre len-filter): " +
        j.agg(sum(col("na") * col("nb"))).head.getLong(0))
      val aa = slim.filter(col("m7") === 0)
        .withColumn("bkt", floor(col("len") / w))
        .groupBy("lang", "source", "bkt").agg(count(lit(1)).as("na"))
      println("q72 vs-new block candidates (~na^2 within bucket): " +
        aa.agg(sum(col("na") * col("na"))).head.getLong(0))
      println("length histogram:")
      slim.groupBy((floor(col("len") / w) * w).as("len_bucket")).count()
        .orderBy("len_bucket").show(30)
      spark.stop(); return
    }
    if (args.length > 2 && args(1) == "decontam") {
      // stage-isolated fast-grams A/B: contaminationCheckBloom with the
      // polyhash oracle kernel vs the xxhash64 production kernel, same
      // docs + probes, alternating within one JVM (run 0 = warm-up per
      // side). Quantifies the KERNEL's app-level stage cost and the
      // survivor delta (P=1e9+7 phantom matches) at stress scale.
      val probes = spark.read.parquet(args(2))
      for (rep <- 0 to 2; fast <- Seq(false, true)) {
        operators.OperatorCaches.releaseAll()
        spark.sharedState.cacheManager.clearCache()
        val t0 = System.nanoTime()
        val contaminated = operators.Corpus
          .contaminationCheckBloom(docs, probes, n = 5, minMatches = 1,
            fastGrams = fast)
          .filter(col("contaminated")).count()
        val s = (System.nanoTime() - t0) / 1e9
        if (rep > 0)
          println(f"decontam fast=$fast rep=$rep: $s%.2f s, contaminated=$contaminated")
      }
      spark.stop(); return
    }
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
