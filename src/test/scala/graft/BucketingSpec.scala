package graft

import graft.usage.UsageEtl
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Plan-level proof of the bucketed-fact layout: user-grained
  * aggregation and self-join over the bucketed table run WITHOUT an
  * exchange — the pre-partitioning satisfies the required
  * distribution, which is the point of bucketing at 100 TB (the fact
  * is written once per ETL window, then every serving query skips the
  * user-key shuffle). */
class BucketingSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.warehouse.dir",
      java.nio.file.Files.createTempDirectory("bkt_wh").toString)
    .config("spark.sql.autoBroadcastJoinThreshold", "-1") // force the join path
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  private lazy val table: String = {
    val fact = (0 until 1000)
      .map(i => (s"u${i % 37}", i.toLong * 3600000L, "c1", false, "MAP",
        "SUCCESS", 1L, 1L, 60000L))
      .toDF("user", "time", "cluster", "excess", "taskType", "status",
        "started", "finished", "elapsedMs")
    UsageEtl.writeFactBucketed(fact, "fact_bucketed", buckets = 8)
    "fact_bucketed"
  }

  test("user aggregation over the bucketed fact plans no exchange") {
    val plan = spark.table(table)
      .groupBy("user").agg(sum("elapsedMs"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan.take(3000))
  }

  test("user self-join over the bucketed fact plans no exchange") {
    val t = spark.table(table)
    val totals = t.groupBy("user").agg(sum("elapsedMs").as("total"))
    val joined = t.join(totals, "user")
    val plan = joined.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan.take(3000))
    assert(joined.count() == 1000)
  }

  test("bucketed results match the unbucketed aggregation") {
    val bucketed = spark.table(table)
      .groupBy("user").agg(sum("elapsedMs").as("s"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(bucketed.size == 37)
    assert(bucketed.values.sum == 1000L * 60000L)
  }
}
