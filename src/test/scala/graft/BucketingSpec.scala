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
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  /** Builder configs are ignored when another spec already created the
    * session, so everything plan-sensitive is set dynamically: no AQE
    * (its wrapper plan prints pre-removal Exchanges), no broadcast
    * (force the shuffle-join path the assertion targets), and an
    * explicit temp table path (no warehouse pollution). */
  private def withPlanConfs[A](f: => A): A = {
    val aqe = spark.conf.get("spark.sql.adaptive.enabled", "false")
    val bc = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try f
    finally {
      spark.conf.set("spark.sql.adaptive.enabled", aqe)
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", bc)
    }
  }

  private lazy val table: String = {
    val fact = (0 until 1000)
      .map(i => (s"u${i % 37}", i.toLong * 3600000L, "c1", false, "MAP",
        "SUCCESS", 1L, 1L, 60000L))
      .toDF("user", "time", "cluster", "excess", "taskType", "status",
        "started", "finished", "elapsedMs")
    val dir = java.nio.file.Files.createTempDirectory("bkt_tbl").toString
    UsageEtl.writeFactBucketed(fact, "fact_bucketed", buckets = 8,
      path = Some(s"$dir/fact_bucketed"))
    "fact_bucketed"
  }

  test("user aggregation over the bucketed fact plans no exchange") {
    withPlanConfs {
      val plan = spark.table(table)
        .groupBy("user").agg(sum("elapsedMs"))
        .queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), plan.take(3000))
    }
  }

  test("user self-join over the bucketed fact plans no exchange") {
    withPlanConfs {
      val t = spark.table(table)
      val totals = t.groupBy("user").agg(sum("elapsedMs").as("total"))
      val joined = t.join(totals, "user")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), plan.take(3000))
      assert(joined.count() == 1000)
    }
  }

  test("bucketed results match the unbucketed aggregation") {
    val bucketed = spark.table(table)
      .groupBy("user").agg(sum("elapsedMs").as("s"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(bucketed.size == 37)
    assert(bucketed.values.sum == 1000L * 60000L)
  }

  test("saltedJoin: identical rows to the plain join; shuffle keys carry the salt") {
    import graft.operators.Skew
    // 90% of fact rows hit one hot key
    val fact = (0 until 2000)
      .map(i => (if (i % 10 == 0) s"k${i % 100}" else "hot", i.toLong))
      .toDF("key", "v")
    val dim = (0 until 100).map(i => (s"k$i", s"d$i")).toDF("key", "attr")
      .union(Seq(("hot", "dhot")).toDF("key", "attr"))
    val salted = Skew.saltedJoin(fact, dim, "key", salts = 8)
    val plain = fact.join(dim, "key")
    val canon = (df: org.apache.spark.sql.DataFrame) => df
      .select("key", "v", "attr").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getString(2))).sorted.toSeq
    assert(canon(salted) == canon(plain))
    // the exchange keys include the salt → the hot key fans out
    val plan = salted.queryExecution.executedPlan.toString
    assert(plan.contains("__salt"), plan.take(3000))
  }
}
