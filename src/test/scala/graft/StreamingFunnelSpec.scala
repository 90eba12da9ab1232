package graft

import graft.operators.EventAnalytics
import graft.streaming.StreamingFunnel
import java.nio.file.Files
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Streaming funnel: emit-on-watermark parity with the batch
  * [[EventAnalytics.funnelStages]], including cross-batch re-ordering
  * that a fold-as-they-arrive design would get wrong. */
class StreamingFunnelSpec extends AnyFunSuite {

  implicit lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  private val Steps = Seq("view", "click", "purchase")
  private val LatenessMs = 60000L

  private def line(user: Long, typ: String, ms: Long) =
    s"""{"user_id":$user,"event_type":"$typ","ts":"${new java.sql.Timestamp(ms)}","tsMs":$ms}"""

  private val schema = StructType(Seq(
    StructField("user_id", LongType), StructField("event_type", StringType),
    StructField("ts", TimestampType), StructField("tsMs", LongType)))

  test("streaming funnel: out-of-order arrival across batches, exact batch parity") {
    val in = Files.createTempDirectory("fun_in")
    val ckpt = Files.createTempDirectory("fun_ck")
    // batch 1: user 1's CLICK arrives before their earlier VIEW does
    Files.write(in.resolve("b1.json"), String.join("\n",
      line(1, "click", 2000),
      line(2, "view", 1000)).getBytes)
    val stream = spark.readStream.schema(schema).json(in.toString)
    val q = StreamingFunnel.funnel(stream, Steps, LatenessMs)
      .writeStream.outputMode("append")
      .format("memory").queryName("fun_out")
      .option("checkpointLocation", ckpt.toString)
      .start()
    try {
      q.processAllAvailable()
      assert(spark.table("fun_out").count() == 0) // all inside lateness

      // batch 2: the view (event-time BEFORE the click) + the purchase
      Files.write(in.resolve("b2.json"), String.join("\n",
        line(1, "view", 1500),
        line(1, "purchase", 2500)).getBytes)
      q.processAllAvailable()
      assert(spark.table("fun_out").count() == 0)

      // batch 3: a sentinel user far in the future pushes the
      // watermark past everyone's last activity + lateness
      Files.write(in.resolve("b3.json"),
        line(99, "view", 2000 + 100 * LatenessMs).getBytes)
      q.processAllAvailable()

      val got = spark.table("fun_out")
        .filter(col("user_id") < 90).collect()
        .map(r => r.getLong(0) ->
          (Option(r.get(1)), Option(r.get(2)), Option(r.get(3)), r.getLong(4)))
        .toMap
      // user 1: view 1500 anchors, click 2000 (arrived FIRST) counts,
      // purchase 2500 completes — stage 3 despite arrival order
      assert(got(1L) == ((Some(1500L), Some(2000L), Some(2500L), 3L)))
      // user 2: view only
      assert(got(2L) == ((Some(1000L), None, None, 1L)))

      // exact parity with the batch operator over the same events
      val batch = EventAnalytics.funnelStages(
        Seq((1L, "click", 2000L), (1L, "view", 1500L), (1L, "purchase", 2500L),
          (2L, "view", 1000L)).toDF("user_id", "event_type", "tsMs"),
        Steps).collect()
        .map(r => r.getLong(0) ->
          (Option(r.get(1)), Option(r.get(2)), Option(r.get(3)), r.getLong(4)))
        .toMap
      assert(got == batch)
    } finally q.stop()
  }

  test("static execution degrades to the batch funnel") {
    val ev = Seq(
      (1L, "view", 100L), (1L, "click", 200L), (1L, "purchase", 300L),
      (2L, "click", 50L), (2L, "view", 100L),
      (3L, "purchase", 10L))
      .toDF("user_id", "event_type", "tsMs")
      .withColumn("ts", timestamp_millis(col("tsMs")))
    val viaState = StreamingFunnel.funnel(ev, Steps, LatenessMs)
      .collect().map(r => r.getLong(0) ->
        (Option(r.get(1)), Option(r.get(2)), Option(r.get(3)), r.getLong(4)))
      .toMap
    val batch = EventAnalytics.funnelStages(ev, Steps)
      .collect().map(r => r.getLong(0) ->
        (Option(r.get(1)), Option(r.get(2)), Option(r.get(3)), r.getLong(4)))
      .toMap
    assert(viaState == batch)
    assert(viaState(2L)._4 == 1L) // click-before-view still rejected
  }
}
