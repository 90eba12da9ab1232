package graft

import graft.streaming.StreamingJoins
import java.nio.file.Files
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Stream-stream interval join: the streaming q47 (clicks inside the
  * 5-minute window after each error). */
class StreamingJoinsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  private def ts(sec: Long) = new java.sql.Timestamp(sec * 1000)

  test("interval join under readStream: in-window matches across micro-batches") {
    val openDir = Files.createTempDirectory("sj_open")
    val ptDir = Files.createTempDirectory("sj_pt")
    val ckpt = Files.createTempDirectory("sj_ck")
    def line(id: Long, user: Long, sec: Long) =
      s"""{"id":$id,"user_id":$user,"ts":"${ts(sec)}"}"""
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("user_id", LongType),
      StructField("ts", TimestampType)))

    // batch 1: one error window [100s, 400s] for user 1; one in-window
    // click, one out-of-window click, one other-user click
    Files.write(openDir.resolve("b1.json"), line(10, 1, 100).getBytes)
    Files.write(ptDir.resolve("b1.json"), String.join("\n",
      line(20, 1, 150), line(21, 1, 500), line(22, 2, 150)).getBytes)

    val opens = spark.readStream.schema(schema).json(openDir.toString)
      .withColumnRenamed("id", "error_id").withColumnRenamed("ts", "open_ts")
    val points = spark.readStream.schema(schema).json(ptDir.toString)
      .withColumnRenamed("id", "click_id").withColumnRenamed("ts", "click_ts")
    val q = StreamingJoins
      .intervalJoin(opens, points, "user_id", "open_ts", "click_ts",
        windowMs = 300000L, lateness = "10 minutes")
      .select("error_id", "click_id")
      .writeStream.outputMode("append")
      .format("memory").queryName("sj_out")
      .option("checkpointLocation", ckpt.toString)
      .start()
    try {
      q.processAllAvailable()
      assert(spark.table("sj_out").as[(Long, Long)].collect().toSet ==
        Set((10L, 20L)))

      // batch 2: a second in-window click arrives later — the open
      // event is still in the join state (inside watermark depth)
      Files.write(ptDir.resolve("b2.json"), line(23, 1, 200).getBytes)
      q.processAllAvailable()
      assert(spark.table("sj_out").as[(Long, Long)].collect().toSet ==
        Set((10L, 20L), (10L, 23L)))
    } finally q.stop()
  }

  test("identical operator code gives identical pairs on batch frames") {
    val opens = Seq((10L, 1L, ts(100))).toDF("error_id", "user_id", "open_ts")
    val points = Seq(
      (20L, 1L, ts(150)), (21L, 1L, ts(500)), (22L, 2L, ts(150)),
      (23L, 1L, ts(400)))  // exactly at the inclusive window end
      .toDF("click_id", "user_id", "click_ts")
    val got = StreamingJoins
      .intervalJoin(opens, points, "user_id", "open_ts", "click_ts",
        windowMs = 300000L, lateness = "10 minutes")
      .select("error_id", "click_id").as[(Long, Long)].collect().toSet
    assert(got == Set((10L, 20L), (10L, 23L)))
  }
}
