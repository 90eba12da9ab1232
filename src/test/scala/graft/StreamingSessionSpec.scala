package graft

import graft.operators.Sessionize
import java.nio.file.Files
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** The native session_window path under readStream: sessions close and
  * emit once the watermark passes their gap, late events merge sessions
  * that were still open — pinning that [[Sessionize.bySessionWindow]]
  * really is the streaming-capable formulation (batch agreement with
  * the window-function form is pinned in MiscSpec). */
class StreamingSessionSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val schema = StructType(Seq(
    StructField("user_id", LongType), StructField("ts", TimestampType)))

  private def line(user: Long, sec: Long) =
    s"""{"user_id":$user,"ts":"${new java.sql.Timestamp(sec * 1000)}"}"""

  test("session_window under readStream: gap-merge across batches, watermark close") {
    val in = Files.createTempDirectory("ss_in")
    val ckpt = Files.createTempDirectory("ss_ck")
    // batch 1: user 1 events at 100s and 400s — gap 600s ⇒ ONE open
    // session [100, 1000)
    Files.write(in.resolve("b1.json"), String.join("\n",
      line(1, 100), line(1, 400)).getBytes)

    val stream = spark.readStream.schema(schema).json(in.toString)
      .withWatermark("ts", "10 seconds")
    val q = Sessionize
      .bySessionWindow(stream, "user_id", "ts", "600 seconds", Seq.empty)
      .writeStream.outputMode("append")
      .format("memory").queryName("ss_out")
      .option("checkpointLocation", ckpt.toString)
      .start()
    try {
      q.processAllAvailable()
      assert(spark.table("ss_out").count() == 0) // session still open

      // batch 2: an event at 900s extends the SAME session (gap from
      // 400s is 500s < 600s); a far-future event then closes it
      Files.write(in.resolve("b2.json"), String.join("\n",
        line(1, 900), line(99, 100000)).getBytes)
      q.processAllAvailable()

      val rows = spark.table("ss_out")
        .filter(col("user_id") === 1).collect()
      assert(rows.length == 1)
      val r = rows.head
      // merged session: [100s, 900s + 600s gap)
      assert(r.getAs[Long]("n_events") == 3)
      assert(r.getAs[Long]("start_ms") == 100000L)
      assert(r.getAs[Long]("end_ms") == 1500000L)
    } finally q.stop()
  }

  test("separate users and gap-exceeded events produce distinct sessions") {
    val in = Files.createTempDirectory("ss2_in")
    val ckpt = Files.createTempDirectory("ss2_ck")
    Files.write(in.resolve("b1.json"), String.join("\n",
      line(1, 100), line(1, 800),   // 700s apart > 600s gap ⇒ 2 sessions
      line(2, 100)).getBytes)
    Files.write(in.resolve("b2.json"),
      line(99, 100000).getBytes)    // watermark push

    val stream = spark.readStream.schema(schema).json(in.toString)
      .withWatermark("ts", "10 seconds")
    val q = Sessionize
      .bySessionWindow(stream, "user_id", "ts", "600 seconds", Seq.empty)
      .writeStream.outputMode("append")
      .format("memory").queryName("ss2_out")
      .option("checkpointLocation", ckpt.toString)
      .start()
    try {
      q.processAllAvailable()
      val got = spark.table("ss2_out")
        .filter(col("user_id") < 90)
        .select("user_id", "start_ms", "n_events").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(got == Set((1L, 100000L, 1L), (1L, 800000L, 1L), (2L, 100000L, 1L)))
    } finally q.stop()
  }
}
