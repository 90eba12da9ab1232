package graft

import graft.streaming.StreamingDedup
import java.nio.file.Files
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

class StreamingDedupSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("ts", TimestampType)))

  private def jsonLine(id: Long, text: String, tsMs: Long): String =
    s"""{"doc_id":$id,"text":"$text","ts":"${new java.sql.Timestamp(tsMs)}"}"""

  test("duplicate content arriving in a later micro-batch is dropped") {
    val in = Files.createTempDirectory("sd_in")
    val ckpt = Files.createTempDirectory("sd_ck")
    Files.write(in.resolve("b1.json"), String.join("\n",
      jsonLine(1, "alpha beta", 1000000L),
      jsonLine(2, "gamma delta", 1001000L)).getBytes)

    val stream = spark.readStream.schema(schema).json(in.toString)
    val deduped = StreamingDedup.dedupByContent(stream, "ts",
      latenessMs = 3600 * 1000L)
    val q = deduped.writeStream
      .outputMode("append")
      .format("memory").queryName("deduped")
      .option("checkpointLocation", ckpt.toString)
      .start()
    try {
      q.processAllAvailable()
      assert(spark.table("deduped").count() == 2)

      // batch 2: same content as doc 1 (later event time, inside the
      // window) + one genuinely new doc
      Files.write(in.resolve("b2.json"), String.join("\n",
        jsonLine(3, "alpha beta", 1002000L),
        jsonLine(4, "epsilon zeta", 1003000L)).getBytes)
      q.processAllAvailable()
      val ids = spark.table("deduped").select("doc_id")
        .as[Long].collect().sorted
      assert(ids.toSeq == Seq(1L, 2L, 4L)) // 3 dropped as duplicate
    } finally q.stop()
  }

  test("corpus quality filter runs unchanged under readStream (stateless parity)") {
    val in = Files.createTempDirectory("sq_in")
    val ckpt = Files.createTempDirectory("sq_ck")
    val good = "the data " + (1 to 10).map(i => s"word$i").mkString(" ")
    Files.write(in.resolve("b1.json"), String.join("\n",
      s"""{"doc_id":1,"text":"$good"}""",
      """{"doc_id":2,"text":"too short"}""").getBytes)

    val docSchema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType)))
    val stream = spark.readStream.schema(docSchema).json(in.toString)
    // the same batch operator, applied verbatim to a streaming frame —
    // stateless narrow ops need no watermark, no state store
    val q = graft.operators.Corpus.qualityFilter(stream)
      .writeStream.outputMode("append")
      .format("memory").queryName("stream_quality")
      .option("checkpointLocation", ckpt.toString)
      .start()
    try {
      q.processAllAvailable()
      val rows = spark.table("stream_quality").collect()
        .map(r => r.getLong(0) -> r.getBoolean(r.fieldIndex("keep"))).toMap
      assert(rows == Map(1L -> true, 2L -> false))
      // micro-batch 2 flows through the same plan
      Files.write(in.resolve("b2.json"),
        s"""{"doc_id":3,"text":"$good extra"}""".getBytes)
      q.processAllAvailable()
      assert(spark.table("stream_quality").count() == 3)
    } finally q.stop()
  }

  test("pixel decode runs unchanged under readStream (stateless parity)") {
    implicit val s: SparkSession = spark
    val in = Files.createTempDirectory("px_in")
    val ckpt = Files.createTempDirectory("px_ck")
    def img(id: Long): Array[Byte] = {
      val rgb = Array.tabulate[Byte](4 * 3 * 3)(i => ((id * 7 + i) % 256).toByte)
      if (id % 2 == 0) graft.operators.PixelDecode.bmpFixture(4, 3, rgb)
      else graft.operators.PixelDecode.pngPixelFixture(4, 3, rgb)
    }
    // parquet carries the binary column losslessly into the stream
    Seq((1L, img(1)), (2L, img(2)))
      .toDF("doc_id", "media").write.parquet(in.toString + "/b1")
    val stream = spark.readStream
      .schema(StructType(Seq(
        StructField("doc_id", LongType), StructField("media", BinaryType))))
      .option("path", in.toString + "/*")
      .format("parquet").load()
    val q = graft.operators.Multimodal.decodePixelStats(stream)
      .toDF()
      .writeStream.outputMode("append")
      .format("memory").queryName("stream_pixels")
      .option("checkpointLocation", ckpt.toString)
      .start()
    try {
      q.processAllAvailable()
      val batch = graft.operators.Multimodal.decodePixelStats(
        Seq((1L, img(1)), (2L, img(2))).toDF("doc_id", "media")).toDF()
      val streamed = spark.table("stream_pixels")
      assert(streamed.count() == 2)
      assert(streamed.exceptAll(batch).isEmpty &&
        batch.exceptAll(streamed).isEmpty)
    } finally q.stop()
  }

  test("batch execution: plain exact dedup, one survivor per content") {
    val docs = Seq(
      (1L, "same text", new java.sql.Timestamp(1000)),
      (2L, "same text", new java.sql.Timestamp(2000)),
      (3L, "other text", new java.sql.Timestamp(3000)))
      .toDF("doc_id", "text", "ts")
    val got = StreamingDedup.dedupByContent(docs, "ts", 60000L)
    assert(got.count() == 2)
    assert(got.select("content_hash").distinct().count() == 2)
  }
}
