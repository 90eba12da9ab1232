package graft

import graft.operators.Dedup
import graft.streaming.StreamingNearDup
import java.nio.file.Files
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

class StreamingNearDupSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType)))

  test("streaming matches equal the batch incremental operator, exactly once") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val cut = 150L
    val corpus = docs.filter(col("doc_id") < cut)
    val fresh = docs.filter(col("doc_id") >= cut)

    // batch expectation: the vs_corpus matches of the incremental op
    val expected = Dedup.incrementalNearDupPairs(
        fresh, Dedup.minHashBandRel(corpus), 0.5)
      .filter(col("vs_corpus"))
      .select("doc_a", "doc_b", "jac")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    spark.sharedState.cacheManager.clearCache()
    assert(expected.nonEmpty, "fixture must produce at least one match")

    // stream the fresh docs in two micro-batches against the index
    val in = Files.createTempDirectory("snd_in")
    val ckpt = Files.createTempDirectory("snd_ck")
    // batch files via Spark's own JSON writer (correct escaping), then
    // moved into the watched dir one at a time
    def writeBatch(name: String, cond: org.apache.spark.sql.Column): Unit = {
      val tmp = Files.createTempDirectory(s"snd_$name").toString
      fresh.filter(cond).select("doc_id", "text")
        .coalesce(1).write.mode("overwrite").json(tmp)
      val part = new java.io.File(tmp).listFiles()
        .find(_.getName.endsWith(".json")).get
      Files.copy(part.toPath, in.resolve(name))
    }
    val mid = 175L

    writeBatch("b1.json", col("doc_id") < mid)
    val idx = StreamingNearDup.indexSignatures(corpus)
    val stream = spark.readStream.schema(schema).json(in.toString)
    val q = StreamingNearDup.nearDupAgainstIndex(stream, idx, 0.5)
      .writeStream.outputMode("append")
      .format("memory").queryName("snd_out")
      .option("checkpointLocation", ckpt.toString)
      .start()
    try {
      q.processAllAvailable()
      writeBatch("b2.json", col("doc_id") >= mid)
      q.processAllAvailable()
      val got = spark.table("snd_out")
        .collect().map(r => (r.getLong(0), r.getLong(1)))
      assert(got.length == got.toSet.size, "pairs must be emitted exactly once")
      assert(got.toSet == expected)
    } finally q.stop()
  }

  test("batch parity: the same plan on a static frame equals the incremental op") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val corpus = docs.filter(col("doc_id") < 150)
    val fresh = docs.filter(col("doc_id") >= 150)
    val streaming = StreamingNearDup.nearDupAgainstIndex(
      fresh, StreamingNearDup.indexSignatures(corpus), 0.5)
    val batch = Dedup.incrementalNearDupPairs(
        fresh, Dedup.minHashBandRel(corpus), 0.5)
      .filter(col("vs_corpus")).select("doc_a", "doc_b", "jac")
    assert(streaming.exceptAll(batch).isEmpty &&
      batch.exceptAll(streaming).isEmpty)
    spark.sharedState.cacheManager.clearCache()
  }
}
