package graft

import graft.operators.Dedup
import graft.streaming.StreamingEmbedNearDup
import java.nio.file.Files
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The streaming embedding ingest path must equal the batch
  * incremental operator's vs-corpus leg — stateless, exactly once. */
class StreamingEmbedNearDupSpec extends AnyFunSuite {

  lazy implicit val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  test("two-micro-batch stream equals the batch incremental vs-corpus leg, exactly once") {
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.001")
      .select("vec_id", "label", "embedding")
    val fresh = emb.filter(col("vec_id") % 4 === 0)
    val corpus = emb.filter(col("vec_id") % 4 =!= 0).cache()
    val expected = Dedup.incrementalEmbeddingNearDupPairs(
        fresh, corpus, "label", 0.4)
      .filter(col("vs_corpus"))
      .select("vec_a", "vec_b", "cosine")
      .as[(Long, Long, Double)].collect().toSet
    assert(expected.nonEmpty)

    // static-frame parity: the identical plan gives identical rows
    val static = StreamingEmbedNearDup
      .embedNearDupAgainstIndex(fresh, corpus, "label", 0.4)
      .as[(Long, Long, Double)].collect().toSet
    assert(static == expected)

    // a REAL two-micro-batch run
    val in = Files.createTempDirectory("semb_in")
    val ckpt = Files.createTempDirectory("semb_ck")
    val mid = 200L
    def writeBatch(name: String, cond: org.apache.spark.sql.Column): Unit =
      fresh.filter(cond).write.parquet(s"$in/$name")
    writeBatch("b1", col("vec_id") < mid)
    val stream = spark.readStream.schema(fresh.schema)
      .option("path", in.toString + "/*").format("parquet").load()
    val q = StreamingEmbedNearDup
      .embedNearDupAgainstIndex(stream, corpus, "label", 0.4)
      .writeStream.outputMode("append")
      .format("memory").queryName("semb_out")
      .option("checkpointLocation", ckpt.toString)
      .start()
    try {
      q.processAllAvailable()
      writeBatch("b2", col("vec_id") >= mid)
      q.processAllAvailable()
      // stateless: no state store operators
      assert(Option(q.lastProgress).forall(_.stateOperators.isEmpty))
      val got = spark.table("semb_out")
        .as[(Long, Long, Double)].collect()
      assert(got.length == got.toSet.size, "pairs must emit exactly once")
      assert(got.toSet == expected)
    } finally {
      q.stop()
      corpus.unpersist()
    }
  }

  test("routed entry: two-micro-batch stream vs the cell-bucketed rel equals the dense leg (radius-exact)") {
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.001")
      .select("vec_id", "label", "embedding")
    val fresh = emb.filter(col("vec_id") % 4 === 0)
    val corpus = emb.filter(col("vec_id") % 4 =!= 0).cache()
    val cents = graft.operators.IvfCentroids.Centroids16
    val dir = Files.createTempDirectory("semb_cell").toString
    Dedup.writeEmbedCellRelBucketed(corpus, "label", cents,
      "semb_cell_idx", 4, Some(s"$dir/semb_cell_idx"))
    try {
      val expected = StreamingEmbedNearDup
        .embedNearDupAgainstIndex(fresh, corpus, "label", 0.4)
        .as[(Long, Long, Double)].collect().toSet
      assert(expected.nonEmpty)

      // static parity: radius-exact probing ⇒ ≡ dense at any τ
      val staticRouted = StreamingEmbedNearDup.embedNearDupAgainstCellIndex(
          fresh, spark.table("semb_cell_idx"), cents, "label", 0.4)
        .as[(Long, Long, Double)].collect().toSet
      assert(staticRouted == expected)

      // a REAL two-micro-batch run through the routed plan
      val in = Files.createTempDirectory("semb_rin")
      val ckpt = Files.createTempDirectory("semb_rck")
      val mid = 200L
      fresh.filter(col("vec_id") < mid).write.parquet(s"$in/b1")
      val stream = spark.readStream.schema(fresh.schema)
        .option("path", in.toString + "/*").format("parquet").load()
      val q = StreamingEmbedNearDup.embedNearDupAgainstCellIndex(
          stream, spark.table("semb_cell_idx"), cents, "label", 0.4)
        .writeStream.outputMode("append")
        .format("memory").queryName("semb_routed_out")
        .option("checkpointLocation", ckpt.toString)
        .start()
      try {
        q.processAllAvailable()
        fresh.filter(col("vec_id") >= mid).write.parquet(s"$in/b2")
        q.processAllAvailable()
        assert(Option(q.lastProgress).forall(_.stateOperators.isEmpty))
        val got = spark.table("semb_routed_out")
          .as[(Long, Long, Double)].collect()
        assert(got.length == got.toSet.size, "pairs must emit exactly once")
        assert(got.toSet == expected)
      } finally q.stop()
    } finally {
      corpus.unpersist()
      spark.sql("DROP TABLE IF EXISTS semb_cell_idx")
    }
  }

  test("nightly rel rebuild under a live stream: running stream keeps its version, restart refuses stale centroids") {
    // The operational story the versioned rebuild + quantizer binding
    // enable: a nightly rebuild swaps the serving view mid-soak; the
    // RUNNING stream resolved the previous version at plan-build and
    // keeps reading it (complete, kept on disk) to completion, while a
    // RESTARTED stream resolves the new version — and passing it the
    // previous night's centroids is refused loudly instead of silently
    // losing pairs.
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.001")
      .select("vec_id", "label", "embedding")
    val fresh = emb.filter(col("vec_id") % 4 === 0)
    val corpus1 = emb.filter(col("vec_id") % 4 =!= 0).cache()
    // night 2's corpus carries DIFFERENT ids, so any silent switch to
    // v2 mid-stream would change the matched pair set
    val corpus2 = corpus1.withColumn("vec_id", col("vec_id") + 1000000L)
    val cents1 = graft.operators.IvfCentroids.Centroids16
    val cents2 = cents1.map { case (i, c) => (i, c.map(_ + 1e-6)) }
    val dir = Files.createTempDirectory("semb_bg").toString
    assert(Dedup.writeEmbedCellRelBucketedVersioned(corpus1, "label",
      cents1, "semb_bg_rel", 4, Some(s"$dir/rel")) == "semb_bg_rel_v1")
    val mid = 200L
    val in = Files.createTempDirectory("semb_bg_in")
    val ckpt = Files.createTempDirectory("semb_bg_ck")
    fresh.filter(col("vec_id") < mid).write.parquet(s"$in/b1")
    val stream = spark.readStream.schema(fresh.schema)
      .option("path", in.toString + "/*").format("parquet").load()
    val q = StreamingEmbedNearDup.embedNearDupAgainstCellIndex(
        stream, spark.table("semb_bg_rel"), cents1, "label", 0.4)
      .writeStream.outputMode("append")
      .format("memory").queryName("semb_bg_out")
      .option("checkpointLocation", ckpt.toString)
      .start()
    try {
      q.processAllAvailable()
      // NIGHTLY REBUILD while the stream runs: v2 under a new fit
      assert(Dedup.writeEmbedCellRelBucketedVersioned(corpus2, "label",
        cents2, "semb_bg_rel", 4, Some(s"$dir/rel")) == "semb_bg_rel_v2")
      assert(spark.catalog.tableExists("semb_bg_rel_v1"), "v1 kept")
      fresh.filter(col("vec_id") >= mid).write.parquet(s"$in/b2")
      q.processAllAvailable()
      // the stream matched BOTH batches against v1 (corpus1 ids): the
      // full expected set, none of corpus2's offset ids
      val got = spark.table("semb_bg_out")
        .as[(Long, Long, Double)].collect().toSet
      val expected = StreamingEmbedNearDup
        .embedNearDupAgainstIndex(fresh, corpus1, "label", 0.4)
        .as[(Long, Long, Double)].collect().toSet
      assert(got == expected, "running stream must keep its resolved v1")
      assert(got.forall(_._2 < 1000000L))
    } finally q.stop()
    // RESTART: the serving name now resolves v2 — last night's
    // centroids are refused by the quantizer binding, naming both fits
    val ex = intercept[IllegalArgumentException] {
      StreamingEmbedNearDup.embedNearDupAgainstCellIndex(
        fresh, spark.table("semb_bg_rel"), cents1, "label", 0.4).collect()
    }
    assert(ex.getMessage.contains("quantizer mismatch"))
    // with the current fit the restarted plan serves v2 (offset ids)
    val restarted = StreamingEmbedNearDup.embedNearDupAgainstCellIndex(
        fresh, spark.table("semb_bg_rel"), cents2, "label", 0.4)
      .select("vec_b").as[Long].collect()
    assert(restarted.nonEmpty && restarted.forall(_ >= 1000000L))
    corpus1.unpersist()
    spark.sql("DROP VIEW IF EXISTS semb_bg_rel")
    Seq("v1", "v2").foreach(v =>
      spark.sql(s"DROP TABLE IF EXISTS semb_bg_rel_$v"))
  }
}
