package graft

import graft.serve.SketchCube
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class SketchCubeSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def fact = Tables.events(spark, "/root/testdata/sf0.01")
    .withColumn("day", expr("tsMs div 86400000"))

  test("cell estimates stay within HLL tolerance of exact distincts") {
    val cube = SketchCube.build(fact, Seq("event_type", "day"), "user_id")
    val est = SketchCube.estimate(cube)
      .select(col("event_type"), col("day"), col("n_distinct_est"))
    val exact = fact.groupBy("event_type", "day")
      .agg(countDistinct("user_id").as("n_exact"))
    val joined = est.join(exact, Seq("event_type", "day")).collect()
    assert(joined.nonEmpty)
    joined.foreach { r =>
      val e = r.getLong(2).toDouble; val x = r.getLong(3).toDouble
      assert(math.abs(e - x) <= math.max(3.0, 0.05 * x),
        s"${r.get(0)}/${r.get(1)}: est $e vs exact $x")
    }
  }

  test("union of cell sketches equals the directly-built sketch") {
    // the mergeability law that makes the cube legitimate: register
    // max per batch then union == register max over everything, so a
    // roll-up is EXACTLY the sketch a raw re-scan would have built
    val cube = SketchCube.build(fact, Seq("event_type", "day"), "user_id")
    val rolled = SketchCube.estimate(
      SketchCube.rollup(cube, Seq("event_type")))
      .select(col("event_type"), col("n_distinct_est").as("rolled"))
    val direct = SketchCube.estimate(
      SketchCube.build(fact, Seq("event_type"), "user_id"))
      .select(col("event_type"), col("n_distinct_est").as("direct"))
    val both = rolled.join(direct, "event_type").collect()
    assert(both.nonEmpty)
    both.foreach(r => assert(r.getLong(1) == r.getLong(2),
      s"${r.get(0)}: rolled ${r.get(1)} != direct ${r.get(2)}"))
  }

  test("additive measures survive the roll-up next to the sketches") {
    val cube = SketchCube.build(fact, Seq("event_type", "day"), "user_id",
      sumCols = Seq("value"))
    val rolled = SketchCube.rollup(cube, Seq("event_type"))
    val got = rolled.agg(sum("n_rows")).first().getLong(0)
    assert(got == fact.count())
  }

  test("the same cube build runs under readStream with batch-identical estimates") {
    // mergeable sketches are what make the cube maintainable
    // incrementally: the streaming aggregation unions per-batch
    // register states, and the final estimates equal the batch build
    import org.apache.spark.sql.functions.col
    val dir = java.nio.file.Files.createTempDirectory("skc_in")
    val ckpt = java.nio.file.Files.createTempDirectory("skc_ck")
    val src = fact.select("event_type", "user_id")
    // two "micro-batch" files
    src.filter(col("user_id") % 2 === 0).write.parquet(dir + "/b1")
    src.filter(col("user_id") % 2 =!= 0).write.parquet(dir + "/b2")
    val stream = spark.readStream.schema(src.schema)
      .option("maxFilesPerTrigger", "4")
      .parquet(dir + "/*")
    val q = SketchCube.build(stream, Seq("event_type"), "user_id")
      .writeStream.outputMode("complete")
      .format("memory").queryName("skc_out")
      .option("checkpointLocation", ckpt.toString)
      .start()
    try {
      q.processAllAvailable()
      val streamed = SketchCube.estimate(spark.table("skc_out"))
        .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
      val batch = SketchCube.estimate(
          SketchCube.build(src, Seq("event_type"), "user_id"))
        .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
      assert(streamed == batch)
    } finally q.stop()
  }
}
