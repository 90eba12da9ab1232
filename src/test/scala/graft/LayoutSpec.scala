package graft

import graft.operators.Layout
import java.nio.file.Files
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Z-order layout: the file-envelope evidence that the curve prunes
  * BOTH dimensions where a single sort key prunes one. */
class LayoutSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("mortonInterleave: hand-checked bit weave") {
    import spark.implicits._
    val got = Seq((0L, 0L), (1L, 0L), (0L, 1L), (1L, 1L), (3L, 5L))
      .toDF("x", "y")
      .select(Layout.mortonInterleave(col("x"), col("y"), 4).as("z"))
      .as[Long].collect().toSeq
    // z(3,5) : x=0011 → bits 0,2 ; y=0101 → bits 1,5 ⇒ 100111b = 39
    assert(got == Seq(0L, 1L, 2L, 3L, 39L))
  }

  test("rangeBucket: monotone, clamped, degenerate-range safe") {
    import spark.implicits._
    val got = Seq(0L, 500L, 999L, 1000L)
      .toDF("v")
      .select(Layout.rangeBucket(col("v"), 0L, 999L, 4).as("b"))
      .as[Long].collect().toSeq
    assert(got.head == 0L && got.last == 15L)       // clamp at top
    assert(got == got.sorted)                        // monotone
    val deg = Seq(7L).toDF("v")
      .select(Layout.rangeBucket(col("v"), 7L, 7L, 4).as("b"))
      .as[Long].collect()
    assert(deg.head == 0L)
  }

  test("z-order prunes both dimensions; x-sort prunes only x") {
    val n = 40000L
    // two independent pseudo-random dims in [0, 1024)
    val df = spark.range(n).select(
      pmod(hash(col("id")), lit(1024)).cast("long").as("x"),
      pmod(hash(col("id") * 7 + 3), lit(1024)).cast("long").as("y"))
    val xDir = Files.createTempDirectory("lay_x").toString
    val zDir = Files.createTempDirectory("lay_z").toString
    val nFiles = 16
    df.repartitionByRange(nFiles, col("x")).sortWithinPartitions("x")
      .write.mode("overwrite").parquet(xDir)
    Layout.zorder(df, "x", "y", bits = 10, numFiles = nFiles)
      .write.mode("overwrite").parquet(zDir)

    // files whose min/max envelope intersects the predicate box — the
    // exact set parquet row-group pruning would read
    def hits(dir: String, xLo: Long, xHi: Long, yLo: Long, yHi: Long): Long =
      Layout.fileEnvelopes(spark.read.parquet(dir), "x", "y")
        .filter(col("x_max") >= xLo && col("x_min") <= xHi &&
          col("y_max") >= yLo && col("y_min") <= yHi)
        .count()
    def total(dir: String): Long =
      Layout.fileEnvelopes(spark.read.parquet(dir), "x", "y").count()

    assert(total(xDir) >= nFiles - 1 && total(zDir) >= nFiles - 1)

    // y-only box: the x-sorted layout reads EVERY file (each spans all
    // of y); the z-curve confines y to a fraction of the files
    val yOnlyX = hits(xDir, 0, 1023, 100, 150)
    val yOnlyZ = hits(zDir, 0, 1023, 100, 150)
    assert(yOnlyX == total(xDir))
    assert(yOnlyZ <= total(zDir) / 2)

    // x-only box: x-sort is optimal (1-2 files); the z-curve still
    // prunes most files — it trades a little single-dim locality for
    // pruning on every dim
    val xOnlyX = hits(xDir, 100, 150, 0, 1023)
    val xOnlyZ = hits(zDir, 100, 150, 0, 1023)
    assert(xOnlyX <= 2)
    assert(xOnlyZ < total(zDir))

    // 2-D box: z-order reads no more than the single-key layout
    assert(hits(zDir, 100, 150, 100, 150) <= hits(xDir, 100, 150, 100, 150))
  }

  test("compact: unpartitioned round-robin hits the byte-sized file count") {
    import spark.implicits._
    val inDir = Files.createTempDirectory("compact_in").toString
    val outDir = Files.createTempDirectory("compact_out").toString + "/t"
    spark.range(10000).select(col("id"), (col("id") * 31).as("v"))
      .repartition(40) // simulate a streaming writer's file spray
      .write.mode("overwrite").parquet(inDir)
    val table = spark.read.parquet(inDir)
    val totalBytes = table.inputFiles.map { f =>
      val p = new org.apache.hadoop.fs.Path(f)
      p.getFileSystem(spark.sparkContext.hadoopConfiguration)
        .getFileStatus(p).getLen
    }.sum
    val target = totalBytes / 4 + 1 // expect ~4 output files
    val (before, after) = Layout.compact(table, outDir, target)
    assert(before == 40L)
    assert(after >= 3L && after <= 5L, s"got $after files")
    // identical data after the rewrite
    val out = spark.read.parquet(outDir)
    assert(out.exceptAll(table).isEmpty && table.exceptAll(out).isEmpty)
  }

  test("compact: partitioned tables size files per partition dir") {
    import spark.implicits._
    val inDir = Files.createTempDirectory("compactp_in").toString
    val outDir = Files.createTempDirectory("compactp_out").toString + "/t"
    // 3 date partitions × 20 sliver files each
    spark.range(3000)
      .select(col("id"), concat(lit("d"), col("id") % 3).as("day"))
      .repartition(20)
      .write.mode("overwrite").partitionBy("day").parquet(inDir)
    val table = spark.read.parquet(inDir)
    val (before, after) =
      Layout.compact(table, outDir, 1L << 30, partitionCols = Seq("day"))
    assert(before == 60L, s"expected 60 sliver files, got $before")
    assert(after == 3L, s"expected 1 file per dir, got $after")
    val out = spark.read.parquet(outDir)
      .select("id", "day") // partition col comes back as string
    assert(out.exceptAll(table.select("id", "day")).isEmpty &&
      table.select("id", "day").exceptAll(out).isEmpty)
  }
}
