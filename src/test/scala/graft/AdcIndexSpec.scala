package graft

import graft.operators.{IvfCentroids, PqCodebooks, Similarity}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.joins.BroadcastHashJoinExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Plan-level proof of the PERSISTED bucketed-by-cell ADC index
  * (VERDICT r11 item 3): the slim (vec_id, cell, codes) table written
  * `bucketBy(cell)`, searched through [[Similarity.ivfAdcSearchPruned]]
  * — the probe-cell IN predicate prunes whole buckets at the scan
  * (SelectedBucketsCount) and the probe join streams the index side
  * with NO exchange (the query side is broadcast), which is the whole
  * point at 10⁹ vectors: per-query index I/O ∝ probed buckets, corpus
  * never shuffles. */
class AdcIndexSpec extends AnyFunSuite {

  lazy implicit val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  private def withPlanConfs[A](f: => A): A = {
    val aqe = spark.conf.get("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try f
    finally spark.conf.set("spark.sql.adaptive.enabled", aqe)
  }

  private lazy val table: String = {
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.001")
    val index = Similarity.buildAdcIndex(emb, IvfCentroids.Centroids16,
      PqCodebooks.Codebooks8x16, 8)
    val dir = java.nio.file.Files.createTempDirectory("adc_tbl").toString
    Similarity.writeAdcIndexBucketed(index, "adc_index_bucketed",
      buckets = 8, path = Some(s"$dir/adc_index_bucketed"))
    "adc_index_bucketed"
  }

  private def queries = Tables.embeddings(spark, "/root/testdata/sf0.001")
    .filter(pmod($"vec_id", lit(200L)) === 0)
    .select($"vec_id".as("query_id"), $"embedding")

  test("pruned search over the bucketed index: bucket pruning + no exchange on the index side") {
    withPlanConfs {
      val res = Similarity.ivfAdcSearchPruned(queries, spark.table(table),
        IvfCentroids.Centroids16, PqCodebooks.Codebooks8x16, 8,
        nProbe = 2, k = 3)
      val plan = res.queryExecution.executedPlan
      // the index scan: bucket pruning must have selected a strict
      // subset of the 8 buckets (3 queries × 2 probes ≤ 6 cells)
      val scans = plan.collect { case s: FileSourceScanExec => s }
        .filter(_.metadata.get("Location").exists(_.contains("adc_index_bucketed")))
      assert(scans.size == 1, plan.toString.take(3000))
      val sel = scans.head.metadata.get("SelectedBucketsCount")
      assert(sel.isDefined, s"no bucket pruning in: ${scans.head.metadata}")
      val m = "(\\d+) out of (\\d+)".r.findFirstMatchIn(sel.get)
      assert(m.isDefined && m.get.group(1).toInt < m.get.group(2).toInt,
        s"expected pruned buckets, got $sel")
      // the probe join: index is the STREAMED side of a broadcast hash
      // join, and nothing between the bucketed scan and the join
      // shuffles it
      val bhj = plan.collect { case j: BroadcastHashJoinExec => j }
        .filter(_.leftKeys.exists(_.toString.contains("cell")))
      assert(bhj.size == 1, plan.toString.take(3000))
      val streamed = bhj.head.left
      assert(streamed.collect { case e: ShuffleExchangeExec => e }.isEmpty,
        streamed.toString.take(3000))
      assert(streamed.collect { case s: FileSourceScanExec => s }
        .exists(_.metadata.get("Location").exists(_.contains("adc_index_bucketed"))),
        streamed.toString.take(3000))
    }
  }

  test("pruned persisted search returns the same rows as the in-memory search") {
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.001")
    val inMem = Similarity.ivfAdcSearchAgainst(queries,
        Similarity.buildAdcIndex(emb, IvfCentroids.Centroids16,
          PqCodebooks.Codebooks8x16, 8),
        IvfCentroids.Centroids16, PqCodebooks.Codebooks8x16, 8,
        nProbe = 2, k = 3)
      .select("query_id", "neighbor_id", "rank", "dist")
      .as[(Long, Long, Int, Double)].collect().toSet
    val persisted = Similarity.ivfAdcSearchPruned(queries, spark.table(table),
        IvfCentroids.Centroids16, PqCodebooks.Codebooks8x16, 8,
        nProbe = 2, k = 3)
      .select("query_id", "neighbor_id", "rank", "dist")
      .as[(Long, Long, Int, Double)].collect().toSet
    assert(persisted == inMem)
    assert(persisted.nonEmpty)
  }

  test("append -> compact: pruned search identical; bucket pruning + no-exchange preserved") {
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.001")
    // base = first half of the corpus, increment = the rest (the daily
    // append), both encoded against the SAME pinned artifacts
    val base = emb.filter($"vec_id" < 1000L)
    val incr = emb.filter($"vec_id" >= 1000L)
    val baseIdx = Similarity.buildAdcIndex(base, IvfCentroids.Centroids16,
      PqCodebooks.Codebooks8x16, 8)
    val incrIdx = Similarity.buildAdcIndex(incr, IvfCentroids.Centroids16,
      PqCodebooks.Codebooks8x16, 8)
    val dir = java.nio.file.Files.createTempDirectory("adc_cmp").toString
    Similarity.writeAdcIndexBucketed(baseIdx, "adc_cmp_base",
      buckets = 8, path = Some(s"$dir/base"))
    // pre-compaction truth: persisted base unioned with the in-memory
    // increment at read time (what a deployment serves mid-window)
    val preCompact = Similarity.ivfAdcSearchPruned(queries,
        spark.table("adc_cmp_base").unionByName(incrIdx),
        IvfCentroids.Centroids16, PqCodebooks.Codebooks8x16, 8,
        nProbe = 2, k = 3)
      .select("query_id", "neighbor_id", "rank", "dist")
      .as[(Long, Long, Int, Double)].collect().toSet
    // compact-per-window: union re-bucketed into a versioned table
    Similarity.compactAdcIndexBucketed(spark, "adc_cmp_base", incrIdx,
      "adc_cmp_v2", buckets = 8, path = Some(s"$dir/v2"))
    // row identity: the compacted table IS base + increment
    val compactRows = spark.table("adc_cmp_v2")
      .select("vec_id", "cell", "codes")
      .as[(Long, Int, Seq[Int])].collect().toSet
    val expectRows = baseIdx.unionByName(incrIdx)
      .select("vec_id", "cell", "codes")
      .as[(Long, Int, Seq[Int])].collect().toSet
    assert(compactRows == expectRows)
    // search parity with the pre-compaction view
    val postCompact = Similarity.ivfAdcSearchPruned(queries,
        spark.table("adc_cmp_v2"),
        IvfCentroids.Centroids16, PqCodebooks.Codebooks8x16, 8,
        nProbe = 2, k = 3)
      .select("query_id", "neighbor_id", "rank", "dist")
      .as[(Long, Long, Int, Double)].collect().toSet
    assert(postCompact == preCompact && postCompact.nonEmpty)
    // and the compacted table keeps the bucketed-layout plan wins
    withPlanConfs {
      val res = Similarity.ivfAdcSearchPruned(queries,
        spark.table("adc_cmp_v2"),
        IvfCentroids.Centroids16, PqCodebooks.Codebooks8x16, 8,
        nProbe = 2, k = 3)
      val plan = res.queryExecution.executedPlan
      val scans = plan.collect { case s: FileSourceScanExec => s }
        .filter(_.metadata.get("Location").exists(_.contains("v2")))
      assert(scans.size == 1, plan.toString.take(3000))
      val sel = scans.head.metadata.get("SelectedBucketsCount")
      val m = sel.flatMap("(\\d+) out of (\\d+)".r.findFirstMatchIn)
      assert(m.isDefined && m.get.group(1).toInt < m.get.group(2).toInt,
        s"expected pruned buckets on the compacted table, got $sel")
      val bhj = plan.collect { case j: BroadcastHashJoinExec => j }
        .filter(_.leftKeys.exists(_.toString.contains("cell")))
      assert(bhj.size == 1 && bhj.head.left.collect {
        case e: ShuffleExchangeExec => e }.isEmpty,
        plan.toString.take(3000))
    }
    spark.sql("DROP TABLE IF EXISTS adc_cmp_base")
    spark.sql("DROP TABLE IF EXISTS adc_cmp_v2")
  }

  test("pruned search dispatches to the residual engine too") {
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.001")
    val rIndex = Similarity.buildResidualAdcIndex(emb,
      IvfCentroids.Centroids16, PqCodebooks.ResidualCodebooks8x16, 8)
    val direct = Similarity.ivfAdcResidualSearchAgainst(queries, rIndex,
        IvfCentroids.Centroids16, PqCodebooks.ResidualCodebooks8x16, 8,
        nProbe = 2, k = 3)
      .select("query_id", "neighbor_id", "rank")
      .as[(Long, Long, Int)].collect().toSet
    val pruned = Similarity.ivfAdcSearchPruned(queries, rIndex,
        IvfCentroids.Centroids16, PqCodebooks.ResidualCodebooks8x16, 8,
        nProbe = 2, k = 3, residual = true)
      .select("query_id", "neighbor_id", "rank")
      .as[(Long, Long, Int)].collect().toSet
    assert(pruned == direct && pruned.nonEmpty)
  }
}
