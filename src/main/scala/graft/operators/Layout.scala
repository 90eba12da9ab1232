package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton-curve) data layout: co-locate rows that are close
  * in SEVERAL dimensions at once, so parquet min/max row-group stats
  * prune multi-dimensional box predicates — the standard layout tool
  * when a 100 TB fact table is filtered by more than one column and a
  * single sort key can only serve one of them (a table sorted by x
  * prunes x-filters perfectly and y-filters not at all; the z-curve
  * prunes both at ~√ the single-key rate).
  *
  * The z-value is computed with plain codegen'd bit arithmetic
  * (shift/and/or folds — no UDF), the layout is one
  * `repartitionByRange` + in-partition sort on it (a single range
  * shuffle, the same cost as any global sort), and the helper column
  * is dropped before the data lands. Bucketing normalizes each
  * dimension to `bits`-bit rank space from its min/max (one tiny
  * aggregate; for incremental loads reuse the previous bounds — the
  * curve does not need exact quantiles, only monotone buckets).
  */
object Layout {

  /** Interleave the low `bits` bits of `x` (even positions) and `y`
    * (odd positions) — the 2-D Morton code, 2·`bits` result bits. */
  def mortonInterleave(x: Column, y: Column, bits: Int): Column = {
    require(bits >= 1 && bits <= 31, "1..31 bits per dimension")
    (0 until bits).foldLeft(lit(0L)) { (acc, i) =>
      acc
        .bitwiseOR(shiftleft(shiftright(x, i).bitwiseAND(lit(1L)), 2 * i))
        .bitwiseOR(shiftleft(shiftright(y, i).bitwiseAND(lit(1L)), 2 * i + 1))
    }
  }

  /** Scale a numeric column to the [0, 2^bits) bucket space of the
    * [lo, hi] range (double intermediate — layout bucketing needs
    * monotonicity, not exactness; the ops are IEEE-deterministic, so
    * the curve IS exactly reproducible cross-engine, see q61). */
  def rangeBucket(c: Column, lo: Column, hi: Column, bits: Int): Column =
    when(hi <= lo, lit(0L)).otherwise(least(
      ((c - lo).cast("double") / (hi.cast("double") - lo + 1) *
        (1L << bits)).cast("long"),
      lit((1L << bits) - 1)))

  def rangeBucket(c: Column, lo: Long, hi: Long, bits: Int): Column =
    rangeBucket(c, lit(lo), lit(hi), bits)

  /** Re-lay `df` along the 2-D z-curve of two long columns into
    * `numFiles` range partitions, each internally sorted by z-value.
    * The min/max bounds aggregate is the only driver-side data (4
    * scalars). Output schema = input schema (the `_zorder` helper is
    * dropped; the physical row order carries the layout). */
  def zorder(df: DataFrame, xCol: String, yCol: String, bits: Int,
      numFiles: Int): DataFrame = {
    val r = df.agg(
      min(xCol).cast("long"), max(xCol).cast("long"),
      min(yCol).cast("long"), max(yCol).cast("long")).first()
    val z = mortonInterleave(
      rangeBucket(col(xCol), r.getLong(0), r.getLong(1), bits),
      rangeBucket(col(yCol), r.getLong(2), r.getLong(3), bits), bits)
    df.withColumn("_zorder", z)
      .repartitionByRange(numFiles, col("_zorder"))
      .sortWithinPartitions("_zorder")
      .drop("_zorder")
  }

  /** Per-file (min, max) envelope of two columns for a parquet
    * directory — the same statistics parquet row-group pruning uses,
    * surfaced as a DataFrame so layouts can be compared and tested.
    * Output: file, x_min, x_max, y_min, y_max. */
  def fileEnvelopes(df: DataFrame, xCol: String, yCol: String): DataFrame =
    df.groupBy(input_file_name().as("file"))
      .agg(min(xCol).as("x_min"), max(xCol).as("x_max"),
        min(yCol).as("y_min"), max(yCol).as("y_max"))

  /** Small-file compaction — the table-maintenance pass every
    * long-lived lake table needs: streaming/incremental writers leave
    * thousands of KB-sized files per partition dir, and at 100 TB the
    * scan cost becomes task scheduling and footer reads instead of IO.
    * Rewrites a parquet-backed DataFrame to ~`targetBytes` files.
    *
    * Sizing uses the table's actual on-disk bytes (the compressed
    * parquet footprint — one filesystem listing, no data read).
    * Unpartitioned tables round-robin into ⌈bytes/target⌉ files — no
    * key skew can recreate the small files. Partitioned tables are
    * sized PER PARTITION DIRECTORY: each input file carries its dir's
    * ⌈dirBytes/target⌉ salt modulus (a broadcast file→modulus map
    * joined on `input_file_name()`), and the shuffle keys on
    * (partition cols, salt) — so a dir with 3 GB gets 3 files and a
    * dir with 10 KB gets exactly 1, instead of every task writing a
    * sliver into every dir. Dynamic partition overwrite keeps the
    * rewrite idempotent and safe to run over a subset of a live
    * table's history.
    *
    * Returns (filesBefore, filesAfter) observed on disk. */
  def compact(df: DataFrame, outDir: String, targetBytes: Long,
      partitionCols: Seq[String] = Nil): (Long, Long) = {
    val spark = df.sparkSession
    import spark.implicits._
    val conf = spark.sparkContext.hadoopConfiguration
    def fileLen(f: String): Long = {
      val p = new org.apache.hadoop.fs.Path(f)
      p.getFileSystem(conf).getFileStatus(p).getLen
    }
    def countOut(dir: String): Long = {
      val p = new org.apache.hadoop.fs.Path(dir)
      val fs = p.getFileSystem(conf)
      if (!fs.exists(p)) 0L
      else {
        val it = fs.listFiles(p, true)
        var n = 0L
        while (it.hasNext)
          if (it.next().getPath.getName.endsWith(".parquet")) n += 1
        n
      }
    }
    val inFiles = df.inputFiles
    val before = inFiles.length.toLong
    val nFiles = (bytes: Long) =>
      math.max(1L, (bytes + targetBytes - 1) / targetBytes)
    val compacted =
      if (partitionCols.isEmpty) {
        val total = inFiles.map(fileLen).sum
        df.repartition(nFiles(total).toInt)
      } else {
        val parentOf = (f: String) => f.substring(0, f.lastIndexOf('/'))
        val dirBytes = inFiles.groupBy(parentOf)
          .view.mapValues(_.map(fileLen).sum).toMap
        val saltMod = inFiles.toSeq
          .map(f => (f, nFiles(dirBytes(parentOf(f)))))
          .toDF("_file", "_mod")
        // Salt is a DETERMINISTIC function of the row's own values: a
        // retried/speculated upstream task reproduces the same salts, so
        // the hash shuffle can't silently drop or duplicate rows the way
        // a monotonically_increasing_id-derived key can (SPARK-23207).
        // Identical rows share a salt — fine for layout (worst case a
        // slightly fuller file), fatal is what we're avoiding.
        val rowHash = xxhash64(df.columns.toIndexedSeq.map(col): _*)
        df.withColumn("_file", input_file_name())
          // left join: rows not traceable to an input file (derived
          // frames, non-file sources report "") keep flowing with
          // modulus 1 (salt 0) instead of being dropped pre-overwrite
          .join(broadcast(saltMod), Seq("_file"), "left")
          .withColumn("_salt", pmod(rowHash, coalesce(col("_mod"), lit(1L))))
          .repartition(partitionCols.map(col) :+ col("_salt"): _*)
          .drop("_file", "_mod", "_salt")
      }
    val writer = compacted.write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
    (if (partitionCols.nonEmpty) writer.partitionBy(partitionCols: _*)
     else writer).parquet(outDir)
    (before, countOut(outDir))
  }
}
