package graft.operators

import org.apache.spark.sql.DataFrame

/** Input-parallelism guard for index-building operators.
  *
  * Operators that materialize an expensive derived table (minhash
  * signatures, gram indexes, IVF assignments) inherit the INPUT's
  * partitioning — and a small-file input (one parquet file under
  * `maxPartitionBytes`) arrives as a single partition, so the whole
  * hash pipeline and columnar cache build run on one core while 31
  * idle (measured 6× on the q68 gram index: 6.5 s → 1.1 s). AQE cannot
  * help: it only re-plans after a shuffle, and a narrow scan→project
  * pipeline has none.
  *
  * `widen` round-robins the input up to the session's default
  * parallelism ONLY when the input has fewer partitions — at
  * production scale (thousands of input splits) it is a no-op, so the
  * extra shuffle is paid exactly when it is cheap (input small enough
  * to arrive under-split) and skipped when it would hurt (100 TB of
  * well-split files). */
object Parallelism {
  def widen(df: DataFrame): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < target) df.repartition(target) else df
  }
}
