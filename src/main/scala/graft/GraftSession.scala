package graft

import org.apache.spark.sql.SparkSession

/** Library entry point: a SparkSession tuned for the engine, with the
  * graft SQL functions registered. Mirrors the knobs the reference set
  * operationally (shuffle sizing ↔ its reducer heuristics, AQE ↔ its
  * per-input-size reducer math, UTC ↔ its GMT hour bucketing).
  */
object GraftSession {

  def builder(appName: String = "graft",
      cores: Int = Runtime.getRuntime.availableProcessors): SparkSession.Builder =
    SparkSession.builder()
      .appName(appName)
      // spark-submit injects spark.master; default to local otherwise
      .config("spark.master",
        sys.props.getOrElse("spark.master", s"local[$cores]"))
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.files.maxPartitionBytes", "128m")
      // many small history-log files per day-partition: treat opens as
      // cheap so they pack into few tasks (the reference's 100 MB
      // CombineFileInputFormat splits, base.properties:39-40)
      .config("spark.sql.files.openCostInBytes", "1m")
      // shuffle/spill codec, env-tunable: lz4 (default) optimizes CPU;
      // zstd buys ~25% on the candidate-stream shuffles whose BYTES are
      // the binding constraint when a data-quadratic campaign runs on
      // one machine's disk (at fleet scale the same knob trades shuffle
      // network for codec CPU — a standard large-shuffle lever)
      .config("spark.io.compression.codec",
        sys.env.getOrElse("SPARK_GRAFT_SHUFFLE_CODEC", "lz4"))

  /** Build (or reuse) the session and register SQL functions plus the
    * range-join rewrite rule (idempotent). */
  def create(appName: String = "graft"): SparkSession = {
    val spark = builder(appName).getOrCreate()
    functions.GraftFunctions.register(spark)
    if (!spark.experimental.extraOptimizations.contains(plans.RangeJoinRewrite))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ plans.RangeJoinRewrite
    spark
  }
}
