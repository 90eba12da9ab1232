package graft.serve

/** The serving layer's query-type catalog — the reference's 23 types
  * (`server/app/usage_data.rb:140-266`): each type is a (filters,
  * measure) pair over the usage fact. Measures are always summed;
  * missing ticks densify to the measure's default
  * (`usage_data.rb:268-277`).
  */
final case class QueryType(
    name: String,
    measure: String,
    taskType: Option[String] = None,
    status: Option[String] = None,
    excess: Option[Boolean] = None) {
  /** Measure default for densification (0.0 for minute measures,
    * 0 for counters — `usage_data.rb:268-277`). */
  def defaultValue: Double = 0.0
}

object QueryType {
  private def t(name: String, measure: String,
      taskType: String = null, status: String = null,
      excess: java.lang.Boolean = null) =
    name -> QueryType(name, measure, Option(taskType), Option(status),
      Option(excess).map(_.booleanValue))

  /** All 23 types (`usage_data.rb:144-266`). */
  val All: Map[String, QueryType] = Map(
    t("minutesTotal", "elapsedMinutes"),
    t("minutesMap", "elapsedMinutes", taskType = "MAP"),
    t("minutesReduce", "elapsedMinutes", taskType = "REDUCE"),
    t("minutesExcessTotal", "elapsedMinutes", excess = true),
    t("minutesExcessMap", "elapsedMinutes", taskType = "MAP", excess = true),
    t("minutesExcessReduce", "elapsedMinutes", taskType = "REDUCE", excess = true),
    t("minutesSuccess", "elapsedMinutes", status = "SUCCESS"),
    t("minutesKilled", "elapsedMinutes", status = "KILLED"),
    t("minutesFailed", "elapsedMinutes", status = "FAILED"),
    t("cpuTotal", "cpuMinutes"),
    t("reduceShuffleBytes", "reduceShuffleBytes", taskType = "REDUCE"),
    t("totalStarted", "started"),
    t("successStarted", "started", status = "SUCCESS"),
    t("failedStarted", "started", status = "FAILED"),
    t("killedStarted", "started", status = "KILLED"),
    t("mapStarted", "started", taskType = "MAP"),
    t("reduceStarted", "started", taskType = "REDUCE"),
    t("totalFinished", "finished"),
    t("successFinished", "finished", status = "SUCCESS"),
    t("failedFinished", "finished", status = "FAILED"),
    t("killedFinished", "finished", status = "KILLED"),
    t("mapFinished", "finished", taskType = "MAP"),
    t("reduceFinished", "finished", taskType = "REDUCE"))
}
