package graft.serve

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Thin DataFrame wrapper with the reference Cube's operator names
  * (`server/app/cube.rb:17-256`) so serving code reads like the
  * original: an N-dimensional additive aggregate navigated by
  * filter / roll-up / slice.
  *
  * The "cube" is just (dims, measures) over a DataFrame — every op is
  * a Catalyst-optimized filter/groupBy, nothing materialized until an
  * action. `aggregate!`'s additive merge (`cube.rb:61-78`) is `sum`.
  */
final case class UsageCube(df: DataFrame, dims: Seq[String], measures: Seq[String]) {

  private def summed(frame: DataFrame, by: Seq[String]): DataFrame =
    frame.groupBy(by.map(col): _*)
      .agg(measures.map(m => sum(m).as(m)).head,
        measures.map(m => sum(m).as(m)).tail: _*)

  /** `filter_on(dim, values)` (`cube.rb:98-109`). */
  def filterOn(dim: String, values: Seq[Any]): UsageCube =
    copy(df = df.filter(col(dim).isin(values: _*)))

  /** `collapse_on(dim)` — drop a dimension, re-aggregate
    * (`cube.rb:125-138`). */
  def collapseOn(dim: String): UsageCube = {
    val rest = dims.filterNot(_ == dim)
    UsageCube(summed(df, rest), rest, measures)
  }

  /** `aggregate_on(dim, f)` — remap a dimension through a column
    * function then re-aggregate (`cube.rb:112-122`). */
  def aggregateOn(dim: String, f: Column => Column): UsageCube =
    UsageCube(summed(df.withColumn(dim, f(col(dim))), dims), dims, measures)

  /** `slice(value…)` — point-lookup on the leading dimension
    * (`cube.rb:144-153`). */
  def slice(dim: String, value: Any): UsageCube = {
    val rest = dims.filterNot(_ == dim)
    UsageCube(df.filter(col(dim) === value).drop(dim), rest, measures)
  }

  /** Materialized additive aggregate at the cube's grain. */
  def build: DataFrame = summed(df, dims)
}
