package graft.serve

import java.time.{Instant, LocalDate, ZoneId, ZonedDateTime}
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Zone-aware time bucketing + tick generation — the reference's
  * `roundTimestampTo{Day,Week,Month,Quarter}` SQL functions
  * (`server/src/java/com/linkedin/whiteelephant/TimeZoneConversion.java:23-83`)
  * and per-unit tick ranges (`server/app/usage_data.rb:291-440`).
  *
  * Semantics preserved exactly:
  *  - truncation happens in the query's IANA zone, result is the UTC
  *    instant of the local bucket start;
  *  - weeks start SUNDAY (`TimeZoneConversion.java:43`) — Spark's
  *    `date_trunc('week')` is Monday-based, so week truncation uses a
  *    dayofweek shift;
  *  - HOURS ticks floor the *requested* (untruncated) range
  *    (`usage_data.rb:315-324` — quirk preserved);
  *  - DAYS drops the partial first+last day (`:330-331`); WEEKS rounds
  *    both ends to Sunday then shrinks one week per side (`:354-358`);
  *    MONTHS shrinks one month per side (`:380-381`); QUARTERS rounds
  *    to quarter starts and drops the last quarter (`:405-415`).
  */
object TimeBuckets {

  val Units = Seq("HOURS", "DAYS", "WEEKS", "MONTHS", "QUARTERS")

  /** Bucket an epoch-ms column to its unit start in `zone`; returns
    * epoch ms. Built from codegen'd built-ins (`from_utc_timestamp` /
    * `date_trunc` composition) — no UDF. */
  def bucket(tsMs: Column, unit: String, zone: String): Column = unit match {
    case "HOURS" =>
      // fact rows are already hour-grain UTC; hour floor is zone-free
      // ("already rounded to hours by Hadoop jobs", usage_data.rb:546)
      (tsMs.cast("long") / 3600000L).cast("long") * 3600000L
    case _ =>
      val local = from_utc_timestamp(timestamp_millis(tsMs), zone)
      val localBucket = unit match {
        case "DAYS"   => date_trunc("day", local)
        case "MONTHS" => date_trunc("month", local)
        case "QUARTERS" => date_trunc("quarter", local)
        case "WEEKS" =>
          // Sunday-based week (Spark weeks start Monday)
          val d = to_date(local)
          date_sub(d, dayofweek(d) - 1).cast("timestamp")
        case u => throw new IllegalArgumentException(s"bad unit: $u")
      }
      unix_millis(to_utc_timestamp(localBucket, zone))
  }

  /** Driver-side tick generation (`usage_data.rb:291-440`): the dense
    * time spine the serving layer densifies onto. `startMs`/`endMs` are
    * the requested range; `minMs`/`maxMs` the cluster's data bounds. */
  def ticks(unit: String, zone: String, startMs: Long, endMs: Long,
      minMs: Long, maxMs: Long): Seq[Long] = {
    val tz = ZoneId.of(zone)
    def localDate(ms: Long): LocalDate =
      ZonedDateTime.ofInstant(Instant.ofEpochMilli(ms), tz).toLocalDate
    def toUtcMs(d: LocalDate): Long =
      d.atStartOfDay(tz).toInstant.toEpochMilli
    // range truncated to data bounds (usage_data.rb:303-307)
    val localStart = localDate(math.max(startMs, minMs))
    val localEnd = localDate(math.min(endMs, maxMs))
    unit match {
      case "HOURS" =>
        // floors the REQUESTED range, not the truncated one (:315-324)
        val step = 3600000L
        val lo = math.floorDiv(startMs, step) * step
        val hi = math.floorDiv(endMs, step) * step
        (lo to hi by step)
      case "DAYS" =>
        val s = localStart.plusDays(1)
        val e = localEnd.minusDays(1)
        Iterator.iterate(s)(_.plusDays(1)).takeWhile(!_.isAfter(e))
          .map(toUtcMs).toSeq
      case "WEEKS" =>
        // round to Sunday (wday: SUNDAY=7 in java.time, reference uses
        // wday 0=Sunday), then shrink one week per side (:348-358)
        def toSunday(d: LocalDate) =
          d.minusDays(d.getDayOfWeek.getValue % 7)
        val s = toSunday(localStart).plusWeeks(1)
        val e = toSunday(localEnd).minusWeeks(1)
        Iterator.iterate(s)(_.plusWeeks(1)).takeWhile(!_.isAfter(e))
          .map(toUtcMs).toSeq
      case "MONTHS" =>
        val s = localStart.withDayOfMonth(1).plusMonths(1)
        val e = localEnd.withDayOfMonth(1).minusMonths(1)
        Iterator.iterate(s)(_.plusMonths(1)).takeWhile(!_.isAfter(e))
          .map(toUtcMs).toSeq
      case "QUARTERS" =>
        def toQuarter(d: LocalDate) =
          d.withDayOfMonth(1).minusMonths((d.getMonthValue - 1) % 3)
        val s = toQuarter(localStart)
        val e = toQuarter(localEnd).minusMonths(3)
        Iterator.iterate(s)(_.plusMonths(3)).takeWhile(!_.isAfter(e))
          .map(toUtcMs).toSeq
      case u => throw new IllegalArgumentException(s"bad unit: $u")
    }
  }
}
