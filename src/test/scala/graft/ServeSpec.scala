package graft

import graft.serve.{QueryType, TimeBuckets, UsageCube, UsageQueries}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class ServeSpec extends AnyFunSuite {

  lazy implicit val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  val H = 3600000L
  val D = 86400000L

  // Jan 2024, UTC. 2024-01-01 is a Monday; 2024-01-07 a Sunday.
  val jan1 = 1704067200000L

  def mkFact(rows: Seq[(String, Long, String, Boolean, String, String, Int, Int, Double)]) =
    rows.toDF("user", "time", "cluster", "excess", "taskType", "status",
      "started", "finished", "elapsedMinutes")
      .withColumn("cpuMinutes", col("elapsedMinutes") / 2)
      .withColumn("reduceShuffleBytes",
        when(col("taskType") === "REDUCE", 1024L))

  // c1 data spans jan2 10:00 .. jan5 02:00 → DAYS ticks = jan3, jan4
  // (partial first/last days dropped after truncation to data bounds)
  val fact = mkFact(Seq(
    ("alice", jan1 + 1 * D + 10 * H, "c1", false, "MAP", "SUCCESS", 1, 1, 30.0),
    ("alice", jan1 + 1 * D + 11 * H, "c1", false, "MAP", "SUCCESS", 1, 1, 60.0),
    ("alice", jan1 + 2 * D + 3 * H, "c1", true, "REDUCE", "KILLED", 1, 0, 10.0),
    ("bob", jan1 + 2 * D + 5 * H, "c1", false, "REDUCE", "FAILED", 2, 2, 5.0),
    ("bob", jan1 + 4 * D + 2 * H, "c1", false, "MAP", "SUCCESS", 1, 1, 7.0),
    ("alice", jan1 + 1 * D, "c2", false, "MAP", "SUCCESS", 1, 1, 99.0)))

  test("clusters/users/timeBounds") {
    assert(UsageQueries.clusters(fact) == Seq("c1", "c2"))
    assert(UsageQueries.users(fact, "c1") == Seq("alice", "bob"))
    val (lo, hi) = UsageQueries.timeBounds(fact, "c1")
    assert(lo == jan1 + 1 * D + 10 * H && hi == jan1 + 4 * D + 2 * H)
  }

  test("query type filters: minutesExcessTotal only counts excess rows") {
    val qt = QueryType.All("minutesExcessTotal")
    val r = UsageQueries.aggregated(fact, "c1", qt, "DAYS", "UTC")
      .agg(sum("value")).head().getDouble(0)
    assert(r == 10.0)
  }

  test("all 23 query types execute") {
    QueryType.All.values.foreach { qt =>
      UsageQueries.aggregated(fact, "c1", qt, "DAYS", "UTC").collect()
    }
  }

  test("DAYS ticks drop partial first and last day") {
    // data spans jan2..jan3; range = data bounds → ticks = [jan3] only
    // (start next_day → jan3... wait: localStart=jan2 → +1d = jan3;
    //  localEnd=jan3 → -1d = jan2 → empty? No: start jan2 10:00 →
    //  date jan2 → next=jan3; end jan3 05:00 → date jan3 → prev=jan2;
    //  jan3 > jan2 ⇒ empty tick list — the reference's behavior for
    //  a 2-day window.
    val t = TimeBuckets.ticks("DAYS", "UTC",
      jan1 + 1 * D + 10 * H, jan1 + 2 * D + 5 * H,
      jan1 + 1 * D + 10 * H, jan1 + 2 * D + 5 * H)
    assert(t.isEmpty)
    // 5-day window → 3 interior days
    val t2 = TimeBuckets.ticks("DAYS", "UTC",
      jan1, jan1 + 4 * D, jan1, jan1 + 4 * D)
    assert(t2 == Seq(jan1 + 1 * D, jan1 + 2 * D, jan1 + 3 * D))
  }

  test("HOURS ticks floor the REQUESTED range (quirk)") {
    val t = TimeBuckets.ticks("HOURS", "UTC",
      jan1 + 30 * 60000L, jan1 + 2 * H + 1,
      jan1 + H, jan1 + H) // data bounds narrower — ignored for HOURS
    assert(t == Seq(jan1, jan1 + H, jan1 + 2 * H))
  }

  test("WEEKS ticks: Sunday-based, shrink one week per side") {
    // range: Mon jan1 .. Sun jan28 (4 weeks)
    val t = TimeBuckets.ticks("WEEKS", "UTC",
      jan1, jan1 + 27 * D, jan1, jan1 + 27 * D)
    // localStart Mon jan1 → sunday = dec31; +1w = jan7
    // localEnd Sun jan28 → sunday = jan28; -1w = jan21
    val jan7 = jan1 + 6 * D
    assert(t == Seq(jan7, jan7 + 7 * D, jan7 + 14 * D))
    t.foreach { ms =>
      val d = java.time.Instant.ofEpochMilli(ms)
        .atZone(java.time.ZoneId.of("UTC")).toLocalDate
      assert(d.getDayOfWeek == java.time.DayOfWeek.SUNDAY)
    }
  }

  test("zone-aware bucketing across a DST transition") {
    // America/Los_Angeles spring-forward 2024-03-10
    val zone = "America/Los_Angeles"
    val mar10_10utc = 1710064800000L // 2024-03-10 10:00 UTC = 03:00 PDT
    val bucketed = Seq(mar10_10utc).toDF("t")
      .select(TimeBuckets.bucket(col("t"), "DAYS", zone).as("b"))
      .head().getLong(0)
    // local day start 2024-03-10 00:00 PST = 08:00 UTC
    assert(bucketed == 1710057600000L)
    // week bucket: 2024-03-10 IS a Sunday → week start = same local day
    val wb = Seq(mar10_10utc).toDF("t")
      .select(TimeBuckets.bucket(col("t"), "WEEKS", zone).as("b"))
      .head().getLong(0)
    assert(wb == 1710057600000L)
  }

  test("Sunday-week + day buckets across BOTH Santiago DST transitions") {
    // Southern-hemisphere zone whose transitions happen AT local
    // midnight: DST ends Sun 2024-04-07 (00:00 → 23:00 Sat, repeated
    // hour) and starts Sun 2024-09-08 (00:00 → 01:00, the week-start
    // midnight itself DOES NOT EXIST). Expected values are computed
    // with java.time's first-valid-instant resolution — verified
    // equal to the DuckDB oracle formula (q30 family) on the same
    // points, so the two engines agree on the gap Sunday too.
    import java.time._
    val zone = "America/Santiago"
    val tz = ZoneId.of(zone)
    def expectedWeek(ms: Long): Long = {
      val d = Instant.ofEpochMilli(ms).atZone(tz).toLocalDate
      val sunday = d.minusDays(d.getDayOfWeek.getValue % 7)
      sunday.atStartOfDay(tz).toInstant.toEpochMilli // gap-safe
    }
    def expectedDay(ms: Long): Long = {
      val d = Instant.ofEpochMilli(ms).atZone(tz).toLocalDate
      d.atStartOfDay(tz).toInstant.toEpochMilli
    }
    // ±2 weeks around each transition, several local hours incl. the
    // edges of the repeated/missing hour
    val samples = for {
      start <- Seq(LocalDate.of(2024, 3, 24), LocalDate.of(2024, 8, 25))
      day <- 0 until 28
      hourMs <- Seq(0L, 1800000L, 3 * H, 12 * H, 23 * H + 1800000L)
    } yield start.atStartOfDay(tz).toInstant.toEpochMilli + day * D + hourMs
    val df = samples.toDF("t").select(col("t"),
      TimeBuckets.bucket(col("t"), "WEEKS", zone).as("wk"),
      TimeBuckets.bucket(col("t"), "DAYS", zone).as("dy"))
    df.collect().foreach { r =>
      val t = r.getLong(0)
      assert(r.getLong(1) == expectedWeek(t),
        s"week mismatch at ${Instant.ofEpochMilli(t)}")
      assert(r.getLong(2) == expectedDay(t),
        s"day mismatch at ${Instant.ofEpochMilli(t)}")
      // the week bucket is always a local Sunday at the first valid
      // local instant of that date
      val wkLocal = Instant.ofEpochMilli(r.getLong(1)).atZone(tz)
      assert(wkLocal.getDayOfWeek == DayOfWeek.SUNDAY)
      assert(wkLocal.toLocalDate.atStartOfDay(tz).toInstant.toEpochMilli
        == r.getLong(1))
    }
    // WEEKS ticks around the gap transition stay Sunday-anchored and
    // 1-week-spaced in LOCAL time (168h ± the 1h DST shift in UTC)
    val s = LocalDate.of(2024, 8, 25).atStartOfDay(tz).toInstant.toEpochMilli
    val e = LocalDate.of(2024, 9, 22).atStartOfDay(tz).toInstant.toEpochMilli
    val ticks = TimeBuckets.ticks("WEEKS", zone, s, e, s, e)
    assert(ticks.nonEmpty)
    ticks.foreach { ms =>
      val z = Instant.ofEpochMilli(ms).atZone(tz)
      assert(z.getDayOfWeek == DayOfWeek.SUNDAY, z.toString)
    }
    ticks.sliding(2).foreach {
      case Seq(a, b) =>
        val weekH = (b - a) / 3600000L
        assert(weekH == 167L || weekH == 168L || weekH == 169L, s"$a -> $b")
      case _ => ()
    }
  }

  test("perUserSeries densifies with defaults") {
    val qt = QueryType.All("minutesTotal")
    val series = UsageQueries.perUserSeries(
      fact, "c1", Seq("alice", "bob"), qt, "DAYS", "UTC",
      jan1, jan1 + 5 * D).collect()
    // ticks jan3..jan4 (2) × 2 users
    assert(series.length == 4)
    val m = series.map(r => (r.getString(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(m(("alice", jan1 + 2 * D)) == 10.0)
    assert(m(("alice", jan1 + 3 * D)) == 0.0) // densified default
    assert(m(("bob", jan1 + 2 * D)) == 5.0)
    assert(m(("bob", jan1 + 3 * D)) == 0.0)
  }

  test("aggregatedSeries collapses the user dimension") {
    val qt = QueryType.All("minutesTotal")
    val series = UsageQueries.aggregatedSeries(
      fact, "c1", Seq("alice", "bob"), qt, "DAYS", "UTC",
      jan1, jan1 + 5 * D).collect()
    val m = series.map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(m(jan1 + 2 * D) == 15.0) // alice 10 + bob 5
    assert(m(jan1 + 3 * D) == 0.0)
  }

  test("exportTable pivots users and scales minutes to hours") {
    val qt = QueryType.All("minutesTotal")
    val table = UsageQueries.exportTable(
      fact, "c1", Seq("alice", "bob"), qt, "DAYS", "UTC",
      jan1, jan1 + 5 * D)
    val row = table.filter(col("tick") === (jan1 + 2 * D)).head()
    assert(row.getDouble(row.fieldIndex("alice")) == 10.0 / 60.0)
    assert(row.getDouble(row.fieldIndex("bob")) == 5.0 / 60.0)
  }

  test("exportTable divides counter measures by 60 too (QUIRK 11, app.rb:152)") {
    val qt = QueryType.All("totalStarted")
    val table = UsageQueries.exportTable(
      fact, "c1", Seq("alice", "bob"), qt, "DAYS", "UTC",
      jan1, jan1 + 5 * D)
    val row = table.filter(col("tick") === (jan1 + 2 * D)).head()
    // reference /api/table scales EVERY cell — counters included
    assert(row.getDouble(row.fieldIndex("alice")) == 1.0 / 60.0)
    assert(row.getDouble(row.fieldIndex("bob")) == 2.0 / 60.0)
  }

  test("UsageCube ops: filter/collapse/slice additive") {
    val cube = UsageCube(fact,
      Seq("user", "time", "cluster", "excess", "taskType", "status"),
      Seq("started", "elapsedMinutes"))
    val collapsed = cube.filterOn("cluster", Seq("c1"))
      .collapseOn("time").collapseOn("excess").collapseOn("taskType")
      .collapseOn("status").collapseOn("cluster")
    val m = collapsed.build.collect()
      .map(r => r.getString(0) -> r.getDouble(r.fieldIndex("elapsedMinutes")))
      .toMap
    assert(m("alice") == 100.0 && m("bob") == 12.0)
  }

  test("profileApprox tracks the exact q34 profile within sketch tolerance") {
    val d = "/root/testdata/sf0.001"
    val exact = SparkEntry.queries("q34_profile")(spark, d).collect()
      .map(r => r.getString(0) -> r).toMap
    val approx = graft.ServeQueries.profileApprox(spark, d).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(approx.keySet == exact.keySet)
    exact.foreach { case (et, e) =>
      val a = approx(et)
      // row counts are exact in both
      assert(a.getLong(a.fieldIndex("n_events")) ==
        e.getLong(e.fieldIndex("n_events")))
      // HLL++ at rsd 2%: allow 10% slack on this small cardinality
      val nu = e.getLong(e.fieldIndex("n_users")).toDouble
      assert(math.abs(a.getLong(a.fieldIndex("n_users_approx")) - nu) <=
        math.max(2.0, nu * 0.1))
      // quantile sketch with accuracy 10000 on small groups: near-exact
      val med = e.getDouble(e.fieldIndex("med_value"))
      val p95 = e.getDouble(e.fieldIndex("p95_value"))
      assert(math.abs(a.getDouble(a.fieldIndex("med_value_approx")) - med) <=
        math.abs(med) * 0.05 + 0.5)
      assert(math.abs(a.getDouble(a.fieldIndex("p95_value_approx")) - p95) <=
        math.abs(p95) * 0.05 + 0.5)
    }
  }
}
