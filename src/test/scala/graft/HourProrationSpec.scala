package graft

import graft.model._
import graft.usage.HourProration
import org.scalatest.funsuite.AnyFunSuite

class HourProrationSpec extends AnyFunSuite {

  private val H = HourProration.HourMs

  private def att(start: Long, finish: Long,
      counters: Map[String, Long] = Map.empty): Attempt =
    Attempt("attempt_1_1_m_0_0", "MAP", "SUCCESS", start, finish,
      None, None, counters, excess = false,
      minutes = (finish - start) / 60000.0,
      cpuMinutes = counters.get("CPU_MILLISECONDS").map(_ / 60000.0))

  test("attempt inside one hour: single bucket, started=finished=1") {
    val rows = HourProration.prorate("u", "c", att(H + 60000, H + 120000))
    assert(rows.size == 1)
    val r = rows.head
    assert(r.time == H && r.started == 1 && r.finished == 1)
    assert(r.elapsedMinutes == 1.0)
  }

  test("attempt spanning 3 hours: boundary flags and overlap split") {
    // 01:30 → 03:15
    val start = H + 30 * 60000L
    val finish = 3 * H + 15 * 60000L
    val rows = HourProration.prorate("u", "c", att(start, finish))
    assert(rows.map(_.time) == Seq(H, 2 * H, 3 * H))
    assert(rows.map(_.elapsedMinutes) == Seq(30.0, 60.0, 15.0))
    assert(rows.map(_.started) == Seq(1, 0, 0))
    assert(rows.map(_.finished) == Seq(0, 0, 1))
  }

  test("finish exactly on hour boundary: no zero-minute bucket; finished=1 in last full bucket") {
    // reference loop `while (currentTime < end)` stops at the boundary
    // (ComputeUsagePerHour.java:285); finished lands via end <= time+unit
    // (:330-332)
    val rows = HourProration.prorate("u", "c", att(H + 60000, 2 * H))
    assert(rows.size == 1)
    assert(rows.head.time == H)
    assert(rows.head.elapsedMinutes == 59.0)
    assert(rows.head.finished == 1 && rows.head.started == 1)
  }

  test("zero-length attempt: no rows (loop body never runs)") {
    val rows = HourProration.prorate("u", "c",
      att(H + 1000, H + 1000, Map("CPU_MILLISECONDS" -> 120000L)))
    assert(rows.isEmpty)
  }

  test("reduceShuffleBytes NOT prorated: full value in every bucket (quirk)") {
    val rows = HourProration.prorate("u", "c",
      att(H, 3 * H + 60000L, Map("REDUCE_SHUFFLE_BYTES" -> 1000L)))
    assert(rows.size == 3)
    assert(rows.forall(_.reduceShuffleBytes.contains(1000L)))
  }

  test("property: split elapsedMinutes sums to total duration") {
    val rnd = new scala.util.Random(42)
    (1 to 500).foreach { _ =>
      val start = rnd.nextLong(400L * 24 * H)
      val finish = start + 1 + rnd.nextLong(12 * H)
      val rows = HourProration.prorate("u", "c", att(start, finish))
      val total = rows.map(_.elapsedMinutes).sum
      assert(math.abs(total - (finish - start) / 60000.0) < 1e-6)
      assert(rows.map(_.started).sum == 1)
      assert(rows.map(_.finished).sum == 1)
    }
  }

  test("property: prorated cpuMinutes sums to counter total") {
    val rnd = new scala.util.Random(7)
    (1 to 500).foreach { _ =>
      val start = rnd.nextLong(400L * 24 * H)
      val finish = start + 1 + rnd.nextLong(12 * H)
      val cpu = rnd.nextLong(10L * H)
      val rows = HourProration.prorate("u", "c",
        att(start, finish, Map("CPU_MILLISECONDS" -> cpu)))
      val total = rows.flatMap(_.cpuMinutes).sum
      assert(math.abs(total - cpu / 60000.0) < 1e-4)
    }
  }
}
