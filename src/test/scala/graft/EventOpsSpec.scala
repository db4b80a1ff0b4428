package graft

import java.sql.Timestamp
import java.time.Instant

import org.scalatest.funsuite.AnyFunSuite
import graft.ops.EventOps

/** Warehouse/time-series event operators: planted scenarios with
  * hand-computed expectations. */
class EventOpsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private val T0 = Instant.parse("2024-01-01T00:00:00Z")
  private def ts(hours: Long): Timestamp =
    Timestamp.from(T0.plusSeconds(hours * 3600))
  private def us(hours: Long): Long =
    (T0.getEpochSecond + hours * 3600) * 1000000L

  private def eventsDf(rows: (Long, Long, Long, String, Double)*) =
    rows.map { case (id, u, h, ty, v) => (id, ts(h), u, ty, v) }
      .toDF("event_id", "ts", "user_id", "event_type", "value")

  test("scd2: each signup opens a half-open version; last one is current") {
    val df = eventsDf((1L, 7L, 0L, "signup", 1.0),
      (2L, 7L, 48L, "signup", 2.0), (3L, 7L, 24L, "signup", 3.0),
      (4L, 7L, 10L, "click", 0.0), (5L, 8L, 5L, "signup", 4.0))
    val out = EventOps.scd2Versions(df).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        Option(r.get(3)).map(_.asInstanceOf[Long]), r.getInt(4)))
      .sortBy(x => (x._1, x._3))
    assert(out === Array(
      (7L, 1L, us(0), Some(us(24)), 0),
      (7L, 3L, us(24), Some(us(48)), 0),
      (7L, 2L, us(48), None, 1),
      (8L, 5L, us(5), None, 1)))
  }

  test("gap-fill: missing days appear with zero events and the purchase " +
    "total forward-filled; null before the first purchase") {
    // user 1 active on days 0 and 3 (72h): purchase day 0, click day 3
    val df = eventsDf((1L, 1L, 2L, "purchase", 12.5),
      (2L, 1L, 72L, "click", 0.0), (3L, 1L, 73L, "view", 0.0),
      (4L, 2L, 26L, "view", 0.0), (5L, 2L, 30L, "purchase", 3.0))
    val out = EventOps.gapFillDaily(df).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        Option(r.get(3)).map(_.asInstanceOf[Long])))
      .sortBy(x => (x._1, x._2))
    val day0 = us(0) / 86400000000L
    assert(out === Array(
      (1L, day0, 1L, Some(1250L)),
      (1L, day0 + 1, 0L, Some(1250L)),
      (1L, day0 + 2, 0L, Some(1250L)),
      (1L, day0 + 3, 2L, Some(1250L)),
      (2L, day0 + 1, 2L, Some(300L))))
  }

  test("funnel: stages honor order and the 24h per-step window") {
    val df = eventsDf(
      // user 1: full conversion (click +1h after view, purchase +2h)
      (1L, 1L, 0L, "view", 0.0), (2L, 1L, 1L, "click", 0.0),
      (3L, 1L, 3L, "purchase", 5.0),
      // user 2: click 30h after view — outside the 24h window → stage 1
      (4L, 2L, 0L, "view", 0.0), (5L, 2L, 30L, "click", 0.0),
      // user 3: click BEFORE the first view never counts → stage 1
      (6L, 3L, 0L, "click", 0.0), (7L, 3L, 2L, "view", 0.0),
      // user 4: no view at all → stage 0
      (8L, 4L, 0L, "purchase", 9.0),
      // user 5: view→click ok, purchase 25h after click → stage 2
      (9L, 5L, 0L, "view", 0.0), (10L, 5L, 2L, "click", 0.0),
      (11L, 5L, 28L, "purchase", 1.0))
    val out = EventOps.funnel(df).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(out === Map(1L -> 3, 2L -> 1, 3L -> 1, 4L -> 0, 5L -> 2))
  }

  test("funnel: first qualifying click in scan order is the min-qualifying " +
    "one (a later cheaper click never replaces it)") {
    val df = eventsDf((1L, 1L, 0L, "view", 0.0),
      (2L, 1L, 5L, "click", 0.0), (3L, 1L, 2L, "click", 0.0))
    val out = EventOps.funnel(df).collect()
    assert(out.length === 1)
    // k2 must be the 2h click (id 3), not the 5h click seen later in input
    val k2 = out(0).getAs[Long]("k2")
    assert(k2 === (us(2) - us(0)) * 1000000L + 3L)
  }

  test("cohort retention: absolute-week cohorts, offsets only forward") {
    val df = eventsDf(
      (1L, 1L, 0L, "signup", 0.0), // user 1 cohort week W
      (2L, 1L, 24L * 8, "click", 0.0), // week W+1
      (3L, 2L, 24L * 7, "signup", 0.0), // user 2 cohort week W+1
      (4L, 2L, 24L * 7 + 1, "view", 0.0), // same week
      (5L, 2L, 24L * 1, "view", 0.0)) // BEFORE signup → dropped
    val w0 = us(0) / 86400000000L / 7L
    val out = EventOps.cohortRetention(df).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(out === Set((w0, 0L, 1L), (w0, 1L, 1L), (w0 + 1, 0L, 1L)))
  }

  test("maxConcurrency: sweep-line counts overlapping intervals, touching " +
    "intervals overlap (closed semantics), histogram is exact") {
    // duration = 1 + event_id % 50 minutes
    def tsMin(m: Long): Timestamp = Timestamp.from(T0.plusSeconds(m * 60))
    val rows = Seq(
      // user 1: [0,10], [2,7], [20,21] minutes → max 2 concurrent
      (9L, tsMin(0), 1L, "click", 0.0),
      (4L, tsMin(2), 1L, "click", 0.0),
      (0L, tsMin(20), 1L, "click", 0.0),
      // user 2: [0,10] and [10,20] — touch at t=10 counts as overlap → 2
      (9L, tsMin(0), 2L, "click", 0.0),
      (59L, tsMin(10), 2L, "click", 0.0), // 59 % 50 + 1 = 10 min
      // user 3: a single interval → 1
      (7L, tsMin(0), 3L, "click", 0.0)
    ).toDF("event_id", "ts", "user_id", "event_type", "value")
    val got = EventOps.maxConcurrency(rows)
      .as[(Long, Long)].collect().toSeq
    assert(got === Seq((1L, 1L), (2L, 2L)))
  }

  test("nearestEventJoin matches each click to the temporally nearest " +
    "purchase in either direction; equidistant ties prefer the earlier; " +
    "users without purchases keep null matches") {
    val df = eventsDf(
      // user 1: purchase at h=10 (id 50)
      (50L, 1L, 10L, "purchase", 0.0),
      (1L, 1L, 8L, "click", 0.0),    // nearest = 50, delta 2h
      (2L, 1L, 11L, "click", 0.0),   // nearest = 50, delta 1h
      // user 2: purchases at h=0 (id 60) and h=4 (id 61); click at h=2 is
      // equidistant → earlier purchase 60 wins
      (60L, 2L, 0L, "purchase", 0.0),
      (61L, 2L, 4L, "purchase", 0.0),
      (3L, 2L, 2L, "click", 0.0),
      // user 3: click, no purchase → null match
      (4L, 3L, 5L, "click", 0.0),
      // noise the filter must drop
      (90L, 1L, 9L, "view", 0.0))
    val got = EventOps.nearestEventJoin(df).collect()
      .map(r => (r.getLong(1),
        if (r.isNullAt(2)) -1L else r.getLong(2),
        if (r.isNullAt(3)) -1L else r.getLong(3))).toSeq
    val h = 3600L * 1000000L
    assert(got === Seq(
      (1L, 50L, 2 * h), (2L, 50L, 1 * h), (3L, 60L, 2 * h), (4L, -1L, -1L)))
  }

  test("intervalUnion counts overlapping intervals once (cummax sweep)") {
    def tsMin(m: Long): Timestamp = Timestamp.from(T0.plusSeconds(m * 60))
    val min = 60L * 1000000L
    val rows = Seq(
      // user 1: [0,10] ∪ [5,12] ∪ [20,21] → 12 + 1 = 13 min covered
      (9L, tsMin(0), 1L, "click", 0.0),   // dur 10
      (6L, tsMin(5), 1L, "click", 0.0),   // dur 7 → [5,12]
      (0L, tsMin(20), 1L, "click", 0.0),  // dur 1
      // user 2: nested [0,20] ⊇ [5,8] → 20 min
      (19L, tsMin(0), 2L, "click", 0.0),  // dur 20
      (2L, tsMin(5), 2L, "click", 0.0)    // dur 3 → fully inside
    ).toDF("event_id", "ts", "user_id", "event_type", "value")
    val got = EventOps.intervalUnion(rows)
      .as[(Long, Long, Long)].collect().toSeq
    assert(got === Seq((1L, 3L, 13 * min), (2L, 2L, 20 * min)))
  }
}
