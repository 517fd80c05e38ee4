package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.pm.Calendar

/** Hand-computed fixtures for the calendar-unavailability displacement op
  * (reference `preprocessing/handoff_batch.py:101-140`). The reference's
  * timedelta arithmetic nets out to: land on the target weekday, then roll
  * the clock to the NEXT exact 09:00:00.000000 (crossing midnight when the
  * start hour is >= 9). Every expected value below is derived by hand from
  * the pandas arithmetic, component by component.
  */
class CalendarSpec extends AnyFunSuite {
  lazy val spark = SparkSuite.spark

  private val SEC = 1000000L
  private val MIN = 60 * SEC
  private val HOUR = 60 * MIN
  private val DAY = 24 * HOUR
  // 2024-01-01 (a Monday) 00:00:00 UTC
  private val mon0 = 1704067200000000L

  private def log(rows: (Long, String, Long)*) = {
    import spark.implicits._
    rows.toSeq.toDF("event_id", "resource", "start_us")
      .withColumn("end_us", org.apache.spark.sql.functions.col("start_us"))
  }

  test("loan-officer rule: Fri 10:30:15.250 -> Mon 09:00:00.000000 exactly") {
    // days=(6-4)=2 -> Sun 10:30:15.25; hours=(8-10)%24=22 -> Mon 08:30:15.25;
    // minutes=29 -> 08:59:15.25; seconds=44 -> 08:59:59.25; micros=750000 ->
    // Mon 09:00:00.000000
    val fri = mon0 + 4 * DAY + 10 * HOUR + 30 * MIN + 15 * SEC + 250000L
    val out = Calendar.displaceLoanCalendars(
      log((1L, "Loan Officer-007", fri))).collect().head
    assert(out.getAs[Long]("start_us") == mon0 + 7 * DAY + 9 * HOUR)
    assert(out.getAs[Long]("end_us") == fri) // end times untouched
  }

  test("loan-officer rule: hour < 8 wraps within the same day (Sun 07:30 -> Sun 09:00)") {
    // days=(6-6)=0; hours=(8-7)%24=1 -> 08:30:00; minutes=29 -> 08:59:00;
    // seconds=59 -> 08:59:59; micros=1000000 -> Sun 09:00:00
    val sun = mon0 + 6 * DAY + 7 * HOUR + 30 * MIN
    val out = Calendar.displaceLoanCalendars(
      log((1L, "Loan Officer-001", sun))).collect().head
    assert(out.getAs[Long]("start_us") == mon0 + 6 * DAY + 9 * HOUR)
  }

  test("senior-officer rule: Mon 14:05:06.000007 -> Thu 09:00:00.000000") {
    // days=(2-0)=2 -> Wed; hours=(8-14)%24=18 -> Thu 08:05:06.000007;
    // minutes=54, seconds=53, micros=999993 -> Thu 09:00:00.000000
    val mon = mon0 + 14 * HOUR + 5 * MIN + 6 * SEC + 7L
    val out = Calendar.displaceLoanCalendars(
      log((1L, "Senior Officer-002", mon))).collect().head
    assert(out.getAs[Long]("start_us") == mon0 + 3 * DAY + 9 * HOUR)
  }

  test("non-matching weekday and non-matching resource pass through unchanged") {
    val tue = mon0 + 1 * DAY + 10 * HOUR // Loan Officer works Mon-Wed
    val sat = mon0 + 5 * DAY + 10 * HOUR // Senior Officer works Thu-Sun
    val fri = mon0 + 4 * DAY + 10 * HOUR
    val out = Calendar.displaceLoanCalendars(log(
      (1L, "Loan Officer-003", tue),
      (2L, "Senior Officer-004", sat),
      (3L, "Clerk-1", fri))).collect()
      .map(r => r.getAs[Long]("event_id") -> r.getAs[Long]("start_us")).toMap
    assert(out == Map(1L -> tue, 2L -> sat, 3L -> fri))
  }

  test("businessUs: Fri 16:00 -> Mon 10:00 is 3 working hours; weekends add zero") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val fri16 = mon0 + 4 * DAY + 16 * HOUR
    val sat12 = mon0 + 5 * DAY + 12 * HOUR
    val sun23 = mon0 + 6 * DAY + 23 * HOUR
    val mon10 = mon0 + 7 * DAY + 10 * HOUR
    val fri17 = mon0 + 4 * DAY + 17 * HOUR
    val mon7 = mon0 + 7 * DAY + 7 * HOUR // before opening: same as Fri 17:00
    val got = Seq(fri16, fri17, sat12, sun23, mon7, mon10).toDF("us")
      .select(Calendar.businessUs(col("us"))).collect().map(_.getLong(0)).toSeq
    val Seq(bF16, bF17, bSat, bSun, bM7, bM10) = got
    assert(bM10 - bF16 == 3 * HOUR) // Fri 16-17 + Mon 8-10
    assert(bSat == bF17 && bSun == bF17 && bM7 == bF17) // closed time is flat
    assert(bF17 - bF16 == 1 * HOUR)
  }

  test("businessUs is monotone on an hourly grid and a full week is exactly 45h") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val grid = (0 until 21 * 24).map(h => mon0 + h.toLong * HOUR)
    val vals = grid.toDF("us").select(Calendar.businessUs(col("us")))
      .collect().map(_.getLong(0)).toSeq
    assert(vals.zip(vals.tail).forall { case (a, b) => a <= b }, "not monotone")
    // one calendar week advances the business clock by exactly 5 * 9h
    assert(vals(7 * 24) - vals(0) == 45 * HOUR)
    assert(vals(14 * 24) - vals(7 * 24) == 45 * HOUR)
    // and each hourly step is either 0 (closed) or 1h (open)
    assert(vals.zip(vals.tail).forall { case (a, b) => b - a == 0 || b - a == HOUR })
  }

  test("two overlapping per-resource calendars measure the same interval differently") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // r1 works Mon-Wed 06:00-18:00, r2 works Thu-Sun 09:00-15:00. The
    // wall interval [Wed 17:00, Thu 10:00) contains 1h of r1's window
    // (Wed 17-18) and 1h of r2's (Thu 9-10); [Mon 00:00, Sun 24:00)
    // contains 3*12h of r1's and 4*6h of r2's.
    val calB = Calendar.ResourceCals.toMap.apply("r1")
    val calC = Calendar.ResourceCals.toMap.apply("r2")
    val wed17 = mon0 + 2 * DAY + 17 * HOUR
    val thu10 = mon0 + 3 * DAY + 10 * HOUR
    val sunEnd = mon0 + 7 * DAY
    def biz(cal: Calendar.BizCal, us: Long*): Seq[Long] =
      us.toDF("us").select(Calendar.businessUsCal(col("us"), cal))
        .collect().map(_.getLong(0)).toSeq
    val Seq(b1a, b1b, b1w0, b1w1) = biz(calB, wed17, thu10, mon0, sunEnd)
    val Seq(c1a, c1b, c1w0, c1w1) = biz(calC, wed17, thu10, mon0, sunEnd)
    assert(b1b - b1a == 1 * HOUR)
    assert(c1b - c1a == 1 * HOUR)
    assert(b1w1 - b1w0 == 36 * HOUR)
    assert(c1w1 - c1w0 == 24 * HOUR)
  }

  test("resourceBizUs: the 24x7 calendar's business clock IS the wall clock") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val times = Seq(mon0, mon0 + 3 * DAY + 7 * HOUR, mon0 + 6 * DAY + 23 * HOUR)
    val rows = times.map(t => ("r3", t)).toDF("resource", "us")
    val got = rows.select(($"us" - Calendar.resourceBizUs($"resource", $"us")).as("d"))
      .collect().map(_.getLong(0)).toSet
    assert(got.size == 1) // constant offset => every wall gap equals its biz gap
    // and the default fallback matches businessUs for an unknown resource
    val fb = times.map(t => ("mystery", t)).toDF("resource", "us")
      .select(Calendar.resourceBizUs($"resource", $"us") - Calendar.businessUs($"us"))
      .collect().map(_.getLong(0)).toSet
    assert(fb == Set(0L))
  }

  test("calendar-as-data: table form == constant form; editing one row moves only that resource") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // a grid of instants x all four resources (+ an unknown one for the
    // DefaultCal fallback path)
    val times = (0 until 14).map(k => mon0 + k * 13 * HOUR + 17 * MIN + 3 * SEC)
    val rows = for (r <- Seq("r0", "r1", "r2", "r3", "mystery"); t <- times) yield (r, t)
    val df = rows.toDF("resource", "us")
    def viaTable(cals: Seq[(String, Calendar.BizCal)]) =
      Calendar.withResourceCal(df, Calendar.calendarDf(spark, cals))
        .select($"resource", $"us", Calendar.bizUsFromCalCols($"us").as("biz"))
        .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    val table = viaTable(Calendar.ResourceCals)
    val const = df.select($"resource", $"us",
        Calendar.resourceBizUs($"resource", $"us").as("biz"))
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(table == const, "broadcast-table form must equal the constant-folded form")
    // edit ONE calendar row (r2 gets r3's 24x7 calendar): only r2 changes
    val edited = viaTable(Calendar.ResourceCals.map {
      case ("r2", _) => "r2" -> Calendar.BizCal(Set(0, 1, 2, 3, 4, 5, 6), 0, 24)
      case other => other
    })
    val (changed, same) = rows.partition(_._1 == "r2")
    assert(same.forall(k => edited(k) == const(k)),
      "editing r2's calendar row must not move any other resource")
    assert(changed.exists(k => edited(k) != const(k)),
      "r2's decomposition must actually change under the edited calendar")
  }

  test("calendar validity intervals: the version valid at the instant wins") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // one instant per side of the amendment, per resource
    val before = Calendar.CalAmendUs - 3 * DAY - 5 * HOUR
    val after = Calendar.CalAmendUs + 3 * DAY + 5 * HOUR
    val rows = for (r <- Seq("r0", "r1", "r2", "r3"); t <- Seq(before, after)) yield (r, t)
    val df = rows.toDF("resource", "us")
    val cal = Calendar.versionedCalendarDf(spark)
      .withColumnRenamed("resource", "cal_resource")
    val got = df.join(broadcast(cal),
        df("resource") === cal("cal_resource") &&
          df("us") >= cal("valid_from_us") && df("us") < cal("valid_to_us"))
      .select($"resource", $"us", Calendar.bizUsFromCalCols($"us").as("biz"))
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(got.size == rows.size, "every (resource, instant) must join exactly one version")
    val v1 = Calendar.ResourceCals.toMap
    val v2 = Calendar.ResourceCalsV2.toMap
    def expect(cal: Calendar.BizCal, us: Long): Long =
      Seq(us).toDF("us").select(Calendar.businessUsCal(col("us"), cal))
        .head.getLong(0)
    for (r <- Seq("r0", "r1", "r2", "r3")) {
      assert(got((r, before)) == expect(v1(r), before), s"$r before amendment uses v1")
      assert(got((r, after)) == expect(v2(r), after), s"$r after amendment uses v2")
    }
    // the amendment actually changes something (rotation is not identity)
    assert(got(("r0", after)) != expect(v1("r0"), after))
  }

  test("dowMon0 matches the pandas convention on epoch day 0 (Thursday)") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val got = Seq(0L, mon0).toDF("us")
      .select(Calendar.dowMon0(col("us"))).collect().map(_.getLong(0)).toSeq
    assert(got == Seq(3L, 0L)) // 1970-01-01 = Thu(3), 2024-01-01 = Mon(0)
  }
}
