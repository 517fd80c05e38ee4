package graft.pm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Calendar-unavailability displacement — the reference's dataset-prep op
  * that shifts events starting outside a resource's working calendar forward
  * to the resource's next working window
  * (reference `src/preprocessing/handoff_batch.py:101-140`:
  * `_displace_calendar_unavailability`).
  *
  * The reference applies, per matching row, a pandas timedelta of
  * `days = targetDow - dow` (Mon=0), `hours = (8 - H) % 24`,
  * `minutes = 59 - M`, `seconds = 59 - S`, `micros = 1_000_000 - U`.
  * The minute/second/micro terms always roll the clock to the NEXT exact
  * `:00:00`, so the net effect is: land on the target weekday, then advance
  * to the following 09:00:00.000000 sharp (crossing midnight when the hour
  * is >= 9 — e.g. a Friday-10:30 Loan-Officer event lands on Monday 09:00).
  * We reproduce that arithmetic exactly, including the `% 24` hour wrap for
  * hours < 8 and the full-second bump when the micro component is zero.
  *
  * Everything is row-local integer arithmetic on epoch micros over built-in
  * functions — whole-stage-codegen'd, no shuffle, no UDF — so the op costs
  * one map pass regardless of log size.
  */
object Calendar {
  private val SecUs = 1000000L
  private val MinUs = 60L * SecUs
  private val HourUs = 60L * MinUs
  private val DayUs = 24L * HourUs

  /** Exact integer division for epoch-micro columns: stripping the pmod
    * remainder first makes the double division exact (the quotient is an
    * integer well under 2^53), so the cast can't be bitten by a
    * one-ulp-under rounding at a unit boundary. */
  private def intDiv(a: Column, b: Long): Column =
    ((a - pmod(a, lit(b))) / b).cast("long")

  /** Monday=0 day-of-week of an epoch-micros column (1970-01-01 was a
    * Thursday = 3 in the pandas Mon=0 convention the reference uses). */
  def dowMon0(us: Column): Column = pmod(intDiv(us, DayUs) + 3, lit(7))

  /** The reference's displacement delta (handoff_batch.py:117-122) in
    * micros, for a row already known to match the rule's predicate. */
  def shiftUs(us: Column, targetDow: Int): Column = {
    val rem = pmod(us, lit(DayUs))
    val hour = intDiv(rem, HourUs)
    val minute = intDiv(pmod(rem, lit(HourUs)), MinUs)
    val second = intDiv(pmod(rem, lit(MinUs)), SecUs)
    val micro = pmod(rem, lit(SecUs))
    (lit(targetDow) - dowMon0(us)) * DayUs +
      pmod(lit(8L) - hour, lit(24L)) * HourUs +
      (lit(59L) - minute) * MinUs +
      (lit(59L) - second) * SecUs +
      (lit(SecUs) - micro)
  }

  /** Epoch-micros column displaced where `cond` holds AND the timestamp's
    * Mon=0 weekday satisfies `dowPred`; unchanged otherwise. */
  def displacedUs(us: Column, cond: Column, dowPred: Column => Column,
      targetDow: Int): Column =
    when(cond && dowPred(dowMon0(us)), us + shiftUs(us, targetDow)).otherwise(us)

  /** One displacement rule over the canonical harness log grain
    * (`start_us`/`resource` columns): rows whose resource name contains
    * `resourceContains` and whose start weekday satisfies `dowPred` get
    * their START advanced by the reference delta (end times are untouched,
    * as in the reference). */
  def displace(log: DataFrame, resourceContains: String,
      dowPred: Column => Column, targetDow: Int): DataFrame = {
    val c = log("resource").contains(resourceContains)
    log.withColumn("start_us",
      displacedUs(log("start_us"), c, dowPred, targetDow))
  }

  /** Business micros elapsed from the epoch to `us` under a Mon-Fri
    * 08:00-17:00 working calendar — the closed-form scan that turns
    * wall-clock waiting times into WORKING-time waiting times (business
    * durations are differences of this transform: monotone, so
    * biz(b) - biz(a) is the working time inside [a, b]). Entirely
    * row-local integer arithmetic over built-ins: full working days are
    * counted with the epoch-week closed form (epoch day 0 = Thursday, so
    * each 7-day block [7m, 7m+7) contributes weekday-prefix counts
    * [0,1,2,2,2,3,4] at offsets 0..6), plus the clamped time-of-day
    * contribution on weekdays. */
  def businessUs(us: Column): Column = {
    val day = intDiv(us, DayUs)
    val r = pmod(day, lit(7L))
    val weekdaysBefore = intDiv(day, 7L) * 5L +
      when(r === 0, 0L).when(r === 1, 1L).when(r === 2, 2L).when(r === 3, 2L)
        .when(r === 4, 2L).when(r === 5, 3L).otherwise(4L)
    val within = least(greatest(pmod(us, lit(DayUs)), lit(8L * HourUs)),
      lit(17L * HourUs)) - lit(8L * HourUs)
    weekdaysBefore * (9L * HourUs) + when(dowMon0(us) <= 4, within).otherwise(0L)
  }


  /** The composed reference op (handoff_batch.py:110-136): Loan Officers
    * don't work Thu-Sun (dow > 2) — displace toward Sunday (net: next
    * Monday 09:00 for working-hours starts); Senior Officers don't work
    * Mon-Wed (dow < 3) — displace toward Wednesday (net: next Thursday
    * 09:00). */
  def displaceLoanCalendars(log: DataFrame): DataFrame =
    displace(
      displace(log, "Loan Officer", _ > 2, targetDow = 6),
      "Senior Officer", _ < 3, targetDow = 2)
}
