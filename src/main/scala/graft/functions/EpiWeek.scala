package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Epidemiological week arithmetic.
  *
  * Semantics from the reference engine's `meerkat_abacus/util/epi_week.py`:
  *  - `epi_year_start_date` (epi_week.py:45-82): policy `"international"` → Jan 1;
  *    `"day:<w>"` → first weekday `w` (python numbering, Mon=0) on or after Jan 1.
  *  - `epi_year_by_date` (epi_week.py:118-148): a date before its calendar year's
  *    epi start belongs to the previous epi year.
  *  - `epi_week_for_date` (epi_week.py:10-42): week = days since epi-year start
  *    `/ 7 + 1`; week-53 strategy remaps: leave_as_is (53), include_in_52,
  *    include_in_1 (→ next year, week 1).
  *  - `epi_week_start_date` (epi_week.py:151-163): year start + (week-1)*7 days.
  *
  * Everything here is pure `Column` arithmetic — no UDFs — so it stays inside
  * whole-stage codegen and vectorizes at any scale.
  */
object EpiWeek {

  sealed trait YearStartPolicy
  /** Epi year starts Jan 1. */
  case object International extends YearStartPolicy
  /** Epi year starts on the first weekday `w` (python numbering Mon=0..Sun=6)
    * on or after Jan 1. */
  final case class StartDay(weekday: Int) extends YearStartPolicy {
    require(weekday >= 0 && weekday <= 6, s"weekday must be 0..6, got $weekday")
  }
  /** Custom per-year epi-year start dates (epi_week.py:58-81, 176-180):
    * `epi_week: {2011: 2011-01-02, 2012: 2011-12-31}`. A date belongs to the
    * latest configured year whose start is on/before it
    * (`__get_epi_week_for_custom_config`); dates before every configured
    * start yield null (the reference raises ValueError there). Compiled as a
    * descending CaseWhen chain over the few configured years — pure literal
    * comparisons, fully codegen'd. */
  final case class Custom(starts: Map[Int, java.time.LocalDate]) extends YearStartPolicy {
    require(starts.nonEmpty, "custom epi-week config needs at least one year")
    /** (year, start) sorted by start date DESCENDING, the reference's
      * reversed(sorted(...)) scan order. */
    def desc: Seq[(Int, java.time.LocalDate)] =
      starts.toSeq.sortBy(_._2.toEpochDay).reverse
  }

  sealed trait Week53Strategy
  case object LeaveAsIs extends Week53Strategy
  case object IncludeIn52 extends Week53Strategy
  case object IncludeIn1 extends Week53Strategy

  private def posMod(x: Column, m: Int): Column = ((x % m) + m) % m

  /** Python-style weekday: Monday=0 .. Sunday=6.
    * Spark's dayofweek: Sunday=1 .. Saturday=7. */
  def pyWeekday(d: Column): Column = posMod(dayofweek(d) + lit(5), 7)

  private def dateLit(d: java.time.LocalDate): Column =
    lit(java.sql.Date.valueOf(d))

  /** Epi-year start date for calendar year `y`. */
  def yearStart(y: Column, policy: YearStartPolicy): Column = policy match {
    case International =>
      make_date(y, lit(1), lit(1))
    case StartDay(w) =>
      val jan1 = make_date(y, lit(1), lit(1))
      date_add(jan1, posMod(lit(w) - pyWeekday(jan1), 7).cast("int"))
    case c: Custom =>
      c.desc.tail.foldLeft(
        when(y === c.desc.head._1, dateLit(c.desc.head._2))) {
        case (acc, (yy, st)) => acc.when(y === yy, dateLit(st))
      }
  }

  /** Epi year owning date `d` (previous year if `d` precedes that year's start). */
  def epiYear(d: Column, policy: YearStartPolicy): Column = {
    val dd = d.cast("date")
    policy match {
      case c: Custom =>
        // latest configured year whose start <= d; null before all starts
        c.desc.tail.foldLeft(
          when(dd >= dateLit(c.desc.head._2), lit(c.desc.head._1))) {
          case (acc, (yy, st)) => acc.when(dd >= dateLit(st), lit(yy))
        }
      case _ =>
        when(dd < yearStart(year(dd), policy), year(dd) - 1).otherwise(year(dd))
    }
  }

  /** Start date of the epi year owning `d`. */
  def epiYearStartOf(d: Column, policy: YearStartPolicy): Column =
    yearStart(epiYear(d, policy), policy)

  /** Raw epi week (1-based; may be 53 on long years) before week-53 remap. */
  def rawEpiWeek(d: Column, policy: YearStartPolicy): Column = {
    val dd = d.cast("date")
    (floor(datediff(dd, epiYearStartOf(dd, policy)) / 7) + 1).cast("int")
  }

  /** `(epi_year, epi_week)` struct after applying the week-53 strategy.
    * The remap hits EXACTLY week 53 (epi_week.py:39-42 `in [0, 53]`) — a
    * custom config whose year runs longer keeps weeks 54+ as-is, like the
    * reference. */
  def epiYearWeek(d: Column, policy: YearStartPolicy,
                  wk53: Week53Strategy = LeaveAsIs): Column = {
    val y = epiYear(d, policy)
    val w = rawEpiWeek(d, policy)
    val (yy, ww) = wk53 match {
      case LeaveAsIs   => (y, w)
      case IncludeIn52 => (y, when(w === 53, lit(52)).otherwise(w))
      case IncludeIn1  => (when(w === 53, y + 1).otherwise(y),
                           when(w === 53, lit(1)).otherwise(w))
    }
    struct(yy.cast("int").as("epi_year"), ww.cast("int").as("epi_week"))
  }

  /** epi_week_start_date(year, week) = year start + (week-1)*7 days. */
  def weekStartDate(y: Column, week: Column, policy: YearStartPolicy): Column =
    date_add(yearStart(y, policy), ((week - 1) * 7).cast("int"))

  /** Seconds between the "epi epoch" (first epi-week-start weekday on/after
    * 1970-01-01) and `d` — the reference's `Variable.to_date` coercion
    * (variable.py:321-367): dates inside `calc` expressions become second
    * counts so arithmetic like date differences works. */
  def epiEpochSeconds(d: Column, policy: YearStartPolicy): Column = {
    val offsetDays = policy match {
      case International => 0
      case StartDay(w)   => (w - 3 + 7) % 7 // 1970-01-01 was a Thursday (py weekday 3)
      // custom configs predate no 1970 epoch notion in the reference's
      // to_date coercion; international epoch is the sensible identity
      case _: Custom     => 0
    }
    unix_timestamp(d.cast("timestamp")) - lit(offsetDays.toLong * 86400L)
  }
}
