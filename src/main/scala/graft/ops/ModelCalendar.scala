package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Engine-owned arithmetic for non-standard model calendars — the
  * 360-day and noleap (365-day) calendars climate models run on
  * (cftime semantics; SURVEY.md §1.1/§7.3: Spark's TimestampType is
  * proleptic-gregorian only, so these calendars need their own column
  * convention).
  *
  * Convention: a model date is an integer column `ymd` = y*10000 +
  * m*100 + d (human-readable, sortable); arithmetic goes through
  * days-since-epoch for the calendar in question. All pure integer
  * column expressions — codegen'd, engine-reproducible, no UDFs.
  */
object ModelCalendar {

  sealed trait Cal { def daysInYear: Int }
  /** Every month has exactly 30 days. */
  case object Day360 extends Cal { val daysInYear = 360 }
  /** Gregorian month lengths, never a leap day. */
  case object NoLeap extends Cal { val daysInYear = 365 }

  private val noLeapCum = Seq(0, 31, 59, 90, 120, 151, 181, 212, 243, 273, 304, 334)

  /** Split a ymd int into (y, m, d) columns. */
  def parts(ymd: Column): (Column, Column, Column) = {
    val y = floor(ymd / 10000).cast("int")
    val m = floor(pmod(ymd, lit(10000)) / 100).cast("int")
    val d = pmod(ymd, lit(100)).cast("int")
    (y, m, d)
  }

  /** Days since year-0 January 1 in the given calendar. */
  def daysSinceEpoch(ymd: Column, cal: Cal): Column = {
    val (y, m, d) = parts(ymd)
    cal match {
      case Day360 => y * 360 + (m - 1) * 30 + (d - 1)
      case NoLeap =>
        val cum = noLeapCum.zipWithIndex.foldLeft(lit(0)) { case (acc, (days, i)) =>
          when(m === i + 1, days).otherwise(acc)
        }
        y * 365 + cum + (d - 1)
    }
  }

  /** Inverse of [[daysSinceEpoch]]. */
  def fromDaysSinceEpoch(days: Column, cal: Cal): Column = cal match {
    case Day360 =>
      val y = floor(days / 360).cast("int")
      val doy = pmod(days, lit(360)).cast("int")
      val m = floor(doy / 30).cast("int") + 1
      val d = pmod(doy, lit(30)).cast("int") + 1
      y * 10000 + m * 100 + d
    case NoLeap =>
      val y = floor(days / 365).cast("int")
      val doy = pmod(days, lit(365)).cast("int")
      val m = noLeapCum.zipWithIndex.tail.foldLeft(lit(1)) { case (acc, (cum, i)) =>
        when(doy >= cum, i + 1).otherwise(acc)
      }
      val cum = noLeapCum.zipWithIndex.foldLeft(lit(0)) { case (acc, (days0, i)) =>
        when(m === i + 1, days0).otherwise(acc)
      }
      y * 10000 + m * 100 + (doy - cum + 1)
  }

  /** Calendar-aware day arithmetic: ymd + n days. */
  def addDays(ymd: Column, n: Column, cal: Cal): Column =
    fromDaysSinceEpoch(daysSinceEpoch(ymd, cal) + n, cal)

  /** Month bucket key (y*100 + m) — the monthly resample axis for model
    * calendars; every month is exactly 30 days under Day360, so the
    * reference's days-in-month normalizations become constants. */
  def monthKey(ymd: Column): Column = floor(ymd / 100).cast("int")

  /** Days in the ymd's month under the calendar (the calc_monsecs
    * divisor, mop_utils.py:849-865, for model calendars). */
  def daysInMonth(ymd: Column, cal: Cal): Column = cal match {
    case Day360 => lit(30)
    case NoLeap =>
      val (_, m, _) = parts(ymd)
      val lens = Seq(31, 28, 31, 30, 31, 30, 31, 31, 30, 31, 30, 31)
      lens.zipWithIndex.foldLeft(lit(31)) { case (acc, (len, i)) =>
        when(m === i + 1, len).otherwise(acc)
      }
  }
}
