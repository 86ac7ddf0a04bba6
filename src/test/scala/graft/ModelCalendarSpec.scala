package graft

import graft.ops.ModelCalendar
import graft.ops.ModelCalendar.{Day360, NoLeap}
import org.apache.spark.sql.functions._

/** Model-calendar arithmetic (360-day / noleap): round trips, day math
  * across month and year boundaries, month lengths. */
class ModelCalendarSpec extends SparkSpec {
  import spark.implicits._

  test("daysSinceEpoch round-trips for both calendars") {
    val dates = Seq(19790101, 19790130, 19790201, 19791230, 19800101,
      20000228, 20000301, 20241231)
    val df = dates.toDF("ymd")
    for (cal <- Seq(Day360, NoLeap)) {
      val ok = cal match {
        case Day360 => dates.filter(d => d % 100 <= 30) // no day 31 in 360-day
        case NoLeap => dates
      }
      val out = ok.toDF("ymd")
        .select(ModelCalendar.fromDaysSinceEpoch(
          ModelCalendar.daysSinceEpoch($"ymd", cal), cal).as("rt"))
        .as[Int].collect().toSeq
      assert(out == ok, s"$cal round trip")
    }
    assert(df.count() == dates.size)
  }

  test("day arithmetic crosses month and year boundaries per calendar") {
    val df = Seq(19791230).toDF("ymd")
    // 360-day: Dec 30 + 1 day -> Jan 1 of next year (months have 30 days)
    val d360 = df.select(ModelCalendar.addDays($"ymd", lit(1), Day360)).as[Int].head()
    assert(d360 == 19800101)
    // noleap: Dec 30 + 1 -> Dec 31, + 2 -> Jan 1
    val nl1 = df.select(ModelCalendar.addDays($"ymd", lit(1), NoLeap)).as[Int].head()
    val nl2 = df.select(ModelCalendar.addDays($"ymd", lit(2), NoLeap)).as[Int].head()
    assert(nl1 == 19791231 && nl2 == 19800101)
    // noleap: Feb 28 + 1 -> Mar 1 even in a gregorian leap year
    val feb = Seq(20000228).toDF("ymd")
      .select(ModelCalendar.addDays($"ymd", lit(1), NoLeap)).as[Int].head()
    assert(feb == 20000301)
  }

  test("month key and days-in-month") {
    val df = Seq(19790215).toDF("ymd")
    assert(df.select(ModelCalendar.monthKey($"ymd")).as[Int].head() == 197902)
    assert(df.select(ModelCalendar.daysInMonth($"ymd", Day360)).as[Int].head() == 30)
    assert(df.select(ModelCalendar.daysInMonth($"ymd", NoLeap)).as[Int].head() == 28)
  }
}
