package graft.plans

/** The physical output planner: split a variable's time range into
  * output files bounded by a size cap, using the reference's interval
  * ladder (setup_utils.py compute_fsize 430-482 + define_files 592-644:
  * choose the largest rung of all → 100y → 10y → 1y → 1mo → 7d → 1d →
  * 0.5d → 0.25d whose per-file size stays within max_size·1.1).
  *
  * Pure planning logic (no Spark types) so it is trivially testable and
  * can run driver-side for a handful of variables or be applied as a UDF
  * over a catalog DataFrame for millions (q40_interval_ladder shows the
  * distributed formulation).
  */
object Planner {

  /** One output file: a [start, end) slice in epoch-microseconds. */
  final case class FileSlice(index: Int, startUs: Long, endUs: Long)

  final case class Plan(
      interval: String, nFiles: Int, estFileMb: Double, slices: Seq[FileSlice])

  /** Ladder rungs as (name, fraction-of-total granularity in days);
    * actual splitting is proportional like the reference's per-interval
    * row emission. */
  private val ladder = Seq(
    "all" -> Double.MaxValue, "100y" -> 36500.0, "10y" -> 3650.0,
    "1y" -> 365.0, "1mo" -> 30.0, "7d" -> 7.0, "1d" -> 1.0,
    "0.5d" -> 0.5, "0.25d" -> 0.25)

  private val usPerDay = 86400L * 1000000L

  /** Choose the largest rung whose per-file size ≤ maxSizeMb·1.1
    * (the 10% slack of setup_utils.py:449), then emit the slices. */
  def plan(startUs: Long, endUs: Long, mbPerDay: Double, maxSizeMb: Double): Plan = {
    require(endUs > startUs, "empty time range")
    val totalDays = (endUs - startUs).toDouble / usPerDay
    val totalMb = totalDays * mbPerDay
    val slack = maxSizeMb * 1.1
    val chosen = ladder.find { case (_, days) =>
      math.min(days, totalDays) * mbPerDay <= slack
    }.getOrElse(ladder.last)
    val (name, days) = chosen
    val nFiles =
      if (days >= totalDays) 1
      else math.ceil(totalDays / days).toInt
    val spanUs = (endUs - startUs + nFiles - 1) / nFiles
    val slices = (0 until nFiles).map { i =>
      FileSlice(i, startUs + i * spanUs,
        math.min(startUs + (i + 1) * spanUs, endUs))
    }
    Plan(name, nFiles, totalMb / nFiles, slices)
  }
}
