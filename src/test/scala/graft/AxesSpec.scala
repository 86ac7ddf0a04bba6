package graft

import graft.catalog.Axes
import graft.io.Sink
import org.apache.spark.sql.functions._

/** Axis classification, require-bounds validation, and positive-direction
  * inference (the oracle side is q94/q95; these cover the surfaces the
  * oracle can't express — the validation failure path and the Scala/Column
  * twin parity). */
class AxesSpec extends SparkSpec {
  import spark.implicits._

  test("requireBounds filters the CMOR axis-entry table (mop_utils.py:646-657)") {
    val entries = Seq(
      ("time", "yes"), ("latitude", "yes"), ("longitude", "yes"),
      ("depth_coord", "yes"), ("basin", "no"), ("typeland", "no"))
      .toDF("name", "must_have_bounds")
    val req = Axes.requireBounds(entries).as[String].collect().toSet
    assert(req == Set("time", "latitude", "longitude", "depth_coord"))
  }

  test("missingBounds flags required coords without bounds and passes clean sets") {
    val entries = Seq(("time", "yes"), ("latitude", "yes"), ("basin", "no"))
      .toDF("name", "must_have_bounds")
    // failure path: latitude required but carries no bounds; basin
    // carries none but is not required
    val bad = Seq(("time", true), ("latitude", false), ("basin", false))
      .toDF("name", "has_bounds")
    assert(Axes.missingBounds(bad, entries).as[String].collect().toSeq ==
      Seq("latitude"))
    // clean set: empty result means publishable
    val ok = Seq(("time", true), ("latitude", true), ("basin", false))
      .toDF("name", "has_bounds")
    assert(Axes.missingBounds(ok, entries).isEmpty)
  }

  test("Sink.positiveOf matches the Column twin Axes.positiveDir") {
    val cases = Seq(
      (Some("up"), Some("surface_downward_heat_flux")),
      (Some("both"), Some("tendency_of_heat_content_down")),
      (None, Some("toa_outgoing_longwave_flux")),
      (None, Some("water_flux_into_sea_water")),
      (None, Some("air_temperature")),
      (None, None))
    val scalaSide = cases.map { case (c, s) => Sink.positiveOf(c, s) }
    val columnSide = cases
      .toDF("configured", "standard_name")
      .select(Axes.positiveDir($"configured", $"standard_name"))
      .as[Option[String]].collect().toSeq
    assert(scalaSide == columnSide)
    assert(scalaSide == Seq(Some("up"), Some("down"), Some("up"),
      Some("down"), None, None))
  }
}
