package graft

import graft.catalog.Catalog
import org.apache.spark.sql.functions._

/** Golden spec over the REAL reference mapping catalogs (r15 verdict
  * #4, extended per r16 verdict #1): CalcSpec already proves every
  * calculation string in the reference's mapping CSVs parses; this
  * closes the loop on the RESOLUTION layer by running the actual
  * shipped catalogs through the loaders and the precedence ladders and
  * pinning section counts, enrichment values, resolve winners, and the
  * derivable closures — three corpora:
  *  - `master_map.csv` (381 rows, APP4 layout) via loadApp4MasterMap;
  *  - `master_map_om2.csv` (210 rows, APP4 layout) — the second APP4
  *    corpus, with OM2/OM2-025 version values the ESM rename must NOT
  *    touch;
  *  - `map_aus2200_v1.csv` (101 rows, MODERN 17-field `;` layout) via
  *    loadMap — the half of the corpus with REAL `1hrPt`-style
  *    frequencies and cmor_table values, so Catalog.resolve's
  *    frequency-relaxation ladder is exercised on real data (APP4
  *    rows carry no frequency).
  * Every pinned number below was computed INDEPENDENTLY (a
  * from-scratch Python replication of the reference's read_map /
  * read_map_app4 slices + the documented precedence ladders, run
  * directly over the raw CSVs), so the spec fails if either a loader
  * or the ladder semantics drift — not merely if the Scala output
  * changes. Skipped (assume) when the reference checkout is absent. */
class CatalogCorpusSpec extends SparkSpec {
  import spark.implicits._

  private val path = "/root/reference/data/mappings/master_map.csv"
  private def present = new java.io.File(path).isFile

  private lazy val catalog = Catalog.loadApp4MasterMap(spark, path)
  private lazy val direct = catalog.filter($"calculation" === "")

  // the classification ladders read these four scanned columns
  private def scanned(freq: String) =
    direct.select($"inputVars".as("varName")).distinct()
      .withColumn("frequency", lit(freq))
      .withColumn("cmorVar", lit(""))
      .withColumn("units", lit(""))

  private def sectionCounts(freq: String, version: String): Map[String, Long] =
    Catalog.templateSections(scanned(freq), catalog, version)
      .groupBy($"section").count()
      .as[(String, Long)].collect().toMap

  test("the 381-row master_map loads and 'both' expands to 622 mapping rows") {
    assume(present, "reference checkout not present")
    assert(catalog.count() == 622)
    val byModel = catalog.groupBy($"model").count()
      .as[(String, Long)].collect().toMap
    // 72 CM2-only + 68 ESM-only + 241 'both' rows (Python csv count):
    // each 'both' contributes one row per version — the documented
    // intent, not the reference's list-aliasing accident
    assert(byModel == Map("CM2" -> 313L, "ESM1.5" -> 309L))
    assert(direct.count() == 317) // calculation = '' after expansion
    assert(direct.select($"inputVars").distinct().count() == 182)
    // APP4 rows carry no dimensions/frequency/cell_methods/cmor_table
    assert(catalog.filter($"frequency" =!= "" || $"cmorTable" =!= "")
      .count() == 0)
  }

  test("templateSections ladder on the real catalog: pinned section counts") {
    assume(present, "reference checkout not present")
    // freq matches ('' vs ''), so the split is purely the version rung:
    // 170 of the 182 direct input vars have a CM2 row, 12 are ESM-only
    assert(sectionCounts("", "CM2") ==
      Map("matched" -> 170L, "no_ver" -> 12L))
    // a frequency the catalog doesn't carry pushes every var down the
    // ladder: version-only hits become no_frq, the rest unmatched
    assert(sectionCounts("mon", "CM2") ==
      Map("no_frq" -> 170L, "no_match" -> 12L))
    // the ESM1.5 lens sees a different version split of the same vars
    assert(sectionCounts("", "ESM1.5") ==
      Map("matched" -> 145L, "no_ver" -> 37L))
  }

  test("templateSections enrichment: pinned rows from the real catalog") {
    assume(present, "reference checkout not present")
    val got = Catalog.templateSections(scanned(""), catalog, "CM2")
      .filter($"varName".isin("fld_s30i297", "temp", "fld_s03i236"))
      .select($"varName", $"section", $"cmor_var", $"positive", $"units")
      .as[(String, String, String, String, String)].collect().toSet
    // fld_s30i297 resolves to 'zg' (not 'zg500') — both are CM2 direct
    // rows for this field, and the deterministic within-level
    // tie-break is m_cmor ascending
    assert(got == Set(
      ("fld_s30i297", "matched", "zg", "", "m"),
      ("temp", "matched", "bigthetao", "", "K"),
      ("fld_s03i236", "matched", "tas", "", "K")))
  }

  test("cmorName ladder agrees with the template winners on the real catalog") {
    assume(present, "reference checkout not present")
    val got = Catalog.cmorName(scanned(""), catalog, "CM2")
      .filter($"varName".isin("fld_s30i297", "temp", "age_global"))
      .select($"varName", $"cmor_var", $"cmor_table")
      .as[(String, String, String)].collect().toSet
    assert(got == Set(
      ("fld_s30i297", "zg", ""),
      ("temp", "bigthetao", ""),
      ("age_global", "agessc", "")))
  }

  test("derivable closure on the real catalog is the pinned 203-row set") {
    assume(present, "reference checkout not present")
    val avail = direct.select($"inputVars".as("varName"))
    val der = Catalog.derivable(catalog, avail)
      .as[(String, String)].collect().toSet
    assert(der.size == 203)
    assert(der.map(_._1).size == 190) // distinct derivable cmor vars
    // the multi-token closures the division actually earns: complete
    // input sets...
    assert(der.contains(("mfo", "tx_trans ty_trans")))
    assert(der.contains(("rtmt", "fld_s01i207 fld_s01i208 fld_s03i332")))
    assert(der.contains(("areacella", "fld_s02i204")))
    // ...and incomplete ones stay out (co2 needs 'lat'/'lat_v', which
    // no direct row provides; areacello needs 'area_t', same)
    assert(!der.exists(_._1 == "co2"))
    assert(!der.contains(("areacello", "area_t ht")))
    assert(!der.exists(_._1 == "abs550aer"))
    // exactly 6 derivable rows are multi-token
    assert(der.count(_._2.contains(" ")) == 6)
  }

  // ---- modern 17-field layout: map_aus2200_v1.csv ----

  private val ausPath = "/root/reference/data/mappings/map_aus2200_v1.csv"
  private lazy val aus = Catalog.loadMap(spark, ausPath)
  private lazy val ausDirect = aus.filter($"calculation" === "")

  test("loadMap: the 101-row aus2200 modern-layout catalog, pinned shape") {
    assume(present, "reference checkout not present")
    assert(aus.count() == 101)
    // real frequencies — the rung data APP4 never carried
    val byFreq = aus.groupBy($"frequency").count()
      .as[(String, Long)].collect().toMap
    assert(byFreq == Map("1hrPt" -> 46L, "1hr" -> 26L,
      "10minPt" -> 25L, "10min" -> 4L))
    assert(aus.filter($"model" =!= "AUS2200").count() == 0)
    // real cmor_table values (12 shipped rows carry a stray 18th
    // field past `version`; the 11 mapped fields must be unshifted)
    val byTable = aus.groupBy($"cmorTable").count()
      .as[(String, Long)].collect().toMap
    assert(byTable == Map("AUS2200_A1hr" -> 61L, "AUS2200_A10min" -> 28L,
      "AUS2200_A1hrPlev" -> 7L, "" -> 3L, "AUS2200_fx" -> 1L,
      "CMIP6_fx" -> 1L))
    assert(ausDirect.count() == 67)
    assert(ausDirect.select($"inputVars").distinct().count() == 58)
    // origin defaults to each row's own filename; alias overrides
    assert(aus.filter($"origin" === "umnsa_cldrad").count() == 9)
    assert(Catalog.loadMap(spark, ausPath, "aus2200")
      .filter($"origin" =!= "aus2200").count() == 0)
  }

  private def ausResolve(freq: String) = {
    val reqs = aus.select($"cmorVar").distinct()
      .withColumn("frequency", lit(freq))
    Catalog.resolve(reqs, aus)
  }

  test("resolve frequency-relaxation on real 1hrPt-style rungs: pinned outcomes") {
    assume(present, "reference checkout not present")
    // a 'day' request always finds a finer source: all 91 distinct
    // vars resolve as resampled, and the winner keeps its REAL
    // modifier-carrying frequency string
    val day = ausResolve("day")
    assert(day.groupBy($"status").count().as[(String, Long)]
      .collect().toMap == Map("resampled" -> 91L))
    assert(day.groupBy($"frequency").count().as[(String, Long)]
      .collect().toMap == Map("1hrPt" -> 45L, "1hr" -> 26L,
        "10minPt" -> 16L, "10min" -> 4L))
    // '1hr' requests: only the 26 true-'1hr' rows are exact —
    // '1hrPt' ranks level with '1hr' (modifier stripped) but is NOT
    // string-equal, so it resolves as a resample, never an exact hit
    val hr = ausResolve("1hr")
    assert(hr.groupBy($"status").count().as[(String, Long)]
      .collect().toMap == Map("exact" -> 26L, "resampled" -> 65L))
    // '10min' requests walk off the fine end of the ladder: only vars
    // with a 10min-rung row resolve, the other 62 are unmatched
    val mn = ausResolve("10min")
    assert(mn.groupBy($"status").count().as[(String, Long)]
      .collect().toMap ==
      Map("exact" -> 4L, "resampled" -> 25L, "unmatched" -> 62L))
    // pinned winners (independently recomputed): tas has rows at
    // '1hr' and '10minPt' — 'day' takes the NEAREST finer (1hr), and
    // the deterministic tie-break prefers the exact string at dist 0
    val pins = ausResolve("day").unionByName(ausResolve("1hr"))
      .unionByName(ausResolve("10min"))
      .filter($"req_var".isin("tas", "clmxro", "hfss_Pt"))
      .select($"req_var", $"req_freq", $"frequency", $"resample", $"status")
      .as[(String, String, String, String, String)].collect().toSet
    assert(pins.contains(("tas", "day", "1hr", "day", "resampled")))
    assert(pins.contains(("tas", "1hr", "1hr", "", "exact")))
    assert(pins.contains(("clmxro", "10min", "10minPt", "10min", "resampled")))
    assert(pins.contains(("hfss_Pt", "day", "1hrPt", "day", "resampled")))
    // hfss_Pt exists only at 1hrPt — a 10min request has no finer
    // source and must come back unmatched, not coarser-matched
    assert(pins.contains(("hfss_Pt", "10min", null, null, "unmatched")))
  }

  private def ausScannedReal =
    ausDirect.select($"inputVars".as("varName"), $"frequency").distinct()
      .withColumn("cmorVar", lit("")).withColumn("units", lit(""))

  test("templateSections on real frequencies: the version and frequency rungs split for real") {
    assume(present, "reference checkout not present")
    // 67 distinct (input, real-frequency) pairs; under the right
    // version every one is an exact (freq, version) hit...
    assert(ausScannedReal.count() == 67)
    def counts(scanned: org.apache.spark.sql.DataFrame, ver: String) =
      Catalog.templateSections(scanned, aus, ver)
        .groupBy($"section").count().as[(String, Long)].collect().toMap
    assert(counts(ausScannedReal, "AUS2200") == Map("matched" -> 67L))
    // ...under a wrong version the REAL frequency still matches, so
    // everything lands exactly one rung down (no_ver) — the rung APP4
    // data could only exercise with injected frequencies
    assert(counts(ausScannedReal, "CM2") == Map("no_ver" -> 67L))
    // a frequency the catalog doesn't carry drops to no_frq via the
    // version-only rung (58 distinct inputs)
    val scannedDay = ausDirect.select($"inputVars".as("varName")).distinct()
      .withColumn("frequency", lit("day"))
      .withColumn("cmorVar", lit("")).withColumn("units", lit(""))
    assert(counts(scannedDay, "AUS2200") == Map("no_frq" -> 58L))
    // enrichment pins: positive and units flow from the real rows
    val got = Catalog.templateSections(ausScannedReal, aus, "AUS2200")
      .filter($"varName".isin("fld_s03i217", "fld_s03i236"))
      .select($"varName", $"frequency", $"section", $"cmor_var",
        $"positive", $"units")
      .as[(String, String, String, String, String, String)].collect().toSet
    assert(got == Set(
      ("fld_s03i217", "1hrPt", "matched", "hfss_Pt", "up", "W m-2"),
      ("fld_s03i236", "1hr", "matched", "tas", "", "K"),
      ("fld_s03i236", "10minPt", "matched", "tas", "", "K")))
  }

  test("cmorName on the modern catalog carries REAL cmor_table values") {
    assume(present, "reference checkout not present")
    val cn = Catalog.cmorName(ausScannedReal, aus, "AUS2200")
    // 66 of the 67 scanned pairs resolve to a row with a real table
    assert(cn.groupBy($"cmor_table").count().as[(String, Long)]
      .collect().toMap == Map("AUS2200_A1hr" -> 39L,
        "AUS2200_A10min" -> 27L, "" -> 1L))
    val pins = Catalog.cmorName(Seq(
        ("fld_s03i217", "1hr"), ("fld_s00i024", "1hrPt"),
        ("fld_s16i222", "1hrPt"))
        .toDF("varName", "frequency"), aus, "AUS2200")
      .as[(String, String, String, String)].collect().toSet
    // frequency-mismatched scans still resolve via the version rung,
    // deterministically by (cmor_var, cmor_table)
    assert(pins == Set(
      ("fld_s03i217", "1hr", "hfss_Pt", "AUS2200_A1hr"),
      ("fld_s00i024", "1hrPt", "ts", "AUS2200_A10min"),
      ("fld_s16i222", "1hrPt", "psl", "AUS2200_A10min")))
  }

  // ---- second APP4 corpus: master_map_om2.csv ----

  private val om2Path = "/root/reference/data/mappings/master_map_om2.csv"
  private lazy val om2 = Catalog.loadApp4MasterMap(spark, om2Path)
  private lazy val om2Direct = om2.filter($"calculation" === "")

  test("the 210-row om2 master map expands to 376 rows; OM2 versions survive the ESM rename") {
    assume(present, "reference checkout not present")
    assert(om2.count() == 376)
    // 166 'both' rows expand pairwise; the 44 OM2/OM2-025 rows must
    // pass through the exact-VALUE rename untouched (a substring
    // replace would leave them alone too, but the 'both' expansion is
    // the documented-intent path, as on master_map.csv)
    assert(om2.groupBy($"model").count().as[(String, Long)]
      .collect().toMap == Map("CM2" -> 166L, "ESM1.5" -> 166L,
        "OM2" -> 24L, "OM2-025" -> 20L))
    // every OM2/OM2-025 row is a computed variable — so the DIRECT
    // catalog is exactly the both-expanded pairs
    assert(om2.filter($"model".startsWith("OM2") &&
      $"calculation" === "").count() == 0)
    assert(om2Direct.count() == 208)
    assert(om2Direct.select($"inputVars").distinct().count() == 104)
  }

  test("om2 templateSections: every direct input matches under CM2/ESM1.5, no_ver under OM2") {
    assume(present, "reference checkout not present")
    val scanned = om2Direct.select($"inputVars".as("varName")).distinct()
      .withColumn("frequency", lit(""))
      .withColumn("cmorVar", lit("")).withColumn("units", lit(""))
    def counts(ver: String) =
      Catalog.templateSections(scanned, om2, ver)
        .groupBy($"section").count().as[(String, Long)].collect().toMap
    assert(counts("CM2") == Map("matched" -> 104L))
    assert(counts("ESM1.5") == Map("matched" -> 104L))
    // no direct row carries an OM2 version, so the OM2 lens can never
    // clear the version rung
    assert(counts("OM2") == Map("no_ver" -> 104L))
    val pin = Catalog.templateSections(scanned, om2, "OM2")
      .filter($"varName" === "mld")
      .select($"section", $"cmor_var", $"units")
      .as[(String, String, String)].collect().toSet
    assert(pin == Set(("no_ver", "mlotst", "m")))
  }

  test("om2 derivable closure is the pinned 120-row set") {
    assume(present, "reference checkout not present")
    val avail = om2Direct.select($"inputVars".as("varName"))
    val der = Catalog.derivable(om2, avail)
      .as[(String, String)].collect().toSet
    assert(der.size == 120)
    assert(der.map(_._1).size == 120) // all distinct cmor vars
    // exactly these 4 multi-token closures complete
    assert(der.filter(_._2.contains(" ")) == Set(
      ("bigthetaoga", "temp rho_dzt"),
      ("mfo", "tx_trans ty_trans"),
      ("thetaoga", "pot_temp rho_dzt"),
      ("zostoga", "pot_temp dht")))
  }
}
