package graft

import graft.dsl.Calc
import graft.dsl.Calc._
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Parser + lowering tests for the calculation DSL (pure, no Spark
  * session needed for parse; evaluation golden-tested via local eval). */
class CalcSpec extends AnyFunSuite {

  test("precedence: * binds tighter than +") {
    assert(parse("var[0]+var[1]*2") ==
      Bin("+", VarRef(0), Bin("*", VarRef(1), Num(2))))
  }

  test("power binds tighter than unary minus (python semantics)") {
    assert(parse("-var[0]**2") == Neg(Bin("**", VarRef(0), Num(2))))
  }

  test("power is right-associative") {
    assert(parse("var[0]**2**3") ==
      Bin("**", VarRef(0), Bin("**", Num(2), Num(3))))
  }

  test("method chaining and calls") {
    assert(parse("var[0].fillna(0)*var[1]") ==
      Bin("*", Method(VarRef(0), "fillna", List(Num(0))), VarRef(1)))
    assert(parse("plevinterp(var[0], var[1], 24)") ==
      Call("plevinterp", List(VarRef(0), VarRef(1), Num(24)), Map.empty))
  }

  test("kwargs parse on calls and methods") {
    val e = parse("f(var[0], dim=3)")
    assert(e == Call("f", List(VarRef(0)), Map("dim" -> Num(3))))
    // method kwargs are preserved in the AST (.isel(depth=0)); lowering
    // rejects them with a frame-level-op message, never drops them
    val m = parse("var[0].isel(depth=0)")
    assert(m == Method(VarRef(0), "isel", Nil, Map("depth" -> Num(0))))
    val err = intercept[IllegalArgumentException](
      Calc.toColumn(m, Seq(org.apache.spark.sql.functions.lit(1.0))))
    assert(err.getMessage.contains("isel"))
  }

  test("scientific literals and long constant ratios") {
    assert(parse("var[0]*12e-6") == Bin("*", VarRef(0), Num(12e-6)))
    assert(parse("(var[0]*106*0.012)/(16*50*1000)") ==
      Bin("/",
        Bin("*", Bin("*", VarRef(0), Num(106)), Num(0.012)),
        Bin("*", Bin("*", Num(16), Num(50)), Num(1000))))
  }

  test("errors: trailing junk and unknown names") {
    assertThrows[Calc.ParseError](parse("var[0] var[1]"))
    // a bare identifier parses (config tokens like `int`) but cannot
    // lower to a Column outside a registered call
    assert(parse("bareword") == Ident("bareword"))
    assertThrows[IllegalArgumentException](
      Calc.toColumn(parse("bareword"), Seq(lit(1.0))))
    assertThrows[IllegalArgumentException](
      Calc.toColumn(parse("nosuchfn(var[0])"), Seq(lit(1.0))))
  }

  test("catalog-corpus literal shapes parse") {
    assert(parse("level_to_height(var[0],levs=(0,66))") ==
      Call("level_to_height", List(VarRef(0)),
        Map("levs" -> TupleLit(List(Num(0), Num(66))))))
    assert(parse("var[0].sum(dim='depth')") ==
      Method(VarRef(0), "sum", Nil, Map("dim" -> Str("depth"))))
    assert(parse("tileFracExtract(var[0],var[1],[5,8]).filled(0)") ==
      Method(Call("tileFracExtract",
        List(VarRef(0), VarRef(1), ListLit(List(Num(5), Num(8)))), Map.empty),
        "filled", List(Num(0))))
    assert(parse("optical_depth(3,var)") ==
      Call("optical_depth", List(Num(3), Ident("var")), Map.empty))
    assert(parse("var[0].isel(time=0).astype(int)") ==
      Method(Method(VarRef(0), "isel", Nil, Map("time" -> Num(0))),
        "astype", List(Ident("int"))))
  }

  test("the entire reference mapping-catalog calculation corpus parses") {
    val dir = new java.io.File("/root/reference/data/mappings")
    assume(dir.isDirectory, "reference checkout not present")

    def splitCsv(line: String, d: Char): Vector[String] = {
      val out = Vector.newBuilder[String]
      val sb = new StringBuilder
      var inQ = false
      var i = 0
      while (i < line.length) {
        val c = line(i)
        if (c == '"') {
          if (inQ && i + 1 < line.length && line(i + 1) == '"') { sb += '"'; i += 1 }
          else inQ = !inQ
        } else if (c == d && !inQ) { out += sb.toString; sb.clear() }
        else sb += c
        i += 1
      }
      out += sb.toString
      out.result()
    }

    val calcs = dir.listFiles().filter(_.getName.endsWith(".csv")).toSeq.flatMap { f =>
      val lines = scala.io.Source.fromFile(f).getLines().toList
      // header = first line mentioning a `calculation` column (some files
      // start with a comment line); '#' prefixes on headers are stripped
      lines.indexWhere(_.toLowerCase.contains("calculation")) match {
        case -1 => Nil
        case hi =>
          val hline = lines(hi)
          val delim = if (hline.count(_ == ';') > hline.count(_ == ',')) ';' else ','
          val header = splitCsv(hline, delim).map(_.stripPrefix("#").trim.toLowerCase)
          val idx = header.indexOf("calculation")
          if (idx < 0) Nil
          else lines.drop(hi + 1).filterNot(_.startsWith("#")).flatMap { l =>
            val cells = splitCsv(l, delim)
            if (cells.length > idx) Some(cells(idx).trim).filter(_.nonEmpty) else None
          }
      }
    }.distinct
    assume(calcs.nonEmpty, "no calculation strings found")
    val failures = calcs.flatMap { c =>
      try { Calc.parse(c); None }
      catch { case e: Calc.ParseError => Some(s"$c -> ${e.getMessage}") }
    }
    assert(failures.isEmpty,
      s"${failures.length}/${calcs.length} failed:\n${failures.take(15).mkString("\n")}")
  }

  test("sql twin mirrors the tree") {
    val sql = Calc.compileSql("var[0]*(1.0-var[1])", Seq("a", "b"))
    assert(sql == "(a * (1.0e0 - b))")
    // integer power lowers to repeated multiply, not pow()
    val p = Calc.compileSql("var[0]**3", Seq("x"))
    assert(p == "(x * x * x)")
  }
}
