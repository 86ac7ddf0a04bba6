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
    assertThrows[Calc.ParseError](parse("bareword"))
    assertThrows[IllegalArgumentException](
      Calc.toColumn(parse("nosuchfn(var[0])"), Seq(lit(1.0))))
  }

  test("sql twin mirrors the tree") {
    val sql = Calc.compileSql("var[0]*(1.0-var[1])", Seq("a", "b"))
    assert(sql == "(a * (1.0e0 - b))")
    // integer power lowers to repeated multiply, not pow()
    val p = Calc.compileSql("var[0]**3", Seq("x"))
    assert(p == "(x * x * x)")
  }
}
