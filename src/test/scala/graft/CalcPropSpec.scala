package graft

import graft.dsl.Calc
import graft.dsl.Calc._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Property tests for the calculation-DSL parser: printing any AST with
  * explicit parentheses and re-parsing yields the same AST, and the SQL
  * twin renders for every supported shape. Deterministic seed, 300 cases
  * each. */
class CalcPropSpec extends AnyFunSuite {

  private val genNum: Gen[Expr] =
    Gen.chooseNum(0, 9999).map(n => Num(n.toDouble / 16.0)) // dyadic: exact round-trip
  private val genVar: Gen[Expr] = Gen.choose(0, 3).map(VarRef)

  private def genExpr(depth: Int): Gen[Expr] =
    if (depth <= 0) Gen.oneOf(genNum, genVar)
    else Gen.frequency(
      2 -> genNum,
      2 -> genVar,
      3 -> (for {
        op <- Gen.oneOf("+", "-", "*", "/")
        l <- genExpr(depth - 1); r <- genExpr(depth - 1)
      } yield Bin(op, l, r)),
      1 -> (for {
        l <- genExpr(depth - 1); n <- Gen.choose(2, 4)
      } yield Bin("**", l, Num(n.toDouble))),
      1 -> genExpr(depth - 1).map(Neg),
      1 -> (for {
        e <- genExpr(depth - 1); f <- genNum
      } yield Method(e, "fillna", List(f))),
      1 -> genExpr(depth - 1).map(e => Call("sqrt", List(e), Map.empty)))

  /** Fully parenthesized printer — the inverse the parser must invert. */
  private def print(e: Expr): String = e match {
    case Num(v)    => if (v == v.toLong) v.toLong.toString else v.toString
    case VarRef(i) => s"var[$i]"
    case Neg(x)    => s"(-${print(x)})"
    case Bin(op, l, r) => s"(${print(l)} $op ${print(r)})"
    case Method(recv, n, args, _) =>
      val r = print(recv)
      val rp = if (r.startsWith("(") || r.startsWith("var")) r else s"($r)"
      s"$rp.$n(${args.map(print).mkString(", ")})"
    case Call(n, args, kw) =>
      val all = args.map(print) ++ kw.map { case (k, v) => s"$k=${print(v)}" }
      s"$n(${all.mkString(", ")})"
    case other => // generator never emits literal/config nodes
      throw new IllegalStateException(s"printer: unexpected $other")
  }

  private def samples(n: Int): Seq[Expr] = {
    var seed = Seed(42L)
    (1 to n).map { _ =>
      val e = genExpr(4).pureApply(Gen.Parameters.default, seed)
      seed = seed.next
      e
    }
  }

  test("parse inverts the printer for 300 random ASTs") {
    samples(300).foreach { ast =>
      val src = print(ast)
      assert(Calc.parse(src) == ast, s"roundtrip failed for: $src")
    }
  }

  test("sql twin renders for every random AST without throwing") {
    val vars = Seq("a", "b", "c", "d")
    samples(300).foreach { ast =>
      assert(Calc.toSql(ast, vars).nonEmpty)
    }
  }
}
