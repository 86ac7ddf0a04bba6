package graft.dsl

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** The calculation DSL: a safe compiler for the reference's catalog
  * `calculation` strings.
  *
  * The reference executes `array = eval(ctx.obj['calculation'])` over a
  * list of input arrays (mop_utils.py:899-901), with expressions like
  * `var[0]*var[1]`, `var[0]-273.15`, `(var[0]*106*0.012)/(16*50*1000)`,
  * `var[0]**2`, `var[0].fillna(0)`, `plevinterp(var[0], var[1], 24)`
  * coming from data/mappings/master_map.csv. Arbitrary eval is unsafe and
  * opaque to an optimizer; here the same grammar is parsed into a small
  * AST and lowered to Spark `Column` expressions, so Catalyst sees plain
  * arithmetic (constant folding, codegen) and named operator calls
  * resolve through an explicit registry.
  *
  * Python semantics preserved: `**` binds tighter than unary minus and is
  * right-associative; all literals are doubles. Integer-literal powers
  * (n ≤ 4) lower to chained multiplication so both Spark and any ANSI
  * oracle engine compute identical IEEE doubles (`pow` is transcendental
  * and engine-dependent; repeated multiply is not).
  *
  * [[Calc.toSql]] emits the same AST as an ANSI SQL fragment with an
  * identical expression tree — the cross-engine determinism contract.
  */
object Calc {

  // ---- AST --------------------------------------------------------------
  sealed trait Expr
  final case class Num(v: Double) extends Expr
  final case class VarRef(i: Int) extends Expr
  final case class Bin(op: String, l: Expr, r: Expr) extends Expr
  final case class Neg(e: Expr) extends Expr
  final case class Call(name: String, args: List[Expr], kwargs: Map[String, Expr]) extends Expr
  final case class Str(s: String) extends Expr
  final case class Ident(name: String) extends Expr      // e.g. `int`, bare `var`
  final case class ListLit(items: List[Expr]) extends Expr
  final case class TupleLit(items: List[Expr]) extends Expr
  final case class Method(recv: Expr, name: String, args: List[Expr],
      kwargs: Map[String, Expr] = Map.empty) extends Expr

  // ---- parser -----------------------------------------------------------
  final case class ParseError(msg: String, pos: Int)
    extends RuntimeException(s"$msg at $pos")

  def parse(src: String): Expr = new Parser(src).parseAll()

  private final class Parser(src: String) {
    private var pos = 0
    private def ws(): Unit = while (pos < src.length && src(pos).isWhitespace) pos += 1
    private def peek: Char = if (pos < src.length) src(pos) else ' '
    private def eat(c: Char): Unit = {
      ws(); if (peek != c) throw ParseError(s"expected '$c'", pos); pos += 1
    }
    private def tryEat(s: String): Boolean = {
      ws()
      if (src.startsWith(s, pos)) { pos += s.length; true } else false
    }

    def parseAll(): Expr = {
      val e = expr(); ws()
      if (pos != src.length) throw ParseError("trailing input", pos)
      e
    }

    // expr := term (('+'|'-') term)*
    private def expr(): Expr = {
      var l = term()
      var done = false
      while (!done) {
        ws()
        if (tryEat("+")) l = Bin("+", l, term())
        // careful: '-' but not part of a number handled in term/unary
        else if (peek == '-') { pos += 1; l = Bin("-", l, term()) }
        else done = true
      }
      l
    }

    // term := unary (('*' not '**' |'/') unary)*
    private def term(): Expr = {
      var l = unary()
      var done = false
      while (!done) {
        ws()
        if (src.startsWith("**", pos)) done = true
        else if (tryEat("*")) l = Bin("*", l, unary())
        else if (tryEat("/")) l = Bin("/", l, unary())
        else done = true
      }
      l
    }

    // unary := '-' unary | power   (Python: -x**2 == -(x**2))
    private def unary(): Expr = {
      ws()
      if (peek == '-') { pos += 1; Neg(unary()) }
      else power()
    }

    // power := postfix ('**' unary)?   (right-assoc, exponent may be unary)
    private def power(): Expr = {
      val base = postfix()
      if (tryEat("**")) Bin("**", base, unary()) else base
    }

    // postfix := atom ('.' ident '(' args ')')*
    private def postfix(): Expr = {
      var e = atom()
      var done = false
      while (!done) {
        ws()
        if (peek == '.' && pos + 1 < src.length && src(pos + 1).isLetter) {
          pos += 1
          val name = ident()
          eat('(')
          val (as, kw) = if ({ ws(); peek == ')' }) (Nil, Map.empty[String, Expr])
            else argList()
          eat(')')
          e = Method(e, name, as, kw)
        } else done = true
      }
      e
    }

    private def atom(): Expr = {
      ws()
      if (peek == '(') {
        // parenthesized expr, or a tuple literal `(a, b, ...)`
        eat('(')
        val first = expr()
        ws()
        if (peek == ',') {
          val items = List.newBuilder[Expr]
          items += first
          while ({ ws(); peek == ',' }) { pos += 1; items += expr() }
          eat(')')
          TupleLit(items.result())
        } else { eat(')'); first }
      }
      else if (peek == '\'') {
        pos += 1
        val start = pos
        while (pos < src.length && src(pos) != '\'') pos += 1
        if (pos >= src.length) throw ParseError("unterminated string", pos)
        val str = src.substring(start, pos)
        pos += 1
        Str(str)
      }
      else if (peek == '[') {
        eat('[')
        val items = List.newBuilder[Expr]
        if ({ ws(); peek != ']' }) {
          items += expr()
          while ({ ws(); peek == ',' }) { pos += 1; items += expr() }
        }
        eat(']')
        ListLit(items.result())
      }
      else if (peek.isDigit || peek == '.') number()
      else if (peek.isLetter || peek == '_') {
        val name = ident()
        ws()
        if (name == "var" && peek == '[') {
          eat('['); ws()
          val start = pos
          while (peek.isDigit) pos += 1
          if (pos == start) throw ParseError("expected index", pos)
          val i = src.substring(start, pos).toInt
          eat(']')
          VarRef(i)
        } else if (peek == '(') {
          eat('(')
          val (as, kw) = if ({ ws(); peek == ')' }) (Nil, Map.empty[String, Expr]) else argList()
          eat(')')
          Call(name, as, kw)
        } else Ident(name) // bare `int`, `var` (the whole input list), etc.
      } else throw ParseError(s"unexpected '$peek'", pos)
    }

    // argList := arg (',' arg)* ; arg := ident '=' expr | expr
    private def argList(): (List[Expr], Map[String, Expr]) = {
      val args = List.newBuilder[Expr]
      val kwargs = Map.newBuilder[String, Expr]
      var done = false
      while (!done) {
        ws()
        val save = pos
        val kw = if (peek.isLetter || peek == '_') {
          val n = ident(); ws()
          if (peek == '=' && !src.startsWith("==", pos)) { pos += 1; Some(n) }
          else { pos = save; None }
        } else None
        kw match {
          case Some(n) => kwargs += n -> expr()
          case None    => args += expr()
        }
        ws()
        if (peek == ',') pos += 1 else done = true
      }
      (args.result(), kwargs.result())
    }

    private def ident(): String = {
      ws()
      val start = pos
      if (!(peek.isLetter || peek == '_')) throw ParseError("expected identifier", pos)
      while (peek.isLetterOrDigit || peek == '_') pos += 1
      src.substring(start, pos)
    }

    private def number(): Expr = {
      val start = pos
      while (peek.isDigit) pos += 1
      if (peek == '.') { pos += 1; while (peek.isDigit) pos += 1 }
      if (peek == 'e' || peek == 'E') {
        pos += 1
        if (peek == '+' || peek == '-') pos += 1
        while (peek.isDigit) pos += 1
      }
      Num(src.substring(start, pos).toDouble)
    }
  }

  // ---- lowering to Column ----------------------------------------------

  /** Named-operator registry: catalog function name → implementation over
    * (positional column args, kwargs). Extend per deployment; the default
    * registry covers the scalar math the catalog uses. */
  type Fn = (List[Column], Map[String, Column]) => Column

  val defaultFns: Map[String, Fn] = Map(
    "sqrt" -> ((as, _) => sqrt(as.head)),
    "exp" -> ((as, _) => exp(as.head)),
    "log" -> ((as, _) => log(as.head)),
    "abs" -> ((as, _) => abs(as.head)),
    "rho_from_theta" -> ((as, _) => graft.ops.Eos.rho(as(0), as(1), as(2))),
    // reference scalar calculations (catalog-callable):
    // mask where sea-ice concentration is zero (calculations.py:701-717)
    "maskSeaIce" -> ((as, _) => when(as(1) =!= 0.0, as(0))),
    // K -> degC surface temperature (calculations.py:968-983)
    "tos_degC" -> ((as, _) => as(0) - 273.15),
    // snow concentration from thickness, 1-exp(-0.2*330*h)
    // (calculations.py:740-753)
    "sisnconc" -> ((as, _) => lit(1.0) - exp(as(0) * -66.0)))

  def toColumn(e: Expr, vars: Seq[Column], fns: Map[String, Fn] = defaultFns): Column = {
    def go(e: Expr): Column = e match {
      case Num(v)    => lit(v)
      case VarRef(i) => vars(i)
      case Neg(x)    => -go(x)
      case Bin("**", l, Num(n)) if n == n.toInt && n >= 1 && n <= 4 =>
        val b = go(l); (2 to n.toInt).foldLeft(b)((acc, _) => acc * b)
      case Bin(op, l, r) =>
        val (a, b) = (go(l), go(r))
        op match {
          case "+" => a + b; case "-" => a - b
          case "*" => a * b; case "/" => a / b
          case "**" => pow(a, b)
        }
      case Method(recv, "fillna", List(v), kw) if kw.isEmpty =>
        coalesce(go(recv), go(v))
      case Method(recv, "filled", List(v), kw) if kw.isEmpty =>
        coalesce(go(recv), go(v))
      case Method(_, name, _, _) =>
        // .isel/.sel/.sum(dim=...) re-shape the frame, not the column —
        // they belong to the planner (Pipeline filters / groupBys)
        throw new IllegalArgumentException(
          s"unsupported method .$name (frame-level ops are planner territory)")
      case Str(_) | Ident(_) | ListLit(_) | TupleLit(_) =>
        throw new IllegalArgumentException(
          "config-literal argument is only meaningful inside a registered operator call")
      case Call(name, args, kwargs) =>
        val fn = fns.getOrElse(name,
          throw new IllegalArgumentException(s"unknown calculation function '$name'"))
        fn(args.map(go), kwargs.map { case (k, v) => k -> go(v) })
    }
    go(e)
  }

  // ---- lowering to ANSI SQL (oracle twin) -------------------------------

  /** SQL-fragment registry mirroring [[defaultFns]]. */
  type SqlFn = (List[String], Map[String, String]) => String

  val defaultSqlFns: Map[String, SqlFn] = Map(
    "sqrt" -> ((as, _) => s"sqrt(${as.head})"),
    "exp" -> ((as, _) => s"exp(${as.head})"),
    "log" -> ((as, _) => s"ln(${as.head})"),
    "abs" -> ((as, _) => s"abs(${as.head})"),
    "rho_from_theta" -> ((as, _) => graft.ops.Eos.rhoSql(as(0), as(1), as(2))))

  /** Double literal that parses as DOUBLE (not DECIMAL) in ANSI engines. */
  private def dlit(v: Double): String = {
    val s = v.toString
    if (s.contains('E') || s.contains('e')) s else s + "e0"
  }

  def toSql(e: Expr, vars: Seq[String], fns: Map[String, SqlFn] = defaultSqlFns): String = {
    def go(e: Expr): String = e match {
      case Num(v)    => dlit(v)
      case VarRef(i) => vars(i)
      case Neg(x)    => s"(- ${go(x)})"
      case Bin("**", l, Num(n)) if n == n.toInt && n >= 1 && n <= 4 =>
        val b = go(l); s"(${(2 to n.toInt).foldLeft(b)((acc, _) => s"$acc * $b")})"
      case Bin("**", l, r) => s"pow(${go(l)}, ${go(r)})"
      case Bin(op, l, r)   => s"(${go(l)} $op ${go(r)})"
      case Method(recv, "fillna", List(v), kw) if kw.isEmpty =>
        s"COALESCE(${go(recv)}, ${go(v)})"
      case Method(recv, "filled", List(v), kw) if kw.isEmpty =>
        s"COALESCE(${go(recv)}, ${go(v)})"
      case Method(_, name, _, _) =>
        throw new IllegalArgumentException(
          s"unsupported method .$name (frame-level ops are planner territory)")
      case Str(_) | Ident(_) | ListLit(_) | TupleLit(_) =>
        throw new IllegalArgumentException(
          "config-literal argument is only meaningful inside a registered operator call")
      case Call(name, args, kwargs) =>
        val fn = fns.getOrElse(name,
          throw new IllegalArgumentException(s"unknown calculation function '$name'"))
        fn(args.map(go), kwargs.map { case (k, v) => k -> go(v) })
    }
    go(e)
  }

  /** Compile a calculation string directly to a Column over `vars`. */
  def compile(src: String, vars: Seq[Column], fns: Map[String, Fn] = defaultFns): Column =
    toColumn(parse(src), vars, fns)

  /** Compile a calculation string to its ANSI-SQL oracle twin. */
  def compileSql(src: String, vars: Seq[String], fns: Map[String, SqlFn] = defaultSqlFns): String =
    toSql(parse(src), vars, fns)
}
