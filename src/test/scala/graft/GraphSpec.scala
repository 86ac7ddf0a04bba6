package graft

import graft.ops.Graph
import org.apache.spark.sql.functions._

class GraphSpec extends SparkSpec {
  import spark.implicits._

  private def sym(pairs: (String, String)*) = {
    val fwd = pairs.toDF("src", "dst")
    fwd.unionByName(fwd.select($"dst".as("src"), $"src".as("dst")))
  }

  test("pageRank: a symmetric 2-cycle is a fixed point at 1/2") {
    // contrib = 0.5/1; new = 0.15/2 + 0.85*0.5 = 0.5 exactly, per round
    val r = Graph.pageRank(sym(("a", "b")), iters = 3)
      .as[(String, Double)].collect().toMap
    assert(r == Map("a" -> 0.5, "b" -> 0.5))
  }

  test("pageRank: star center dominates, leaves tie, mass ~ 1") {
    val r = Graph.pageRank(
      sym(("c", "l1"), ("c", "l2"), ("c", "l3")), iters = 3)
      .as[(String, Double)].collect().toMap
    val leaves = Seq("l1", "l2", "l3").map(r)
    assert(leaves.distinct.size == 1) // symmetry → identical ranks
    assert(r("c") > leaves.head * 2)
    // damped PR over a connected symmetric graph conserves rank mass
    // up to the 6-decimal per-term rounding (4 nodes × 3 rounds)
    assert(math.abs(r.values.sum - 1.0) < 1e-4)
  }

  test("pageRank: hand-walked star iteration 1") {
    // N=4: base = 0.0375, r0 = 0.25. Center receives 3 leaf whole-ranks,
    // a leaf receives round(0.25/3, 6) of the center's.
    val r1 = Graph.pageRank(
      sym(("c", "l1"), ("c", "l2"), ("c", "l3")), iters = 1)
      .as[(String, Double)].collect().toMap
    val center = BigDecimal("0.0375") + BigDecimal("0.85") * BigDecimal("0.75")
    assert(r1("c") ==
      center.setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    val leaf = BigDecimal("0.0375") +
      (BigDecimal("0.85") * BigDecimal("0.083333"))
    assert(r1("l1") ==
      leaf.setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
  }

  test("personalized pageRank: mass stays on the seed frontier") {
    // two disjoint 2-cycles; seeding {a} must leave c,d unranked
    val edges = sym(("a", "b"), ("c", "d"))
    val seeds = Seq("a").toDF("node")
    val r = Graph.pageRankPersonalized(edges, seeds, iters = 2)
      .as[(String, Double)].collect().toMap
    assert(!r.contains("c") && !r.contains("d"))
    // it1: a=0.15, b=0.85. it2: a = 0.15 + 0.85·0.85, b = 0.85·0.15
    def dec(s: String) = BigDecimal(s)
    assert(r("a") == (dec("0.15") + dec("0.85") * dec("0.85"))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    assert(r("b") == (dec("0.85") * dec("0.15"))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
  }

  test("personalized pageRank: seeds with no returned mass keep base") {
    // path a-b-c seeded {a}: after 1 iter b carries 0.85, a keeps base
    val r = Graph.pageRankPersonalized(
      sym(("a", "b"), ("b", "c")), Seq("a").toDF("node"), iters = 1)
      .as[(String, Double)].collect().toMap
    assert(r("a") == 0.15 && r("b") == 0.85 && !r.contains("c"))
  }

  test("kCorePeel: pendant peels, the 3-core clique is stable") {
    // 4-clique (every degree 3) plus a pendant e hanging off d
    val clique = for {
      a <- Seq("a", "b", "c", "d"); b <- Seq("a", "b", "c", "d")
      if a < b
    } yield (a, b)
    val edges = sym(clique :+ (("d", "e")): _*)
    val out = Graph.kCorePeel(edges, k = 3, rounds = 2)
      .as[(Long, Long, Long)].collect().toSeq
    // round 1 drops e (degree 1) and its edge; round 2 is a fixed point
    assert(out == Seq((1L, 4L, 12L), (2L, 4L, 12L)))
  }

  test("kCorePeel: k above the max degree empties the graph") {
    val out = Graph.kCorePeel(sym(("a", "b"), ("b", "c")), k = 5,
        rounds = 2)
      .as[(Long, Long, Long)].collect().toSeq
    assert(out == Seq((1L, 0L, 0L), (2L, 0L, 0L)))
  }

  test("pageRankDirected: hand-walked chain with a sink, iteration 1") {
    // a→b→c, c dangling. n=3, r0=0.333333, base=0.05.
    // D = 0.333333, dshare = round(D/3, 6) = 0.111111.
    val r = Graph.pageRankDirected(
      Seq(("a", "b"), ("b", "c")).toDF("src", "dst"), iters = 1)
      .as[(String, Double)].collect().toMap
    def dec(s: String) = BigDecimal(s)
    def blend(sm: String) = (dec("0.05") + dec("0.85") *
        (dec(sm) + dec("0.111111")))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(r("a") == blend("0")) // no in-edges: base + dangling share only
    assert(r("b") == blend("0.333333"))
    assert(r("c") == blend("0.333333"))
    // redistribution conserves mass up to per-term 6-decimal rounding
    assert(math.abs(r.values.sum - 1.0) < 1e-4)
  }

  test("pageRankDirected: sink mass does NOT leak over iterations") {
    // star of sinks: s→t1..t4. Without the dangling term, 4/5 of the
    // mass would vanish in round 1 and the total would decay ~0.85^k.
    val edges = (1 to 4).map(i => ("s", s"t$i")).toDF("src", "dst")
    val r = Graph.pageRankDirected(edges, iters = 4)
      .as[(String, Double)].collect().toMap
    assert(math.abs(r.values.sum - 1.0) < 1e-3)
    assert(Seq("t1", "t2", "t3", "t4").map(r).distinct.size == 1)
  }

  test("pageRankDirected equals pageRank on a dangling-free symmetric graph") {
    // with no sinks the dangling term is exactly 0 every round, so the
    // two formulations must walk identical arithmetic
    val edges = sym(("a", "b"), ("b", "c"), ("c", "d"))
    val d = Graph.pageRankDirected(edges, 3).as[(String, Double)].collect().toSet
    val s0 = Graph.pageRank(edges, 3).as[(String, Double)].collect().toSet
    assert(d == s0)
  }

  test("hits: hand-walked co-citation pair, L1 mass = 1 on both sides") {
    // a→b, c→b: b is the sole authority; a and c split the hub mass
    val r = Graph.hits(Seq(("a", "b"), ("c", "b")).toDF("src", "dst"),
        iters = 2)
      .as[(String, Double, Double)].collect()
      .map(t => t._1 -> (t._2, t._3)).toMap
    assert(r("b") == (1.0, 0.0))
    assert(r("a") == (0.0, 0.5) && r("c") == (0.0, 0.5))
    assert(math.abs(r.values.map(_._1).sum - 1.0) < 1e-5)
    assert(math.abs(r.values.map(_._2).sum - 1.0) < 1e-5)
  }

  test("hits separates hub and authority roles on a directed chain") {
    // x→y, y→z: z is pure authority, x pure hub, y carries both
    val r = Graph.hits(Seq(("x", "y"), ("y", "z")).toDF("src", "dst"),
        iters = 3)
      .as[(String, Double, Double)].collect()
      .map(t => t._1 -> (t._2, t._3)).toMap
    assert(r("x")._1 == 0.0 && r("x")._2 > 0.0)
    assert(r("z")._1 > 0.0 && r("z")._2 == 0.0)
    assert(r("y")._1 > 0.0 && r("y")._2 > 0.0)
  }

  test("triangleStats: K4 + pendant — counts and coefficients exact") {
    val k4 = for {
      a <- Seq(1L, 2L, 3L, 4L); b <- Seq(1L, 2L, 3L, 4L) if a < b
    } yield (a, b)
    val pairs = (k4 :+ ((4L, 5L))).toDF("d1", "d2")
    val r = Graph.triangleStats(pairs)
      .as[(Long, Long, Long, Double)].collect()
      .map(t => t._1 -> (t._2, t._3, t._4)).toMap
    // nodes 1..3: degree 3, in all 3 of their triangles, clustering 1
    Seq(1L, 2L, 3L).foreach(n => assert(r(n) == (3L, 3L, 1.0), r(n)))
    // node 4: degree 4 (pendant edge), same 3 triangles, 2·3/(4·3)=0.5
    assert(r(4L) == (4L, 3L, 0.5))
    // the pendant: degree 1, no triangle, coefficient 0 by convention
    assert(r(5L) == (1L, 0L, 0.0))
  }

  test("triangleStats counts each triangle once regardless of id order") {
    // triangle with ids arranged so id-ordering and degree-ordering
    // disagree (9 is the low-degree node): still exactly one triangle
    val pairs = Seq((1L, 9L), (1L, 5L), (5L, 9L), (1L, 2L), (1L, 3L))
      .toDF("d1", "d2")
    val r = Graph.triangleStats(pairs)
      .as[(Long, Long, Long, Double)].collect()
      .map(t => t._1 -> t._3).toMap
    assert(r(1L) == 1L && r(5L) == 1L && r(9L) == 1L)
    assert(r(2L) == 0L && r(3L) == 0L)
  }

  test("labelPropagate: majority adoption, tie to the smaller label, seed clamp") {
    // x sees two A-seeds and one B-seed -> A; t sees one of each -> tie
    // breaks to 'A'; b1 is CLAMPED at B no matter what reaches it
    val edges = sym(("x", "a1"), ("x", "a2"), ("x", "b1"), ("t", "a1"),
      ("t", "b1"))
    val seeds = Seq(("a1", "A"), ("a2", "A"), ("b1", "B"))
      .toDF("node", "label")
    val r = Graph.labelPropagate(edges, seeds, rounds = 2)
      .as[(String, Option[String])].collect().toMap
    assert(r("x").contains("A"))
    assert(r("t").contains("A"))
    assert(r("b1").contains("B"))
    assert(r("a1").contains("A") && r("a2").contains("A"))
  }

  test("labelPropagate: diffusion advances one hop per round") {
    // chain seed — n1 — n2: n2 is unreachable in 1 round, labeled in 2
    val edges = sym(("seed", "n1"), ("n1", "n2"))
    val seeds = Seq(("seed", "L")).toDF("node", "label")
    val r1 = Graph.labelPropagate(edges, seeds, rounds = 1)
      .as[(String, Option[String])].collect().toMap
    assert(r1("n1").contains("L") && r1("n2").isEmpty)
    val r2 = Graph.labelPropagate(edges, seeds, rounds = 2)
      .as[(String, Option[String])].collect().toMap
    assert(r2("n2").contains("L"))
  }

  test("bfsFrontier: hop-exact reach on a lollipop graph") {
    // seed a; triangle a-b-c plus a tail c-d-e: hop1 = {b, c},
    // hop2 = {d}, hop3 = {e}
    val edges = sym(("a", "b"), ("a", "c"), ("b", "c"), ("c", "d"),
      ("d", "e"))
    val out = Graph.bfsFrontier(edges, Seq("a").toDF("node"), hops = 3)
      .as[(Long, Long, Long)].collect().toSeq
    assert(out == Seq((0L, 1L, 1L), (1L, 2L, 3L), (2L, 1L, 4L),
      (3L, 1L, 5L)))
  }

  test("bfsFrontier: an exhausted frontier stays empty") {
    val out = Graph.bfsFrontier(sym(("a", "b")), Seq("a").toDF("node"),
        hops = 3)
      .as[(Long, Long, Long)].collect().toSeq
    assert(out == Seq((0L, 1L, 1L), (1L, 1L, 2L), (2L, 0L, 2L),
      (3L, 0L, 2L)))
  }

  test("adamicAdar: rare shared group outweighs a hub group") {
    // g1 = {a, b} (size 2), gh = {a, b, c, d, e, f} (size 6):
    // aa(a,b) = round(1/ln 2, 6) + round(1/ln 6, 6); any other pair
    // shares only the hub. The rare group dominates: aa(a,b) > 2·aa(c,d).
    val memb = (Seq(("a", "g1"), ("b", "g1")) ++
      Seq("a", "b", "c", "d", "e", "f").map(i => (i, "gh")))
      .toDF("item", "grp")
    val r = Graph.adamicAdar(memb)
      .as[(String, String, Long, Double)].collect()
      .map { case (i1, i2, sh, aa) => (i1, i2) -> (sh, aa) }.toMap
    val wRare = BigDecimal(1.0 / math.log(2.0))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP)
    val wHub = BigDecimal(1.0 / math.log(6.0))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP)
    assert(r(("a", "b")) == ((2L, (wRare + wHub).toDouble)))
    assert(r(("c", "d")) == ((1L, wHub.toDouble)))
    assert(r.size == 15) // C(6,2): every pair shares the hub
  }

  test("adamicAdar: size-1 groups contribute nothing") {
    val memb = Seq(("a", "solo1"), ("b", "solo2"), ("a", "g"), ("b", "g"))
      .toDF("item", "grp")
    val r = Graph.adamicAdar(memb)
      .as[(String, String, Long, Double)].collect().toSeq
    val w = BigDecimal(1.0 / math.log(2.0))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(r == Seq(("a", "b", 1L, w)))
  }

  test("sssp: two cheap hops beat one expensive edge") {
    // a-b direct w=5; a-c w=1, c-b w=1. Round 1 sees only the direct
    // edge (dist b = 5); round 2 relaxes through c (dist b = 2).
    val w = Map(("a", "b") -> 5L, ("a", "c") -> 1L, ("c", "b") -> 1L)
    val fwd = w.toSeq.map { case ((s, d), x) => (s, d, x) }
      .toDF("src", "dst", "w")
    val edges = fwd.unionByName(
      fwd.select($"dst".as("src"), $"src".as("dst"), $"w"))
    val seeds = Seq("a").toDF("node")
    val r1 = Graph.sssp(edges, seeds, rounds = 1)
      .as[(String, Long)].collect().toMap
    assert(r1 == Map("a" -> 0L, "b" -> 5L, "c" -> 1L))
    val r2 = Graph.sssp(edges, seeds, rounds = 2)
      .as[(String, Long)].collect().toMap
    assert(r2 == Map("a" -> 0L, "b" -> 2L, "c" -> 1L))
  }

  test("sssp: unreached nodes are absent; extra rounds are stable") {
    val edges = Seq(("a", "b", 2L), ("x", "y", 1L)).toDF("src", "dst", "w")
    val r = Graph.sssp(edges, Seq("a").toDF("node"), rounds = 3)
      .as[(String, Long)].collect().toMap
    assert(r == Map("a" -> 0L, "b" -> 2L))
  }

  test("randomWalk: single-edge graph oscillates deterministically") {
    // deg(a) = deg(b) = 1, so every pick is neighbor 1: a walker
    // seeded at a must visit b, a, b at steps 1..3.
    val out = Graph.randomWalk(sym(("a", "b")), Seq("a").toDF("node"),
        steps = 3)
      .as[(String, String, Long)].collect().toSeq.sortBy(_._3)
    assert(out == Seq(("a", "a", 0L), ("a", "b", 1L), ("a", "a", 2L),
      ("a", "b", 3L)))
  }

  test("randomWalk: steps follow edges and replay identically") {
    val edges = sym(("a", "b"), ("a", "c"), ("b", "c"), ("c", "d"))
    val seeds = Seq("a", "b", "c", "d").toDF("node")
    val t1 = Graph.randomWalk(edges, seeds, steps = 3)
      .as[(String, String, Long)].collect().toSet
    val t2 = Graph.randomWalk(edges, seeds, steps = 3)
      .as[(String, String, Long)].collect().toSet
    assert(t1 == t2) // hash-seeded: bit-identical replay
    // every walker advances every step (symmetric graph, no sinks)
    assert(t1.size == 4 * 4)
    // consecutive positions are always joined by an edge
    val adj = edges.as[(String, String)].collect().toSet
    val byWalker = t1.groupBy(_._1).values
    byWalker.foreach { rows =>
      rows.toSeq.sortBy(_._3).map(_._2).sliding(2).foreach {
        case Seq(u, v) => assert(adj.contains((u, v)), s"$u->$v")
        case _         =>
      }
    }
  }

  test("randomWalk: a directed sink ends the walk") {
    // a -> b only (directed): the walker reaches b at step 1 and b
    // has no out-edges, so steps 2..3 produce no rows.
    val out = Graph.randomWalk(Seq(("a", "b")).toDF("src", "dst"),
        Seq("a").toDF("node"), steps = 3)
      .as[(String, String, Long)].collect().toSeq.sortBy(_._3)
    assert(out == Seq(("a", "a", 0L), ("a", "b", 1L)))
  }

  test("modularity: two disjoint triangles split correctly scores 0.5") {
    val edges = sym(("a", "b"), ("b", "c"), ("a", "c"),
      ("x", "y"), ("y", "z"), ("x", "z"))
    val comm = Seq("a" -> "L", "b" -> "L", "c" -> "L",
      "x" -> "R", "y" -> "R", "z" -> "R").toDF("node", "label")
    val r = Graph.modularity(edges, comm)
      .as[(String, Long, Long, Long, Double)].collect()
      .map(t => t._1 -> t).toMap
    // per community: m2=12, d_c=6, e_in=6 → (12·6 − 36)/144 = 0.25
    assert(r("L") == (("L", 3L, 6L, 6L, 0.25)))
    assert(r("R") == (("R", 3L, 6L, 6L, 0.25)))
    assert(r("__all__") == (("__all__", 6L, 12L, 12L, 0.5)))
  }

  test("modularity: the everything-in-one-community partition scores 0") {
    val edges = sym(("a", "b"), ("b", "c"), ("a", "c"))
    val comm = Seq("a", "b", "c").map(_ -> "one").toDF("node", "label")
    val r = Graph.modularity(edges, comm)
      .as[(String, Long, Long, Long, Double)].collect()
      .map(t => t._1 -> t._5).toMap
    assert(r("one") == 0.0 && r("__all__") == 0.0)
  }

  test("assortativityR: exact past 2^63 where long products would wrap") {
    // Sums from a synthetic hub-heavy graph far beyond any tested SF:
    // s_j = Σ deg² = 4·10⁹, so s_j·s_j = 1.6·10¹⁹ > 2^63 ≈ 9.22·10¹⁸.
    // Long arithmetic wraps silently (non-ANSI); decimal(38,0) is exact.
    val m = 80000000L         // edges (symmetric frame)
    val sj = 4000000000L      // Σ j  (= Σ deg² over edges)
    val sjk = 3999999000L     // Σ j·k
    val sj2 = 260000000000L   // Σ j²
    val sums = Seq((m, sj, sjk, sj2))
      .toDF("m_edges", "s_j", "s_jk", "s_j2")
    val r = Graph.assortativityR(sums)
      .select($"r_assort").as[Double].head()
    // BigDecimal ground truth, same 6-decimal HALF_UP rounding
    def bd(x: Long) = BigDecimal(x)
    val num = bd(m) * bd(sjk) - bd(sj) * bd(sj)
    val den = bd(m) * bd(sj2) - bd(sj) * bd(sj)
    val expect = BigDecimal(num.toDouble / den.toDouble)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(r == expect)
    // the landmine this guards: the long products really do wrap
    assert(sj * sj < 0L)
    // and the wrapped value really would corrupt r (not a benign wrap)
    val wrapped = ((m * sjk - sj * sj).toDouble /
      (m * sj2 - sj * sj).toDouble)
    assert(math.abs(wrapped - expect) > 1e-3)
  }

  test("assortativityR matches the inline formula at small scale") {
    // path graph a-b-c (symmetric): degrees a=1 b=2 c=1.
    // edges (j,k): (1,2),(2,1),(2,1),(1,2) → m=4, s_j=6, s_jk=8, s_j2=10
    // r = (4·8 − 36) / (4·10 − 36) = −4/4 = −1 (a perfect path is
    // maximally disassortative)
    val sums = Seq((4L, 6L, 8L, 10L)).toDF("m_edges", "s_j", "s_jk", "s_j2")
    assert(Graph.assortativityR(sums).select($"r_assort")
      .as[Double].head() == -1.0)
  }

  test("louvainMove: a mislabeled triangle member moves home") {
    // two triangles bridged by c–x; partition puts c with the wrong
    // triangle. s_stay(c) = 14·1 − 7·3 = −7; s_move(c→L) = 14·2 − 4·3
    // = 16 — the only strictly-improving proposal, so it is accepted
    // and the sweep recovers the perfect 2-community split.
    val edges = sym(("a", "b"), ("b", "c"), ("a", "c"),
      ("x", "y"), ("y", "z"), ("x", "z"), ("c", "x"))
    val comm = Seq("a" -> "L", "b" -> "L", "c" -> "R",
      "x" -> "R", "y" -> "R", "z" -> "R").toDF("node", "label")
    val r = Graph.louvainMove(edges, comm)
      .as[(String, String)].collect().toMap
    assert(r == Map("a" -> "L", "b" -> "L", "c" -> "L",
      "x" -> "R", "y" -> "R", "z" -> "R"))
    // and Q strictly increased
    def q(c: Map[String, String]) = Graph.modularity(edges,
        c.toSeq.toDF("node", "label"))
      .filter($"label" === "__all__").select($"q_term")
      .as[Double].head()
    assert(q(r) > q(Map("a" -> "L", "b" -> "L", "c" -> "R",
      "x" -> "R", "y" -> "R", "z" -> "R")))
  }

  test("louvainMove: conflicting proposals accept exactly one winner") {
    // star hub h, leaves l1..l4, all singletons. Every node proposes
    // (leaves into 'h', h into 'l1' — its equal-gain tie broken label
    // asc); every proposal touches community 'h', where the rank order
    // (gain desc, node asc) puts h first — so ONLY h's move survives
    // the conflict-free rule, and the accepted gain stays exact.
    val edges = sym(("h", "l1"), ("h", "l2"), ("h", "l3"), ("h", "l4"))
    val comm = Seq("h", "l1", "l2", "l3", "l4").map(n => n -> n)
      .toDF("node", "label")
    val r = Graph.louvainMove(edges, comm)
      .as[(String, String)].collect().toMap
    assert(r == Map("h" -> "l1", "l1" -> "l1", "l2" -> "l2",
      "l3" -> "l3", "l4" -> "l4"))
    // Q: all-singletons −20/64, after {h,l1} −12/64 — strict increase
    def q(c: Map[String, String]) = Graph.modularity(edges,
        c.toSeq.toDF("node", "label"))
      .filter($"label" === "__all__").select($"q_term")
      .as[Double].head()
    assert(q(r) == -0.1875)
    assert(q(comm.as[(String, String)].collect().toMap) == -0.3125)
  }

  test("louvainMove: a stable partition is a fixed point") {
    val edges = sym(("a", "b"), ("b", "c"), ("a", "c"),
      ("x", "y"), ("y", "z"), ("x", "z"), ("c", "x"))
    val comm = Seq("a" -> "L", "b" -> "L", "c" -> "L",
      "x" -> "R", "y" -> "R", "z" -> "R").toDF("node", "label")
    val r = Graph.louvainMove(edges, comm)
      .as[(String, String)].collect().toMap
    assert(r.filterKeys(Set("a", "b", "c")).values.toSet == Set("L"))
    assert(r.filterKeys(Set("x", "y", "z")).values.toSet == Set("R"))
  }

  test("pageRankWeighted: w = 1 collapses to plain pageRank") {
    val edges = sym(("c", "l1"), ("c", "l2"), ("c", "l3"), ("l1", "l2"))
    val weighted = edges.withColumn("w", lit(1L))
    val a = Graph.pageRank(edges, 3)
      .as[(String, Double)].collect().toMap
    val b = Graph.pageRankWeighted(weighted, 3)
      .as[(String, Double)].collect().toMap
    assert(a == b)
  }

  test("pageRankWeighted: hand-walked skewed triangle, iteration 1") {
    // symmetric triangle; a routes 9/10 of its mass to b. N=3,
    // base=0.05, r0=0.333333; wout a=10, b=2, c=2.
    val fwd = Seq(("a", "b", 9L), ("a", "c", 1L), ("b", "a", 1L),
      ("b", "c", 1L), ("c", "a", 1L), ("c", "b", 1L))
      .toDF("src", "dst", "w")
    val r = Graph.pageRankWeighted(fwd, 1)
      .as[(String, Double)].collect().toMap
    // unit shares: a: round(0.0333333, 6) = 0.033333 (scaled ×9 / ×1),
    // b, c: round(0.1666665, 6) = 0.166667 (canonical-string HALF_UP)
    assert(r("a") == 0.333334) // 0.05 + 0.85·(0.166667 + 0.166667)
    assert(r("b") == 0.446664) // 0.05 + 0.85·(9·0.033333 + 0.166667)
    assert(r("c") == 0.22)     // 0.05 + 0.85·(0.033333 + 0.166667)
  }

  test("labelPropagateWeighted: w = 1 collapses to plain labelPropagate") {
    val edges = sym(("a", "b"), ("b", "c"), ("c", "d"))
    val seeds = Seq("a" -> "L", "d" -> "R").toDF("node", "label")
    val a = Graph.labelPropagate(edges, seeds, 2)
      .as[(String, String)].collect().toMap
    val b = Graph.labelPropagateWeighted(
      edges.withColumn("w", lit(1L)), seeds, 2)
      .as[(String, String)].collect().toMap
    assert(a == b)
  }

  test("labelPropagateWeighted: one heavy edge outvotes two light ones") {
    // m's neighbors: seed L over weight 5, seeds R1/R2 (label 'R')
    // over weight 1 each — unweighted majority says R (mass 2 vs 1),
    // weighted mass says L (5 vs 2)
    val fwd = Seq(("l", "m", 5L), ("r1", "m", 1L), ("r2", "m", 1L))
      .toDF("src", "dst", "w")
    val edges = fwd.unionByName(
      fwd.select($"dst".as("src"), $"src".as("dst"), $"w"))
    val seeds = Seq("l" -> "L", "r1" -> "R", "r2" -> "R")
      .toDF("node", "label")
    val w = Graph.labelPropagateWeighted(edges, seeds, 1)
      .as[(String, String)].collect().toMap
    assert(w("m") == "L")
    val u = Graph.labelPropagate(edges.drop("w"), seeds, 1)
      .as[(String, String)].collect().toMap
    assert(u("m") == "R")
  }

  test("conductance: bridged triangles leak exactly the bridge") {
    val edges = sym(("a", "b"), ("b", "c"), ("a", "c"),
      ("x", "y"), ("y", "z"), ("x", "z"), ("c", "x"))
    val comm = Seq("a" -> "L", "b" -> "L", "c" -> "L",
      "x" -> "R", "y" -> "R", "z" -> "R").toDF("node", "label")
    val r = Graph.conductance(edges, comm)
      .as[(String, Long, Long, Double)].collect()
      .map(t => t._1 -> t).toMap
    // vol = 2+2+3 = 7 per side, cut = the one bridge row each way
    assert(r("L") == (("L", 7L, 1L, 0.142857)))
    assert(r("R") == (("R", 7L, 1L, 0.142857)))
  }

  test("conductance: a single community has no boundary to score") {
    val edges = sym(("a", "b"), ("b", "c"))
    val comm = Seq("a", "b", "c").map(_ -> "one").toDF("node", "label")
    val r = Graph.conductance(edges, comm)
      .as[(String, Long, Long, Double)].collect()
    assert(r.toSeq == Seq(("one", 4L, 0L, 0.0)))
  }

  test("kTrussPeel: 4-truss keeps K4, peels the pendant triangle") {
    // K4 on a,b,c,d (every edge in 2 K4-triangles; (a,b) also closes
    // {a,b,p} for 3) plus pendant triangle edges (a,p),(b,p) with
    // support 1 — k=4 demands support >= 2, so the pendant peels in
    // round 1 and K4 is the stable truss
    val pairs = Seq(("a", "b"), ("a", "c"), ("a", "d"), ("b", "c"),
      ("b", "d"), ("c", "d"), ("a", "p"), ("b", "p")).toDF("d1", "d2")
    val r = Graph.kTrussPeel(pairs, k = 4, rounds = 2)
      .as[(Long, Long, Long)].collect().toSeq
    assert(r == Seq((1L, 4L, 6L), (2L, 4L, 6L)))
  }

  test("kTrussPeel: 3-truss drops triangle-free chains, keeps all closed edges") {
    val pairs = Seq(("a", "b"), ("a", "c"), ("a", "d"), ("b", "c"),
      ("b", "d"), ("c", "d"), ("a", "p"), ("b", "p"),
      ("x", "y"), ("y", "z")).toDF("d1", "d2")
    val r = Graph.kTrussPeel(pairs, k = 3, rounds = 1)
      .as[(Long, Long, Long)].collect().toSeq
    assert(r == Seq((1L, 5L, 8L)))
  }

  test("kTrussPeel: cascading peel needs the second round") {
    // diamond a-b-c-d with chord (b,c): triangles {a,b,c},{b,c,d}.
    // supports: (b,c)=2, the four rim edges 1 each. k=4 round 1 keeps
    // only (b,c); round 2 finds it triangle-free and peels it too —
    // the cascade a single-pass support filter would miss.
    val pairs = Seq(("a", "b"), ("a", "c"), ("b", "c"), ("b", "d"),
      ("c", "d")).toDF("d1", "d2")
    val r = Graph.kTrussPeel(pairs, k = 4, rounds = 2)
      .as[(Long, Long, Long)].collect().toSeq
    assert(r == Seq((1L, 2L, 1L), (2L, 0L, 0L)))
  }

  test("contract: bridged triangles collapse to two weighted supernodes") {
    val edges = sym(("a", "b"), ("b", "c"), ("a", "c"),
      ("x", "y"), ("y", "z"), ("x", "z"), ("c", "x"))
    val comm = Seq("a" -> "L", "b" -> "L", "c" -> "L",
      "x" -> "R", "y" -> "R", "z" -> "R").toDF("node", "label")
    val g = Graph.contract(edges, comm)
      .as[(String, String, Long)].collect().toSet
    // each triangle's 3 undirected edges = 6 directed rows -> the
    // self-row carries the doubled intra mass; one bridge each way
    assert(g == Set(("L", "L", 6L), ("R", "R", 6L),
      ("L", "R", 1L), ("R", "L", 1L)))
  }

  test("modularityWeighted: Q is invariant under contraction") {
    val edges = sym(("a", "b"), ("b", "c"), ("a", "c"),
      ("x", "y"), ("y", "z"), ("x", "z"), ("c", "x"))
    val comm = Seq("a" -> "L", "b" -> "L", "c" -> "L",
      "x" -> "R", "y" -> "R", "z" -> "R").toDF("node", "label")
    def allQ(e: org.apache.spark.sql.DataFrame,
        c: org.apache.spark.sql.DataFrame) =
      Graph.modularityWeighted(e, c)
        .filter($"label" === "__all__").select($"q_term")
        .as[Double].head()
    val qOrig = allQ(edges.withColumn("w", lit(1L)), comm)
    val g = Graph.contract(edges, comm)
    val ident = Seq("L" -> "L", "R" -> "R").toDF("node", "label")
    assert(allQ(g, ident) == qOrig)
    // and the weighted op agrees with the unweighted q_term
    val qUnweighted = Graph.modularity(edges, comm)
      .filter($"label" === "__all__").select($"q_term")
      .as[Double].head()
    assert(qOrig == qUnweighted)
  }

  test("louvainMoveWeighted: heavy pair merges, tie broken by node asc") {
    val edges = Seq(("u", "v", 5L), ("v", "u", 5L)).toDF("src", "dst", "w")
    val ident = Seq("u" -> "u", "v" -> "v").toDF("node", "label")
    val r = Graph.louvainMoveWeighted(edges, ident)
      .as[(String, String)].collect().toMap
    assert(r == Map("u" -> "v", "v" -> "v"))
  }

  test("louvainMoveWeighted: self-mass travels with the node and Q rises") {
    // x carries self-mass 6 (a contracted triangle) plus a weight-2
    // link to y. Merging x into y: Q -0.08 -> 0.
    val edges = Seq(("x", "x", 6L), ("x", "y", 2L), ("y", "x", 2L))
      .toDF("src", "dst", "w")
    val ident = Seq("x" -> "x", "y" -> "y").toDF("node", "label")
    val r = Graph.louvainMoveWeighted(edges, ident)
      .as[(String, String)].collect().toMap
    assert(r == Map("x" -> "y", "y" -> "y"))
    def q(c: Map[String, String]) = Graph.modularityWeighted(edges,
        c.toSeq.toDF("node", "label"))
      .filter($"label" === "__all__").select($"q_term")
      .as[Double].head()
    assert(q(Map("x" -> "x", "y" -> "y")) == -0.08)
    assert(q(r) == 0.0)
  }

  test("louvainMoveWeighted: two self-heavy supernodes do not merge") {
    // contracted two-triangle graph: merging across the weak bridge
    // would LOWER Q (s_move = 14*1 - 7*7 < 0), so the sweep holds
    val edges = Seq(("L", "L", 6L), ("R", "R", 6L),
      ("L", "R", 1L), ("R", "L", 1L)).toDF("src", "dst", "w")
    val ident = Seq("L" -> "L", "R" -> "R").toDF("node", "label")
    val r = Graph.louvainMoveWeighted(edges, ident)
      .as[(String, String)].collect().toMap
    assert(r == Map("L" -> "L", "R" -> "R"))
  }

  test("onionPeel: pendant peels first, then the triangle, then quiet") {
    // triangle a-b-c plus pendant c-d: round 1 peels d (min deg 1),
    // round 2 peels the whole triangle (min deg 2), round 3 is empty
    val edges = sym(("a", "b"), ("b", "c"), ("a", "c"), ("c", "d"))
    val r = Graph.onionPeel(edges, rounds = 3)
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    assert(r == Seq((1L, 1L, 1L, 3L, 6L), (2L, 2L, 3L, 0L, 0L),
      (3L, 0L, 0L, 0L, 0L)))
  }

  test("onionPeel: a star strips its leaves and the hub leaves the frame") {
    // hub h deg 3, leaves deg 1: round 1 peels the three leaves and
    // every edge loses an endpoint — the hub exits with its last edge
    val r = Graph.onionPeel(
      sym(("h", "l1"), ("h", "l2"), ("h", "l3")), rounds = 2)
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    assert(r == Seq((1L, 1L, 3L, 0L, 0L), (2L, 0L, 0L, 0L, 0L)))
  }

  test("louvainMoveBatch: a community absorbs its whole queue in one sweep") {
    // h1-h2 labeled C; leaves l1..l3 attached to h1 as singletons.
    // All three leaves propose into C with g=3, k=1. The conflict-free
    // rule accepts ONE (l1 — rank-1 in C's window); the batch rule's
    // prefix bound g > k·K_prev admits the whole queue: l1 (3>0),
    // l2 (3>1), l3 (3>2). ΔQ is exactly Σ2g − 2Σ_{i<j}k_ik_j =
    // 18 − 2·(0+1+2) = 12 over m2² = 64.
    val edges = sym(("h1", "h2"), ("h1", "l1"), ("h1", "l2"),
      ("h1", "l3")).withColumn("w", lit(1L))
    val comm = Seq("h1" -> "C", "h2" -> "C", "l1" -> "l1",
      "l2" -> "l2", "l3" -> "l3").toDF("node", "label")
    val batch = Graph.louvainMoveBatch(edges, comm)
      .as[(String, String)].collect().toMap
    assert(batch == Map("h1" -> "C", "h2" -> "C", "l1" -> "C",
      "l2" -> "C", "l3" -> "C"))
    val matching = Graph.louvainMoveWeighted(edges, comm)
      .as[(String, String)].collect().toMap
    assert(matching.values.count(_ == "C") == 3) // h1, h2, l1 only
    def q(c: Map[String, String]) = Graph.modularityWeighted(edges,
        c.toSeq.toDF("node", "label"))
      .filter($"label" === "__all__").select($"q_term")
      .as[Double].head()
    assert(q(comm.as[(String, String)].collect().toMap) == -0.1875)
    assert(q(batch) == 0.0) // −12/64 + 12/64, the formula's exact ΔQ
  }

  test("louvainMoveBatch: the prefix bound rejects the over-mass mover") {
    // a and b (degree 4 each, self-mass 1) both propose into the C
    // triangle with g=12. a ranks first (node asc) and is accepted;
    // b must clear g > k·K_prev = 4·4 = 16 and is rejected — the
    // exact pairwise correction 2·k_a·k_b the simultaneous move would
    // owe. The NEXT sweep is then a fixed point: with a inside, C is
    // too heavy for b to gain (s_move = 20·3 − 16·4 < 0).
    val base = sym(("c1", "c2"), ("c2", "c3"), ("c1", "c3"),
      ("a", "c1"), ("a", "c2"), ("a", "c3"),
      ("b", "c1"), ("b", "c2"), ("b", "c3"))
      .withColumn("w", lit(1L))
    val edges = base.unionByName(
      Seq(("a", "a", 1L), ("b", "b", 1L)).toDF("src", "dst", "w"))
    val comm = Seq("c1" -> "C", "c2" -> "C", "c3" -> "C",
      "a" -> "a", "b" -> "b").toDF("node", "label")
    val s1 = Graph.louvainMoveBatch(edges, comm)
      .as[(String, String)].collect().toMap
    assert(s1 == Map("c1" -> "C", "c2" -> "C", "c3" -> "C",
      "a" -> "C", "b" -> "b"))
    val s2 = Graph.louvainMoveBatch(edges, s1.toSeq.toDF("node", "label"))
      .as[(String, String)].collect().toMap
    assert(s2 == s1) // converged: n_moved = 0
  }

  test("louvainMoveBatch: a stable partition is a fixed point") {
    val edges = sym(("a", "b"), ("b", "c"), ("a", "c"),
      ("x", "y"), ("y", "z"), ("x", "z"), ("c", "x"))
      .withColumn("w", lit(1L))
    val comm = Seq("a" -> "L", "b" -> "L", "c" -> "L",
      "x" -> "R", "y" -> "R", "z" -> "R").toDF("node", "label")
    val r = Graph.louvainMoveBatch(edges, comm)
      .as[(String, String)].collect().toMap
    assert(r == comm.as[(String, String)].collect().toMap)
  }

  test("louvainMoveBatch: the min-gain threshold drops marginal moves") {
    // the absorption case again, but each leaf move is worth
    // ΔQ = 2g/m2² = 6/64 ≈ 0.094 and one edge's share is 2/m2 = 0.25:
    // den = 2 requires g·2 > m2 (g > 4) — g = 3 fails, so the
    // thresholded sweep moves nothing while the strict sweep moves all
    val edges = sym(("h1", "h2"), ("h1", "l1"), ("h1", "l2"),
      ("h1", "l3")).withColumn("w", lit(1L))
    val comm = Seq("h1" -> "C", "h2" -> "C", "l1" -> "l1",
      "l2" -> "l2", "l3" -> "l3").toDF("node", "label")
    val r = Graph.louvainMoveBatch(edges, comm, minGainDen = 2L)
      .as[(String, String)].collect().toMap
    assert(r == comm.as[(String, String)].collect().toMap)
  }

  test("louvainMoveBatch: an isolated comm node passes through unchanged") {
    // z has no edge row: its degree defaults to 0, s_stay to 0, and no
    // proposal exists — it must survive in the returned frame with its
    // label intact instead of being dropped by a degree inner join
    // (r13 advice).
    val edges = sym(("a", "b")).withColumn("w", lit(1L))
    val comm = Seq("a" -> "A", "b" -> "A", "z" -> "Z")
      .toDF("node", "label")
    val r = Graph.louvainMoveBatch(edges, comm)
      .as[(String, String)].collect().toMap
    assert(r == Map("a" -> "A", "b" -> "A", "z" -> "Z"))
  }

  test("louvainMoveBatch: gamma = 1 collapses exactly, in plan and oracle text") {
    val edges = sym(("h1", "h2"), ("h1", "l1"), ("h1", "l2"),
      ("h1", "l3")).withColumn("w", lit(1L))
    val comm = Seq("h1" -> "C", "h2" -> "C", "l1" -> "l1",
      "l2" -> "l2", "l3" -> "l3").toDF("node", "label")
    val dflt = Graph.louvainMoveBatch(edges, comm)
    val g1 = Graph.louvainMoveBatch(edges, comm,
      gammaNum = 1L, gammaDen = 1L)
    // identical logical plan, not merely identical results: the γ
    // factors are emitted only when ≠ 1
    assert(g1.queryExecution.optimizedPlan.canonicalized ==
      dflt.queryExecution.optimizedPlan.canonicalized)
    assert(Graph.louvainMoveBatchSql("e", "c", "_x", 2L, 1L, 1L) ==
      Graph.louvainMoveBatchSql("e", "c", "_x", 2L))
  }

  test("louvainMoveBatch: gamma scales resolution — penalty, prefix bound, rejection") {
    // the absorption fixture: each leaf proposes into C with
    // s_move = m2·kic − γ·stot·k = 8 − 5γ and s_stay = 0.
    // γ = 3/2 (scores ×2: g' = 16 − 15 = 1): the gain survives but the
    // γ-scaled prefix bound g > γ·k·K_prev admits ONLY the rank-1 leaf
    // (l2 needs 1 > 3·1·1). γ = 2: 8 − 10 < 0 — no move at all.
    val edges = sym(("h1", "h2"), ("h1", "l1"), ("h1", "l2"),
      ("h1", "l3")).withColumn("w", lit(1L))
    val comm = Seq("h1" -> "C", "h2" -> "C", "l1" -> "l1",
      "l2" -> "l2", "l3" -> "l3").toDF("node", "label")
    val g32 = Graph.louvainMoveBatch(edges, comm,
        gammaNum = 3L, gammaDen = 2L)
      .as[(String, String)].collect().toMap
    assert(g32 == Map("h1" -> "C", "h2" -> "C", "l1" -> "C",
      "l2" -> "l2", "l3" -> "l3"))
    val g2 = Graph.louvainMoveBatch(edges, comm,
        gammaNum = 2L, gammaDen = 1L)
      .as[(String, String)].collect().toMap
    assert(g2 == comm.as[(String, String)].collect().toMap)
  }

  test("louvainConverge: witness rows, then the sweep cap raises when hit unconverged") {
    // weighted chain — heavy pair first, then progressively lighter
    // attachments, so level-1 convergence needs several sweeps even
    // under the den = 2 threshold (the q244 configuration)
    val fwd = Seq(("a1", "a2", 50L), ("a1", "x", 30L), ("x", "y", 20L),
      ("y", "z", 12L)).toDF("src", "dst", "w")
    val ew = fwd.unionByName(
      fwd.select($"dst".as("src"), $"src".as("dst"), $"w"))
    val full = Graph.louvainConverge(ew, maxSweeps = 32, maxLevels = 8,
        minGainDen = 2L)
      .select($"level", $"sweep", $"n_moved")
      .as[(Long, Long, Long)].collect().toSeq
    // every level's LAST row carries the n_moved = 0 witness
    full.groupBy(_._1).foreach { case (_, rows) =>
      assert(rows.maxBy(_._2)._3 == 0L, rows.toString) }
    val level1Sweeps = full.filter(_._1 == 1L).map(_._2).max
    assert(level1Sweeps >= 2,
      s"fixture too easy: level 1 converged in $level1Sweeps sweep(s)")
    // one sweep short of the measured horizon: the cap is hit with
    // moves still accepted, and the loop must RAISE, not emit a frame
    // that silently lacks its witness (r13 verdict #2)
    val eS = intercept[IllegalStateException] {
      Graph.louvainConverge(ew, maxSweeps = (level1Sweeps - 1).toInt,
        maxLevels = 8, minGainDen = 2L)
    }
    assert(eS.getMessage.contains("sweep cap"), eS.getMessage)
  }

  test("louvainConverge: the level cap raises when the hierarchy is still moving") {
    // four bridged triangles: level 1 forms the triangles, so level 1
    // always moves — with maxLevels below the measured level horizon
    // the loop exits by cap while the last level still moved, and the
    // all-quiet hierarchy witness is missing: must raise
    val tris = Seq("a", "b", "c", "d").flatMap { t =>
      Seq((s"${t}1", s"${t}2"), (s"${t}2", s"${t}3"), (s"${t}1", s"${t}3")) }
    val bridges = Seq(("a3", "b1"), ("b3", "c1"), ("c3", "d1"))
    val ew = sym(tris ++ bridges: _*).withColumn("w", lit(1L))
    val full = Graph.louvainConverge(ew, maxSweeps = 32, maxLevels = 8)
      .select($"level").as[Long].collect()
    val levelsUsed = full.max
    assert(levelsUsed >= 2, s"fixture too easy: $levelsUsed level(s)")
    val eL = intercept[IllegalStateException] {
      Graph.louvainConverge(ew, maxSweeps = 32,
        maxLevels = (levelsUsed - 1).toInt)
    }
    assert(eL.getMessage.contains("level cap"), eL.getMessage)
  }

  test("louvainMoveBatch is invariant to input partitioning") {
    // acceptance is windows over exact integers with total tie orders;
    // no physical partitioning may change which proposals win
    val edges = sym((1 to 40).map(i => (s"h${i % 7}", s"u$i")): _*)
      .withColumn("w", lit(1L))
    val comm = edges.select($"src".as("node")).distinct()
      .select($"node", $"node".as("label"))
    val a = Graph.louvainMoveBatch(edges, comm)
      .as[(String, String)].collect().toSet
    val b = Graph.louvainMoveBatch(edges.repartition(13),
        comm.repartition(3))
      .as[(String, String)].collect().toSet
    assert(a == b)
  }

  test("contractWeighted: weights sum and Q stays invariant") {
    // u,v,w with a self-row on u; contracting {u,v} keeps every
    // community's (d_c, e_in) — Q before/after must be bit-equal
    val edges = Seq(("u", "v", 4L), ("v", "u", 4L), ("v", "w", 2L),
      ("w", "v", 2L), ("u", "u", 2L)).toDF("src", "dst", "w")
    val comm = Seq("u" -> "P", "v" -> "P", "w" -> "w")
      .toDF("node", "label")
    val g = Graph.contractWeighted(edges, comm)
      .as[(String, String, Long)].collect().toSet
    assert(g == Set(("P", "P", 10L), ("P", "w", 2L), ("w", "P", 2L)))
    def allQ(e: org.apache.spark.sql.DataFrame,
        c: org.apache.spark.sql.DataFrame) =
      Graph.modularityWeighted(e, c)
        .filter($"label" === "__all__").select($"q_term")
        .as[Double].head()
    val ident = Seq("P" -> "P", "w" -> "w").toDF("node", "label")
    assert(allQ(edges, comm) == allQ(
      Seq(("P", "P", 10L), ("P", "w", 2L), ("w", "P", 2L))
        .toDF("src", "dst", "w"), ident))
  }

  test("louvainMove is invariant to input partitioning") {
    // the conflict-free acceptance is a total order over exact
    // integers — no partitioning (and no window evaluation order)
    // may change which proposals win
    val edges = sym((1 to 40).map(i => (s"h${i % 7}", s"u$i")): _*)
    val comm = edges.select($"src".as("node")).distinct()
      .select($"node", $"node".as("label"))
    val a = Graph.louvainMove(edges, comm)
      .as[(String, String)].collect().toSet
    val b = Graph.louvainMove(edges.repartition(13), comm.repartition(3))
      .as[(String, String)].collect().toSet
    assert(a == b)
  }

  test("pageRank is invariant to input partitioning") {
    val edges = sym((1 to 40).map(i => (s"h${i % 7}", s"u$i")): _*)
    val a = Graph.pageRank(edges, 3).as[(String, Double)].collect().toSet
    val b = Graph.pageRank(edges.repartition(13), 3)
      .as[(String, Double)].collect().toSet
    assert(a == b)
  }
}
