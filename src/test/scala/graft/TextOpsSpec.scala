package graft

import graft.catalog.Catalog
import graft.ops.TextOps
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Paths}

/** LSH skew capping and catalog CSV loading. */
class TextOpsSpec extends SparkSpec {
  import spark.implicits._

  test("capHotBands drops signatures shared by too many docs") {
    // docs 1..6 share one identical text (one hot signature);
    // docs 7,8 share a different text (a small bucket that must survive)
    val hot = (1L to 6L).map(i => (i, "x y z w v u t s"))
    val cold = Seq((7L, "p q r s t u v w"), (8L, "p q r s t u v w"))
    val docs = (hot ++ cold).toDF("doc_id", "text")
    val sh = docs.withColumn("ts", TextOps.tokens($"text"))
      .select($"doc_id", explode(TextOps.shingles("ts", 2)).as("s"))
      .distinct()
    val mh = TextOps.minhash(sh, $"doc_id", $"s", k = 4)

    val uncapped = TextOps.lshCandidates(mh, r = 2).count()
    assert(uncapped == 15 + 1) // C(6,2) hot pairs + 1 cold pair

    val capped = TextOps.lshCandidates(mh, r = 2, maxBucket = Some(3))
      .as[(Long, Long)].collect().toSet
    assert(capped == Set((7L, 8L))) // hot bucket gone, cold pair kept
  }

  test("q182 verify gate: broadcast and shuffle-hash paths return identical rows") {
    // the gate is plan-only — forcing the above-gate (100 TB) shuffle
    // path must not change a single output row vs the broadcast path
    def run(): Seq[String] =
      graft.queries.Registry.runMap("q182_prefix_filter_join")(
        spark, "/root/testdata/sf0.001").collect().map(_.toString).sorted.toSeq
    val below = run()
    spark.conf.set("spark.graft.verify.broadcastBytes", "0")
    try {
      val above = run()
      assert(below.nonEmpty)
      assert(below == above)
    } finally spark.conf.unset("spark.graft.verify.broadcastBytes")
  }

  test("repeatedSpans: self-repeats merge to one maximal span, sub-w repeats invisible") {
    // doc 1: 24 tokens where tokens 0..11 repeat as 12..23 -> with w=4
    // every 4-window is duplicated (pos p matches p+12 or p-12), so the
    // islands merge into ONE maximal span [0, 23] of exact length 24
    val rep = (0 until 12).map(i => s"t$i").mkString(" ")
    // doc 2: unique tokens except a 3-token repeat (below w) -> no span
    val sub = ((0 until 20).map(i => s"u$i") ++ Seq("u0", "u1", "u2"))
      .mkString(" ")
    val df = Seq((1L, rep + " " + rep), (2L, sub)).toDF("doc_id", "text")
    val spans = TextOps.repeatedSpans(df, $"doc_id", $"text", w = 4)
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(spans == Set((1L, 0L, 23L, 24L)))
  }

  test("repeatedSpans: cross-doc duplicate yields whole-doc spans in both docs") {
    val words = (0 until 15).map(i => s"c$i").mkString(" ")
    val df = Seq((1L, words), (2L, words), (3L, "x1 x2 x3 x4 x5 x6 x7"))
      .toDF("doc_id", "text")
    val spans = TextOps.repeatedSpans(df, $"doc_id", $"text", w = 5)
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(spans == Set((1L, 0L, 14L, 15L), (2L, 0L, 14L, 15L)))
  }

  test("catalog CSV loader round-trips the mapping layout") {
    val dir = Files.createTempDirectory("graft-cat").toString
    val csv =
      """cmorVar,inputVars,calculation,units,dimensions,frequency,realm,cellMethods,positive,cmorTable,model
        |tas,fld_s03i236,,K,t y x,1hr,atmos,area: time: mean,,Amon,CM2
        |pr,rain snow,var[0]+var[1],kg m-2 s-1,t y x,day,atmos,area: time: mean,,Aday,CM2
        |""".stripMargin
    Files.writeString(Paths.get(dir, "map.csv"), csv)
    val m = Catalog.loadMappingsCsv(spark, s"$dir/map.csv")
    assert(m.count() == 2)
    val pr = m.filter($"cmorVar" === "pr").head()
    assert(pr.getAs[String]("calculation") == "var[0]+var[1]")
    assert(pr.getAs[String]("inputVars") == "rain snow")
    // resolve works over the loaded frame
    val res = Catalog.resolve(
      Seq(("pr", "day")).toDF("cmorVar", "frequency"), m)
    assert(res.head().getAs[String]("status") == "exact")
  }

  test("repetitionStats: distinct text scores 0, repeated phrase dominates") {
    val docs = Seq(
      (1L, "a b c d e"),            // 4 distinct bigrams, no repeats
      (2L, "x y x y x y x y x y")). // "x y"×5 + "y x"×4 of 9 bigrams
      toDF("doc_id", "text")
    val ngr = docs.withColumn("ts", TextOps.tokens($"text"))
      .select($"doc_id".as("doc"), explode(TextOps.shingles("ts", 2)).as("s"))
    val r = TextOps.repetitionStats(ngr).orderBy($"doc")
      .as[(Long, Long, Double, Double)].collect()
    assert(r(0) == ((1L, 4L, 0.0, 0.25)))
    assert(r(1) == ((2L, 9L, 1.0 - 2.0 / 9.0, 5.0 / 9.0)))
  }

  test("packSequences: greedy fill, oversize doc isolated, per-source reset") {
    val docs = Seq(
      // source A, budget 10: 4+5 fit, +3 overflows -> new seq; 12 > budget
      // stands alone; 2 starts after it
      (1L, "A", "t t t t"), (2L, "A", "t t t t t"), (3L, "A", "t t t"),
      (4L, "A", "t t t t t t t t t t t t"), (5L, "A", "t t"),
      // source B restarts numbering at 0
      (6L, "B", "t t t t t t")).map { case (id, src, text) => (id, text, src) }
      .toDF("doc_id", "text", "source")
    val out = TextOps.packSequences(docs, budget = 10L)
      .orderBy($"source", $"doc_id")
      .as[(String, Long, Long, Long, Long)].collect().toSeq
    assert(out == Seq(
      ("A", 1L, 4L, 0L, 4L), ("A", 2L, 5L, 0L, 9L), ("A", 3L, 3L, 1L, 3L),
      ("A", 4L, 12L, 2L, 12L), ("A", 5L, 2L, 3L, 2L),
      ("B", 6L, 6L, 0L, 6L)))
  }

  test("packSequences matches a naive driver fold on randomized input (seeded)") {
    val rnd = new scala.util.Random(13)
    val docs = (1L to 200L).map { id =>
      val n = 1 + rnd.nextInt(40) // 1..40 tokens; budget 25 forces splits
      (id, Seq.fill(n)("t").mkString(" "), s"s${rnd.nextInt(4)}")
    }
    val df = docs.toDF("doc_id", "text", "source")
    val got = TextOps.packSequences(df, budget = 25L)
      .orderBy($"source", $"doc_id")
      .as[(String, Long, Long, Long, Long)].collect().toSeq
    val expected = docs.map { case (id, text, src) =>
      (src, id, text.split("\\s+").length.toLong)
    }.groupBy(_._1).toSeq.flatMap { case (src, rows) =>
      var fill = 0L; var seq = -1L
      rows.sortBy(_._2).map { case (_, id, n) =>
        if (seq < 0L || fill + n > 25L) { seq += 1; fill = n } else fill += n
        (src, id, n, seq, fill)
      }
    }.sortBy(r => (r._1, r._2))
    assert(got == expected)
  }

  test("contamination counts shared distinct n-grams and caps hot ones") {
    // hash stand-ins: h=99 appears in every doc (boilerplate, capped out)
    val test = Seq((1L, 10L), (1L, 11L), (1L, 12L), (1L, 99L), (2L, 20L), (2L, 99L))
      .toDF("doc", "h")
    val train = Seq((7L, 10L), (7L, 11L), (7L, 99L), (8L, 20L), (8L, 99L))
      .toDF("doc", "h")
    val r = TextOps.contamination(test, train, maxPostings = 3L)
      .orderBy($"test_doc", $"train_doc")
      .as[(Long, Long, Long, Double)].collect().toSeq
    // doc1 shares {10,11} with doc7 (99 capped); test_n counts ALL of
    // doc1's grams (4), so the fraction stays honest about doc size
    assert(r == Seq((1L, 7L, 2L, 0.5), (2L, 8L, 1L, 0.5)))
  }

  test("dupSpans: cross-doc span flagged, unique spans not, short docs absent") {
    val docs = Seq(
      (1L, "a b c d e f"),   // spans: "a b c d e", "b c d e f"
      (2L, "a b c d e x"),   // shares "a b c d e" with doc 1
      (3L, "too short")      // < 5 tokens -> no spans
    ).toDF("doc_id", "text")
    val out = TextOps.dupSpans(docs, $"doc_id", $"text", w = 5)
      .orderBy($"doc")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(out.toSeq == Seq((1L, 2L, 1L, 0.5), (2L, 2L, 1L, 0.5)))
  }

  test("blockedContainment: subset pair scores 1 where Jaccard stays low") {
    val tr = Seq(
      // doc 1 (4 tokens) is a strict subset of doc 2 (10 tokens):
      // J = 4/10 = 0.4, containment = 4/4 = 1 — the case q49 misses
      (1L, "s", Seq("a", "b", "c", "d")),
      (2L, "s", Seq("a", "b", "c", "d", "e", "f", "g", "h", "i", "j")),
      // doc 3 shares 1 of its 3 tokens with doc 1 -> containment 1/3
      (3L, "s", Seq("a", "x", "y")),
      // doc 4: other block, never paired
      (4L, "t", Seq("a", "b", "c", "d")))
      .toDF("doc", "block", "toks")
      .select($"doc", $"block", explode($"toks").as("token"))
    val out = TextOps.blockedContainment(tr)
      .orderBy($"d1", $"d2")
      .as[(Long, Long, Long, Double, Long)].collect().toSeq
    assert(out == Seq(
      (1L, 2L, 4L, 1.0, 1L),          // subsumed = the smaller set
      (1L, 3L, 1L, 1.0 / 3.0, 3L),    // tie on size -> higher id subsumed
      (2L, 3L, 1L, 1.0 / 3.0, 3L)))
  }

  test("hotSpanExposure counts within-doc repeats that dupSpans ignores") {
    // doc 1 repeats one 2-token span 3 times BY ITSELF; no other doc
    // shares it, so dupSpans sees nothing hot but exposure does
    val docs = Seq(
      (1L, "p q p q p q"),   // spans: pq qp pq qp pq -> "p q" x3, "q p" x2
      (2L, "r s t u v w"))
      .toDF("doc_id", "text")
    val hot = TextOps.hotSpanExposure(docs, $"doc_id", $"text", w = 2, minFreq = 3)
      .orderBy($"doc")
      .as[(Long, Long, Long, Long, Double)].collect().toSeq
    assert(hot == Seq(
      (1L, 5L, 3L, 3L, 0.6),  // 3 of 5 spans are the freq-3 "p q"
      (2L, 5L, 0L, 1L, 0.0)))
    val dup = TextOps.dupSpans(docs, $"doc_id", $"text", w = 2)
      .filter($"n_dup" > 0).count()
    assert(dup == 0) // cross-doc view is blind to the self-repetition
  }

  test("blockLocalComponents equals the iterative CC on block-local graphs") {
    val rnd = new scala.util.Random(7)
    // 3 blocks, nodes 0..59 assigned round-robin; random edges strictly
    // inside each block (chains, cliques and bridges within a block)
    val blockOf = (0L until 60L).map(n => n -> s"b${n % 3}").toMap
    val edges = (1 to 120).map { _ =>
      val b = rnd.nextInt(3)
      val a = rnd.nextInt(20) * 3 + b
      val c = rnd.nextInt(20) * 3 + b
      (a.toLong, c.toLong)
    }.filter { case (a, c) => a != c }
    val edgesDf = edges.toDF("d1", "d2")
    val nodesDf = (0L until 60L).toDF("node")
    val blocksDf = blockOf.toSeq.toDF("doc", "block")
    val iterative = TextOps.connectedComponents(edgesDf, nodesDf)
      .orderBy($"node").as[(Long, Long)].collect().toSeq
    val oneShot = TextOps.blockLocalComponents(edgesDf, blocksDf, nodesDf)
      .orderBy($"node").as[(Long, Long)].collect().toSeq
    assert(oneShot == iterative)
  }

  test("connectedComponentsIncremental is batch-equivalent to from-scratch CC") {
    // frozen world: component {2,3,4} (min 2), component {10,11}
    // (min 10), singleton 7
    val oldEdges = Seq((2L, 3L), (3L, 4L), (10L, 11L)).toDF("d1", "d2")
    val oldNodes = Seq(2L, 3L, 4L, 7L, 10L, 11L).toDF("node")
    val frozen = TextOps.connectedComponents(oldEdges, oldNodes)
    // delivery: (4,10) merges the two old components; (1,3) attaches a
    // NEW node whose id undercuts the old min (the relabel-to-a-new-min
    // case); (20,21) is a brand-new pair
    val newEdges = Seq((4L, 10L), (1L, 3L), (20L, 21L)).toDF("d1", "d2")
    val inc = TextOps.connectedComponentsIncremental(frozen, newEdges)
      .orderBy($"node").as[(Long, Long)].collect().toSeq
    val scratch = TextOps.connectedComponents(
        oldEdges.unionByName(newEdges),
        oldNodes.unionByName(Seq(1L, 20L, 21L).toDF("node")))
      .orderBy($"node").as[(Long, Long)].collect().toSeq
    assert(inc == scratch)
    val m = inc.toMap
    assert(Seq(1L, 2L, 3L, 4L, 10L, 11L).forall(m(_) == 1L))
    assert(m(7L) == 7L && m(20L) == 20L && m(21L) == 20L)
  }

  test("connectedComponentsIncremental with an empty delivery is the frozen labeling") {
    val oldEdges = Seq((5L, 6L)).toDF("d1", "d2")
    val oldNodes = Seq(5L, 6L, 9L).toDF("node")
    val frozen = TextOps.connectedComponents(oldEdges, oldNodes)
    val inc = TextOps.connectedComponentsIncremental(frozen,
        Seq.empty[(Long, Long)].toDF("d1", "d2"))
      .orderBy($"node").as[(Long, Long)].collect().toSeq
    assert(inc == Seq((5L, 5L), (6L, 5L), (9L, 9L)))
  }

  test("large-star/small-star equals min-label CC on path, clique, forest") {
    def both(edges: Seq[(Long, Long)], n: Long) = {
      val e = edges.toDF("d1", "d2")
      val nodes = (0L until n).toDF("node")
      val a = TextOps.connectedComponents(e, nodes, maxIters = 200)
        .orderBy($"node").as[(Long, Long)].collect().toSeq
      val b = TextOps.connectedComponentsStars(e, nodes)
        .orderBy($"node").as[(Long, Long)].collect().toSeq
      (a, b)
    }
    // long path: the adversarial case for min-label (O(diameter)) and
    // the motivating case for stars (O(log^2))
    val path = (0L until 79L).map(i => (i, i + 1))
    val (p1, p2) = both(path, 80L)
    assert(p2 == p1)
    assert(p2.forall(_._2 == 0L))
    // clique + separate triangle + singletons
    val clique = for (i <- 10L until 20L; j <- (i + 1) until 20L) yield (i, j)
    val tri = Seq((3L, 5L), (5L, 7L), (7L, 3L))
    val (c1, c2) = both(clique ++ tri, 25L)
    assert(c2 == c1)
    // random forest-ish graph, edges in both orientations and dups
    val rnd = new scala.util.Random(11)
    val rand = (1 to 150).map { _ =>
      (rnd.nextInt(60).toLong, rnd.nextInt(60).toLong)
    }.filter(e => e._1 != e._2)
    val (r1, r2) = both(rand, 60L)
    assert(r2 == r1)
  }

  test("urlHost/urlDomain extract the authority and strip one leading www") {
    val df = Seq(
      "https://www.example.co.uk/path?q=1",
      "http://sub.www.site.org/x",
      "ftp://files.example.com",
      "not a url").toDF("url")
    val out = df.select(TextOps.urlHost($"url").as("h"),
        TextOps.urlDomain($"url").as("d"))
      .collect().map(r => (r.getString(0), r.getString(1)))
    assert(out(0) == (("www.example.co.uk", "example.co.uk")))
    // only a LEADING www. strips — an interior label is part of the key
    assert(out(1) == (("sub.www.site.org", "sub.www.site.org")))
    assert(out(2) == (("files.example.com", "files.example.com")))
    assert(out(3) == (("", ""))) // no scheme → no host, empty not null
  }

  test("redactPii scrubs every occurrence, counts match, clean text untouched") {
    val df = Seq(
      (1L, "mail a@b.co and c.d@e.org call 555-123-4567 at 10.0.0.1 or 10.0.0.2"),
      (2L, "clean text no pii 123-45")).toDF("id", "text")
    val out = TextOps.redactPii(df, $"text").orderBy($"id")
      .select($"n_emails", $"n_phones", $"n_ips", $"redacted")
      .collect()
    assert((out(0).getInt(0), out(0).getInt(1), out(0).getInt(2)) == ((2, 1, 2)))
    val r = out(0).getString(3)
    assert(!r.contains("@") && !r.contains("555") && !r.contains("10.0"), r)
    assert(r == "mail <EMAIL> and <EMAIL> call <PHONE> at <IP> or <IP>")
    // partial shapes (123-45) are not phone numbers; nothing rewrites
    assert(out(1).getString(3) == "clean text no pii 123-45")
    assert((out(1).getInt(0), out(1).getInt(1), out(1).getInt(2)) == ((0, 0, 0)))
  }

  test("canonicalizeUrl collapses spelling variants and keeps meaning") {
    val variants = Seq(
      "HTTPS://WWW.Site3.Example.COM:443/page/7?id=7#frag",
      "https://site3.example.com/page/7?id=7",
      "https://site3.example.com:443/page/7/?id=7",
      "https://www.site3.example.com/page/7?fbclid=x99&id=7",
      "https://site3.example.com/page/7?id=7&utm_campaign=a42",
      "https://site3.example.com/page/7?utm_source=f&id=7&utm_medium=g")
    val canon = variants.toDF("u")
      .select(TextOps.canonicalizeUrl($"u")).as[String].collect().toSet
    assert(canon == Set("https://site3.example.com/page/7?id=7"), canon)

    val semantics = Seq(
      // non-default port, path case, param order: all significant
      "http://a.com:8080/X" -> "http://a.com:8080/X",
      "http://a.com:80/X" -> "http://a.com/X",
      "https://a.com/p?b=2&a=1" -> "https://a.com/p?b=2&a=1",
      // all-tracking query drops entirely; empty path becomes /
      "https://a.com?utm_a=1&utm_b=2" -> "https://a.com/",
      "https://a.com/" -> "https://a.com/",
      // http keeps :443 (not its default); www strips once
      "http://www.a.com:443/p" -> "http://a.com:443/p",
      // no scheme://host: passes through untouched, never "://..."
      "not a url" -> "not a url",
      "" -> "")
    val got = semantics.map(_._1).toDF("u")
      .select($"u", TextOps.canonicalizeUrl($"u")).as[(String, String)]
      .collect().toMap
    semantics.foreach { case (in, want) =>
      assert(got(in) == want, s"$in -> ${got(in)} (want $want)")
    }
  }

  test("lineRuleScrub: each rule fires on its own shape, survivors rejoin in order") {
    val lines = Seq(
      // doc 1: short no-punct dropped; short WITH punct kept; normal kept
      (1L, 0L, Seq("ok", "line")),                       // drop: 2 words, no punct
      (1L, 1L, Seq("so", "be.")),                        // keep: punct saves it
      (1L, 2L, Seq("a", "normal", "line", "of", "text")),
      // doc 2: digit-dominated and link-dominated both drop
      (2L, 0L, Seq("1234", "5678", "90")),               // digits > 30%
      (2L, 1L, Seq("http://x.com", "www.y.com", "ok")),  // links > 50%
      (2L, 2L, Seq("plain", "words", "survive", "here")),
      // doc 3: everything drops -> empty clean_text
      (3L, 0L, Seq("no", "x")))
      .toDF("doc_id", "line_no", "lw")
    val got = graft.ops.TextOps.lineRuleScrub(lines)
      .as[(Long, Long, Long, String)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(got(1L) == ((2L, 1L, "so be. a normal line of text")))
    assert(got(2L) == ((1L, 2L, "plain words survive here")))
    assert(got(3L) == ((0L, 1L, "")))
  }

  test("normalizeText collapses case, punctuation, and whitespace runs") {
    val got = Seq("Hello,  World!", "hello world", "  hello   world. ",
        "HELLO-WORLD", "unrelated text")
      .toDF("t").select(TextOps.normalizeText($"t").as("n"))
      .as[String].collect()
    assert(got(0) == "hello world" && got(1) == "hello world" &&
      got(2) == "hello world")
    // hyphen is stripped, not spaced: "HELLO-WORLD" -> "helloworld"
    assert(got(3) == "helloworld")
    assert(got(4) == "unrelated text")
  }

  test("blocklistStats: counts, distinct terms, ratio, and the keep gate") {
    val tok = Seq((1L, "clean"), (1L, "words"),
        (2L, "bad"), (2L, "Bad"), (2L, "worse"), (2L, "ok"))
      .toDF("doc", "token")
    val got = TextOps.blocklistStats(tok, Seq("bad", "worse"))
      .as[(Long, Long, Long, Long, Double, Boolean)].collect()
      .map(r => r._1 -> r).toMap
    assert(got(1L) == ((1L, 2L, 0L, 0L, 0.0, true)))
    // "bad" and "Bad" are one distinct term; 3 of 4 tokens hit
    assert(got(2L) == ((2L, 4L, 3L, 2L, 0.75, false)))
  }

  test("noveltyVsReference scores only non-reference spans as novel") {
    val spans = Seq((10L, 100L), (10L, 101L), (10L, 102L),
        (11L, 200L), (11L, 201L),
        (10L, 100L)) // duplicate span within a doc counts once
      .toDF("doc", "h")
    val ref = Seq((1L, 100L), (1L, 200L), (1L, 201L)).toDF("doc", "h")
    val got = TextOps.noveltyVsReference(spans, ref)
      .as[(Long, Long, Long, Double)].collect().map(r => r._1 -> r).toMap
    assert(got(10L) == ((10L, 3L, 2L, 2.0 / 3.0))) // 101,102 novel
    assert(got(11L) == ((11L, 2L, 0L, 0.0)))       // fully covered
  }
}
