package graft

import graft.ops.Bpe
import org.apache.spark.sql.functions._

/** BPE training against a naive single-machine reference implementation. */
class BpeSpec extends SparkSpec {
  import spark.implicits._

  /** Straight-line reference: the textbook algorithm over a Map. */
  private def naiveTrain(vocab: Map[String, Long],
      k: Int): (Seq[(String, String)], Map[String, Seq[String]]) = {
    var syms: Map[String, (Long, Vector[String])] =
      vocab.map { case (w, c) => w -> (c, w.split("").toVector) }
    val merges = Seq.newBuilder[(String, String)]
    var stop = false
    for (_ <- 1 to k if !stop) {
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      syms.values.foreach { case (c, ss) =>
        ss.sliding(2).filter(_.size == 2).foreach { p =>
          val key = (p(0), p(1))
          counts(key) = counts.getOrElse(key, 0L) + c
        }
      }
      if (counts.isEmpty) stop = true
      else {
        // count desc, then pair lexicographic — the op's total order
        val (l, r) = counts.toSeq
          .minBy { case ((a, b), c) => (-c, a, b) }._1
        merges += ((l, r))
        syms = syms.map { case (w, (c, ss)) =>
          val out = Vector.newBuilder[String]
          var i = 0
          while (i < ss.size) {
            if (i + 1 < ss.size && ss(i) == l && ss(i + 1) == r) {
              out += (l + r); i += 2
            } else { out += ss(i); i += 1 }
          }
          w -> (c, out.result())
        }
      }
    }
    (merges.result(), syms.map { case (w, (_, ss)) => w -> ss })
  }

  // the Sennrich et al. example vocabulary
  private val sennrich = Map(
    "low" -> 5L, "lower" -> 2L, "newest" -> 6L, "widest" -> 3L)

  test("train matches the naive reference on the Sennrich vocabulary") {
    val df = sennrich.toSeq.toDF("word", "cnt")
    val (merges, syms) = Bpe.train(df, k = 6)
    val (expMerges, expSyms) = naiveTrain(sennrich, k = 6)
    assert(merges == expMerges, s"got $merges expected $expMerges")
    val got = syms.select($"word", $"symbols")
      .as[(String, Seq[String])].collect().toMap
    assert(got == expSyms)
    // the canonical first merges of the example: (e,s) 9×, then (es,t) 9×
    assert(merges.take(2) == Seq(("e", "s"), ("es", "t")))
  }

  test("train is partitioning-invariant and overlap-safe") {
    val words = Seq(("aaaa", 3L), ("aab", 2L), ("baa", 4L))
    for (parts <- Seq(1, 4)) {
      val df = words.toDF("word", "cnt").repartition(parts)
      val (merges, syms) = Bpe.train(df, k = 2)
      val (expMerges, expSyms) = naiveTrain(words.toMap, k = 2)
      assert(merges == expMerges, s"parts=$parts")
      val got = syms.select($"word", $"symbols")
        .as[(String, Seq[String])].collect().toMap
      // "aaaa" under (a,a) must scan left-to-right: [aa, aa], never [a, aa, a]
      assert(got == expSyms, s"parts=$parts")
    }
  }

  test("symbols split per code point — multibyte text trains correctly") {
    val words = Map("日本語" -> 4L, "日本酒" -> 2L, "語学" -> 1L)
    val (merges, syms) = Bpe.train(words.toSeq.toDF("word", "cnt"), k = 2)
    val (expMerges, expSyms) = naiveTrain(words, k = 2)
    assert(merges == expMerges)
    // the dominant pair is (日, 本) with weight 6
    assert(merges.head == (("日", "本")))
    val got = syms.select($"word", $"symbols")
      .as[(String, Seq[String])].collect().toMap
    assert(got == expSyms)
  }

  test("encode applies a frozen merge list exactly like training did") {
    // encode(word, merges) over the training words must reproduce the
    // final symbol table train() returned — same fold, frozen rules
    val df = sennrich.toSeq.toDF("word", "cnt")
    val (merges, syms) = Bpe.train(df, k = 6)
    val expect = syms.select($"word", $"symbols")
      .as[(String, Seq[String])].collect().toMap
    val got = df.select($"word", Bpe.encode($"word", merges).as("symbols"))
      .as[(String, Seq[String])].collect().toMap
    assert(got == expect)
    // unseen words encode too: prefixes/suffixes of trained merges apply
    val unseen = Seq(("lowest", 1L), ("newer", 1L), ("xyz", 1L))
      .toDF("word", "cnt")
      .select($"word", Bpe.encode($"word", merges).as("symbols"))
      .as[(String, Seq[String])].collect().toMap
    val (_, refSyms) = naiveTrainEncode(
      Map("lowest" -> 1L, "newer" -> 1L, "xyz" -> 1L), merges)
    assert(unseen == refSyms)
  }

  /** Apply a fixed merge list with the naive fold (no training). */
  private def naiveTrainEncode(words: Map[String, Long],
      merges: Seq[(String, String)]): (Unit, Map[String, Seq[String]]) = {
    val out = words.map { case (w, _) =>
      var ss: Vector[String] = w.split("").toVector
      merges.foreach { case (l, r) =>
        val b = Vector.newBuilder[String]
        var i = 0
        while (i < ss.size) {
          if (i + 1 < ss.size && ss(i) == l && ss(i + 1) == r) {
            b += (l + r); i += 2
          } else { b += ss(i); i += 1 }
        }
        ss = b.result()
      }
      w -> (ss: Seq[String])
    }
    ((), out)
  }

  test("pull-local and distributed merge loops are output-identical") {
    // pseudo-random words over a tiny alphabet so merges overlap and
    // interact (the stale-membership and overlap-rewrite paths fire)
    val rnd = new scala.util.Random(42)
    val words = (0 until 300).map { _ =>
      val len = 3 + rnd.nextInt(6)
      (0 until len).map(_ => ('a' + rnd.nextInt(4)).toChar).mkString
    }.distinct.map(w => (w, 1L + rnd.nextInt(9)))
    val df = words.toDF("word", "cnt")
    val (ml, sl) = Bpe.train(df, k = 25) // n ≤ threshold → local path
    val (md, sd) = Bpe.trainDistributed(df, k = 25)
    assert(ml == md, s"merge lists diverge:\n$ml\n$md")
    val gl = sl.select($"word", $"symbols")
      .as[(String, Seq[String])].collect().toMap
    val gd = sd.select($"word", $"symbols")
      .as[(String, Seq[String])].collect().toMap
    assert(gl == gd)
  }

  test("train stops early when no pair repeats") {
    val df = Seq(("ab", 1L), ("cd", 1L)).toDF("word", "cnt")
    val (merges, _) = Bpe.train(df, k = 10)
    // every pair occurs once; merges still happen (count 1 is valid) but
    // single-char words end the loop
    assert(merges.size <= 2)
    val (single, _) = Bpe.train(Seq(("a", 5L)).toDF("word", "cnt"), k = 3)
    assert(single.isEmpty)
  }
}
