package graft

import graft.ops.Winnow
import org.apache.spark.sql.functions._

class WinnowSpec extends SparkSpec {
  import spark.implicits._

  private def fps(texts: Seq[(Long, String)], k: Int, w: Int) =
    Winnow.fingerprints(texts.toDF("doc_id", "text"), $"doc_id", $"text", k, w)

  test("selects the window minimum, rightmost on ties") {
    // brute-force reference on one document
    val text = "e b a d c a b e d a b c"
    val toks = text.split(" ")
    val k = 2; val w = 3
    val hashes = toks.sliding(k).map(_.mkString(" ")).zipWithIndex.map {
      case (s, i) =>
        val md5 = java.security.MessageDigest.getInstance("MD5")
          .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
        (i, java.lang.Long.parseLong(md5.take(15), 16))
    }.toArray
    val expected = hashes.sliding(w).flatMap { win =>
      val mn = win.map(_._2).min
      Some(win.filter(_._2 == mn).last) // rightmost among ties
    }.toSet
    val got = fps(Seq(1L -> text), k, w)
      .select($"fp_pos", $"fp").as[(Int, Long)].collect().toSet
    assert(got == expected.map { case (p, h) => (p, h) })
  }

  test("coverage guarantee: a shared passage of length >= k+w-1 shares a fingerprint") {
    val passage = "alpha beta gamma delta epsilon zeta eta" // 7 tokens = k+w-1
    val a = s"one two three $passage four five six"
    val b = s"nine eight $passage seven"
    val f = fps(Seq(1L -> a, 2L -> b), k = 4, w = 4)
    val shared = f.filter($"doc" === 1L).select($"fp")
      .intersect(f.filter($"doc" === 2L).select($"fp"))
    assert(shared.count() >= 1)
  }

  test("density: winnowed set is sparse relative to the span set") {
    val text = (1 to 400).map(i => s"w${i % 57}").mkString(" ")
    val n = fps(Seq(1L -> text), k = 4, w = 8).count()
    val spans = 400 - 4 + 1
    // expected density 2/(w+1) ~ 0.22; allow generous slack
    assert(n > 0 && n < spans * 0.5, s"density $n / $spans")
  }

  test("short docs (no full window) emit nothing") {
    assert(fps(Seq(1L -> "a b c d e f"), k = 4, w = 4).count() == 0)
  }

  test("clonePairs drops hot fingerprints and counts shared") {
    // fp 100 is boilerplate (4 docs > maxDocs=2) -> capped before the join
    val f = Seq(
      (1L, 100L), (2L, 100L), (3L, 100L), (4L, 100L),
      (1L, 200L), (2L, 200L),
      (1L, 300L), (2L, 300L),
      (2L, 400L), (3L, 400L)).toDF("doc", "fp")
    val pairs = Winnow.clonePairs(f, minShared = 2, maxDocs = 2)
      .orderBy($"d1", $"d2").as[(Long, Long, Long)].collect()
    assert(pairs.toSeq == Seq((1L, 2L, 2L)))
  }
}
