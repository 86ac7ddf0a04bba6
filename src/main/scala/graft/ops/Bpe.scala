package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Byte-pair-encoding tokenizer training (Sennrich et al. 2016,
  * arXiv:1508.07909) as a corpus-scale pipeline stage.
  *
  * The scale structure every fast BPE trainer exploits: merges are
  * learned from the WORD-FREQUENCY table, not the corpus. One pass over
  * the documents aggregates (word, cnt) — the only corpus-sized job —
  * and the iterative merge loop then runs over the vocabulary (10⁵–10⁶
  * rows at any corpus size; Heaps' law keeps it sublinear in the
  * 100 TB). Each iteration is a distributed pair-count + a 1-row argmax
  * collect: the argmax is BPE's inherent sequential dependence (merge
  * k+1 depends on the table rewritten by merge k), so the driver loop
  * is the algorithm, not a shortcut — what's distributed is the
  * pair-count over the vocab and the merge rewrite, both map/agg jobs.
  *
  * Pair selection is totally ordered (count desc, then left/right
  * lexicographic), so training is deterministic and engine-portable —
  * the property every oracle check here rides on.
  */
object Bpe {

  /** Initial symbol sequence of a word: its characters (code points —
    * `split` on the empty pattern is per-character in Spark and
    * DuckDB both). */
  def charSymbols(word: Column): Column = split(word, "")

  /** Adjacent-pair counts over a (symbols, cnt) vocabulary table:
    * each word contributes its adjacent symbol pairs weighted by the
    * word's corpus frequency. Map-side pair generation (one
    * transform + explode), one agg shuffle keyed on the pair —
    * vocab-sized throughout. Output: (left, right, cnt). */
  def pairCounts(vocab: DataFrame, symbols: Column, cnt: Column): DataFrame =
    vocab.select(cnt.as("__cnt"), symbols.as("__s"))
      .filter(size(col("__s")) >= 2)
      .select(col("__cnt"), explode(expr(
        """transform(sequence(1, size(__s) - 1),
           i -> struct(element_at(__s, i) AS l,
                       element_at(__s, i + 1) AS r))""")).as("p"))
      .groupBy(col("p.l").as("left"), col("p.r").as("right"))
      .agg(sum(col("__cnt")).as("cnt"))

  /** Rewrite a symbol sequence under one merge rule: every adjacent
    * (l, r) becomes the fused symbol, scanning left to right (the
    * fold's accumulator state resolves overlaps the standard way:
    * "aaa" under (a,a) → [aa, a]). Pure per-row array fold — no
    * shuffle. */
  def applyMerge(symbols: Column, l: String, r: String): Column =
    aggregate(symbols, array().cast("array<string>"),
      (acc, x) =>
        when(size(acc) === 0, array(x))
          .when(element_at(acc, -1) === lit(l) && (x === lit(r)),
            concat(slice(acc, lit(1), size(acc) - 1), array(lit(l + r))))
          .otherwise(concat(acc, array(x))))

  /** Apply a FROZEN ordered merge list to a word — the tokenizer
    * APPLICATION step: train once ([[train]]), encode everywhere. The
    * fold chain is built at plan time (one [[applyMerge]] per rule),
    * so encoding is pure per-row map work with the merge table baked
    * into the plan — nothing joins, nothing shuffles, and a 100 TB
    * encode pass is embarrassingly parallel. Returns the symbol
    * array after all merges, applied in training order. */
  def encode(word: Column, merges: Seq[(String, String)]): Column =
    merges.foldLeft(charSymbols(word)) { case (syms, (l, r)) =>
      applyMerge(syms, l, r)
    }

  /** Learn `k` merge rules from a (word, cnt) vocabulary. Returns the
    * ordered merge list and the final symbol table
    * (word, cnt, symbols). Stops early when no pair repeats. Each
    * iteration localCheckpoints the rewritten vocab — the frame is
    * vocab-sized and feeds every later iteration, exactly the
    * bounded-many-consumers case where the eager cut pays (and it
    * stops the logical plan doubling per merge). */
  def train(vocab: DataFrame, k: Int): (Seq[(String, String)], DataFrame) = {
    var syms = vocab.select(col("word"), col("cnt"),
      charSymbols(col("word")).as("symbols")).localCheckpoint()
    val merges = Seq.newBuilder[(String, String)]
    var done = false
    var i = 0
    while (i < k && !done) {
      val top = pairCounts(syms, col("symbols"), col("cnt"))
        .orderBy(col("cnt").desc, col("left").asc, col("right").asc)
        .limit(1).collect()
      if (top.isEmpty) done = true
      else {
        val (l, r) = (top(0).getString(0), top(0).getString(1))
        merges += ((l, r))
        syms = syms.withColumn("symbols",
          applyMerge(col("symbols"), l, r)).localCheckpoint()
      }
      i += 1
    }
    (merges.result(), syms)
  }
}
