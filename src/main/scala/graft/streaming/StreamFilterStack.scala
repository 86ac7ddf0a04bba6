package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}

/** A per-document filter verdict — q131's batch decision-table row. */
final case class FilterDecision(doc_id: Long, f_short: Int, f_lowq: Int,
    f_rep: Int, f_ppl: Int, decision: String)

/** The composed corpus filter stack as an ONLINE operator: C4-style
  * quality gates + Gopher-style repetition stats + CCNet-style
  * perplexity against a FROZEN batch-trained LM, per document, with
  * the same precedence-ordered verdict as the batch decision table
  * (q131) — the filter a crawl frontier runs on documents as they
  * arrive, instead of re-batching the corpus.
  *
  * Every rule is per-document arithmetic over the doc's own tokens
  * plus the broadcast LM model, so the whole stack is a STATELESS map
  * — no shuffle, no watermark, no state store; it scales with stream
  * partitions alone. Each component replicates its batch twin's exact
  * arithmetic (integer-count ratios for quality/repetition — exact in
  * doubles — and [[StreamLm.pplOf]]'s decimal-rounded chain for ppl),
  * so a doc filtered here gets the BIT-IDENTICAL verdict the batch
  * table assigns it (StreamFilterStackSpec pins all rows against
  * q131). Missing-rule semantics carry over: a doc with < 2 tokens
  * has no repetition row in batch (left join → null → coalesce
  * false), so here f_rep = 0; same for f_ppl when the model covers no
  * bigram.
  */
object StreamFilterStack {

  def decide(stream: Dataset[DocEvent], vocab: Set[String],
      c1: Map[String, Long], c2: Map[(String, String), Long],
      vocabK: Int, minTokens: Long = 20, minMeanLen: Double = 3.5,
      dupMax: Double = 0.5, topMax: Double = 0.18,
      pplFlag: Double = 32.0): Dataset[FilterDecision] = {
    require(vocabK > 0, s"vocabK must be positive, got $vocabK")
    implicit val outEnc = Encoders.product[FilterDecision]
    stream.map { e =>
      // same tokenization as the batch stack: trim + \s+ (empty text
      // yields one zero-length token, exactly like explode(tokens))
      val ts = e.text.trim.split("\\s+")
      val n = ts.length.toLong
      // token-length sum is integral, so the batch side's decimal-exact
      // sum ÷ count is the same IEEE division done here
      val meanLen = ts.foldLeft(0L)(_ + _.length).toDouble / n.toDouble
      val fShort = if (n < minTokens) 1 else 0
      val fLowq = if (meanLen < minMeanLen) 1 else 0
      val fRep = if (ts.length < 2) 0
      else {
        val counts = scala.collection.mutable.Map.empty[String, Long]
        var total = 0L
        ts.iterator.sliding(2).withPartial(false).foreach { p =>
          val bg = p(0) + " " + p(1)
          counts(bg) = counts.getOrElse(bg, 0L) + 1L
          total += 1L
        }
        val dupFrac = 1.0 - counts.size.toDouble / total.toDouble
        val topFrac = counts.values.max.toDouble / total.toDouble
        if (dupFrac > dupMax || topFrac > topMax) 1 else 0
      }
      val fPpl = StreamLm.pplOf(ts, vocab, c1, c2, vocabK) match {
        case Some((_, _, ppl)) if ppl > pplFlag => 1
        case _ => 0
      }
      val decision =
        if (fShort == 1) "short"
        else if (fLowq == 1) "low_quality"
        else if (fRep == 1) "repetition"
        else if (fPpl == 1) "perplexity"
        else "kept"
      FilterDecision(e.doc, fShort, fLowq, fRep, fPpl, decision)
    }
  }
}
