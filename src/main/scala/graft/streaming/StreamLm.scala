package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}

/** A scored document — the [[graft.ops.LmScore.lmScore]] row shape. */
final case class LmOut(doc: Long, nBigrams: Long, nll: Double, ppl: Double,
    decision: String)

/** Streaming LM perplexity scoring — score a document stream against a
  * FROZEN capped-vocabulary bigram model trained on a batch corpus
  * ([[graft.ops.LmScore.lmModel]]).
  *
  * Same deployment shape as [[StreamDsir]]: the model is bounded by
  * construction (vocab ≤ K, unigrams ≤ K+1, observed bigrams ≤
  * (K+1)²), so it ships as plain broadcast values and scoring is a
  * STATELESS per-row map — no shuffle, no watermark, no state store.
  * Token mapping, the add-one probability, the per-bigram round-6,
  * the scale-6 HALF_UP decimal sum, and the ppl rounding replicate
  * the batch operator step for step, so a doc scored here is
  * BIT-IDENTICAL to the batch score against the same model
  * (StreamLmSpec pins it).
  *
  * Batch inner-join contract: a bigram whose (mw, mw2) the model
  * never observed contributes nothing (and doesn't count toward
  * nBigrams); a doc with no covered bigram emits no row.
  */
object StreamLm {

  /** The per-doc scoring kernel, shared with [[StreamFilterStack]]:
    * Some((covered bigrams, nll, ppl)) or None when the batch operator
    * would emit no row (< 2 tokens, or no model-covered bigram). */
  private[streaming] def pplOf(ts: Array[String], vocab: Set[String],
      c1: Map[String, Long], c2: Map[(String, String), Long],
      vocabK: Int): Option[(Long, Double, Double)] = {
    if (ts.length < 2) None
    else {
      val smooth = vocabK + 1
      val mw = ts.map(w => if (vocab(w)) w else "<unk>")
      var n = 0L
      var sum = BigDecimal(0)
      mw.iterator.sliding(2).withPartial(false).foreach { pair =>
        (c2.get((pair(0), pair(1))), c1.get(pair(0))) match {
          case (Some(cc2), Some(cc1)) =>
            n += 1
            sum += BigDecimal(
              math.log((cc2 + 1).toDouble / (cc1 + smooth).toDouble))
              .setScale(6, BigDecimal.RoundingMode.HALF_UP)
          case _ => () // unseen bigram: the batch inner-join drop
        }
      }
      if (n == 0) None
      else {
        val nll = -sum.toDouble / n.toDouble
        val ppl = BigDecimal(math.exp(nll))
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
        Some((n, nll, ppl))
      }
    }
  }

  def score(stream: Dataset[DocEvent], vocab: Set[String],
      c1: Map[String, Long], c2: Map[(String, String), Long],
      vocabK: Int, pplFlag: Double): Dataset[LmOut] = {
    require(vocabK > 0, s"vocabK must be positive, got $vocabK")
    implicit val outEnc = Encoders.product[LmOut]
    stream.flatMap { e =>
      pplOf(e.text.trim.split("\\s+"), vocab, c1, c2, vocabK) match {
        case None => Iterator.empty
        case Some((n, nll, ppl)) =>
          val decision = if (ppl > pplFlag) "flagged" else "kept"
          Iterator.single(LmOut(e.doc, n, nll, ppl, decision))
      }
    }
  }
}
