package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}

/** A scored document — the [[graft.ops.LmScore.nbScore]] row shape. */
final case class NbOut(doc: Long, n_tokens: Long, score: Double,
    label: String)

/** Streaming Naive Bayes quality scoring — classify a document stream
  * against a FROZEN batch-trained word-level model
  * ([[graft.ops.LmScore.nbModel]]).
  *
  * Same deployment shape as [[StreamDsir]]/[[StreamLm]]: the model is
  * bounded by construction (vocab ≤ K, llr table ≤ K+1 rows, one
  * prior scalar), so it ships as plain broadcast values and scoring
  * is a STATELESS per-row map — no shuffle, no watermark, no state
  * store. Token mapping, the decimal-exact llr sum, and the score
  * arithmetic replicate the batch operator step for step, so a doc
  * scored here is BIT-IDENTICAL to the batch score against the same
  * model (StreamNbSpec pins it).
  *
  * Batch inner-join contract: a mapped token absent from the llr
  * table (an OOV token when training saw no OOV) contributes nothing
  * and doesn't count toward n_tokens; a doc with no scorable token
  * emits no row.
  */
object StreamNb {

  def score(stream: Dataset[DocEvent], vocab: Set[String],
      llr: Map[String, Double], prior: Double): Dataset[NbOut] = {
    implicit val outEnc = Encoders.product[NbOut]
    stream.flatMap { e =>
      val ts = e.text.trim.split("\\s+")
      var n = 0L
      var sum = BigDecimal(0)
      ts.foreach { w =>
        val mw = if (vocab(w)) w else "<unk>"
        llr.get(mw) match {
          case Some(v) =>
            n += 1
            // the batch side sums llr through DECIMAL(38,6); llr values
            // are already 6-decimal-rounded, so the cast is exact
            sum += BigDecimal(v).setScale(6, BigDecimal.RoundingMode.HALF_UP)
          case None => () // unseen event: the batch inner-join drop
        }
      }
      if (n == 0) Iterator.empty
      else {
        val score = prior + sum.toDouble
        val label = if (score > 0) "good" else "bad"
        Iterator.single(NbOut(e.doc, n, score, label))
      }
    }
  }
}
