package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}

/** A standing-query match — the [[graft.ops.Retrieval.bm25Scores]] row
  * shape. */
final case class Bm25Out(qid: Long, doc: Long, score: Double)

/** Streaming BM25 routing — score a document stream against FROZEN
  * standing queries and frozen index statistics (the alerting /
  * topic-routing deployment of the batch retrieval operator: "send new
  * docs matching these profiles to their shard").
  *
  * Same deployment shape as [[StreamDsir]]/[[StreamLm]]/[[StreamNb]]:
  * everything the score needs besides the doc itself is bounded — the
  * per-term document frequencies of the QUERY terms (≤ Σ|query|), the
  * corpus scalars N and avgdl — so the model ships as plain broadcast
  * values and scoring is a STATELESS per-row flatMap: no shuffle, no
  * watermark, no state store. tf and dl come from the arriving doc.
  *
  * Parity contract (StreamBm25Spec pins it): per-term contributions
  * replicate the batch expression tree ([[graft.ops.Retrieval.bm25Sql]])
  * in the same IEEE evaluation order, round to 6 dp exactly as Spark's
  * `round` does (HALF_UP on `BigDecimal.valueOf`), and sum in exact
  * decimals — a doc scored here is BIT-IDENTICAL to the batch score
  * against the same index. A query with no matching term in the doc
  * emits no row (the batch inner-join contract).
  */
object StreamBm25 {

  def score(stream: Dataset[DocEvent],
      queryTerms: Map[Long, Set[String]],
      df: Map[String, Long], nDocs: Double, avgdl: Double): Dataset[Bm25Out] = {
    implicit val outEnc = Encoders.product[Bm25Out]
    stream.flatMap { e =>
      val ts = e.text.trim.split("\\s+")
      val dl = ts.length.toLong
      val tf = scala.collection.mutable.HashMap.empty[String, Long]
      // only query terms with a corpus df can score (batch ⋈ dfreq)
      ts.foreach { w =>
        if (df.contains(w)) tf.update(w, tf.getOrElse(w, 0L) + 1L)
      }
      queryTerms.iterator.flatMap { case (qid, terms) =>
        var n = 0
        var sum = BigDecimal(0)
        terms.foreach { t =>
          tf.get(t).foreach { f =>
            val d = df(t)
            val idf = math.log(1.0 + (nDocs - d + 0.5) / (d + 0.5))
            val c = idf * (f * 2.2) /
              (f + 1.2 * (0.25 + 0.75 * dl / avgdl))
            // Spark round(double, 6): HALF_UP over BigDecimal.valueOf
            sum += BigDecimal(java.math.BigDecimal.valueOf(c)
              .setScale(6, java.math.RoundingMode.HALF_UP))
            n += 1
          }
        }
        if (n == 0) Iterator.empty
        else Iterator.single(Bm25Out(qid, e.doc, sum.toDouble))
      }.toSeq
    }
  }
}
