package graft.streaming

import java.nio.charset.StandardCharsets

import org.apache.spark.sql.{Dataset, Encoders}

/** An incoming document. */
final case class DocEvent(doc: Long, text: String)

/** Its DSIR score — the [[graft.ops.LmScore.dsirLogWeights]] row shape. */
final case class DsirScore(doc: Long, nFeats: Long, logw: Double,
    decision: String)

/** Streaming DSIR scoring — score a document stream against a FROZEN
  * importance model trained on a batch corpus
  * ([[graft.ops.LmScore.dsirModel]]).
  *
  * This is the deployment shape of DSIR's fixed-size-model property:
  * the model is exactly `buckets` (bucket → log-ratio) entries
  * regardless of corpus size, so it ships to every task as a plain
  * broadcast value and scoring is a STATELESS per-row map — no
  * shuffle, no streaming aggregation, no watermark, no state store.
  * Each event tokenizes, hashes its bigrams through the same
  * [[graft.plans.Md5Prefix60]] kernel as the batch operator, folds
  * bucket counts locally, and sums cnt·lr with the same per-product
  * scale-6 HALF_UP rounding as [[graft.ops.Exact.dsum]] — so a doc
  * scored here is BIT-IDENTICAL to the same doc scored by the batch
  * operator against the same model (StreamDsirSpec pins it).
  *
  * Parity contract with the batch inner model join: buckets the model
  * never saw contribute nothing (and don't count toward nFeats); a doc
  * with no model-covered feature emits no row; docs with fewer than
  * two tokens have no features at all.
  */
object StreamDsir {

  def score(stream: Dataset[DocEvent], model: Map[Long, Double],
      buckets: Int): Dataset[DsirScore] = {
    require(buckets > 0, s"buckets must be positive, got $buckets")
    implicit val outEnc = Encoders.product[DsirScore]
    stream.flatMap { e =>
      val counts = bucketCounts(e.text, buckets)
      val covered = counts.filter { case (b, _) => model.contains(b) }
      if (covered.isEmpty) Iterator.empty
      else {
        var nFeats = 0L
        var sum = BigDecimal(0)
        covered.foreach { case (b, cnt) =>
          nFeats += cnt
          sum += BigDecimal(cnt.toDouble * model(b))
            .setScale(6, BigDecimal.RoundingMode.HALF_UP)
        }
        val logw = sum.toDouble
        val decision = if (logw > 0.0) "selected" else "rest"
        Iterator.single(DsirScore(e.doc, nFeats, logw, decision))
      }
    }
  }

  /** Bigram-bucket counts of one document — the Scala twin of the
    * batch feature pipeline (tokens → 2-shingles → md5-prefix60 mod
    * buckets), kept branch-for-branch compatible: trim + whitespace
    * split, space-joined shingles, UTF-8 digest bytes. */
  private[streaming] def bucketCounts(text: String,
      buckets: Int): Map[Long, Long] = {
    val ts = text.trim.split("\\s+")
    if (ts.length < 2) Map.empty
    else ts.iterator.sliding(2).withPartial(false)
      .map { pair =>
        val sh = pair.mkString(" ")
        graft.plans.Md5Prefix60.compute(
          sh.getBytes(StandardCharsets.UTF_8), 0) % buckets
      }
      .toSeq.groupBy(identity).map { case (b, g) => b -> g.size.toLong }
  }
}
