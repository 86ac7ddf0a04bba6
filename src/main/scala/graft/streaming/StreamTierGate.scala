package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.ops.TextOps

/** Streaming quality-tier gate — the streaming sibling of the v4
  * pipeline's [[graft.ops.CorpusPipelineV2.tierGate]]: arriving
  * documents are gated against a FROZEN tier table (the label
  * propagation over the source affinity graph runs batch-side — on
  * yesterday's corpus, a nightly job — and its host-sized verdict
  * frame broadcasts into the ingest stream). Stateless: a
  * stream-static broadcast join plus the same salted map-side hash
  * predicate, so a document is admitted or dropped within its own
  * micro-batch and a re-delivered document always gets the identical
  * verdict (the decision reads only the frozen table and the doc's
  * own key — never arrival order). Unlike the batch gate, the stream
  * emits the DECISION instead of filtering, so a downstream audit
  * sink can count what the gate did per tier; `filter($"keep")` is
  * the batch-equivalent admission (StreamTierGateSpec pins parity).
  */
object StreamTierGate {

  /** (doc_id, source, …) stream + frozen `tiers(source, tier)` →
    * the input columns + (tier, keep). 'lo'-tier docs keep only the
    * deterministic half (hash salt "|tg", the batch gate's exact
    * predicate); 'hi' and no-evidence sources pass whole. */
  def gate(docs: DataFrame, tiers: DataFrame): DataFrame =
    docs.join(broadcast(tiers.select(col("source"), col("tier"))),
        Seq("source"), "left")
      .withColumn("keep",
        coalesce(col("tier") =!= "lo", lit(true)) ||
          pmod(TextOps.h64(concat(col("doc_id").cast("string"),
            lit("|tg"))), lit(2L)) === 0L)
}
