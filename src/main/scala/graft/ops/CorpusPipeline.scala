package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The composed corpus-construction pipeline: six individually
  * oracle-verified stages chained as ONE declarative job —
  *
  *   corpus build (q76)   quality gates + keep-first near-dup
  *                        suppression + deterministic hash sample
  *   → line dedup (q99)   corpus-wide boilerplate line scrub
  *   → clustering (q62)   blocked-Jaccard near-dup components
  *                        over the CLEANED text
  *   → quality keep (q126) longest document per cluster
  *   → chunking (q88)     32-token windows, stride 16,
  *                        content-addressed chunks
  *   → sharding (q132)    serpentine deal over the counting-sort
  *                        rank — 8 balanced training shards
  *
  * — the shape a real training-data run executes. Composing matters
  * beyond the per-stage audits: stage boundaries here are plain
  * DataFrame hand-offs (no materialization, no driver round-trips), so
  * Catalyst plans the whole chain as one DAG and the scale tier can
  * measure the END-TO-END wall/shuffle cost rather than five solo
  * costs. Every shuffle keys on doc/cluster/hash ids; text rides a
  * shuffle only where a stage's semantics need it (line reassembly,
  * chunking) — the per-stage scale arguments carry over unchanged.
  *
  * Input `docs`: (doc_id, text, source, n_chars) — the documents
  * table. Output: one row per 32-token chunk of each kept document's
  * cleaned text, with its training shard:
  * (doc_id, chunk_id, chunk_len, chunk_hash, shard).
  */
object CorpusPipeline {

  private def blockOf(nChars: org.apache.spark.sql.Column) =
    (nChars / 100).cast("int").cast("string")

  def build(docs: DataFrame): DataFrame = {
    // stage 1 — corpus build (q76): quality gates, keep-first near-dup
    // suppression, deterministic 50% hash sample (map-side predicate)
    val kept = TextOps.corpusDecisions(docs)
      .filter(col("decision") === "kept").select(col("doc_id"))
    val sampled = Sampling.hashRateSample(docs.join(kept, Seq("doc_id")),
      col("doc_id").cast("string"), num = 500, den = 1000)

    // stage 2 — line dedup (q99): 10-word lines cut map-side, lines in
    // >= 2 distinct docs dropped corpus-wide, survivors reassembled
    val lines = sampled
      .select(col("doc_id"), split(col("text"), " ").as("words"))
      .select(col("doc_id"), posexplode(expr(
        """transform(sequence(0, (size(words) - 1) div 10),
           n -> array_join(slice(words, n * 10 + 1, 10), ' '))"""))
        .as(Seq("line_no", "line")))
    val cleaned = TextOps.lineDedupe(lines, maxDocFreq = 2, sep = " ")
      .join(sampled.select(col("doc_id"), col("source")), Seq("doc_id"))
      .withColumn("n_chars", length(col("clean_text")).cast("long"))

    // stage 3 — near-dup clustering (q62) over the CLEANED text: the
    // line scrub upstream means boilerplate can no longer glue
    // unrelated documents into one cluster
    val tr = cleaned.select(col("doc_id").as("doc"),
      concat(col("source"), lit("#"), blockOf(col("n_chars"))).as("block"),
      explode(array_distinct(TextOps.tokens(col("clean_text")))).as("token"))
    val edges = TextOps.blockedJaccard(tr)
      .filter(col("jaccard") >= 0.9)
      .select(col("d1"), col("d2"))
    val docBlocks = cleaned.select(col("doc_id").as("doc"),
      concat(col("source"), lit("#"), blockOf(col("n_chars"))).as("block"))
    val clustered = TextOps.blockLocalComponents(edges, docBlocks,
        cleaned.select(col("doc_id").as("node")))
      .select(col("node").as("doc_id"), col("cluster"))

    // stage 4 — quality-priority keep (q126): longest doc per cluster,
    // one keyed top-1 window
    val sized = clustered.join(
      cleaned.select(col("doc_id"), col("n_chars"), col("clean_text")),
      Seq("doc_id"))
    val keepers = Relational.topOnePerGroup(sized, Seq(col("cluster")),
      Seq(col("n_chars").desc, col("doc_id").asc))

    // stage 5 — chunking (q88): 32-token windows with stride 16, each
    // chunk content-addressed by the cross-engine hash
    val chunks = keepers
      .select(col("doc_id"), TextOps.tokens(col("clean_text")).as("ts"))
      .withColumn("n", size(col("ts")))
      .filter(col("n") >= 1)
      .select(col("doc_id"), col("ts"),
        explode(expr("sequence(0, (n - 1) div 16)")).as("chunk_id"))
      .select(col("doc_id"), col("chunk_id").cast("int").as("chunk_id"),
        expr("slice(ts, CAST(chunk_id * 16 + 1 AS INT), 32)").as("chunk"))
      .select(col("doc_id"), col("chunk_id"),
        size(col("chunk")).as("chunk_len"),
        TextOps.h64(array_join(col("chunk"), " ")).as("chunk_hash"))

    // stage 6 — balanced training shards (q132): serpentine deal over
    // the counting-sort rank (bucket = chunk_len, ≤ 33 distinct values)
    // so the 8 shard token totals stay within one chunk of each other
    Shard.histogramRank(chunks, col("chunk_len"), bucketAsc = false,
        Seq(col("doc_id").asc, col("chunk_id").asc), "__rnk")
      .withColumn("shard", Shard.serpentineShard(col("__rnk"), 8)
        .cast("int"))
      .drop("__rnk")
  }
}
