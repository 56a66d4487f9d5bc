package graft.operators

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Training-batch assembly operators over `documents` — the step between
  * dedup/filtering and the trainer in an LLM data pipeline (SURVEY.md
  * §2B extension surface):
  *
  *   - [[packSequences]]: concat-then-chunk sequence packing — documents
  *     in doc_id order are laid head-to-tail into a global token stream
  *     and cut into fixed-capacity training bins; each doc reports the
  *     bin and offset where it starts. Needs a GLOBAL running token
  *     count, which is the interesting part at scale: a bare
  *     `Window.orderBy` with no partitioning drags the whole corpus into
  *     ONE partition, so the cumulative sum runs two-level instead —
  *     order-preserving coarse buckets, a windowed cumsum WITHIN each
  *     bucket (shuffles once, `buckets`-way parallel), and a
  *     constant-size bucket-offset table (≤ `buckets` rows) that
  *     broadcasts back. The only single-partition window in the plan
  *     covers those ≤ `buckets` rows, never the corpus.
  *   - [[chunkDocuments]]: sliding context-window splitting — each doc
  *     longer than `chunkTokens` yields overlapping chunks at stride
  *     `chunkTokens − overlap`. Pure per-row arithmetic + explode:
  *     shuffle-free, embarrassingly parallel, one codegen'd scan.
  *
  * Both are exact integer arithmetic end to end, so the DuckDB oracle
  * hash-matches bit for bit. Token counting matches
  * [[TextAnalysis.tokenCounts]]: split on single spaces, drop empties.
  */
object Packing {

  /** Token count = number of non-space runs — identical to
    * `size(filter(split(c, " "), length(_) > 0))` (single-space split,
    * empties dropped; the semantics every oracle pins) but as one
    * allocation-free pass over the string. The declarative form's filter
    * lambda is CodegenFallback (interpreted — the repo-measured ~30×
    * pattern) AND materializes the full token array just to count it;
    * packSequences evaluates this over every document, where it was the
    * dominant per-row cost. Null text counts 0 (the tables have none). */
  private[graft] val nTokensUdf = udf { (text: String) =>
    if (text == null) 0L
    else {
      var n = 0L
      var i = 0
      val len = text.length
      var inTok = false
      while (i < len) {
        if (text.charAt(i) == ' ') inTok = false
        else { if (!inTok) n += 1; inTok = true }
        i += 1
      }
      n
    }
  }

  private def nTokens(c: Column): Column = nTokensUdf(c)

  /** (doc_id, n_tokens, bin_id, offset_in_bin): doc's start position in
    * the packed token stream, cut into bins of `binTokens`. A doc whose
    * tokens straddle a bin boundary belongs to the bin where it starts
    * (the concat-then-chunk pretraining convention: the stream is cut
    * every `binTokens` regardless of doc boundaries). */
  def packSequences(docs: DataFrame, binTokens: Int = 512,
      buckets: Int = 64): DataFrame = {
    require(binTokens > 0 && buckets > 0)
    val t = docs.select(col("doc_id"), nTokens(col("text")).as("n_tokens"))
    val mm = t.agg(min("doc_id"), max("doc_id")).head()
    if (mm.isNullAt(0))
      return t.select(col("doc_id"), col("n_tokens"),
        lit(0L).as("bin_id"), lit(0L).as("offset_in_bin")).limit(0)
    val (lo, hi) = (mm.getLong(0), mm.getLong(1))
    // width_bucket's upper bound is hi + 1; at doc_id = Long.MaxValue that
    // wraps (silently wrong bucketing under ANSI) — fail loudly instead
    require(hi < Long.MaxValue,
      "packSequences: doc_id = Long.MaxValue would overflow bucket bounds")
    // order-preserving coarse bucketing by doc_id value (uniform ranges;
    // a skew-robust variant would take approxQuantile bounds instead —
    // same plan shape, the bucket column is the only thing that changes)
    val bucketed = t.withColumn("bucket",
      width_bucket(col("doc_id"), lit(lo), lit(hi + 1), lit(buckets)))
    val wIn = Window.partitionBy("bucket").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    val withPre = bucketed
      .withColumn("pre_in", coalesce(sum("n_tokens").over(wIn), lit(0L)))
    // ≤ `buckets` rows: the one global-orderBy window in the plan is
    // constant-size, not corpus-size
    val wB = Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, -1)
    val offsets = withPre.groupBy("bucket")
      .agg(sum("n_tokens").as("btot"))
      .withColumn("boff", coalesce(sum("btot").over(wB), lit(0L)))
      .select("bucket", "boff")
    withPre.join(broadcast(offsets), "bucket")
      .withColumn("pre", col("boff") + col("pre_in"))
      .select(col("doc_id"), col("n_tokens"),
        expr(s"pre div $binTokens").as("bin_id"),
        (col("pre") % binTokens).as("offset_in_bin"))
      .orderBy("doc_id")
  }

  /** (doc_id, chunk_id, start_token, end_token): sliding windows of
    * `chunkTokens` at stride `chunkTokens − overlap` over each doc's
    * token positions; a window is emitted iff it is the doc's first or
    * contributes at least one new token (so `n_chunks = 1 +
    * ⌊max(n − overlap − 1, 0) / stride⌋` for non-empty docs; empty docs
    * yield no chunks). end_token is exclusive and clipped to n. */
  def chunkDocuments(docs: DataFrame, chunkTokens: Int = 64,
      overlap: Int = 8): DataFrame = {
    require(chunkTokens > overlap && overlap >= 0,
      s"need chunkTokens > overlap >= 0: $chunkTokens, $overlap")
    val stride = chunkTokens - overlap
    val nChunks = when(col("n_tokens") === 0, lit(0L)).otherwise(
      expr(s"1 + greatest(n_tokens - $overlap - 1, 0L) div $stride"))
    docs.select(col("doc_id"), nTokens(col("text")).as("n_tokens"))
      .withColumn("n_chunks", nChunks)
      // sequence(0, k-1) DESCENDS for k = 0 (→ [0,-1]); emit an empty
      // array for chunkless docs so explode drops them instead
      .withColumn("chunk_id", explode(when(col("n_chunks") > 0,
        sequence(lit(0L), col("n_chunks") - 1))
        .otherwise(array().cast("array<bigint>"))))
      .select(col("doc_id"), col("chunk_id"),
        (col("chunk_id") * stride).as("start_token"),
        least(col("chunk_id") * stride + chunkTokens, col("n_tokens"))
          .as("end_token"))
      .orderBy("doc_id", "chunk_id")
  }

  /** (bin_id, n_docs, n_tokens, shard_text): materialize each packing bin
    * as a training shard — the docs STARTING in the bin, concatenated in
    * doc_id order. ZERO-token docs are excluded: they contribute nothing
    * to a shard, and because they never advance the running count,
    * unboundedly many of them could otherwise share one bin_id and blow
    * up its group. With them gone a bin holds at most `binTokens` doc
    * starts (every kept doc is ≥1 token), so the per-bin collect_list is
    * bounded by construction; the ordered concat goes through
    * array_sort(struct(doc_id, text)) because collect_list order is not
    * deterministic across shuffles. The sort/transform lambdas are
    * interpreted, but over ≤`binTokens` elements per bin — bounded, not
    * the repo's corpus-sized-HOF trap. */
  def shardAssembly(docs: DataFrame, binTokens: Int = 512,
      buckets: Int = 64): DataFrame =
    packSequences(docs, binTokens, buckets)
      .filter(col("n_tokens") > 0)
      .join(docs.select(col("doc_id"), col("text")), "doc_id")
      .groupBy("bin_id")
      .agg(
        count(lit(1)).as("n_docs"),
        sum("n_tokens").as("n_tokens"),
        array_join(
          transform(
            array_sort(collect_list(struct(col("doc_id"), col("text")))),
            x => x.getField("text")),
          " ").as("shard_text"))
      .orderBy("bin_id")

  /** Length-bucketed batch assembly: documents ranked by
    * (token count DESC, doc_id) and cut into fixed-size batches of
    * `batchSize` similar-length neighbors — the standard
    * padding-minimization layout for variable-length training/inference
    * (a batch pads every member to its longest; random batching wastes
    * compute ∝ length variance). Emits one row per batch with its
    * padded-token cost and the waste the layout leaves.
    *
    * The global rank is the [[packSequences]] / corpusShuffle two-level
    * shape with a twist: the ORDER KEY ITSELF (n_tokens) is the bucket,
    * so within-bucket ranking needs only doc_id order and the offset
    * table has one row per DISTINCT LENGTH — bounded by the max doc
    * token count (a training corpus has ≤ ~context-window distinct
    * lengths), never by corpus rows. That offset cumsum is the plan's
    * only unpartitioned window (documented in PlanInvariantSpec's
    * allowlist); everything corpus-sized flows through one hash
    * shuffle on n_tokens and one on batch_id. Exact integer arithmetic
    * end to end. */
  def lengthBatches(docs: DataFrame, batchSize: Int = 32): DataFrame = {
    require(batchSize > 0, s"batchSize must be positive: $batchSize")
    val keyed = docs.select(col("doc_id"), nTokens(col("text")).as("n_tokens"))
    val wIn = Window.partitionBy("n_tokens").orderBy("doc_id")
    val wB = Window.orderBy(col("n_tokens").desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = keyed.groupBy("n_tokens").agg(count(lit(1)).as("bc"))
      .withColumn("boff", coalesce(sum("bc").over(wB), lit(0L)))
      .select("n_tokens", "boff")
    keyed
      .withColumn("rn", row_number().over(wIn).cast("long"))
      .join(broadcast(offsets), "n_tokens")
      // integer `div`, not floor(`/`): Spark's Divide casts the longs
      // to double, which goes inexact past 2^53 global positions while
      // the oracle's `//` stays exact — the quantileFilter div
      // discipline (r19 review finding)
      .withColumn("batch_id",
        expr(s"(boff + rn - 1) div ${batchSize.toLong}"))
      .groupBy("batch_id")
      .agg(count(lit(1)).as("n_docs"),
        max("n_tokens").as("max_tokens"),
        sum("n_tokens").as("sum_tokens"))
      .withColumn("padded_tokens", col("max_tokens") * col("n_docs"))
      .withColumn("padding_waste", col("padded_tokens") - col("sum_tokens"))
      .orderBy("batch_id")
  }

  // --- SparkEntry-facing query wrappers ---------------------------------

  def qPackSequences(s: SparkSession, dir: String): DataFrame =
    packSequences(Tables.documents(s, dir))

  /** Registered query (`length_batches`). */
  def qLengthBatches(s: SparkSession, dir: String): DataFrame =
    lengthBatches(Tables.documents(s, dir))

  def qShardAssembly(s: SparkSession, dir: String): DataFrame =
    shardAssembly(Tables.documents(s, dir))

  def qChunkDocuments(s: SparkSession, dir: String): DataFrame =
    chunkDocuments(Tables.documents(s, dir))
}
