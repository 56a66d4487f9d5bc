package graft

import graft.operators.Packing
import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

class PackingSpec extends AnyFunSuite with SparkFixture {
  import spark.implicits._

  // token counts: 3, 5, 0, 2, 4 (split on single spaces, drop empties)
  private def corpus: DataFrame = Seq(
    (10L, "a b c"),
    (11L, "d e f g h"),
    (12L, ""),
    (13L, "i j"),
    (14L, "k l  m n")).toDF("doc_id", "text")

  test("packSequences: global running count cut into bins") {
    // stream: doc10@0, doc11@3, doc12@8, doc13@8, doc14@10; bin capacity 4
    val got = Packing.packSequences(corpus, binTokens = 4, buckets = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq === Seq(
      (10L, 3L, 0L, 0L),
      (11L, 5L, 0L, 3L),
      (12L, 0L, 2L, 0L),
      (13L, 2L, 2L, 0L),
      (14L, 4L, 2L, 2L)))
  }

  test("packSequences: bucket count does not change the result") {
    val a = Packing.packSequences(corpus, binTokens = 4, buckets = 1).collect()
    val b = Packing.packSequences(corpus, binTokens = 4, buckets = 64).collect()
    assert(a.map(_.toSeq).toSeq === b.map(_.toSeq).toSeq)
  }

  test("packSequences: empty corpus yields empty frame with full schema") {
    val empty = Seq.empty[(Long, String)].toDF("doc_id", "text")
    val got = Packing.packSequences(empty)
    assert(got.columns.toSeq ===
      Seq("doc_id", "n_tokens", "bin_id", "offset_in_bin"))
    assert(got.count() === 0)
  }

  test("packSequences plan: corpus cumsum bucket-partitioned, offsets broadcast") {
    val plan = Packing.packSequences(corpus, binTokens = 4, buckets = 2)
      .queryExecution.executedPlan.toString
    // the corpus-sized window must be partitioned by bucket …
    assert(plan.contains("windowspecdefinition(bucket"),
      s"corpus window not bucket-partitioned:\n$plan")
    // … the bucket-offset table joins back as a broadcast …
    assert(plan.contains("BroadcastExchange"), s"offsets not broadcast:\n$plan")
    // … and the only single-partition exchange is the constant-size
    // bucket-totals window, never the corpus
    assert(plan.linesIterator.count(_.contains("Exchange SinglePartition")) === 1,
      s"unexpected single-partition exchanges:\n$plan")
  }

  test("shardAssembly: bins concat their starting docs in doc_id order") {
    // stream as above, bin capacity 4: bin0 = docs 10,11; bin2 = 13,14
    // (doc12 is zero-token → excluded: it would contribute nothing and
    // zero-token runs would make bin groups unbounded)
    val got = Packing.shardAssembly(corpus, binTokens = 4, buckets = 2)
      .collect().map(r =>
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    assert(got.toSeq === Seq(
      (0L, 2L, 8L, "a b c d e f g h"),
      (2L, 2L, 6L, "i j k l  m n")))
  }

  test("chunkDocuments: stride windows, boundary cases, empty docs dropped") {
    // chunk 4, overlap 1, stride 3:
    //   n=3 → 1 chunk [0,3); n=5 → 1+⌊(5-1-1)/3⌋=2 → [0,4),[3,5)
    //   n=0 → none; n=2 → [0,2); n=4 → 1+⌊(4-2)/3⌋=1 → [0,4)
    val got = Packing.chunkDocuments(corpus, chunkTokens = 4, overlap = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq === Seq(
      (10L, 0L, 0L, 3L),
      (11L, 0L, 0L, 4L), (11L, 1L, 3L, 5L),
      (13L, 0L, 0L, 2L),
      (14L, 0L, 0L, 4L)))
  }

  test("chunkDocuments: a chunk is emitted only if it adds new tokens") {
    // n=4 with chunk 4, overlap 2, stride 2: window at 2 would cover
    // [2,4) ⊂ [0,4) — adds nothing, must not be emitted
    val one = Seq((1L, "a b c d")).toDF("doc_id", "text")
    val got = Packing.chunkDocuments(one, chunkTokens = 4, overlap = 2)
    assert(got.count() === 1)
    // n=5: window at 2 covers [2,5) — adds token 4, emitted
    val two = Seq((1L, "a b c d e")).toDF("doc_id", "text")
    assert(Packing.chunkDocuments(two, chunkTokens = 4, overlap = 2)
      .count() === 2)
  }

  test("lengthBatches: descending-length rank, batch stats, padding waste") {
    // fixture lengths: doc10=3, doc11=5, doc12=0, doc13=2, doc14=4;
    // add a second 3-token doc so a length tie crosses nothing weird
    val docs = corpus.union(Seq((15L, "x y z")).toDF("doc_id", "text"))
    // rank: 11(5), 14(4), 10(3), 15(3), 13(2), 12(0); batchSize=2 →
    //   batch 0: {11,14} max 5 sum 9 → padded 10, waste 1
    //   batch 1: {10,15} max 3 sum 6 → padded 6, waste 0
    //   batch 2: {13,12} max 2 sum 2 → padded 4, waste 2
    val got = Packing.lengthBatches(docs, batchSize = 2).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    assert(got.toSeq === Seq(
      (0L, 2L, 5L, 9L, 10L, 1L),
      (1L, 2L, 3L, 6L, 6L, 0L),
      (2L, 2L, 2L, 2L, 4L, 2L)))
  }

  test("lengthBatches: within-length ties rank by doc_id so batches are reproducible") {
    val docs = Seq((3L, "a b"), (1L, "c d"), (2L, "e f"), (4L, "g h"))
      .toDF("doc_id", "text")
    // all length 2 → rank purely by doc_id: batch0={1,2}, batch1={3,4}
    val got = Packing.lengthBatches(docs, batchSize = 2).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq === Seq((0L, 2L, 2L), (1L, 2L, 2L)))
  }
}
