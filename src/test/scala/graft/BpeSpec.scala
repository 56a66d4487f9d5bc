package graft

import graft.operators.Bpe
import org.scalatest.funsuite.AnyFunSuite

class BpeSpec extends AnyFunSuite with SparkFixture {
  import spark.implicits._

  test("three merge rounds on a constructed vocab: run overlap, freq weighting, merged-symbol chaining") {
    // "aaab" ×3 and "ab" ×2.
    // round 1: pairs (a,a) weight 6 vs (a,b) weight 5 → merge "a a"→"aa";
    //   the run "a a a" merges LEFT-TO-RIGHT NON-OVERLAPPING: "aa a"
    // round 2: (aa,a) 3, (a,b) 3+2=5 → merge "a b"→"ab"
    // round 3: only (aa,ab) 3 remains in "aaab" → merge to the full word
    val docs = Seq(
      (1L, "aaab aaab ab"),
      (2L, "aaab ab")).toDF("doc_id", "text")
    val got = Bpe.bpeMerges(docs, steps = 3).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
    assert(got === Array(
      (1L, "a a", "aa", 6L),
      (2L, "a b", "ab", 5L),
      (3L, "aa ab", "aaab", 3L)))
  }

  test("ties break by pair string ascending (deterministic across engines)") {
    // "xy" ×2 and "zw" ×2: both pairs count 2 — "x y" < "z w"
    val docs = Seq((1L, "xy zw xy zw")).toDF("doc_id", "text")
    val got = Bpe.bpeMerges(docs, steps = 1).collect()
      .map(r => (r.getString(1), r.getLong(3)))
    assert(got === Array(("x y", 2L)))
  }
}
