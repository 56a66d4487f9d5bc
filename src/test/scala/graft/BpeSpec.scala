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

  test("canonical merge: even runs and alternating bigrams merge fully") {
    // 'aaaa' → 'a a a a': round 1 merges BOTH pairs skip-two ("aa aa"),
    // so round 2's top pair is (aa,aa). A consuming single-space
    // replace would under-merge to 'aa a a' and pick 'a a' in round 2.
    val even = Seq((1L, "aaaa")).toDF("doc_id", "text")
    val g1 = Bpe.bpeMerges(even, steps = 2).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
    assert(g1 === Array((1L, "a a", "aa", 3L), (2L, "aa aa", "aaaa", 1L)))

    // 'xyxyxy' → 'x y x y x y': all three (x,y) occurrences merge in
    // round 1 ("xy xy xy"), so round 2 sees (xy,xy)×2. The consuming
    // replace would skip the middle occurrence ("xy x y xy").
    val alt = Seq((1L, "xyxyxy")).toDF("doc_id", "text")
    val g2 = Bpe.bpeMerges(alt, steps = 2).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
    assert(g2 === Array((1L, "x y", "xy", 3L), (2L, "xy xy", "xyxy", 2L)))
  }

  test("five-run regroups canonically — a fixpoint replace would NOT") {
    // 'aaaaa' → canonical round 1 is "aa aa a" (scan left-to-right,
    // skip two). Iterating the consuming replace to a fixpoint yields
    // the DIFFERENT grouping "aa a aa", whose round-2 argmax is
    // ("a aa") instead of ("aa a") — pinning this case is what rules
    // the fixpoint formulation out.
    val run5 = Seq((1L, "aaaaa")).toDF("doc_id", "text")
    val g = Bpe.bpeMerges(run5, steps = 2).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
    assert(g === Array((1L, "a a", "aa", 4L), (2L, "aa a", "aaa", 1L)))
  }

  test("encode applies the trained merges in order; counts chars vs BPE tokens") {
    // corpus: "aaab ab" + "aaab" → words aaab×2, ab×1.
    // r1: (a,a) 4 vs (a,b) 3 → merge aa; r2: (aa,a) 2 vs (a,b) 3 →
    // merge ab; r3: (aa,ab) 2 → merge aaab. Encoding: "aaab" → 1
    // token, "ab" → 1 token.
    val docs = Seq((1L, "aaab ab"), (2L, "aaab")).toDF("doc_id", "text")
    val got = Bpe.bpeEncode(docs, steps = 3).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got === Array((1L, 6L, 2L), (2L, 4L, 1L)))

    // fewer merges than steps (tiny vocab exhausts): encoder applies
    // what exists and still counts correctly
    val tiny = Seq((7L, "xy xy")).toDF("doc_id", "text")
    // r1 merges (x,y) → "xy" single symbol; r2/r3 have nothing to merge
    val enc = Bpe.bpeEncode(tiny, steps = 3).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(enc === Array((7L, 4L, 2L)))

    // null text emits no row (repo-wide explode convention)
    val withNull = Seq((1L, "ab"), (2L, null)).toDF("doc_id", "text")
    assert(Bpe.bpeEncode(withNull).collect().map(_.getLong(0)).toSeq === Seq(1L))
  }

  test("carriage returns symbolize as single characters (Java dot vs RE2 dot)") {
    // Java's `.` skips \r (and U+0085/U+2028/U+2029) while RE2's skips
    // only \n: without DOTALL a CRLF word symbolized as a glued "\rb"
    // on the Spark side and "\r","b" in the DuckDB oracle — diverging
    // pair tables and token counts (r19 review finding). "a\rb" must be
    // 3 initial symbols: one merge leaves 2 BPE tokens, not 1.
    val docs = Seq((1L, "a\rb")).toDF("doc_id", "text")
    val got = Bpe.bpeEncode(docs, steps = 1).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got === Array((1L, 3L, 2L)))
  }

  test("encode chunks long merge lists without changing results") {
    // Hundreds of merges folded into ONE column expression nest a
    // Catalyst tree 3 levels per merge — a stack overflow at the
    // trainer's own 32k-round envelope (r19 review finding). The
    // chunked fold pins lineage between chunks; chunkRounds = 1 forces
    // a checkpoint between EVERY merge, and the output must be
    // bit-identical to the single-expression plan.
    val docs = Seq((1L, "aaab ab"), (2L, "aaab")).toDF("doc_id", "text")
    val single = Bpe.bpeEncode(docs, steps = 3).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    val chunked = Bpe.bpeEncode(docs, steps = 3, chunkRounds = 1).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(chunked === single)
  }

  test("bpeMerges reaps every one of its own checkpoint blocks and spares bystander persisted RDDs") {
    // r19 ADVICE pair: (a) the registry-delta reaper baselined the
    // initial `words` checkpoint into knownIds and leaked one
    // materialized vocabulary copy per bpeMerges call; (b) diffing the
    // global persistent-RDD registry would force-unpersist RDDs some
    // CONCURRENT job persisted mid-run. The rewrite tracks the trainer's
    // own LogicalRDD handles, so after the call the registry must be
    // exactly what it was, bystanders untouched.
    val sc = spark.sparkContext
    val pre = sc.getPersistentRDDs.keySet
    val bystander = sc.parallelize(1 to 10).persist()
    bystander.count()
    val docs = Seq((1L, "aaab ab"), (2L, "aaab aaab")).toDF("doc_id", "text")
    assert(Bpe.bpeMerges(docs, steps = 3).collect().nonEmpty)
    val post = sc.getPersistentRDDs.keySet
    assert((post -- pre) === Set(bystander.id),
      s"trainer checkpoints leaked: ${(post -- pre) - bystander.id}")
    assert(bystander.getStorageLevel.useMemory,
      "bystander RDD was force-unpersisted by the trainer's reaper")
    bystander.unpersist(false)
  }

  test("ties break by pair string ascending (deterministic across engines)") {
    // "xy" ×2 and "zw" ×2: both pairs count 2 — "x y" < "z w"
    val docs = Seq((1L, "xy zw xy zw")).toDF("doc_id", "text")
    val got = Bpe.bpeMerges(docs, steps = 1).collect()
      .map(r => (r.getString(1), r.getLong(3)))
    assert(got === Array(("x y", 2L)))
  }

  test("scale envelope: 50 driver-sequential rounds match the reference merge for merge") {
    // The trainer's loop is driver-SEQUENTIAL by nature (each round's
    // argmax depends on the previous merge) — realistic vocabularies run
    // it hundreds/thousands of times, so this pins a deep run: 50 rounds
    // on a corpus rich enough to never exhaust, every pick equal to the
    // in-memory canonical reference, and the per-round rewrite's lazy
    // checkpoint keeping the plan from snowballing (completion well
    // inside the suite budget IS the envelope check; cost grows as
    // steps × vocabulary scan, documented on bpeMerges).
    val rng = new scala.util.Random(21)
    val letters = "abcdefgh"
    def word() = Seq.fill(3 + rng.nextInt(8))(
      letters(rng.nextInt(letters.length))).mkString
    val texts = Seq.tabulate(40)(i =>
      (i.toLong, Seq.fill(12)(word()).mkString(" ")))
    val docs = texts.toDF("doc_id", "text")
    val allWords = texts.flatMap(_._2.split(" ")).filter(_.nonEmpty)
    val (expMerges, encoded) = BpeReference.refBpeMerges(allWords, steps = 50)
    assert(expMerges.length === 50, "fixture rot: vocab exhausted early")
    val got = Bpe.bpeMerges(docs, steps = 50).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
      .toSeq
    assert(got === expMerges)
    // the 50-merge table applied by the encoder matches the reference's
    // per-word symbol counts
    val gotEnc = Bpe.bpeEncode(docs, steps = 50).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    texts.foreach { case (id, t) =>
      val exp = t.split(" ").filter(_.nonEmpty).map(w => encoded(w).toLong).sum
      assert(gotEnc(id) === exp, s"doc $id symbol count")
    }
  }
}
