package graft

import graft.operators.{TextAnalysis, TextStats}
import org.scalatest.funsuite.AnyFunSuite

class TextStatsSpec extends AnyFunSuite with SparkFixture {
  import spark.implicits._

  // 3 docs, hand-checkable counts: "rare" appears once in one doc,
  // "the cat" is the dominant bigram.
  private val docs = Seq(
    (1L, "the cat sat on the cat mat"),
    (2L, "the cat ate the rare fish"),
    (3L, "dogs bark")).toDF("doc_id", "text")

  test("topTerms: ranked by tf desc then df asc then term, exact tfidf") {
    val r = TextStats.topTerms(docs, k = 2).collect()
      .map(x => (x.getLong(0), x.getLong(1)) ->
        (x.getString(2), x.getLong(3), x.getLong(4))).toMap
    // doc 1: 'the'/'cat' tf=2 tie → df tie (both in docs 1,2) → term asc
    assert(r((1L, 1L)) === (("cat", 2L, 2L)))
    assert(r((1L, 2L)) === (("the", 2L, 2L)))
    // doc 3: both tf=1 df=1 → term asc
    assert(r((3L, 1L)) === (("bark", 1L, 1L)))
    // tfidf = tf * ln(N/df): cat in doc1 = 2*ln(3/2)
    val row = TextStats.topTerms(docs, k = 2).collect()
      .find(x => x.getLong(0) == 1L && x.getString(2) == "cat").get
    assert(row.getAs[Double]("tfidf") ===
      math.rint(2 * math.log(3.0 / 2) * 10000) / 10000)
  }

  test("collocations: counts exact, ordered by pair count then bigram") {
    val r = TextStats.collocations(docs, k = 3).collect()
    assert(r.head.getString(0) === "the cat") // appears 3×
    assert(r.head.getLong(1) === 3L)
    assert(r.head.getLong(2) === 4L) // 'the' unigram count
    assert(r.head.getLong(3) === 3L) // 'cat' unigram count
    // pmi = ln(cb·tu²/(tb·cu_l·cu_r)); tu=15 unigrams, tb=12 bigrams
    assert(r.head.getAs[Double]("pmi") ===
      math.rint(math.log(3.0 * 15 * 15 / (12.0 * 4 * 3)) * 10000) / 10000)
    // remaining rows tie at cb=1 → bigram-ascending
    assert(r.map(_.getString(0)).drop(1) === r.map(_.getString(0)).drop(1).sorted)
  }

  test("rarityScores: rare fraction and min count exact") {
    val r = TextStats.rarityScores(docs, rareBelow = 2L).collect()
      .map(x => x.getLong(0) ->
        (x.getLong(1), x.getLong(2), x.getAs[Double]("rare_frac"),
          x.getLong(4))).toMap
    // doc 1 bigrams: the-cat(3) cat-sat sat-on on-the the-cat cat-mat
    // → 6 total, 4 with corpus count 1 (<2)
    assert(r(1L) === ((6L, 4L, math.rint(4.0 / 6 * 10000) / 10000, 1L)))
    // doc 3: one bigram, count 1
    assert(r(3L) === ((1L, 1L, 1.0, 1L)))
  }

  test("rarityScores: single-word docs have no bigrams and drop out") {
    val d = Seq((1L, "solo"), (2L, "a b")).toDF("doc_id", "text")
    assert(TextStats.rarityScores(d).collect().map(_.getLong(0)).toSeq === Seq(2L))
  }

  test("filterVerdicts: each rule fires and keep matches reason") {
    val d = Seq(
      (1L, ("the quick brown fox jumps over lazy dogs daily " * 3).trim), // 27 tokens, ok
      (2L, "too short a doc"),                                  // too_short
      (3L, Seq.fill(30)("a b c d").mkString(" ")),              // short_words
      (4L, Seq.fill(30)("extraordinarily incomprehensibilities the").mkString(" ")), // long_words
      (5L, Seq.fill(30)("fox dog cat").mkString(" ")))          // no_stopwords
      .toDF("doc_id", "text")
    val r = TextAnalysis.filterVerdicts(d).collect()
      .map(x => x.getLong(0) -> (x.getString(1), x.getLong(2))).toMap
    assert(r(1L) === (("ok", 1L)))
    assert(r(2L) === (("too_short", 0L)))
    assert(r(3L) === (("short_words", 0L)))
    assert(r(4L) === (("long_words", 0L)))
    assert(r(5L) === (("no_stopwords", 0L)))
  }

  test("invertedIndex: exact df, postings bounded and ascending") {
    val docs = Seq(
      (5L, "b a"), (3L, "a a b"), (9L, "a c"), (1L, "c")
    ).toDF("doc_id", "text")
    val r = TextStats.invertedIndex(docs, maxPostings = 2)
      .collect().map(x => x.getString(0) -> ((x.getLong(1), x.getString(2))))
    // within-doc repeats count once toward df; postings = 2 smallest ids
    assert(r.toSeq === Seq(
      "a" -> ((3L, "3,5")),
      "b" -> ((2L, "3,5")),
      "c" -> ((2L, "1,9"))))
  }

  test("every new round-7 operator returns empty on an empty corpus, no crash") {
    val noDocs = Seq.empty[(Long, String)].toDF("doc_id", "text")
    assert(TextStats.topTerms(noDocs).count() === 0)
    assert(TextStats.collocations(noDocs).count() === 0)
    assert(TextStats.rarityScores(noDocs).count() === 0)
    assert(TextAnalysis.filterVerdicts(noDocs).count() === 0)
    assert(graft.operators.Packing.shardAssembly(noDocs).count() === 0)
    val noRows = Seq.empty[(String, Long)].toDF("g", "k")
    assert(graft.operators.Sampling.samplePerGroup(noRows, "g", "k", 3).count() === 0)
    assert(graft.operators.Relational.coOccurrence(noRows, "g", "k").count() === 0)
    assert(graft.operators.TextStats.invertedIndex(
      spark.emptyDataset[(Long, String)].toDF("doc_id", "text")).count() === 0)
  }

  test("single-doc corpus: collocations and rarity still well-formed") {
    val one = Seq((7L, "x y x y")).toDF("doc_id", "text")
    val c = TextStats.collocations(one, k = 5).collect()
    assert(c.map(_.getString(0)).toSet === Set("x y", "y x"))
    val r = TextStats.rarityScores(one, rareBelow = 2).collect()
    assert(r.length === 1 && r.head.getLong(1) === 3L) // 3 bigrams
  }

  test("bm25: term-hit doc ranks above partial hits; missing terms score nothing") {
    val docs = Seq(
      (1L, "hash join vector hash join"),   // all 3 query terms, tf-heavy
      (2L, "hash table scan row batch"),    // 1 query term
      (3L, "merge sort run length code"),   // 0 query terms → absent
      (4L, "join vector join vector join")) // 2 query terms
      .toDF("doc_id", "text")
    val got = TextStats.bm25Retrieval(docs, Seq("hash", "join", "vector"))
      .collect()
    assert(got.map(_.getLong(0)).toSet === Set(1L, 2L, 4L)) // doc 3 absent
    val byDoc = got.map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(byDoc(1L) === 3L && byDoc(4L) === 2L && byDoc(2L) === 1L)
    // full-coverage doc outranks the single-hit doc
    val order = got.map(_.getLong(0)).toSeq
    assert(order.indexOf(1L) < order.indexOf(2L))
  }

  test("bm25 plan: query-term filter is pushed to the scan side, df side broadcasts") {
    val plan = TextStats.bm25Retrieval(docs, Seq("alpha", "beta"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan)
  }

  test("vocabStats: exact per-source token and vocab counts") {
    val docs = Seq(
      (1L, "a b a", "s1"), (2L, "a c", "s1"), (3L, "x y z x", "s2"))
      .toDF("doc_id", "text", "source")
    val got = TextStats.vocabStats(docs).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4))).toMap
    assert(got("s1") === ((2L, 5L, 3L, 0.6)))   // tokens a,b,a,a,c; vocab a,b,c
    assert(got("s2") === ((1L, 4L, 3L, 0.75)))  // x,y,z,x; vocab x,y,z
  }

  test("topTerms plan: the only window is doc_id-partitioned") {
    val plan = TextStats.topTerms(docs).queryExecution.executedPlan.toString
    assert(plan.contains("Window"), plan)
    // its exchange hashes on doc_id — never a corpus-wide SinglePartition
    // window (the scalar-count agg is the only legitimate 1-row exchange)
    assert(plan.contains("hashpartitioning(doc_id"), plan)
  }
  test("lm_logprob: add-one bigram LM, integerized per-token logs, exact sums") {
    // corpus: "a b a", "b a", "z" -> unigrams a:3 b:2 z:1, V=3.
    // p(b|a) = (1+1)/(3+3) = 1/3  -> ln = -1.0986123 -> -1098612
    // p(a|b) = (2+1)/(2+3) = 3/5  -> ln = -0.5108256 -> -510826
    val docs = Seq((1L, "a b a"), (2L, "b a"), (3L, "z"))
      .toDF("doc_id", "text")
    val got = TextStats.lmLogprob(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(got === Array(
      (1L, 2L, -1609438L, -0.8047),
      (2L, 1L, -510826L, -0.5108)))
    // doc 3 has one token -> no bigrams -> no row, but its token still
    // contributed to V and the unigram counts (asserted by the values
    // above: V=3 not 2)
    assert(!got.map(_._1).contains(3L))
    // determinism across runs (integer sums: no accumulation-order drift)
    assert(TextStats.lmLogprob(docs).collect().toSeq ===
      TextStats.lmLogprob(docs).collect().toSeq)
  }
}
