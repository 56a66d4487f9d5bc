package graft

import graft.operators.TextAnalysis
import org.scalatest.funsuite.AnyFunSuite

class TextAnalysisSpec extends AnyFunSuite with SparkFixture {
  import spark.implicits._

  private val docs = Seq(
    (1L, "the cat sat on the mat"),
    (2L, "hello, world! it's 42 degrees."),
    (3L, "a")).toDF("doc_id", "text")

  test("token counts: whitespace and subword") {
    val r = TextAnalysis.tokenCounts(docs).collect()
      .map(x => x.getLong(0) -> (x.getLong(1), x.getLong(2))).toMap
    assert(r(1L) === ((6L, 6L)))
    // hello , world ! it ' s 42 degrees .  → 10 subword runs, 5 ws tokens
    assert(r(2L) === ((5L, 10L)))
    assert(r(3L) === ((1L, 1L)))
  }

  test("quality: stopword and punct ratios") {
    val r = TextAnalysis.qualityScores(docs).collect()
      .map(x => x.getLong(0) -> x).toMap
    // two 'the' of six tokens; qualityScores rounds to 4 decimals
    assert(r(1L).getAs[Double]("stopword_ratio") === 0.3333)
    assert(r(2L).getAs[Double]("punct_ratio") === 0.1333) // , ! ' . = 4 of 30 chars
    assert(r(1L).getAs[Double]("avg_token_len") ===
      math.rint((17.0 / 6) * 10000) / 10000)
  }

  test("langid: marker words dominate") {
    val multilingual = Seq(
      (1L, "the cat and the dog of the house"),
      (2L, "der hund und die katze und das haus"),
      (3L, "el perro y la casa de la playa"),
      (4L, "xylophone quartz")).toDF("doc_id", "text")
    val r = TextAnalysis.languageId(multilingual).collect()
      .map(x => x.getLong(0) -> x.getString(1)).toMap
    assert(r === Map(1L -> "en", 2L -> "de", 3L -> "es", 4L -> "und"))
  }

  test("repetition: duplicate-bigram fraction, edge cases exact") {
    val reps = Seq(
      (1L, "a b a b"),              // bigrams: ab, ba, ab → 1 dup of 3
      (2L, "spam spam spam spam"),  // 3 bigrams, 2 dups
      (3L, "all unique words here"),
      (4L, "single"),               // no bigrams → 0, 0.0
      (5L, "")).toDF("doc_id", "text")
    val r = TextAnalysis.repetitionScores(reps).collect()
      .map(x => x.getLong(0) -> (x.getLong(1), x.getDouble(2))).toMap
    assert(r(1L) === ((3L, math.rint(1.0 / 3 * 10000) / 10000)))
    assert(r(2L) === ((3L, math.rint(2.0 / 3 * 10000) / 10000)))
    assert(r(3L) === ((3L, 0.0)))
    assert(r(4L) === ((0L, 0.0)))
    assert(r(5L) === ((0L, 0.0)))
  }

  test("fingerprint: deterministic, order-sensitive, matches manual fold") {
    def fold(s: String): Long =
      s.foldLeft(0L)((acc, c) => (acc * 31 + c.toInt) % 1000000007L)
    val r = TextAnalysis.fingerprints(docs).collect()
      .map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(r(1L) === fold("the cat sat on the mat"))
    val swapped = Seq((9L, "mat the on sat cat the")).toDF("doc_id", "text")
    val fp9 = TextAnalysis.fingerprints(swapped).head.getLong(1)
    assert(fp9 !== r(1L))
  }
}
