package graft

import graft.operators.Segments
import org.scalatest.funsuite.AnyFunSuite

class SegmentsSpec extends AnyFunSuite with SparkFixture {
  import spark.implicits._

  // 2-word segments make the fixture arithmetic obvious.
  private val docs = Seq(
    (1L, "a b c d e"),        // segs: "a b", "c d", "e"
    (2L, "a b x y"),          // segs: "a b", "x y"  — "a b" is cross-doc dup
    (3L, "x y x y"),          // segs: "x y", "x y"  — both occurrences dup
    (4L, "unique words only") // segs: "unique words", "only"
  ).toDF("doc_id", "text")

  test("segmentDocs chunks words into ordered fixed-width segments") {
    val segs = Segments.segmentDocs(docs.filter($"doc_id" === 1L), 2)
      .orderBy("seg_idx")
      .collect().map(r => (r.getInt(1), r.getString(2))).toSeq
    assert(segs === Seq((0, "a b"), (1, "c d"), (2, "e")))
  }

  test("dedupSegments removes every occurrence of cross-doc segments") {
    val r = Segments.dedupSegments(docs, segWords = 2)
      .collect()
      .map(x => x.getLong(0) -> ((x.getLong(1), x.getLong(2), x.getString(3))))
      .toMap
    assert(r(1L) === ((3L, 1L, "c d e")))       // "a b" removed
    assert(r(2L) === ((2L, 2L, "")))            // "a b" and "x y" both dup
    assert(r(3L) === ((2L, 2L, "")))            // within-doc repeats of a
                                                // cross-doc dup all removed
    assert(r(4L) === ((2L, 0L, "unique words only")))
  }

  test("within-doc-only repeats survive (dup means >1 DISTINCT docs)") {
    val solo = Seq((9L, "p q p q r")).toDF("doc_id", "text")
    val r = Segments.dedupSegments(solo, segWords = 2).collect().head
    assert((r.getLong(1), r.getLong(2), r.getString(3)) === ((3L, 0L, "p q p q r")))
  }

  test("empty corpus yields empty result") {
    val empty = spark.emptyDataset[(Long, String)].toDF("doc_id", "text")
    assert(Segments.dedupSegments(empty).count() === 0)
  }

  test("plan: no cartesian, reassembly window-free, joins key-partitioned") {
    val plan = Segments.dedupSegments(docs, segWords = 2)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"))
    assert(!plan.contains("Window"),
      s"reassembly must aggregate, not window:\n$plan")
  }
}
