package graft

import graft.operators.Decontamination
import org.scalatest.funsuite.AnyFunSuite

class DeconSpec extends AnyFunSuite with SparkFixture {
  import spark.implicits._

  private val benchmark = Seq(
    (100L, "the quick brown fox jumps"),
    (101L, "pack my box with five dozen jugs")).toDF("doc_id", "text")

  private val corpus = Seq(
    (1L, "we saw the quick brown fox yesterday"), // shares 2 3-grams
    (2L, "pack my box in care"),                  // shares 1
    (3L, "completely unrelated clean text here"),
    (4L, "ox jumps pack my")).toDF("doc_id", "text") // no shared 3-gram

  test("contaminationHits counts distinct shared n-grams per corpus doc") {
    val hits = Decontamination.contaminationHits(corpus, benchmark)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // doc 1: "the quick brown" + "quick brown fox"; doc 2: "pack my box"
    assert(hits === Map(1L -> 2L, 2L -> 1L))
  }

  test("decontaminate removes exactly the contaminated docs") {
    val clean = Decontamination.decontaminate(corpus, benchmark)
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(clean === Seq(3L, 4L))
  }

  test("bloom-prefiltered hits equal the exact path (FPs confirmed away)") {
    val exact = Decontamination.contaminationHits(corpus, benchmark)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val bloom = Decontamination.contaminationHitsBloom(corpus, benchmark)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(bloom === exact)
    // Degenerate fpp exercises the confirm join doing real work: at
    // fpp≈1 the bloom passes ~everything and results must STILL be exact.
    val sloppy = Decontamination
      .contaminationHitsBloom(corpus, benchmark, fpp = 0.9)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sloppy === exact)
  }

  test("probe join broadcasts the benchmark side (corpus never shuffles)") {
    val plan = Decontamination.contaminationHits(corpus, benchmark)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"benchmark side not broadcast:\n$plan")
    // the benchmark side may shuffle for its own distinct — it's small by
    // construction and sits under the BroadcastExchange; what must NOT
    // happen is a hash-repartition of the corpus shingle stream (the
    // streamed side prints before the build side in the plan tree)
    val lines = plan.linesIterator.toVector
    val bcast = lines.indexWhere(_.contains("BroadcastExchange"))
    val shingleShuffles = lines.zipWithIndex
      .filter(_._1.contains("Exchange hashpartitioning(shingle"))
    assert(shingleShuffles.forall(_._2 > bcast),
      s"corpus shingle stream shuffled for the join:\n$plan")
    // and the per-doc hit aggregation is the single corpus-rooted exchange
    assert(lines.count(_.contains("Exchange hashpartitioning(doc_id")) === 1,
      s"unexpected corpus shuffles:\n$plan")
  }
}
