package graft

import org.scalatest.funsuite.AnyFunSuite

/** Registry-wide physical-plan invariants: whatever individual operator
  * specs pin, EVERY registered query must also be free of the two
  * plan shapes that cannot survive a 100 TB input. Runs on sf0.001 —
  * planning shapes, not timings. */
class PlanInvariantSpec extends AnyFunSuite with SparkFixture {

  /** Queries whose wrapper eagerly runs a stream rather than returning a
    * lazy frame; their operators are covered by StreamingSpec. */
  private val skip = Set("stream_tumbling")

  /** BroadcastNestedLoopJoin is legitimate exactly where one side is
    * guaranteed tiny: the literal band table (a theta join by design), the
    * broadcast 1-row query vector, and the broadcast 1-row corpus-total
    * scalars of the corpus-stats queries. */
  private val bnljAllowed = Set("q18b_theta_band", "q15_cosine_topk",
    "text_top_terms", "sim_batch_topk", "corpus_drift", "quantile_filter",
    "text_bm25")

  test("no registered query plans a cartesian product; BNLJ only where intended") {
    SparkEntry.queries.toSeq.sortBy(_._1)
      .filterNot { case (name, _) => skip(name) }
      .foreach { case (name, fn) =>
        val plan = fn(spark, sf0001).queryExecution.executedPlan.toString
        assert(!plan.contains("CartesianProduct"),
          s"$name plans a cartesian product:\n$plan")
        if (!bnljAllowed(name))
          assert(!plan.contains("BroadcastNestedLoopJoin"),
            s"$name plans an unintended nested-loop join:\n$plan")
      }
  }
}
