package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Entity resolution (record linkage) — the structured-data sibling of
  * the document dedup family: find records that denote the SAME
  * real-world entity despite textual drift (typos, re-keyed ingests,
  * partial field corruption), then assign canonical ids.
  *
  * The three-stage shape every production ER system shares, composed
  * from this repo's existing primitives:
  *
  *   1. BLOCKING — candidate pairs come only from records agreeing on a
  *      cheap deterministic key, via plain equi self-joins (never a
  *      corpus×corpus comparison; the LSH-banding idea with exact
  *      keys). MULTI-PASS: several independent blocking keys, unioned —
  *      a single key misses any record whose key field itself is
  *      corrupted, so real pipelines run two or three passes whose
  *      union covers each other's blind spots.
  *   2. MATCHING — an expensive fuzzy predicate (here codegen'd
  *      `levenshtein` on the name) runs at CANDIDATE cardinality only.
  *   3. CLUSTERING — matched pairs feed the same pointer-jumping
  *      [[Dedup.connectedComponents]] the near-dup family uses;
  *      canonical id = component minimum (survivorship rule).
  *
  * Scale: block sizes are bounded by key choice — composite keys
  * (nation+balance, segment+balance) keep blocks O(1) here; a skewed
  * blocking key on real data takes the same `splitHotKeysStar`
  * degradation the LSH paths use. Shuffles carry (key, id, name) only.
  */
object EntityResolution {

  /** Candidate pairs from one blocking pass: equi self-join on `keys`,
    * each unordered pair once. */
  private def blockPairs(recs: DataFrame, keys: Seq[String]): DataFrame = {
    val a = recs.select(
      keys.map(col) :+ col("c_custkey").as("a") :+ col("c_name").as("na"): _*)
    val b = recs.select(
      keys.map(col) :+ col("c_custkey").as("b") :+ col("c_name").as("nb"): _*)
    a.join(b, keys).filter(col("a") < col("b"))
      .select("a", "b", "na", "nb")
  }

  /** Resolve near-duplicate customer records: two blocking passes
    * (nation+balance, segment+balance), a levenshtein ≤ `maxEdits` name
    * match, CC clustering. Returns (c_custkey, canonical_custkey), one
    * row per record that belongs to a multi-record entity. */
  def resolveCustomers(recs: DataFrame, maxEdits: Int = 1): DataFrame = {
    val cand = blockPairs(recs, Seq("c_nationkey", "c_acctbal"))
      .unionByName(blockPairs(recs, Seq("c_mktsegment", "c_acctbal")))
      .distinct()
    val matched = cand
      .filter(levenshtein(col("na"), col("nb")) <= maxEdits)
      .select("a", "b")
    Dedup.connectedComponents(matched, "a", "b")
      .select(col("doc_id").as("c_custkey"),
        col("canonical_doc_id").as("canonical_custkey"))
      .orderBy("c_custkey")
  }

  /** Registered query (`er_customers`): the customer table with planted
    * drifted duplicates — every %50 record re-keyed under +1000000 with
    * a one-edit name typo ("Customer#…" → "Cstomer#…"); the %150 subset
    * ALSO corrupts the nation key, so blocking pass 1 misses it and only
    * the segment+balance pass catches it — the multi-pass union is
    * load-bearing, not decorative (a pass-coverage regression drops
    * those clusters and hash-mismatches the oracle). Oracle = the same
    * construction + blocking + levenshtein in SQL, CC as the recursive
    * reachability CTE the dedup_clusters oracle established. */
  def qResolveCustomers(s: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(s, dir)
      .select("c_custkey", "c_name", "c_nationkey", "c_acctbal",
        "c_mktsegment")
    val clones = c.filter(col("c_custkey") % 50 === 0)
      .select(
        (col("c_custkey") + 1000000L).as("c_custkey"),
        concat(lit("C"), expr("substring(c_name, 3)")).as("c_name"),
        when(col("c_custkey") % 150 === 0,
          (col("c_nationkey") + 1) % 25).otherwise(col("c_nationkey"))
          .as("c_nationkey"),
        col("c_acctbal"), col("c_mktsegment"))
    resolveCustomers(c.unionByName(clones))
  }
}
