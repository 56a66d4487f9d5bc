package graft

import graft.operators.EntityResolution
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class EntityResolutionSpec extends AnyFunSuite with SparkFixture {
  import spark.implicits._

  // (key, name, nation, balance, segment)
  private def recs = Seq(
    (1L, "Customer#000000001", 5, 100.0, "AUTO"),
    // one-edit clone of 1, same blocks → resolved
    (2L, "Cstomer#000000001", 5, 100.0, "AUTO"),
    // one-edit clone of 1 with CORRUPTED nation — only the
    // segment+balance pass can block it with 1
    (3L, "Custmer#000000001", 9, 100.0, "AUTO"),
    // same blocks as 1 but a genuinely different name → never matched
    (4L, "Customer#000000777", 5, 100.0, "AUTO"),
    // identical name to 1 but NO shared blocking key → never paired
    // (blocking is load-bearing: matching without candidates is not run)
    (5L, "Customer#000000001", 11, 200.0, "BLDG"),
    (6L, "Customer#000000042", 7, 300.0, "MACH"))
    .toDF("c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment")

  test("multi-pass blocking resolves drift the first pass misses; no false merges") {
    val out = EntityResolution.resolveCustomers(recs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // 1, 2, 3 form one entity with canonical 1 — 3 only reachable via
    // the second blocking pass
    assert(out === Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
    // 4 (name too far), 5 (no shared block), 6 (unrelated) stay out
    assert(!out.contains(4L) && !out.contains(5L) && !out.contains(6L))
  }

  test("single-pass blocking (nation+balance only) misses the nation-corrupted clone") {
    // documents WHY the union is load-bearing: drop pass 2 and record 3
    // falls out of the entity
    val cand = recs.as("x").join(recs.as("y"),
        col("x.c_nationkey") === col("y.c_nationkey") &&
          col("x.c_acctbal") === col("y.c_acctbal") &&
          col("x.c_custkey") < col("y.c_custkey"))
      .filter(levenshtein(col("x.c_name"), col("y.c_name")) <= 1)
      .select(col("x.c_custkey").as("a"), col("y.c_custkey").as("b"))
    val singlePass = graft.operators.Dedup.connectedComponents(cand, "a", "b")
      .collect().map(_.getLong(0)).toSet
    assert(singlePass === Set(1L, 2L), "fixture rot: pass 1 should catch only 1-2")
  }
}
