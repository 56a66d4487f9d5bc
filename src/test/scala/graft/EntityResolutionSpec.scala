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

  test("skewed blocking key: star guard caps hot-block pairs, cluster survives") {
    // 200 records pile into ONE (nation, balance) block — the
    // default-valued-field skew real customer data has. All-pairs would
    // be C(200,2) = 19,900 levenshtein candidates from this block; the
    // star guard must emit only the 199 rep-centered pairs.
    val n = 200
    val hot = (1 to n).map(i =>
      (i.toLong, "Customer#000000001", 5, 0.0, s"SEG$i"))
    // distinct segments kill the second blocking pass for these records
    val cold = Seq(
      (900L, "Customer#000000900", 7, 55.0, "AUTO"),
      (901L, "Cstomer#000000900", 7, 55.0, "AUTO"))
    val recs = (hot ++ cold)
      .toDF("c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment")

    val pairs = EntityResolution.blockPairs(
      recs, Seq("c_nationkey", "c_acctbal"), cap = 64)
    val got = pairs.collect()
    // hot block degraded: 199 star pairs (rep 1 vs each other member),
    // cold block untouched: its single all-pairs candidate
    assert(got.length === (n - 1) + 1,
      s"expected ${n - 1} star + 1 cold pairs, got ${got.length}")
    val hotPairs = got.filter(_.getLong(0) == 1L)
    assert(hotPairs.length === n - 1)
    assert(got.forall(r => r.getLong(0) < r.getLong(1)), "a < b must hold")

    // end-to-end: the degraded candidates still resolve the whole hot
    // entity (identical names → every star pair matches; CC closes the
    // cluster transitively through the representative)
    val out = EntityResolution.resolveCustomers(recs, blockCap = 64)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    (1 to n).foreach(i => assert(out(i.toLong) === 1L,
      s"record $i fell out of the hot-block cluster"))
    assert(out(901L) === 900L)

    // below the cap nothing degrades: all-pairs form is unchanged
    val full = EntityResolution.blockPairs(
      recs, Seq("c_nationkey", "c_acctbal"), cap = 500)
    assert(full.count() === n.toLong * (n - 1) / 2 + 1)
  }
}
