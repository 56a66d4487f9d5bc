package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew tooling for shuffle joins (SURVEY.md §2B scale notes).
  *
  * Spark's AQE rebalances skewed SHUFFLE joins at runtime
  * (spark.sql.adaptive.skewJoin), and the dedup operators guard their
  * self-joins with hot-key caps ([[Dedup.DefaultDfCap]]). This utility is
  * the third tool: explicit key salting, for when a hot key's rows must
  * all be JOINED (not dropped like a df-cap) and the plan must spread
  * them over the cluster deterministically — e.g. a fact table where 1%
  * of keys hold 50% of rows joined against a per-key dimension too big to
  * broadcast.
  */
object Skew {

  /** Salted inner equi-join on `key`: the large (skewed) side gets a
    * deterministic salt in [0, salts); the smaller side is replicated
    * once per salt value. Each hot key's rows then land on `salts`
    * reducers instead of one. The salt derives from
    * monotonically_increasing_id (stable for a given partition layout),
    * not rand(), so repeated runs shuffle identically.
    *
    * Cost model: replicates the small side `salts`×, so pick
    * salts ≈ (hot-key rows / target partition rows), and keep the
    * replicated side the SMALLER input. */
  def saltedEquiJoin(large: DataFrame, small: DataFrame, key: String,
      salts: Int): DataFrame = {
    require(salts > 0, s"salts must be positive: $salts")
    val saltCol = "__graft_salt"
    val l = large.withColumn(saltCol,
      pmod(xxhash64(monotonically_increasing_id()), lit(salts.toLong)))
    val r = small.withColumn(saltCol,
      explode(sequence(lit(0L), lit(salts.toLong - 1))))
    l.join(r, Seq(key, saltCol)).drop(saltCol)
  }
}
