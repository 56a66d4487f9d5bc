package graft.functions

/** Shared numeric kernels whose EXACT semantics are load-bearing for
  * oracle bit-identity — one implementation, referenced by every
  * kernel, so a future tweak cannot silently diverge one family's
  * rounding from another's (the r19 review's duplication finding). */
private[graft] object GraftMath {

  /** Round half away from zero.
    *
    * Agrees with Spark's `round` (BigDecimal HALF_UP over the
    * shortest-decimal string) and DuckDB's `round` (half away from
    * zero on the binary value) on EVERY double: the shortest decimal
    * repr round-trips to the same double, and both rules are
    * half-away-from-zero for positive and negative — the
    * [[Int8QuantizeCodes]] scaladoc carries the full argument, and
    * both its spec and [[JlProject]]'s pin the bit-identity against
    * the HOF `round` forms. */
  def roundAway(x: Double): Double = {
    val a = math.abs(x)
    val f = math.floor(a)
    val r = if (a - f >= 0.5) f + 1.0 else f
    if (x < 0) -r else r
  }
}
