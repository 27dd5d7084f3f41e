package graft.operators

/** The ONE overflow-safe range-bucket expression every two-phase
  * order-statistic operator shares (rank statistics, rank transform,
  * skyline). Duplicated string copies of this expression reintroduced
  * the wrap bug once already — change it here or nowhere. */
private[graft] object BucketMath {

  /** SQL for a LONG bucket id of `v` within the [lo, hi] span:
    * the width derives from HALF-spans so it cannot wrap even when
    * `hi - lo` exceeds Long.MaxValue (sentinel minimums mixed with
    * large positives), and `v div w - lo div w` is monotone in v for
    * any positive w (truncating division included) with equal v always
    * mapping to equal ids — the only two properties the two-phase
    * consumers need. Ids are ordered, not evenly placed. (decimal(38)
    * arithmetic would also be wrap-safe but costs ~4 s of plan
    * compilation per construction — measured in round 8.) */
  def halfSpanBucketSql(v: String, lo: String, hi: String,
                        buckets: Int): String = {
    require(buckets >= 1, s"buckets=$buckets")
    val half = math.max(buckets / 2, 1)
    // every operand is parenthesized: a compound expression like
    // "a + b" must not rebind through div's precedence into a silently
    // non-monotone bucket id
    val w = s"greatest(((($hi) div 2) - (($lo) div 2)) div $half, 1L)"
    s"(($v) div $w) - (($lo) div $w)"
  }
}
