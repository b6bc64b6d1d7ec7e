package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Cross-engine-safe decimal rounding for hash-gated output columns.
  *
  * Spark's `round(x, s)` rounds the SHORTEST DECIMAL REPR half-up
  * (BigDecimal.valueOf goes through Double.toString), while DuckDB's
  * `round(x, s)` multiplies by 10^s and rounds the BINARY value half away
  * from zero — they disagree whenever the shortest repr carries a 5 at
  * position s+1 but the binary value sits below the tie (probed:
  * round(12.34565, 4) = 12.3457 on Spark, 12.3456 on DuckDB). That is a
  * data-dependent bit-parity failure waiting in every rounded double
  * column — the same latent class as the round-2 negative-zero bug.
  *
  * `r(c, s)` = `round(c * 10^s) / 10^s` instead: the product's rounding
  * agrees between the engines everywhere, because a double's shortest
  * repr ends in ".5" iff the value IS exactly k + 0.5 (".5" round-trips),
  * where repr-half-up and binary-half-away-from-zero coincide; every
  * non-tie product rounds by its actual magnitude on both. The division
  * then yields identical bits (same integer, same divisor).
  *
  * Keep DuckDB oracles on plain `round(x, s)` — this helper matches THAT
  * (differentially tested: 200k values x scales {2,4,6} including odd
  * multiples of 5*10^-(s+1) — the tie grids — and rational percentages;
  * zero bit mismatches against DuckDB).
  * Negative near-zero inputs can still round to -0.0 on DuckDB (never on
  * Spark — BigDecimal has no signed zero): columns that can be negative
  * must add `+ 0.0` on BOTH engines (the r4z pattern).
  *
  * == The tie-sensitive-aggregate convention ==
  *
  * Every tie-sensitive rounding of an AGGREGATED double must PRE-ROUND at
  * a scale >= final + 4 (mirrored on the oracle side). This is the rule
  * that unifies the three distinct cross-engine rounding traps this
  * project has hit:
  *
  *   1. signed zero (round 2, o42): a rounded difference whose true value
  *      is ~-1e-17 — Spark normalizes -0.0, DuckDB keeps it. Guard: `+ 0.0`
  *      on both engines after the round.
  *   2. shortest-repr vs binary rounding (round 3, found by review): Spark
  *      round/bround round the printed repr, DuckDB rounds the binary
  *      value. Guard: [[r]] (multiply form) on the Spark side.
  *   3. partition-order drift (round 3, o43, caught by the driver): the two
  *      engines — and the SAME engine at different partition counts — sum
  *      a float aggregate in different orders, so a value whose true
  *      magnitude sits exactly ON a rounding tie (21.25 at scale 1)
  *      arrives as 21.25 +/- 1 ulp and rounds to DIFFERENT digits per run.
  *      Guard: [[ra]] — pre-round 4 extra decimals to collapse the +/-ulp
  *      noise onto one double on every engine and at every parallelism,
  *      then round to the output scale. The pre-round scale must be coarse
  *      enough that accumulated drift (~1e-12 relative) stays far from its
  *      OWN ties, and fine enough not to perturb the output scale — +4
  *      digits satisfies both by ~7 orders of magnitude.
  *
  * Deterministic per-row values (ratios of exact integer sums, scalar
  * math) cannot drift and may use [[r]] directly; anything downstream of
  * AVG/STDDEV over doubles — or of a sum that can exceed 2^53 at target
  * scale — goes through [[ra]]. Printed text formats through the
  * MULTIPLY form `bround(r(x, 6) * 10) / 10`, mirrored as
  * `round_even(round(x, 6) * 10, 0) / 10` (round 5): scale-1 `bround`
  * half-evens the shortest repr while DuckDB's `round_even(x, 1)`
  * half-evens the binary value, and a pre-rounded 3350000/1e6 can split
  * them — at scale 0 every tie point is a half-INTEGER, exactly
  * representable, so repr- and binary-rounding agree on all inputs.
  */
object CrossRound {
  def r(c: Column, scale: Int): Column = {
    val f = math.pow(10, scale)
    round(c * f) / f
  }

  /** Aggregate-safe output rounding: collapse partition-order drift at
    * `scale + 4`, then round to `scale`. Oracle mirror:
    * `round(round(x, scale + 4), scale)`.
    */
  def ra(c: Column, scale: Int): Column = r(r(c, scale + 4), scale)

  /** Driver-side twin of [[r]] for bounded model state computed on the
    * driver (sample-trained centroids / codebooks): the same
    * multiply-then-HALF_UP arithmetic Spark's `round(x * 10^s) / 10^s`
    * performs (Round on DoubleType goes through
    * `BigDecimal.valueOf(v).setScale(0, HALF_UP)`), so driver- and
    * cluster-computed values round through the same lattice.
    */
  def rD(x: Double, scale: Int): Double = {
    val f = math.pow(10, scale)
    java.math.BigDecimal.valueOf(x * f)
      .setScale(0, java.math.RoundingMode.HALF_UP).doubleValue() / f
  }

  /** Driver-side twin of [[ra]]. */
  def raD(x: Double, scale: Int): Double = rD(rD(x, scale + 4), scale)
}
