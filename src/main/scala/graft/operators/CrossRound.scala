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
  */
object CrossRound {
  def r(c: Column, scale: Int): Column = {
    val f = math.pow(10, scale)
    round(c * f) / f
  }
}
