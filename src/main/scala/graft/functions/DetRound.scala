package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Cross-engine-deterministic fixed-point rounding for doubles that a
  * DuckDB oracle re-derives independently.
  *
  * `round(x, 6)` is NOT such a function: Spark rounds the double's
  * shortest decimal representation via BigDecimal HALF_UP, DuckDB
  * multiplies in double arithmetic, and the two disagree on
  * representation ties — observed flipping the 6th decimal of one LM
  * surprisal row in ~5000 at sf0.1 (round 10). `floor(x·1e6 + 0.5)/1e6`
  * is a pure IEEE-double op sequence (multiply, add, floor, divide —
  * each exactly-rounded and implementation-independent), so BOTH engines
  * map identical input doubles to identical outputs, ties included.
  *
  * The SQL mirror every oracle must use verbatim:
  * `floor(x * 1000000.0 + 0.5) / 1000000.0`.
  */
object DetRound {
  def round6(c: Column): Column =
    floor(c * lit(1000000.0) + lit(0.5)) / lit(1000000.0)

  /** The DuckDB-side spelling, for composing oracle SQL strings. */
  def sql6(expr: String): String =
    s"floor(($expr) * 1000000.0 + 0.5) / 1000000.0"
}
