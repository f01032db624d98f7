package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.round

/** Decimal rounding that is bit-compatible with the DuckDB oracle's
  * `round(x, d)` (`std::round(x*10^d)/10^d` on the binary double).
  * Spark's own `round(x, d)` goes through BigDecimal(shortest-repr)
  * HALF_UP, which disagrees on `.xx5`-boundary values. */
object Rounding {
  def r2(c: Column): Column = round(c * 100) / 100
  def r4(c: Column): Column = round(c * 10000) / 10000
  def r6(c: Column): Column = round(c * 1000000) / 1000000
}
