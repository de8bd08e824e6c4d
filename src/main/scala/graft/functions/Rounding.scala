package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.rint

/** Cross-engine-stable rounding for RATIO columns.
  *
  * `round(double, k)` is implementation-defined at half-points: Spark
  * rounds the double's SHORTEST decimal representation
  * (BigDecimal.valueOf) HALF_UP, DuckDB correctly rounds the BINARY
  * value — and a ratio of integers / terminating decimals lands
  * EXACTLY on a half-point routinely (observed: sliding-window avg
  * 1512.12/32 = 47.25375 → Spark .2538, DuckDB .2537; 18 of 14 415
  * windows at sf0.1). Sums never hit this (they are rounded as exact
  * DECIMALs on both sides — see RelationalQueries.decSum); divisions
  * do, because the quotient picks up decimals past the output scale.
  *
  * Fix: both engines round the scaled product of the SAME input
  * double with the SAME half-even rule —
  * Spark `rint(x * 10^k) / 10^k` == DuckDB
  * `round_even(x * 1e<k>, 0) / 1e<k>` (mirror helper in the oracle
  * SQL builders). The products are identical IEEE doubles, rint and
  * round_even agree everywhere including exact .5 doubles, and the
  * final division of identical integers is identical.
  */
object Rounding {
  /** Half-even round of a ratio-valued double column to `scale`
    * decimals, bit-identical across engines. The oracle SQL mirror is
    * spelled inline at each oracle site (the strings live inside
    * larger SQL literals) and MUST stay exactly
    * `round_even((<expr>) * 1e<scale>, 0) / 1e<scale>`. */
  def roundEven(c: Column, scale: Int): Column = {
    val f = math.pow(10, scale)
    rint(c * f) / f
  }
}
