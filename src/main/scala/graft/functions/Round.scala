package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Engine-portable rounding and exact money arithmetic.
  *
  * Spark's `round(double, n)` rounds the double's SHORTEST DECIMAL STRING
  * (BigDecimal HALF_UP); DuckDB rounds the binary value. The two disagree
  * whenever the true value sits near a `…5` boundary at the n-th decimal
  * — which exact ratios of small integers hit constantly. `floor(x*10^n
  * + 0.5)/10^n` is pure IEEE arithmetic, so two engines evaluating it on
  * identical input bits produce identical output bits. That is what the
  * DuckDB oracle needs: determinism, not a preferred tie-break direction.
  *
  * Money columns in the fixtures are exact 2-decimal values stored as
  * doubles. [[cents]] recovers the exact integer cent count; sums/products
  * over cents are exact integer arithmetic — invariant to partitioning
  * and summation order (a plain double sum is NOT: its last-ulp value
  * depends on the shuffle partition count).
  */
object Round {
  def rn(c: Column, n: Int): Column = {
    val p = math.pow(10.0, n.toDouble)
    floor(c * lit(p) + lit(0.5)) / lit(p)
  }
  def r2(c: Column): Column = rn(c, 2)
  def r4(c: Column): Column = rn(c, 4)
  def r6(c: Column): Column = rn(c, 6)

  /** Exact integer cents of a 2-decimal double column. */
  def cents(c: Column): Column = floor(c * lit(100.0) + lit(0.5)).cast("long")

  /** Cents back to a (exact) 2-decimal double. */
  def fromCents(c: Column): Column = c.cast("double") / lit(100.0)

  /** Micro-unit scale shared by the exact-integer mean family (batch
    * q88, centroidStream, and their oracle SQL): elements scale to
    * integer micro-units before summation so sums are order-invariant.
    * One constant so the batch/stream/oracle lockstep is structural,
    * not comment-enforced.
    */
  val MicroScale: Double = 1e6

  /** JVM-scalar twin of [[rn]] — the same floor idiom on plain doubles,
    * for code that rounds outside Column space (stateful streaming
    * emissions). Identical bits to rn/sqlRn on identical input.
    */
  def jvmRn(d: Double, n: Int): Double = {
    val p = math.pow(10.0, n.toDouble)
    math.floor(d * p + 0.5) / p
  }

  /** DuckDB SQL for the same operations (keep in lockstep with above). */
  def sqlRn(expr: String, n: Int): String = {
    val p = math.pow(10.0, n.toDouble)
    s"floor(($expr) * $p + 0.5) / $p"
  }
  def sqlCents(expr: String): String =
    s"CAST(floor(($expr) * 100.0 + 0.5) AS BIGINT)"
}
