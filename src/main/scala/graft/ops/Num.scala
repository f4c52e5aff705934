package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Numeric conventions for oracle parity.
  *
  * Double aggregation is order-dependent, and Spark's partition merge order
  * differs from DuckDB's — so a naive `sum(double)` can differ in low bits
  * (and after rounding, in the hash compare). We therefore aggregate the
  * 2-decimal monetary columns as DECIMAL(18,2) (exact, associative — also the
  * right call at 100 TB where partial-aggregate merge order is arbitrary) and
  * convert to double only at the end, where both engines perform the same
  * correctly-rounded IEEE754 ops.
  *
  * Sample stddev is likewise computed from exact decimal/integer sums via
  * sqrt((Σx² − (Σx)²/n)/(n−1)) instead of the builtin single-pass
  * `stddev_samp`, whose Welford merges are order-dependent across engines.
  */
object Num {
  private[ops] val D = DecimalType(18, 2)

  /** Exact decimal sum surfaced as double. */
  def dsum(c: Column): Column = sum(c.cast(D)).cast("double")

  /** avg via exact sum / count — deterministic double division. */
  def davg(c: Column): Column = dsum(c) / count(c)

  /** Matching DuckDB SQL fragments. */
  def dsumSql(col: String): String =
    s"CAST(sum(CAST($col AS DECIMAL(18,2))) AS DOUBLE)"
  def davgSql(col: String): String = s"${dsumSql(col)} / count($col)"

  /** Sample stddev from exact sums: n = count, s = Σx, s2 = Σx² (both exact
    * — decimal or integer). All-double finale is identical across engines. */
  def stddevFromSums(n: Column, s: Column, s2: Column): Column =
    when(n > 1,
      sqrt(greatest(
        (s2.cast("double") - s.cast("double") * s.cast("double") / n) / (n - lit(1)),
        lit(0.0))))

  /** DuckDB fragment matching [[stddevFromSums]]. `n`, `s`, `s2` are SQL
    * fragments producing exact (integer/decimal) aggregates. */
  def stddevSql(n: String, s: String, s2: String): String =
    s"CASE WHEN $n > 1 THEN sqrt(greatest((CAST($s2 AS DOUBLE) - CAST($s AS DOUBLE) * CAST($s AS DOUBLE) / $n) / ($n - 1), 0.0)) ELSE NULL END"

  /** Decimal-exact sample stddev of a 2-decimal column. */
  def dstddev(c: Column): Column = {
    val dec = c.cast(D)
    stddevFromSums(count(c), sum(dec), sum(dec * dec))
  }

  def dstddevSql(col: String): String = {
    val dec = s"CAST($col AS DECIMAL(18,2))"
    stddevSql(s"count($col)", s"sum($dec)", s"sum($dec * $dec)")
  }
}
