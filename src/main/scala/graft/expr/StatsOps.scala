package graft.expr

/** Statistical kernels for the reliability score (reference:
  * notebooks/schedule_deviation.ipynb cell f208d562 — scipy.stats.norm.cdf
  * post-processing done client-side in pandas; we compute it in-engine).
  *
  * erf uses Abramowitz & Stegun 7.1.26 (max abs error 1.5e-7). The exact
  * same operation order is mirrored in the DuckDB oracle SQL
  * (ops/Flagship.scala) so both engines produce bit-near-identical doubles —
  * results are rounded to 7 decimals on both sides for the hash compare.
  * Keep the op order in sync with `Flagship.erfSql` when editing.
  */
object StatsOps {
  private final val P = 0.3275911
  private final val A1 = 0.254829592
  private final val A2 = -0.284496736
  private final val A3 = 1.421413741
  private final val A4 = -1.453152027
  private final val A5 = 1.061405429
  private final val InvSqrt2 = 1.0 / math.sqrt(2.0)

  private def erfPos(x: Double): Double = {
    val t = 1.0 / (1.0 + P * x)
    1.0 - ((((A5 * t + A4) * t + A3) * t + A2) * t + A1) * t * math.exp(-x * x)
  }

  def erf(x: Double): Double = if (x >= 0) erfPos(x) else -erfPos(-x)

  /** Standard normal CDF Φ(z). */
  def normalCdf(z: Double): Double = 0.5 * (1.0 + erf(z * InvSqrt2))

  /** P(X in [lo, hi]) for X ~ N(mu, sigma): the reference's reliability
    * score with lo = -60 s, hi = +300 s. */
  def reliability(mu: Double, sigma: Double, lo: Double, hi: Double): Double =
    normalCdf((hi - mu) / sigma) - normalCdf((lo - mu) / sigma)
}
