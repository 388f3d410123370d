package graft.quality

/**
 * Distribution-drift tests over two fixed-bucket histograms (north_rule:
 * "histogram for distribution-drift KS/chi-square checks").
 *
 * The heavy lifting — bucket counting — is distributed (one aggregation
 * pass, see [[ColumnStats.histogram]]); the test statistics themselves are
 * O(buckets) driver-side math, which is the right split at 100 TB: shipping
 * two small count arrays to the driver costs nothing.
 */
object Drift {

  final case class Result(statistic: Double, threshold: Double, drifted: Boolean)

  /**
   * Pearson chi-square two-sample test on bucket counts. Buckets where both
   * samples are empty are ignored. Uses the standard two-sample form:
   * X^2 = sum_i ( (K1*R_i - K2*S_i)^2 / (R_i + S_i) ) with K1=sqrt(N2/N1),
   * K2=sqrt(N1/N2) — robust to unequal sample sizes.
   */
  def chiSquare(a: Array[Long], b: Array[Long], threshold: Double): Result = {
    require(a.length == b.length, "histograms must share a bucket spec")
    val n1 = a.sum.toDouble
    val n2 = b.sum.toDouble
    if (n1 == 0 || n2 == 0) return Result(0.0, threshold, drifted = false)
    val k1 = math.sqrt(n2 / n1)
    val k2 = math.sqrt(n1 / n2)
    var x2 = 0.0
    var i = 0
    while (i < a.length) {
      val r = a(i).toDouble
      val s = b(i).toDouble
      if (r + s > 0) {
        val d = k1 * r - k2 * s
        x2 += d * d / (r + s)
      }
      i += 1
    }
    Result(x2, threshold, x2 > threshold)
  }

  /**
   * Population Stability Index over the bucketed distributions:
   * PSI = Σ_i (p_i - q_i) · ln(p_i / q_i), with additive (+0.5 per
   * bucket) smoothing so empty buckets contribute finitely instead of
   * ±∞ — the standard monitoring metric alongside KS/chi² (rule of
   * thumb: < 0.1 stable, > 0.2 shifted, the default threshold here).
   * The smoothing constant is part of the contract: the q_drift DuckDB
   * oracle restates `(count + 0.5) / (total + 0.5·buckets)` verbatim.
   */
  def psi(a: Array[Long], b: Array[Long], threshold: Double = 0.2): Result = {
    require(a.length == b.length, "histograms must share a bucket spec")
    val n1 = a.sum.toDouble
    val n2 = b.sum.toDouble
    if (n1 == 0 || n2 == 0) return Result(0.0, threshold, drifted = false)
    val k = a.length
    var s = 0.0
    var i = 0
    while (i < k) {
      val p = (a(i) + 0.5) / (n1 + 0.5 * k)
      val q = (b(i) + 0.5) / (n2 + 0.5 * k)
      s += (p - q) * math.log(p / q)
      i += 1
    }
    Result(s, threshold, s > threshold)
  }

  /** Two-sample Kolmogorov-Smirnov statistic over bucketed CDFs:
   * D = max_i |CDF1(i) - CDF2(i)|. */
  def ks(a: Array[Long], b: Array[Long], threshold: Double): Result = {
    require(a.length == b.length, "histograms must share a bucket spec")
    val n1 = a.sum.toDouble
    val n2 = b.sum.toDouble
    if (n1 == 0 || n2 == 0) return Result(0.0, threshold, drifted = false)
    var c1 = 0.0
    var c2 = 0.0
    var d = 0.0
    var i = 0
    while (i < a.length) {
      c1 += a(i) / n1
      c2 += b(i) / n2
      val diff = math.abs(c1 - c2)
      if (diff > d) d = diff
      i += 1
    }
    Result(d, threshold, d > threshold)
  }
}
