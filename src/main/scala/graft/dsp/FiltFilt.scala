package graft.dsp

/**
 * Zero-phase forward-backward IIR filtering with the exact defaults of
 * `scipy.signal.filtfilt(b, a, x)` for 3-tap (order-2) filters, as invoked by
 * the reference's `lp_filter` (ctd/processing.py:89):
 *
 *  - odd-reflection padding of length `padlen = 3 * max(len(a), len(b)) = 9`,
 *  - initial filter state `zi = lfilter_zi(b, a)` scaled by the first padded
 *    sample (forward) / last forward output (backward),
 *  - direct-form II transposed recurrence (`lfilter`).
 *
 * Divergence from scipy (documented): scipy RAISES when `len(x) <= padlen`;
 * we clamp `padlen = min(9, n - 1)` so a degenerate 2-row cast doesn't kill a
 * 100 TB job. Casts in real data are thousands of rows, where behavior is
 * bit-identical to scipy's formula.
 */
object FiltFilt {

  /** Direct-form II transposed `lfilter` for 3-tap b/a with initial state zi
    * (length 2). Returns the output; mutates nothing. */
  def lfilter(b: Array[Double], a: Array[Double], x: Array[Double],
              zi: Array[Double]): Array[Double] = {
    val y  = new Array[Double](x.length)
    var z0 = zi(0)
    var z1 = zi(1)
    var i  = 0
    while (i < x.length) {
      val xi = x(i)
      val yi = b(0) * xi + z0
      z0 = b(1) * xi - a(1) * yi + z1
      z1 = b(2) * xi - a(2) * yi
      y(i) = yi
      i += 1
    }
    y
  }

  /** Steady-state initial conditions, `scipy.signal.lfilter_zi` for the 3-tap
    * case: solve (I - companion(a).T) zi = b[1:] - a[1:]*b[0] — a 2x2 system.
    */
  def lfilterZi(b: Array[Double], a: Array[Double]): Array[Double] = {
    // [[1+a1, -1], [a2, 1]] zi = [b1 - a1*b0, b2 - a2*b0]
    val m00 = 1.0 + a(1); val m01 = -1.0
    val m10 = a(2);       val m11 = 1.0
    val r0  = b(1) - a(1) * b(0)
    val r1  = b(2) - a(2) * b(0)
    val det = m00 * m11 - m01 * m10
    Array((r0 * m11 - m01 * r1) / det, (m00 * r1 - r0 * m10) / det)
  }

  /** Forward-backward filter, scipy `filtfilt` defaults (padtype="odd"). */
  def filtfilt(b: Array[Double], a: Array[Double], x: Array[Double]): Array[Double] = {
    val n = x.length
    if (n == 0) return Array.empty
    if (n == 1) return x.clone()
    val edge = math.min(3 * math.max(a.length, b.length), n - 1)

    // odd extension: left = 2*x(0) - x(edge..1), right = 2*x(n-1) - x(n-2..n-1-edge)
    val ext = new Array[Double](n + 2 * edge)
    var i = 0
    while (i < edge) { ext(i) = 2.0 * x(0) - x(edge - i); i += 1 }
    System.arraycopy(x, 0, ext, edge, n)
    i = 0
    while (i < edge) { ext(edge + n + i) = 2.0 * x(n - 1) - x(n - 2 - i); i += 1 }

    val zi = lfilterZi(b, a)
    val fwd = lfilter(b, a, ext, Array(zi(0) * ext(0), zi(1) * ext(0)))
    val rev = fwd.reverse
    val bwd = lfilter(b, a, rev, Array(zi(0) * rev(0), zi(1) * rev(0)))
    val out = bwd.reverse
    out.slice(edge, edge + n)
  }
}
