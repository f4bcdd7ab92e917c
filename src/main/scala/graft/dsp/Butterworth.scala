package graft.dsp

/**
 * Order-2 digital Butterworth low-pass design, equivalent to
 * `scipy.signal.butter(2, wn, "low")` (used by the reference's `lp_filter`,
 * ctd/processing.py:83-87).
 *
 * scipy's path is: analog prototype poles exp(i*pi*3/4), exp(i*pi*5/4) ->
 * pre-warped cutoff `warped = 4*tan(pi*wn/2)` -> bilinear transform with
 * fs = 2. Algebraically that collapses to the classic biquad closed form
 * below (H(s) = 1/(s^2 + sqrt(2) s + 1) with s = (1 - z^-1)/(K (1 + z^-1)),
 * K = tan(pi*wn/2)); the closed form and scipy agree to double precision.
 */
object Butterworth {

  /** Returns (b, a) — numerator/denominator taps, a(0) = 1. `wn` is the
    * cutoff normalized to Nyquist (half-cycles/sample), 0 < wn < 1. */
  def butter2LowPass(wn: Double): (Array[Double], Array[Double]) = {
    require(wn > 0.0 && wn < 1.0, s"wn must be in (0, 1), got $wn")
    val k    = math.tan(math.Pi * wn / 2.0)
    val k2   = k * k
    val sq2k = math.sqrt(2.0) * k
    val norm = 1.0 / (1.0 + sq2k + k2)
    val b0   = k2 * norm
    val b    = Array(b0, 2.0 * b0, b0)
    val a    = Array(1.0, 2.0 * (k2 - 1.0) * norm, (1.0 - sq2k + k2) * norm)
    (b, a)
  }
}
