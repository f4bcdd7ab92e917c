package graft.dsp

/** `np.interp(newX, xp, fp)` semantics (used by the reference's
  * `bindata(method="interpolate")`, ctd/processing.py:121-123): linear
  * interpolation with edge CLAMPING (newX below xp(0) -> fp(0), above
  * xp(last) -> fp(last)). Assumes xp ascending, like np.interp. */
object Interp {

  /** Single-point np.interp (same clamping semantics as [[linear]]). */
  def linearOne(x: Double, xp: Array[Double], fp: Array[Double]): Double =
    linear(Array(x), xp, fp)(0)

  def linear(newX: Array[Double], xp: Array[Double], fp: Array[Double]): Array[Double] = {
    require(xp.length == fp.length, "xp and fp must have the same length")
    val n = xp.length
    newX.map { x =>
      if (n == 0) Double.NaN
      else if (n == 1 || x <= xp(0)) fp(0)
      else if (x >= xp(n - 1)) fp(n - 1)
      else {
        // binary search: greatest i with xp(i) <= x
        var lo = 0; var hi = n - 1
        while (hi - lo > 1) {
          val mid = (lo + hi) >>> 1
          if (xp(mid) <= x) lo = mid else hi = mid
        }
        val x0 = xp(lo); val x1 = xp(hi)
        if (x1 == x0) fp(lo)
        else fp(lo) + (fp(hi) - fp(lo)) * (x - x0) / (x1 - x0)
      }
    }
  }
}
